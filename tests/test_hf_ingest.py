"""HF streaming-ingest path, driven by a recorded-schema fixture (VERDICT r1
item 7: the branch had never executed — no egress here).

The fixture rows replicate the `project-riz/osu-beatmaps` row schema as the
reference consumes it (reference data/dataset.py:42-85): ``opus`` holds the
Audio-cast decoded wave (``{'array', 'path', 'sampling_rate'}``), ``json``
carries ``audio_hash`` plus ``beatmaps`` rows with
mode/approved/beatmap_id/beatmapset_id/content. ``normalize_hf_sample`` and
``build_dataset(samples=...)`` are the exact functions the live stream runs
— only ``datasets.load_dataset`` itself is bypassed.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from test_end_to_end import synth_osu  # noqa: E402

from osu_dreamer_tpu.audio import SR, read_spec  # noqa: E402
from osu_dreamer_tpu.data.ingest import build_dataset, normalize_hf_sample  # noqa: E402
from osu_dreamer_tpu.signal import read_beatmap  # noqa: E402


def _wave(seconds: float, freq: float) -> np.ndarray:
    t = np.arange(int(SR * seconds)) / SR
    return (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _hf_row(audio_hash, wave, beatmaps):
    return {
        "opus": {"array": wave.astype(np.float64), "path": f"{audio_hash}.opus",
                 "sampling_rate": SR},
        "json": {"audio_hash": audio_hash, "beatmaps": beatmaps},
    }


def _bm(bm_id, content, mode=0, approved=1):
    return {
        "mode": mode,
        "approved": approved,
        "beatmap_id": bm_id,
        "beatmapset_id": bm_id // 10,
        "content": content,
    }


def fixture_page():
    """three corpus rows: a normal ranked set, a set whose maps are all
    filtered (wrong mode / unranked), and a set with one unparseable map"""
    return [
        _hf_row("deadbeefcafe0001", _wave(3.0, 220), [
            _bm(101, synth_osu(1)),
            _bm(102, synth_osu(2)),
        ]),
        _hf_row("deadbeefcafe0002", _wave(2.0, 330), [
            _bm(201, synth_osu(3), mode=3),       # mania: filtered
            _bm(202, synth_osu(4), approved=0),   # pending: filtered
        ]),
        _hf_row("deadbeefcafe0003", _wave(2.0, 440), [
            _bm(301, "osu file format v14\n[HitObjects]\ngarbage"),  # bad map
            _bm(302, synth_osu(5)),
        ]),
    ]


def test_hf_fixture_build_dataset(tmp_path):
    data_dir = tmp_path / "data"
    samples = (normalize_hf_sample(r) for r in fixture_page())
    written = sum(build_dataset(data_dir, num_workers=2, samples=samples))

    # ranked std maps minus the unparseable one
    assert written == 3

    # layout keyed by the corpus's audio_hash (reference dataset.py:42)
    set1 = data_dir / "deadbeefcafe0001"
    assert sorted(p.name for p in set1.iterdir()) == [
        "101.map.npy", "102.map.npy", "spec.npy",
    ]
    # fully-filtered set produces nothing
    assert not (data_dir / "deadbeefcafe0002").exists()
    # parse failure is isolated: sibling map + spec still written
    set3 = data_dir / "deadbeefcafe0003"
    assert sorted(p.name for p in set3.iterdir()) == ["302.map.npy", "spec.npy"]

    # outputs round-trip through the standard readers
    with open(set1 / "spec.npy", "rb") as f:
        spec = read_spec(f)
    assert spec.shape[0] == 72 and spec.shape[1] > 0
    chart, labels = read_beatmap(set1 / "101.map.npy")
    assert chart.shape[0] == 9 and chart.shape[1] == spec.shape[1]
    assert labels.shape == (5,)


def test_hf_fixture_idempotent_and_force(tmp_path):
    data_dir = tmp_path / "data"
    page = fixture_page()[:1]
    assert sum(build_dataset(data_dir, samples=(normalize_hf_sample(r) for r in page))) == 2
    # second pass: everything exists, nothing rewritten
    assert sum(build_dataset(data_dir, samples=(normalize_hf_sample(r) for r in page))) == 0
    # force: rewritten
    assert sum(build_dataset(
        data_dir, force=True, samples=(normalize_hf_sample(r) for r in page)
    )) == 2
