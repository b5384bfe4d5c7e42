"""Header-based window counting (data/pipeline.py count_*_windows) must
equal what the streams actually yield — the multi-host lockstep truncation
(parallel/config.py lockstep_steps) depends on these counts being exact and
seed-independent."""

import numpy as np
import pytest

from osu_dreamer_tpu.audio import get_frame_times, write_spec
from osu_dreamer_tpu.data.pipeline import (
    count_latent_windows,
    count_signal_windows,
    hold_out_mapsets,
    latent_windows,
    signal_windows,
)
from osu_dreamer_tpu.osu import Beatmap
from osu_dreamer_tpu.signal import write_beatmap


@pytest.fixture(scope="module")
def signal_dataset(tmp_path_factory):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_end_to_end import synth_osu

    root = tmp_path_factory.mktemp("sigdata")
    rng = np.random.default_rng(0)
    # ragged lengths so counts differ per mapset
    for i, n_frames in enumerate((900, 1300, 701)):
        d = root / f"set{i}"
        d.mkdir()
        spec = rng.random((72, n_frames)).astype(np.float32)
        with open(d / "spec.npy", "wb") as f:
            write_spec(f, spec)
        for m in range(2):
            bm = Beatmap(synth_osu(i * 10 + m))
            with open(d / f"{i}{m}.map.npy", "wb") as f:
                write_beatmap(f, bm, get_frame_times(n_frames))
    return root


@pytest.fixture(scope="module")
def latent_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("latdata")
    rng = np.random.default_rng(1)
    for i, l in enumerate((40, 73, 21)):
        d = root / f"set{i}"
        d.mkdir()
        np.save(d / "h.npy", rng.normal(size=(l, 16)).astype(np.float32))
        for m in range(2):
            np.savez(
                d / f"{i}{m}.latent.npz",
                z=rng.normal(size=(l - m, 4)).astype(np.float32),
                s=rng.normal(size=(8,)).astype(np.float32),
                labels=rng.random(5).astype(np.float32) * 10,
            )
    return root


@pytest.mark.parametrize("seq_len,cap", [(64, -1), (64, 2), (256, -1)])
def test_signal_count_matches_stream(signal_dataset, seq_len, cap):
    sets, _ = hold_out_mapsets(signal_dataset, "*.map.npy", 0, 0.0)
    expected = sum(
        1 for _ in signal_windows(sets, seq_len, max_per_map=cap, seed=7)
    )
    assert count_signal_windows(sets, seq_len, cap) == expected
    # seed-independence: a different epoch seed yields the same count
    assert expected == sum(
        1 for _ in signal_windows(sets, seq_len, max_per_map=cap, seed=99)
    )


@pytest.mark.parametrize("seq_len,cap", [(8, -1), (8, 3), (None, -1)])
def test_latent_count_matches_stream(latent_dataset, seq_len, cap):
    sets, _ = hold_out_mapsets(latent_dataset, "*.latent.npz", 0, 0.0)
    expected = sum(
        1 for _ in latent_windows(sets, seq_len, max_per_map=cap, seed=3)
    )
    assert count_latent_windows(sets, seq_len, cap) == expected


def test_counts_respect_shard(latent_dataset):
    sets, _ = hold_out_mapsets(latent_dataset, "*.latent.npz", 0, 0.0)
    total = count_latent_windows(sets, 8)
    shards = [count_latent_windows(sets, 8, shard=(2, i)) for i in range(2)]
    assert sum(shards) == total
