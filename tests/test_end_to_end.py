"""End-to-end slice: synthetic dataset -> fit all three stages (briefly) ->
encode latents -> export artifact -> predict a structurally valid .osz.

This exercises every layer of the framework (SURVEY.md §7 step 4). Models
are tiny and runs are a few steps; quality is not asserted — structure is.
"""

import zipfile
from pathlib import Path

import numpy as np
import pytest
import yaml

from osu_dreamer_tpu.audio import SR, get_frame_times, write_spec
from osu_dreamer_tpu.osu import Beatmap
from osu_dreamer_tpu.signal import write_beatmap

SEQ_LEN = 108  # 2 * chunk(9) * 6
N_FRAMES = 16 * SEQ_LEN  # ~10 s per map

TINY_LATENT_CFG = {
    "data": {
        "seq_len": SEQ_LEN,
        "batch_size": 2,
        "max_val_count": 2,
        "max_val_frac": 0.4,
        "max_per_map": 2,
    },
    "fit": {
        "max_epochs": 1,
        "monitor": "eval/score",
        "monitor_mode": "max",
        "log_every": 1,
    },
    "train": {"opt": {"lr": 1e-3}},
    "model": {
        "emb_dim": 4,
        "style_dim": 8,
        "n_downs": 2,
        "stride": 3,
        "h_dim": 16,
        "stack": {"n_layers": 1, "expand": 2, "radius": 1},
        "style_head_dim": 8,
        "style_heads": 2,
    },
}

TINY_DIFFUSION_CFG = {
    "data": {"seq_len": 16, "batch_size": 2, "max_val_count": 2, "max_val_frac": 0.4},
    "fit": {"max_epochs": 1, "monitor": "val/loss", "log_every": 1},
    "train": {"opt": {"lr": 3e-4}, "val_batches": 2},
    "model": {
        "emb_dim": 4,
        "a_dim": 16,
        "style_dim": 8,
        "global_cond_dim": 16,
        "backbone_dim": 16,
        "u_head_dim": 8,
        "backbone": {"depth": 1, "expand": 2, "head_dim": 8, "n_heads": 2, "radius": 1},
    },
}

TINY_STYLE_CFG = {
    "data": {"batch_size": 4, "max_val_count": 2, "max_val_frac": 0.4},
    "fit": {"max_epochs": 1, "monitor": "val/loss", "log_every": 1},
    "train": {"opt": {"lr": 3e-4}},
    "model": {"style_dim": 8, "label_features": 16, "h_dim": 16, "depth": 1, "expand": 2},
}


def synth_osu(seed: int) -> str:
    """a small synthetic but valid beatmap"""
    rng = np.random.default_rng(seed)
    objs = []
    t = 1000
    for i in range(24):
        x, y = rng.integers(64, 448), rng.integers(64, 320)
        combo = 4 if i % 6 == 0 else 0
        kind = rng.integers(0, 3)
        if kind == 0:
            objs.append(f"{x},{y},{t},{1 + combo},0,0:0:0:0:")
            t += int(rng.integers(250, 400))
        elif kind == 1:
            x2 = min(int(x) + 120, 500)
            objs.append(f"{x},{y},{t},{2 + combo},0,L|{x2}:{y},1,100")
            t += int(rng.integers(500, 700))
        else:
            objs.append(f"256,192,{t},{8 + combo},0,{t + 400}")
            t += int(rng.integers(600, 800))
    return (
        "osu file format v14\n\n[General]\nMode: 0\n\n"
        "[Metadata]\nTitle: Synth\nArtist: Test\nCreator: t\nVersion: v\n\n"
        "[Difficulty]\nHPDrainRate: 5\nCircleSize: 4\nOverallDifficulty: 7\n"
        "ApproachRate: 9\nSliderMultiplier: 1.4\nSliderTickRate: 1\n\n"
        "[TimingPoints]\n0,400,4,2,0,60,1,0\n\n"
        "[HitObjects]\n" + "\n".join(objs) + "\n"
    )


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    """synthetic preprocessed dataset: 5 mapsets x 2 maps"""
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    frame_times = get_frame_times(N_FRAMES)
    for mapset_i in range(5):
        mapset = root / f"set{mapset_i:02d}"
        mapset.mkdir()
        spec = rng.random((72, N_FRAMES)).astype(np.float32) * 0.5
        with open(mapset / "spec.npy", "wb") as f:
            write_spec(f, spec)
        for map_i in range(2):
            bm = Beatmap(synth_osu(mapset_i * 10 + map_i))
            with open(mapset / f"{mapset_i}{map_i}.map.npy", "wb") as f:
                write_beatmap(f, bm, frame_times)
    return root


def _write_cfg(tmp_path: Path, name: str, cfg: dict, data_dir: Path, run_dir: Path) -> Path:
    cfg = {**cfg}
    cfg["data"] = {**cfg["data"], "data_dir": str(data_dir)}
    cfg["fit"] = {**cfg["fit"], "run_dir": str(run_dir)}
    path = tmp_path / name
    path.write_text(yaml.safe_dump(cfg))
    return path


@pytest.mark.slow
def test_full_pipeline(dataset_dir, tmp_path):
    from click.testing import CliRunner

    from osu_dreamer_tpu.cli import main as cli_main
    from osu_dreamer_tpu.models.diffusion.fit import run as fit_denoiser
    from osu_dreamer_tpu.models.latent.fit import run as fit_latent
    from osu_dreamer_tpu.models.style.fit import run as fit_style

    runs = tmp_path / "runs"

    # --- stage 1 ---
    cfg = _write_cfg(tmp_path, "latent.yml", TINY_LATENT_CFG, dataset_dir, runs / "latent")
    fit_latent(cfg)
    assert (runs / "latent" / "best").exists()

    # --- encode latents (CLI) ---
    runner = CliRunner()
    res = runner.invoke(
        cli_main,
        [
            "encode-latents",
            "--latent-ckpt-path", str(runs / "latent" / "best"),
            "--data-dir", str(dataset_dir),
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    latents = list(dataset_dir.rglob("*.latent.npz"))
    assert len(latents) == 10
    h_files = list(dataset_dir.rglob("h.npy"))
    assert len(h_files) == 5
    z0 = np.load(latents[0])
    assert z0["z"].shape[1] == 4 and z0["s"].shape == (8,)

    # --- stages 2 + 3 ---
    cfg = _write_cfg(tmp_path, "diff.yml", TINY_DIFFUSION_CFG, dataset_dir, runs / "denoiser")
    fit_denoiser(cfg)
    assert (runs / "denoiser" / "best").exists()

    cfg = _write_cfg(tmp_path, "style.yml", TINY_STYLE_CFG, dataset_dir, runs / "style")
    fit_style(cfg)
    assert (runs / "style" / "best").exists()

    # --- export (CLI) ---
    artifact = tmp_path / "inference.odt"
    res = runner.invoke(
        cli_main,
        [
            "export-inference",
            "--latent-ckpt-path", str(runs / "latent" / "best"),
            "--denoiser-ckpt-path", str(runs / "denoiser" / "best"),
            "--style-ckpt-path", str(runs / "style" / "best"),
            "--output-path", str(artifact),
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert artifact.exists()

    # --- predict (CLI) on a small WAV ---
    wav = tmp_path / "song.wav"
    _write_wav(wav, np.sin(2 * np.pi * 220 * np.arange(SR * 4) / SR).astype(np.float32) * 0.5)

    import os

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        res = runner.invoke(
            cli_main,
            [
                "predict",
                "--model-path", str(artifact),
                "--audio-file", str(wav),
                "--diff", "5", "9", "8", "4", "6",
                "--sample-steps", "2",
                "--title", "Synth", "--artist", "Test",
                "--seed", "0",
                # host-side decode flag (no extra device compile): beat
                # snapping through the real CLI surface
                "--snap-divisor", "4",
            ],
            catch_exceptions=False,
        )
    finally:
        os.chdir(cwd)
    assert res.exit_code == 0, res.output

    # bulk mode: several songs BATCHED through one device program
    # (--batch-songs 2; both ~3-4 s songs share the same length bucket),
    # .osu decoding fanned out over worker processes, one .osz per song
    wav2 = tmp_path / "song2.wav"
    _write_wav(wav2, np.sin(2 * np.pi * 330 * np.arange(SR * 3) / SR).astype(np.float32) * 0.5)
    bulk_dir = tmp_path / "bulk"
    bulk_dir.mkdir()
    os.chdir(bulk_dir)
    try:
        res = runner.invoke(
            cli_main,
            [
                "predict",
                "--model-path", str(artifact),
                "--audio-file", str(wav),
                "--audio-file", str(wav2),
                "--diff", "5", "9", "8", "4", "6",
                "--diff", "3", "7", "6", "3", "5",
                "--sample-steps", "2",
                "--seed", "1",
                "--serialize-workers", "2",
                "--batch-songs", "2",
            ],
            catch_exceptions=False,
        )
    finally:
        os.chdir(cwd)
    assert res.exit_code == 0, res.output
    bulk_sets = sorted(bulk_dir.glob("*.osz"))
    assert len(bulk_sets) == 2
    for ms in bulk_sets:
        with zipfile.ZipFile(ms) as z:
            assert sum(n.endswith(".osu") for n in z.namelist()) == 2

    mapsets = list(tmp_path.glob("*.osz"))
    assert len(mapsets) == 1
    with zipfile.ZipFile(mapsets[0]) as z:
        names = z.namelist()
        osu_names = [n for n in names if n.endswith(".osu")]
        assert "song.wav" in names and len(osu_names) == 1
        text = z.read(osu_names[0]).decode()

    # structural validity of the serialized map
    for section in ("[General]", "[Metadata]", "[Difficulty]", "[TimingPoints]", "[HitObjects]"):
        assert section in text
    assert "AudioFilename: song.wav" in text
    assert "Title: Synth" in text

    # with UNTRAINED weights the decoded hits can overlap (e.g. a hold
    # spanning the next onset), which the strict parser rejects — the
    # reference serializer has the same property. A trained model yields
    # parseable maps (see TestFullRoundTrip in test_signal_codec.py, which
    # round-trips real signals through decode_beatmap -> Beatmap).
    from osu_dreamer_tpu.osu import BeatmapParseError

    try:
        bm = Beatmap(text)
        assert bm.title == "Synth"
    except BeatmapParseError:
        pass


def _write_wav(path, data: np.ndarray):
    from osu_dreamer_tpu.data.synth import write_wav

    write_wav(Path(path), data)


@pytest.mark.slow
def test_init_length_invariance():
    """LDM param shapes do not depend on the spec length: bench.py and the
    CLI initialize on a tiny spec and apply to full songs (the 2-min-spec
    jitted init measured 43-80 s of pure compile on the bench backend)."""
    import jax
    import jax.numpy as jnp

    from osu_dreamer_tpu.audio import A_DIM
    from osu_dreamer_tpu.models.inference import LDM, LDMArgs

    args = LDMArgs()
    model = LDM(args)
    chunk = args.latent.chunk_size
    labels = jnp.zeros((1, 5), jnp.float32)
    key = jax.random.PRNGKey(0)

    shapes = []
    for n_chunks in (8, 40):
        spec = jnp.zeros((1, chunk * n_chunks, A_DIM), jnp.float32)
        tree = jax.eval_shape(lambda k: model.init(k, spec, labels, k, 1, 1), key)
        shapes.append(jax.tree.map(lambda a: (a.shape, str(a.dtype)), tree))
    assert shapes[0] == shapes[1]
