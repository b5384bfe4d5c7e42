"""Measure the PyTorch reference's end-to-end sampling throughput on CPU.

VERDICT r1 item 2: the round-1 bench divided by a *guessed* reference
throughput. This script produces a measured one: it imports the reference
(/root/reference, CPU torch, native deps stubbed — the same black-box-oracle
approach as tests/test_model_parity.py), builds the full-size LDM from the
reference's own model.yml configs (latent/model.yml:80-93,
diffusion/model.yml:76-91, style/model.yml:66-73), and times
``LDM.sample`` (reference scripts/predict.py:72-77 driving
inference/model.py:34) on a 2-minute song at 32 diffusion steps — the
BASELINE.json headline config. Weights are random (throughput is
architecture-bound, matching bench.py's methodology); the spectrogram is
random too (the resonator featurizer is Rust and cannot run here; its cost
is excluded from the reference number, which *flatters* the reference —
our number includes featurization).

It then runs OUR pipeline on the same host CPU via a subprocess (JAX CPU
backend) for an apples-to-apples CPU-vs-CPU ratio, and writes
benchmarks/reference_baseline.json, which bench.py consumes for its
``vs_baseline`` field.

Run me on the bench host:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/reference_baseline.py
"""

from __future__ import annotations

import json
import os
import platform
import subprocess
import sys
import time
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
REFERENCE = Path("/root/reference")
OUT_PATH = REPO / "benchmarks" / "reference_baseline.json"

SONG_SECONDS = 120
NUM_STEPS = 32
N_RUNS = 3

# reference audio constants (load_audio.py:11-19) — hard constants of the
# data format, needed before any import
A_DIM = 72
SR = 16384
HOP_LEN = 98


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def import_reference():
    """import the reference model modules with native deps stubbed (the
    identical stub set as tests/test_model_parity.py)"""
    rosu = types.ModuleType("rosu_pp_py")
    rosu.Beatmap = object
    rosu.Performance = object
    stubs = {"rosu_pp_py": rosu}
    for name in ("torchcodec", "torchcodec.decoders", "resonators"):
        stubs[name] = types.ModuleType(name)
    pl = types.ModuleType("pytorch_lightning")
    pl.LightningDataModule = type("LightningDataModule", (), {})
    pl.LightningModule = type("LightningModule", (), {})
    stubs["pytorch_lightning"] = pl
    ad = types.ModuleType("torchcodec.decoders._audio_decoder")
    ad.AudioDecoder = object
    stubs["torchcodec.decoders._audio_decoder"] = ad
    stubs["torchcodec.decoders"].AudioDecoder = object
    stubs["torchcodec.decoders"].__path__ = []
    stubs["resonators"].ResonatorBank = object
    for n, m in stubs.items():
        sys.modules.setdefault(n, m)
    sys.path.insert(0, str(REFERENCE))

    from osu_dreamer.models.diffusion.backbone import BackboneArgs
    from osu_dreamer.models.diffusion.model import DiffusionModelArgs
    from osu_dreamer.models.inference.model import LDM, LDMArgs
    from osu_dreamer.models.latent.model import LatentModelArgs
    from osu_dreamer.models.latent.unet import LayerArgs
    from osu_dreamer.models.style.model import StyleModelArgs

    # full-size configuration, transcribed from the reference model.yml files
    args = LDMArgs(
        emb_dim=6,
        style_dim=32,
        n_downs=3,
        stride=3,
        latent_args=LatentModelArgs(
            h_dim=128,
            ae_args=LayerArgs(n_layers=8, expand=4, radius=2),
            style_head_dim=64,
            style_heads=16,
        ),
        style_args=StyleModelArgs(label_features=128, h_dim=256, depth=8, expand=4),
        diffusion_args=DiffusionModelArgs(
            global_cond_dim=512,
            backbone_dim=512,
            backbone_args=BackboneArgs(
                depth=8, expand=4, head_dim=64, n_heads=16, radius=2
            ),
            u_head_dim=64,
        ),
    )
    return LDM(args)


def measure_reference() -> dict:
    import torch

    torch.manual_seed(0)
    model = import_reference().eval()
    n_params = sum(p.numel() for p in model.parameters())
    log(f"reference LDM built: {n_params / 1e6:.1f}M params, "
        f"{torch.get_num_threads()} torch threads")

    n_frames = int(np.ceil(SONG_SECONDS * SR / HOP_LEN))  # matches bench.py
    audio = torch.rand(A_DIM, n_frames)
    labels = torch.tensor([[5.0, 9.0, 8.0, 4.0, 6.0]])

    with torch.no_grad():
        t0 = time.time()
        chart, out_labels = model.sample(audio, labels, num_steps=NUM_STEPS)
        warmup = time.time() - t0
        log(f"reference warmup run: {warmup:.1f}s, chart {tuple(chart.shape)}")
        times = []
        for i in range(N_RUNS):
            t0 = time.time()
            model.sample(audio, labels, num_steps=NUM_STEPS)
            times.append(time.time() - t0)
    per_map = float(np.median(times))
    log(f"reference per-map: {[round(t, 2) for t in times]} -> median {per_map:.2f}s")
    return {
        "per_map_s": per_map,
        "maps_per_min": 60.0 / per_map,
        "runs_s": times,
        "n_params": n_params,
        "torch_threads": torch.get_num_threads(),
        "torch_version": torch.__version__,
    }


OURS_CHILD = r"""
import sys, time, json
import numpy as np
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp
from functools import partial
from osu_dreamer_tpu.audio import SR, prep_wave_for_model, spec_for_model_jax
from osu_dreamer_tpu.models.inference import LDM, LDMArgs

assert jax.default_backend() == "cpu", jax.default_backend()
rng = np.random.default_rng(0)
t = np.arange(%(seconds)d * SR) / SR
wave = (0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.normal(size=t.shape)).astype(np.float32)
args = LDMArgs()
# fp32 on CPU (matches load_inference's backend-aware dtype: XLA:CPU
# emulates bf16 matmuls ~1.4x slower)
model = LDM(args, dtype=jnp.float32)
chunk = args.latent.chunk_size
buf, real_frames, n_frames, out_frames = prep_wave_for_model(wave, chunk)
labels = jnp.asarray([[5.0, 9.0, 8.0, 4.0, 6.0]], jnp.float32)
key = jax.random.PRNGKey(0)

@partial(jax.jit, static_argnames=("n_frames", "out_frames"))
def sample_wave(p, wave_i16, rf, n_frames, out_frames, lb, k):
    sp = spec_for_model_jax(wave_i16, rf, n_frames, out_frames)
    return model.apply(p, sp, lb, k, %(steps)d)

spec_shape = (1, out_frames, 72)
params = jax.jit(lambda k: model.init(k, jnp.zeros(spec_shape), labels, k, 1, 1))(key)
wave_dev = jnp.asarray(buf)
out = sample_wave(params, wave_dev, real_frames, n_frames, out_frames, labels, key)
jax.block_until_ready(out)
times = []
for i in range(%(runs)d):
    t0 = time.time()
    out = sample_wave(params, wave_dev, real_frames, n_frames, out_frames, labels,
                      jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out)
    times.append(time.time() - t0)

# featurizer-EXCLUDED variant: precompute the spec once and time only the
# 3-stage sampler — the exact analog of the reference measurement, which
# feeds model.sample a precomputed random spec (its Rust featurizer cannot
# run here)
spec = jax.jit(
    lambda w, rf: spec_for_model_jax(w, rf, n_frames, out_frames)
)(wave_dev, real_frames)
jax.block_until_ready(spec)

@jax.jit
def sample_spec(p, sp, lb, k):
    return model.apply(p, sp, lb, k, %(steps)d)

out = sample_spec(params, spec, labels, key)
jax.block_until_ready(out)
times_model = []
for i in range(%(runs)d):
    t0 = time.time()
    out = sample_spec(params, spec, labels, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out)
    times_model.append(time.time() - t0)
print(json.dumps({
    "runs_s": times, "per_map_s": float(np.median(times)),
    "model_only_runs_s": times_model,
    "model_only_per_map_s": float(np.median(times_model)),
}))
"""


def measure_ours_cpu() -> dict:
    """our pipeline (featurizer INCLUDED) on the same host CPU, in a child
    process so the JAX CPU backend is clean of the TPU plugin"""
    env = {k: v for k, v in os.environ.items() if "AXON" not in k.upper()}
    env.pop("PJRT_LIBRARY_PATH", None)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_baseline",
    )
    code = OURS_CHILD % {
        "repo": str(REPO),
        "seconds": SONG_SECONDS,
        "steps": NUM_STEPS,
        "runs": N_RUNS,
    }
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=3600,
    )
    if proc.returncode != 0:
        log(proc.stderr[-2000:])
        raise RuntimeError("our-CPU measurement failed")
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    out["maps_per_min"] = 60.0 / out["per_map_s"]
    out["model_only_maps_per_min"] = 60.0 / out["model_only_per_map_s"]
    log(f"ours (CPU) per-map: {[round(t, 2) for t in out['runs_s']]} "
        f"-> median {out['per_map_s']:.2f}s; model-only "
        f"{out['model_only_per_map_s']:.2f}s")
    return out


def main() -> None:
    ref = measure_reference()
    ours = measure_ours_cpu()
    result = {
        "methodology": (
            "Reference torch LDM (full model.yml config, random weights, "
            f"random {A_DIM}-bin spec, featurizer excluded) vs our JAX "
            "pipeline (random weights), both on this host's CPU: "
            f"{SONG_SECONDS}s song, {NUM_STEPS} diffusion steps, median of "
            f"{N_RUNS} steady-state runs. ours_cpu carries two variants: "
            "featurizer INCLUDED (whole pipeline) and model_only "
            "(precomputed spec, the exact analog of the reference "
            "measurement). cpu_vs_cpu_model_only is the apples-to-apples "
            "ratio; cpu_vs_cpu keeps our featurizer in the numerator. The "
            "reference cannot run on TPU (CUDA/torch); bench.py reports "
            "TPU-vs-CPU against reference_cpu."
        ),
        "config": {
            "song_seconds": SONG_SECONDS,
            "num_steps": NUM_STEPS,
            "host": platform.processor() or platform.machine(),
            "cpu_count": os.cpu_count(),
        },
        "reference_cpu": ref,
        "ours_cpu": ours,
        "cpu_vs_cpu": round(ours["maps_per_min"] / ref["maps_per_min"], 2),
        "cpu_vs_cpu_model_only": round(
            ours["model_only_maps_per_min"] / ref["maps_per_min"], 2
        ),
    }
    OUT_PATH.write_text(json.dumps(result, indent=2) + "\n")
    log(f"wrote {OUT_PATH}")
    log(f"reference CPU: {ref['maps_per_min']:.2f} maps/min; "
        f"ours CPU: {ours['maps_per_min']:.2f} maps/min "
        f"({result['cpu_vs_cpu']}x CPU-vs-CPU)")


if __name__ == "__main__":
    main()
