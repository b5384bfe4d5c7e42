"""Profile the single-song predict program (the bench.py headline config):
where do the ~134 ms of a serial 2-minute-song generation go?

Writes a jax.profiler trace around 3 steady-state runs and prints the
per-run device-op composition via profile_summary-style grouping, plus
wall-clock vs device-total (the difference = host-link/dispatch overhead).

Usage: python benchmarks/predict_profile.py [--steps 32] [--trace-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# benchmarks dir itself, so `import profile_summary` resolves no matter who
# imports this module (not just `python benchmarks/predict_profile.py`)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# enable the persistent compile cache even when a sitecustomize already
# imported jax (env vars alone are snapshotted too early there)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) 
                if "benchmarks" in os.path.dirname(os.path.abspath(__file__))
                else os.path.dirname(os.path.abspath(__file__)))
from osu_dreamer_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/jax_cache_bench")

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--trace-dir", default="/tmp/predict_trace")
    ap.add_argument("--runs", type=int, default=3)
    args_cli = ap.parse_args()

    from functools import partial

    import jax
    import jax.numpy as jnp

    from osu_dreamer_tpu.audio import SR, prep_wave_for_model, spec_for_model_jax
    from osu_dreamer_tpu.models.inference import LDM, LDMArgs

    print(f"devices: {jax.devices()}", file=sys.stderr)

    rng = np.random.default_rng(0)
    t = np.arange(120 * SR) / SR
    wave = (0.4 * np.sin(2 * np.pi * 220 * t)
            + 0.05 * rng.normal(size=t.shape)).astype(np.float32)

    args = LDMArgs()
    model = LDM(args)
    chunk = args.latent.chunk_size
    buf, real_frames, n_frames, out_frames = prep_wave_for_model(wave, chunk)
    labels = jnp.asarray([[5.0, 9.0, 8.0, 4.0, 6.0]], jnp.float32)
    key = jax.random.PRNGKey(0)

    spec = spec_for_model_jax(jnp.asarray(buf), real_frames, n_frames, out_frames)
    params = jax.jit(lambda k: model.init(k, spec, labels, k, 1, 1))(key)
    jax.block_until_ready(params)

    @partial(jax.jit, static_argnames=("n_frames", "out_frames"))
    def sample_wave(p, wave_i16, real_frames, n_frames, out_frames, lb, k):
        sp = spec_for_model_jax(wave_i16, real_frames, n_frames, out_frames)
        return model.apply(p, sp, lb, k, args_cli.steps)

    def run(k):
        chart, _ = sample_wave(params, jnp.asarray(buf), real_frames,
                               n_frames, out_frames, labels, k)
        float(chart[0, 0, 0])

    run(key)  # compile
    for i in range(2):
        run(jax.random.PRNGKey(10 + i))

    times = []
    jax.profiler.start_trace(args_cli.trace_dir)
    for i in range(args_cli.runs):
        t0 = time.time()
        run(jax.random.PRNGKey(100 + i))
        times.append(time.time() - t0)
    jax.profiler.stop_trace()
    wall = float(np.median(times))
    print(f"wall per run: {[round(x*1e3,1) for x in times]} ms "
          f"-> median {wall*1e3:.1f} ms", file=sys.stderr)

    # summarize the trace with the existing helper
    import profile_summary
    profile_summary.main([args_cli.trace_dir,
                          "--steps", str(args_cli.runs), "--top", "45"])


if __name__ == "__main__":
    main()
