"""Half-layer megakernel probe (VERDICT r3 item 6, measured answer).

The open question from rounds 2-3: would fusing norm + FiLM + qkv-projection
into the attention kernel's prologue push the denoiser step past MFU 0.37?
The full megakernel's matmuls would run on M=152-row tiles instead of XLA's
full-batch 19456-row matmuls (measured at 75-90% MXU). This probe measures
exactly that trade in isolation:

  XLA baseline:  y = rms_norm(x) * (1+scale) + shift;  qkv = y @ Wqkv + b
                 (one fused elementwise chain + one large matmul)
  Pallas fused:  the same computation in ONE kernel, gridded (B, L-tiles),
                 qkv matmul on per-program row tiles

If the fused prologue is not faster than XLA here, the full megakernel
cannot win either: the attention core is already a fused kernel, so the
prologue is the only part whose HBM round trips fusion could save — and the
probe prices what in-kernel small-M matmuls give back in MXU efficiency.

Usage: python benchmarks/half_layer_probe.py [--write]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from osu_dreamer_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/jax_cache_bench")

import numpy as np

# denoiser reference shapes: batch 128 x seq 152, backbone 512, 16x64 heads
B, L, C = 128, 152, 512
QKV = 3 * 16 * 64


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, L, C), jnp.bfloat16)
    scale = jax.random.normal(ks[1], (B, C), jnp.bfloat16) * 0.1
    shift = jax.random.normal(ks[2], (B, C), jnp.bfloat16) * 0.1
    w = (jax.random.normal(ks[3], (C, QKV), jnp.float32) * 0.05).astype(jnp.bfloat16)
    b = jnp.zeros((QKV,), jnp.bfloat16)

    def xla_prologue(x, scale, shift, w, b):
        xf = x.astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
        y = ((xf * inv).astype(x.dtype) * (1 + scale[:, None, :]) + shift[:, None, :])
        return y @ w + b

    def _kernel(x_ref, scale_ref, shift_ref, w_ref, b_ref, o_ref):
        # all operands kept rank-2 (Mosaic dislikes rank-1 vectors)
        xf = x_ref[0].astype(jnp.float32)  # (L, C)
        inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
        y = ((xf * inv).astype(jnp.bfloat16)
             * (1 + scale_ref[0]) + shift_ref[0])  # (L,C) * (1,C)
        o_ref[0] = (
            jnp.dot(y, w_ref[...], preferred_element_type=jnp.float32)
            + b_ref[...].astype(jnp.float32)
        ).astype(jnp.bfloat16)

    fused = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # film vectors as (B, 1, C): a (1, C) block on a (B, C) array
            # violates Mosaic's trailing-dim tiling (second-minor 1 != 8)
            pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, QKV), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QKV), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, QKV), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, QKV), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * C * QKV,
            bytes_accessed=2 * B * L * (C + QKV),
            transcendentals=B * L,
        ),
    )

    def timed(fn, *xs, iters):
        out = fn(*xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    # differential timing: chain N dependent applications (the output feeds
    # the next x via a cheap slice) inside one jit and take the slope between
    # two chain lengths — cancels the ~1.5 ms tunneled-relay dispatch floor
    # that a single-kernel timed loop at ~1 ms compute would otherwise
    # measure (see benchmarks/latent_roofline.py)
    N1, N2 = 4, 16

    def chain(step, n):
        def f(x, s, sh, w, b):
            for _ in range(n):
                out = step(x, s, sh, w, b)          # (B, L, QKV)
                x = out[..., :C] + x                 # dependency, trivial cost
            return x
        return jax.jit(f)

    def slope(step):
        t1 = timed(chain(step, N1), x, scale, shift, w, b, iters=args.iters)
        t2 = timed(chain(step, N2), x, scale, shift, w, b, iters=args.iters)
        return max((t2 - t1) / (N2 - N1), 1e-9)

    jit_xla = jax.jit(xla_prologue)
    fused_step = lambda x, s, sh, w, b: fused(x, s[:, None], sh[:, None], w, b[None])  # noqa: E731
    jit_fused = jax.jit(fused_step)

    # correctness first
    ref = np.asarray(jit_xla(x, scale, shift, w, b), np.float32)
    got = np.asarray(jit_fused(x, scale, shift, w, b), np.float32)
    err = float(np.max(np.abs(ref - got)) / max(np.max(np.abs(ref)), 1e-6))
    assert err < 5e-2, f"fused prologue diverges: rel err {err}"

    t_xla = slope(xla_prologue)
    t_fused = slope(fused_step)

    flops = 2 * B * L * C * QKV
    result = {
        "shape": {"B": B, "L": L, "C": C, "qkv": QKV},
        "xla_us": round(t_xla * 1e6, 1),
        "fused_us": round(t_fused * 1e6, 1),
        "speedup": round(t_xla / t_fused, 3),
        "xla_mxu": round(flops / t_xla / 197e12, 3),
        "fused_mxu": round(flops / t_fused / 197e12, 3),
        "max_rel_err": err,
        "verdict": None,
    }
    result["verdict"] = (
        "fused prologue WINS: fold it into the attention kernel"
        if t_fused < t_xla * 0.95 else
        "fused prologue does NOT beat XLA at these shapes: the half-layer "
        "megakernel cannot reach the projected win (its in-kernel small-M "
        "matmuls run below XLA's full-batch MXU efficiency)"
    )
    print(json.dumps(result))
    if args.write:
        out = Path(__file__).parent / "half_layer_probe.json"
        out.write_text(json.dumps(result, indent=1))
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
