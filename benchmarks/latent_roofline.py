"""Per-kernel roofline for the latent train step (VERDICT r3 item 5).

The latent step's wall-clock is dominated by the fused FiLM layer kernel
(ops/film_layer.py) running at the four sequence lengths of the stride-3
U-Net. For each (L, invocations-per-step) shape this script measures the
kernel's forward and forward+backward wall-clock on the real chip and
compares it against the two analytic floors:

  flop floor  = matmul+elementwise FLOPs / bf16 peak (197 TFLOP/s on v5e)
  byte floor  = HBM traffic (activations + per-program weight streams) /
                HBM bandwidth (819 GB/s on v5e)

Summing max(floors) x invocations gives the step's kernel-bound floor; the
gap between that and the measured 61-64 ms step answers whether 0.199 MFU
is structural (the narrow C=128 model meeting a 128x128 MXU) or headroom.

Usage: python benchmarks/latent_roofline.py [--write]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from osu_dreamer_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/jax_cache_bench")

import numpy as np

# v5e peaks
BF16_PEAK = 197e12
HBM_BW = 819e9
# VPU elementwise ceiling (fp32 ops/s): 8 sublanes x 128 lanes x ~2 flops
# x ~940 MHz per core — optimistic; the norm/FiLM/gate chain runs here
VPU_PEAK = 3.8e12

# latent reference config: h_dim 128, expand 4 -> H = 341, radius 2 -> K 5
B, C, EXPAND, K = 32, 128, 4, 5
H = int(C * EXPAND * 2 / 3)

# (L, film-layer invocations per train step): 8-layer stacks — encoders
# chart+audio at L=2052/684/228, decoder at 228/684/2052, style+temporal at 76
SHAPES = [(2052, 24), (684, 24), (228, 24), (76, 16)]


def analytic_floors(L: int, tile: int) -> tuple[float, float, float, float]:
    """-> (fwd_flops, fwd_bytes, bwd_flops, bwd_bytes)"""
    rows = B * L
    mm_flops = 2 * rows * (C * 2 * H + H * C)        # vg + out matmuls
    dw_flops = 2 * rows * C * K
    elem = rows * (12 * C + 8 * H)                   # norms/film/gate/silu
    fwd_flops = mm_flops + dw_flops + elem

    programs = B * -(-L // tile)
    weights = 2 * (K * C + 7 * C + C * 2 * H + 2 * H + H * C)
    fwd_bytes = 2 * rows * C * 2 + programs * weights  # x in + out + weights

    # backward: dgrads through both matmuls (2x fwd matmul flops) + dW
    # accumulations (another 2x), saved-residual reads
    bwd_flops = 4 * mm_flops + 2 * dw_flops + 2 * elem
    bwd_bytes = 5 * rows * C * 2 + 2 * programs * weights
    return fwd_flops, fwd_bytes, bwd_flops, bwd_bytes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--write", action="store_true",
                    help="write benchmarks/latent_roofline.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from osu_dreamer_tpu.ops.film_layer import DEFAULT_TILE, fused_film_layer

    print(f"devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)

    def timed(fn, *xs, iters):
        out = fn(*xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    rows = []
    total_fwd_floor = total_fwd_meas = 0.0
    total_bwd_floor = total_bwd_meas = 0.0
    total_serial_floor = 0.0
    for L, count in SHAPES:
        ks = jax.random.split(key, 12)
        x = jax.random.normal(ks[0], (B, L, C), jnp.bfloat16)
        scale = jax.random.normal(ks[1], (B, C), jnp.bfloat16) * 0.1
        shift = jax.random.normal(ks[2], (B, C), jnp.bfloat16) * 0.1
        gate = jax.random.normal(ks[3], (B, C), jnp.bfloat16) * 0.1
        g1 = jnp.ones((C,), jnp.float32)
        g2 = jnp.full((C,), 1e-3, jnp.float32)
        dww = jax.random.normal(ks[4], (K, C), jnp.float32) * 0.05
        dwb = jnp.zeros((C,), jnp.float32)
        wvg = jax.random.normal(ks[5], (C, 2 * H), jnp.float32) * 0.05
        bvg = jnp.zeros((2 * H,), jnp.float32)
        wout = jax.random.normal(ks[6], (H, C), jnp.float32) * 0.05
        bout = jnp.zeros((C,), jnp.float32)
        weights = (dww, dwb, wvg, bvg, wout, bout)

        # differential timing: chain N dependent applications (lax.scan —
        # the carry is the layer input, weights are hoisted loop
        # invariants) inside ONE jitted program and take the slope between
        # two chain lengths — (t(N2) - t(N1)) / (N2 - N1) cancels EVERY
        # fixed cost (the ~1.5 ms tunneled-relay dispatch, donation copies,
        # pad/cast prologues). A fixed-UNROLL chain divided by UNROLL does
        # NOT: at L<=228 the whole chain's compute sits below the dispatch
        # cost and the loop measures the link (the r4 first-cut numbers'
        # failure mode: fwd_us ~flat at ~180 us across a 9x L change).
        # N2 is sized per shape so the EXTRA compute between the two chain
        # lengths is >= ~4 ms — several dispatch floors of signal.
        ff0, _, _, _ = analytic_floors(L, DEFAULT_TILE)
        est_layer = ff0 / BF16_PEAK
        N1 = 8
        N2 = N1 + min(320, max(16, int(4e-3 / max(est_layer, 2e-5))))

        def chain(n):
            def f(x, s, sh, g):
                def body(c, _):
                    return fused_film_layer(c, s, sh, g, g1, g2, *weights), None
                return jax.lax.scan(body, x, None, length=n)[0]
            return f

        def slope(make, n1, n2):
            t1 = timed(jax.jit(make(n1)), x, scale, shift, gate, iters=args.iters)
            t2 = timed(jax.jit(make(n2)), x, scale, shift, gate, iters=args.iters)
            return max((t2 - t1) / (n2 - n1), 1e-9)

        t_fwd = slope(chain, N1, N2)

        def grad_chain(n):
            g_fn = jax.grad(
                lambda x, s, sh, g: chain(n)(x, s, sh, g).astype(jnp.float32).sum(),
                argnums=(0, 1, 2, 3),
            )
            return g_fn

        t_full = slope(grad_chain, N1, N2)
        t_bwd = max(t_full - t_fwd, 1e-9)

        ff, fb, bf_, bb = analytic_floors(L, DEFAULT_TILE)
        # the VPU floor prices the elementwise chain (fp32 norm stats, FiLM,
        # gate/silu — ~30 ops/element through the fused layer) at VPU rate
        vpu_ops = B * L * (14 * C + 16 * H)
        fwd_floor = max(ff / BF16_PEAK, fb / HBM_BW, vpu_ops / VPU_PEAK)
        bwd_floor = max(bf_ / BF16_PEAK, bb / HBM_BW, 2 * vpu_ops / VPU_PEAK)
        # the max() floor assumes perfect VPU/MXU/DMA overlap — but within a
        # tile the layer's chain is DATA-DEPENDENT (norm -> vg matmul ->
        # silu/gate -> norm -> out matmul -> norm), so VPU and MXU phases
        # serialize; at C=128 the VPU chain costs about as much as the
        # matmuls and the honest attainable bound is closer to their SUM
        fwd_serial = ff / BF16_PEAK + vpu_ops / VPU_PEAK
        bwd_serial = bf_ / BF16_PEAK + 2 * vpu_ops / VPU_PEAK
        rows.append({
            "L": L, "count": count,
            "fwd_us": round(t_fwd * 1e6, 1),
            "fwd_floor_us": round(fwd_floor * 1e6, 1),
            "fwd_vs_floor": round(t_fwd / fwd_floor, 2),
            "fwd_serial_floor_us": round(fwd_serial * 1e6, 1),
            "fwd_vs_serial": round(t_fwd / fwd_serial, 2),
            "fwd_gflops": round(ff / t_fwd / 1e9, 0),
            "fwd_gbs": round(fb / t_fwd / 1e9, 0),
            "bwd_us": round(t_bwd * 1e6, 1),
            "bwd_floor_us": round(bwd_floor * 1e6, 1),
            "bwd_vs_floor": round(t_bwd / bwd_floor, 2),
            "bwd_serial_floor_us": round(bwd_serial * 1e6, 1),
            "bwd_vs_serial": round(t_bwd / bwd_serial, 2),
        })
        total_fwd_floor += fwd_floor * count
        total_fwd_meas += t_fwd * count
        total_bwd_floor += bwd_floor * count
        total_bwd_meas += t_bwd * count
        total_serial_floor += (fwd_serial + bwd_serial) * count
        print(rows[-1], file=sys.stderr)

    summary = {
        "config": {"B": B, "C": C, "H": H, "K": K, "peaks": {
            "bf16_tflops": BF16_PEAK / 1e12, "hbm_gbs": HBM_BW / 1e9}},
        "per_shape": rows,
        "step_film_floor_ms": round((total_fwd_floor + total_bwd_floor) * 1e3, 2),
        "step_film_serial_floor_ms": round(total_serial_floor * 1e3, 2),
        "step_film_measured_ms": round((total_fwd_meas + total_bwd_meas) * 1e3, 2),
        "note": (
            "floor = per-kernel max(flop, byte, vpu) floor x invocations/"
            "step — an overlap-perfect bound; serial_floor = flop + vpu "
            "SUMMED (the layer's chain is data-dependent, so VPU and MXU "
            "phases cannot overlap within a tile) — the attainable bound "
            "for this kernel structure. measured = slope-timed kernel wall "
            "x invocations. Compare with the measured full latent step "
            "(trainstep_result.json) — the difference outside the film "
            "kernels is stems/heads/optimizer."
        ),
    }
    print(json.dumps(summary))
    if args.write:
        out = Path(__file__).parent / "latent_roofline.json"
        out.write_text(json.dumps(summary, indent=1))
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
