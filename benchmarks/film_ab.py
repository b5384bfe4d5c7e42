"""Slope-timed A/B: fused film-layer kernel vs pure-XLA reference.

The r2 claim that motivated ops/film_layer.py — "XLA runs this chain at
~1.75 ms/layer fwd+bwd at (B=64, L~1026)" — predates slope timing, the
same measurement flaw that produced the half-layer probe's wrong first
conclusion (ROADMAP negative results). This probe re-settles it honestly:
for each latent U-Net shape, chain N dependent layer applications in one
jitted lax.scan and take the slope between two chain lengths, for BOTH
implementations, fwd and fwd+bwd.

Usage: python benchmarks/film_ab.py [--write]
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

from benchmarks.latent_roofline import B, BF16_PEAK, C, H, K, SHAPES, analytic_floors


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--write", action="store_true",
                    help="write benchmarks/film_ab.json")
    ap.add_argument("--shapes", default=None,
                    help="comma-separated L values to probe instead of the "
                         "latent U-Net shapes (crossover hunting)")
    args = ap.parse_args()
    shapes = SHAPES
    if args.shapes:
        shapes = [(int(tok), 1) for tok in args.shapes.split(",")]

    import jax
    import jax.numpy as jnp

    from osu_dreamer_tpu.ops.film_layer import (
        DEFAULT_TILE,
        film_layer_reference,
        fused_film_layer,
    )

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
    totals = {"kernel": 0.0, "xla": 0.0}
    for L, count in shapes:
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

        ff0, _, _, _ = analytic_floors(L, DEFAULT_TILE)
        est_layer = ff0 / BF16_PEAK
        N1 = 8
        N2 = N1 + min(320, max(16, int(4e-3 / max(est_layer, 2e-5))))

        def chain(layer, n):
            def f(x, s, sh, g):
                # jax.checkpoint on the scan body memory-equalizes the A/B:
                # the Pallas kernel's flash-style backward recomputes its
                # forward from the inputs (no residuals beyond x), while the
                # plain XLA chain would save ~0.5 GB of (B, L, 2H) residuals
                # PER LAYER at L=2052 — an N-layer timing chain OOMs HBM
                # outright. Remat gives XLA the same recompute policy the
                # kernel uses (and is what a production XLA-only config
                # would require at these widths anyway).
                @jax.checkpoint
                def body(c, _):
                    return layer(c, s, sh, g, g1, g2, *weights), None
                return jax.lax.scan(body, x, None, length=n)[0]
            return f

        def slope(make, n1, n2):
            t1 = timed(jax.jit(make(n1)), x, scale, shift, gate, iters=args.iters)
            t2 = timed(jax.jit(make(n2)), x, scale, shift, gate, iters=args.iters)
            return max((t2 - t1) / (n2 - n1), 1e-9)

        def grad_chain(layer, n):
            return jax.grad(
                lambda x, s, sh, g: chain(layer, n)(x, s, sh, g)
                .astype(jnp.float32).sum(),
                argnums=(0, 1, 2, 3),
            )

        row = {"L": L, "count": count}
        for name, layer in (("kernel", fused_film_layer),
                            ("xla", film_layer_reference)):
            t_fwd = slope(lambda n: chain(layer, n), N1, N2)
            t_full = slope(lambda n: grad_chain(layer, n), N1, N2)
            row[f"{name}_fwd_us"] = round(t_fwd * 1e6, 1)
            row[f"{name}_full_us"] = round(t_full * 1e6, 1)
            totals[name] += t_full * count
        row["xla_over_kernel_full"] = round(
            row["xla_full_us"] / row["kernel_full_us"], 2)
        rows.append(row)
        print(row, file=sys.stderr)

    summary = {
        "config": {"B": B, "C": C, "H": H, "K": K},
        "per_shape": rows,
        "step_film_full_ms": {k: round(v * 1e3, 2) for k, v in totals.items()},
        "note": (
            "slope-timed (two lax.scan chain lengths, difference quotient) "
            "fwd and fwd+bwd per layer for the Pallas kernel vs the exact "
            "jnp reference chain XLA fuses itself. full = grad of the "
            "chained layer wrt x and film vectors; both variants run the "
            "scan body under jax.checkpoint (memory-equalized recompute "
            "backward — the unrematted XLA chain OOMs HBM at L=2052)."
        ),
    }
    print(json.dumps(summary))
    if args.write:
        out = Path(__file__).parent / "film_ab.json"
        out.write_text(json.dumps(summary, indent=1))
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
