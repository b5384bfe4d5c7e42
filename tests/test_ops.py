"""Pallas kernels, validated against the jnp reference in interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osu_dreamer_tpu.ops import fused_swiglu, swiglu_reference

KEY = jax.random.PRNGKey(0)


def make_params(C=16, H=20, K=5, dtype=jnp.float32):
    ks = jax.random.split(KEY, 6)
    return dict(
        dw_kernel=jax.random.normal(ks[0], (K, C), dtype) * 0.3,
        dw_bias=jax.random.normal(ks[1], (C,), dtype) * 0.1,
        vg_kernel=jax.random.normal(ks[2], (C, 2 * H), dtype) * 0.2,
        vg_bias=jax.random.normal(ks[3], (2 * H,), dtype) * 0.1,
        out_kernel=jax.random.normal(ks[4], (H, C), dtype) * 0.2,
        out_bias=jax.random.normal(ks[5], (C,), dtype) * 0.1,
    )


class TestFusedSwiGLU:
    def test_matches_reference(self):
        p = make_params()
        x = jax.random.normal(KEY, (2, 40, 16))
        ref = swiglu_reference(x, *p.values())
        got = fused_swiglu(x, *p.values(), 16, True)  # tile 16, interpret
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_ragged_length(self):
        """L not a multiple of the tile: zero-pad + crop must be transparent"""
        p = make_params()
        x = jax.random.normal(KEY, (1, 37, 16))
        ref = swiglu_reference(x, *p.values())
        got = fused_swiglu(x, *p.values(), 16, True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_single_tile(self):
        p = make_params()
        x = jax.random.normal(KEY, (1, 12, 16))
        ref = swiglu_reference(x, *p.values())
        got = fused_swiglu(x, *p.values(), 64, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_gradients_match_reference(self):
        p = make_params()
        x = jax.random.normal(KEY, (1, 24, 16))

        def loss_fused(x, *params):
            return jnp.sum(fused_swiglu(x, *params, 16, True) ** 2)

        def loss_ref(x, *params):
            return jnp.sum(swiglu_reference(x, *params) ** 2)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 3, 5))(x, *p.values())
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 3, 5))(x, *p.values())
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestSwiGLUModuleDispatch:
    def test_fused_flag_paths_agree(self):
        from osu_dreamer_tpu.nn import SwiGLU

        x = jax.random.normal(KEY, (2, 20, 16))
        ref_mod = SwiGLU(16, expand=2, radius=2, dtype=jnp.float32, fused=False)
        params = ref_mod.init(KEY, x)
        ref = ref_mod.apply(params, x)

        # the fused path shares the same param tree
        import osu_dreamer_tpu.ops.swiglu as swiglu_ops

        orig = swiglu_ops.fused_swiglu

        def interpreted(*args, **kw):
            return orig(*args[:7], DEFAULT_TILE_OVERRIDE, True)

        DEFAULT_TILE_OVERRIDE = 16
        import osu_dreamer_tpu.ops as ops_pkg

        old = ops_pkg.fused_swiglu
        ops_pkg.fused_swiglu = interpreted
        try:
            fused_mod = SwiGLU(16, expand=2, radius=2, dtype=jnp.float32, fused=True)
            got = fused_mod.apply(params, x)
        finally:
            ops_pkg.fused_swiglu = old

        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


class TestPallasResonator:
    def test_matches_sequential_iir(self, rng):
        """the one-pass kernel (MXU contrib + in-kernel prefix scan + carried
        cross-tile state) equals the exact recurrence"""
        import jax.numpy as jnp

        from osu_dreamer_tpu.audio.constants import HOP_LEN, N_BINS, SR
        from osu_dreamer_tpu.audio.spectrogram import resonate_reference
        from osu_dreamer_tpu.ops.resonator import TILE, resonate_frames_pallas

        n = HOP_LEN * (TILE + 37)  # spans a tile boundary (carry path)
        wave = rng.normal(size=n).astype(np.float32)
        K = -(-n // HOP_LEN)
        padded = np.zeros(K * HOP_LEN, np.float32)
        padded[:n] = wave
        frames = jnp.asarray(padded.reshape(K, HOP_LEN))

        got = np.asarray(
            resonate_frames_pallas(frames, HOP_LEN, N_BINS, SR, interpret=True)
        )
        exact = resonate_reference(wave)
        np.testing.assert_allclose(got[..., 0], exact.real, atol=5e-3)
        np.testing.assert_allclose(got[..., 1], exact.imag, atol=5e-3)
