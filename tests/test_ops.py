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

    @pytest.mark.slow
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

    @pytest.mark.slow
    def test_backward_kernel_all_grads(self):
        """the flash-style backward kernel (ops/swiglu.py _bwd_kernel):
        dx and EVERY weight/bias grad vs autodiff of the reference, over
        multi-batch ragged-length inputs and both conv radii"""
        from osu_dreamer_tpu.ops.swiglu import _fused_swiglu_bwd_impl

        for (B, L, C, H, K, tile) in [(2, 70, 16, 20, 5, 32), (3, 33, 8, 12, 3, 16)]:
            p = make_params(C=C, H=H, K=K)
            ks = jax.random.split(jax.random.PRNGKey(B), 2)
            x = jax.random.normal(ks[0], (B, L, C))
            go = jax.random.normal(ks[1], (B, L, C))

            _, vjp = jax.vjp(swiglu_reference, x, *p.values())
            ref = vjp(go)
            got = _fused_swiglu_bwd_impl(
                x, p["dw_kernel"], p["dw_bias"], p["vg_kernel"], p["vg_bias"],
                p["out_kernel"], go, tile=tile, interpret=True,
            )
            names = ["dx", "d_dw_kernel", "d_dw_bias", "d_vg_kernel",
                     "d_vg_bias", "d_out_kernel", "d_out_bias"]
            for name, r, g in zip(names, ref, got):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4,
                    err_msg=f"{name} at B{B} L{L} C{C} K{K}",
                )

    @pytest.mark.slow
    def test_partial_backward_kernel_all_grads(self):
        """the partial backward (ops/swiglu.py _partial_bwd_kernel — engaged
        when the full weight-grad accumulators don't fit VMEM, e.g. the
        denoiser FFN): dx and EVERY grad vs autodiff of the reference,
        including a ragged length and an odd (lane-misaligned) h_dim"""
        from osu_dreamer_tpu.ops.swiglu import _fused_swiglu_partial_bwd_impl

        for (B, L, C, H, K, tile) in [(2, 70, 16, 20, 5, 32), (1, 33, 8, 13, 3, 16)]:
            p = make_params(C=C, H=H, K=K)
            ks = jax.random.split(jax.random.PRNGKey(B + 10), 2)
            x = jax.random.normal(ks[0], (B, L, C))
            go = jax.random.normal(ks[1], (B, L, C))

            _, vjp = jax.vjp(swiglu_reference, x, *p.values())
            ref = vjp(go)
            got = _fused_swiglu_partial_bwd_impl(
                x, p["dw_kernel"], p["dw_bias"], p["vg_kernel"], p["vg_bias"],
                p["out_kernel"], go, tile=tile, interpret=True,
            )
            names = ["dx", "d_dw_kernel", "d_dw_bias", "d_vg_kernel",
                     "d_vg_bias", "d_out_kernel", "d_out_bias"]
            for name, r, g in zip(names, ref, got):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4,
                    err_msg=f"{name} at B{B} L{L} C{C} H{H} K{K}",
                )

    @pytest.mark.slow
    def test_partial_backward_via_grad_dispatch(self):
        """jax.grad through fused_swiglu at dims where only the partial
        backward is feasible routes through it and matches the reference"""
        from osu_dreamer_tpu.ops import swiglu as sw

        p = make_params(C=16, H=20, K=5)
        x = jax.random.normal(KEY, (1, 24, 16))

        def loss_fused(x, *params):
            return jnp.sum(fused_swiglu(x, *params, 16, True) ** 2)

        def loss_ref(x, *params):
            return jnp.sum(swiglu_reference(x, *params) ** 2)

        orig = sw._feasible_bwd_tile
        sw._feasible_bwd_tile = lambda *a, **k: None  # force the partial path
        try:
            g_fused = jax.grad(loss_fused, argnums=(0, 1, 3, 5))(x, *p.values())
        finally:
            sw._feasible_bwd_tile = orig
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 3, 5))(x, *p.values())
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestFusedFilmLayer:
    """ops/film_layer.py: the whole FiLM residual layer (pre-norm + FiLM +
    SwiGLU + block-norm + gated residual) as one kernel, fwd + flash-style
    bwd, vs the exact jnp composition."""

    def _args(self, B, L, C, H, K, seed=7):
        ks = jax.random.split(jax.random.PRNGKey(seed), 14)
        return (
            jax.random.normal(ks[0], (B, L, C)),
            jax.random.normal(ks[1], (B, C)) * 0.3,          # scale
            jax.random.normal(ks[2], (B, C)) * 0.3,          # shift
            jax.random.normal(ks[3], (B, C)) * 0.3,          # gate
            jax.random.normal(ks[4], (C,)) * 0.2 + 1.0,      # g1
            jax.random.normal(ks[5], (C,)) * 0.2,            # g2
            jax.random.normal(ks[6], (K, C)) * 0.3,
            jax.random.normal(ks[7], (C,)) * 0.1,
            jax.random.normal(ks[8], (C, 2 * H)) * 0.1,
            jax.random.normal(ks[9], (2 * H,)) * 0.1,
            jax.random.normal(ks[10], (H, C)) * 0.1,
            jax.random.normal(ks[11], (C,)) * 0.1,
        ), jax.random.normal(ks[12], (B, L, C))

    @pytest.mark.slow
    def test_forward_matches_reference(self):
        from osu_dreamer_tpu.ops.film_layer import (
            _fused_film_layer_fwd_impl,
            film_layer_reference,
        )

        for (B, L, C, H, K, tile) in [(2, 70, 16, 20, 5, 32), (3, 33, 8, 12, 3, 16)]:
            args, _ = self._args(B, L, C, H, K)
            ref = film_layer_reference(*args)
            got = _fused_film_layer_fwd_impl(*args, tile=tile, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
                err_msg=f"B{B} L{L} C{C}",
            )

    @pytest.mark.slow
    def test_backward_all_grads(self):
        from osu_dreamer_tpu.ops.film_layer import (
            _fused_film_layer_bwd_impl,
            film_layer_reference,
        )

        names = ["dx", "dscale", "dshift", "dgate", "dg1", "dg2",
                 "ddw", "ddwb", "dwvg", "dbvg", "dwout", "dbout"]
        for (B, L, C, H, K, tile) in [(2, 70, 16, 20, 5, 32), (3, 33, 8, 12, 3, 16)]:
            args, go = self._args(B, L, C, H, K)
            _, vjp = jax.vjp(film_layer_reference, *args)
            ref = vjp(go)
            got = _fused_film_layer_bwd_impl(*args, go, tile=tile, interpret=True)
            for name, r, g in zip(names, ref, got):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(r), rtol=3e-4, atol=3e-4,
                    err_msg=f"{name} B{B} L{L} C{C}",
                )

    @pytest.mark.slow
    def test_filmstack_fused_path_agrees(self):
        """FilmStack(fused=True) through the interpreted kernel equals the
        unfused module path, conditioned AND unconditioned, same param
        tree — grads included"""
        from osu_dreamer_tpu.nn import FilmStack
        from osu_dreamer_tpu.ops import film_layer as fl_mod

        orig = fl_mod.fused_film_layer

        def interpreted(*args, **kw):
            return orig(*args[:12], DEFAULT_TILE_SMALL, True)

        DEFAULT_TILE_SMALL = 16
        for cond_dim in (0, 12):
            x = jax.random.normal(KEY, (2, 40, 16))
            cond = jax.random.normal(KEY, (2, cond_dim)) if cond_dim else None
            ref_mod = FilmStack(16, cond_dim, n_layers=2, expand=2, radius=2,
                                dtype=jnp.float32, fused=False)
            params = ref_mod.init(KEY, x, cond)
            ref = ref_mod.apply(params, x, cond)

            fl_mod.fused_film_layer = interpreted
            try:
                fused_mod = FilmStack(16, cond_dim, n_layers=2, expand=2,
                                      radius=2, dtype=jnp.float32, fused=True)
                got = fused_mod.apply(params, x, cond)

                def loss(p, mod):
                    return jnp.sum(mod.apply(p, x, cond).astype(jnp.float32) ** 2)

                g_ref = jax.grad(loss)(params, ref_mod)
                g_fused = jax.grad(loss)(params, fused_mod)
            finally:
                fl_mod.fused_film_layer = orig

            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
                err_msg=f"cond_dim={cond_dim}",
            )
            flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
            flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fused))
            assert len(flat_r) == len(flat_f)
            for path, r in flat_r:
                np.testing.assert_allclose(
                    np.asarray(flat_f[path]), np.asarray(r), rtol=1e-3, atol=1e-3,
                    err_msg=f"grad {jax.tree_util.keystr(path)} cond_dim={cond_dim}",
                )


class TestFilmQKV:
    """ops/film_qkv.py: the fused norm + FiLM + qkv-projection prologue
    (fwd + flash-style bwd) vs the exact jnp composition."""

    def _args(self, B, L, C, F, seed=11):
        ks = jax.random.split(jax.random.PRNGKey(seed), 7)
        return (
            jax.random.normal(ks[0], (B, L, C)),
            jax.random.normal(ks[1], (B, C)) * 0.3,   # scale
            jax.random.normal(ks[2], (B, C)) * 0.3,   # shift
            jax.random.normal(ks[3], (B, L, C)) * 0.5,  # add
            jax.random.normal(ks[4], (C, F)) * 0.2,
            jax.random.normal(ks[5], (F,)) * 0.1,
        ), jax.random.normal(ks[6], (B, L, F))

    @pytest.mark.slow
    def test_forward_matches_reference(self):
        from osu_dreamer_tpu.ops.film_qkv import _fwd_impl, film_qkv_reference

        # 33 rows with tile 16 exercises the zero-pad + crop path
        for (B, L, C, F, tile) in [(2, 64, 16, 24, 32), (3, 33, 8, 16, 16)]:
            args, _ = self._args(B, L, C, F)
            ref = film_qkv_reference(*args)
            got = _fwd_impl(*args, tile=tile, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
                err_msg=f"B{B} L{L} C{C} F{F}",
            )

    @pytest.mark.slow
    def test_backward_all_grads(self):
        from osu_dreamer_tpu.ops.film_qkv import film_qkv, film_qkv_reference

        names = ["dx", "dscale", "dshift", "dadd", "dkernel", "dbias"]
        for (B, L, C, F, tile) in [(2, 64, 16, 24, 32), (3, 33, 8, 16, 16)]:
            args, go = self._args(B, L, C, F)
            _, vjp_ref = jax.vjp(film_qkv_reference, *args)
            ref = vjp_ref(go)
            _, vjp_got = jax.vjp(lambda *a: film_qkv(*a, tile, True), *args)
            got = vjp_got(go)
            for name, r, g in zip(names, ref, got):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(r), rtol=3e-4, atol=3e-4,
                    err_msg=f"{name} B{B} L{L} C{C} F{F}",
                )

    def test_attention_film_path_matches_manual(self):
        """RoPEAttention(x, film=(scale, shift), add=a) on the XLA fallback
        equals applying the manual pre-norm + FiLM + add composition to the
        plain module — the param tree (attn qkv/kernel paths) is shared."""
        from osu_dreamer_tpu.nn import RoPEAttention, rms_norm

        B, L, C = 2, 24, 16
        ks = jax.random.split(KEY, 4)
        x = jax.random.normal(ks[0], (B, L, C))
        scale = jax.random.normal(ks[1], (B, C)) * 0.3
        shift = jax.random.normal(ks[2], (B, C)) * 0.3
        add = jax.random.normal(ks[3], (B, L, C)) * 0.5

        mod = RoPEAttention(2, 8, C, dtype=jnp.float32)
        params = mod.init(KEY, x, film=(scale, shift), add=add)
        assert "kernel" in params["params"]["qkv"], "qkv param path changed"

        got = mod.apply(params, x, film=(scale, shift), add=add)
        h = rms_norm(x) * (1 + scale[:, None, :]) + shift[:, None, :] + add
        ref = mod.apply(params, h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    @pytest.mark.slow
    def test_attention_fused_prologue_agrees(self, monkeypatch):
        """the fused kernel path through RoPEAttention (interpret mode)
        equals the XLA fallback on the same params"""
        import osu_dreamer_tpu.nn.attention as attn_mod
        import osu_dreamer_tpu.ops.film_qkv as fq

        B, L, C = 2, 24, 16
        ks = jax.random.split(KEY, 4)
        x = jax.random.normal(ks[0], (B, L, C))
        scale = jax.random.normal(ks[1], (B, C)) * 0.3
        shift = jax.random.normal(ks[2], (B, C)) * 0.3
        add = jax.random.normal(ks[3], (B, L, C)) * 0.5

        mod = attn_mod.RoPEAttention(2, 8, C, dtype=jnp.float32)
        params = mod.init(KEY, x, film=(scale, shift), add=add)
        ref = mod.apply(params, x, film=(scale, shift), add=add)

        orig = fq.film_qkv
        monkeypatch.setattr(
            fq, "film_qkv", lambda *a: orig(*a, 16, True)
        )
        monkeypatch.setattr(attn_mod, "_prologue_ok", lambda C_, F_: True)
        got = mod.apply(params, x, film=(scale, shift), add=add)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


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



    def test_batched_featurize_keeps_carry_per_song(self, rng):
        """vmapping the resonator kernel must keep the cross-tile carry
        keyed PER SONG: the batching rule prepends the song axis to the
        grid, but pl.program_id indexes only the USER axes (jax filters
        vmapped_dims out of the kernel-visible grid indices) — pin that
        contract, since the carry logic silently corrupts every batched
        spectrogram if it ever changes"""
        import jax
        import jax.numpy as jnp

        from osu_dreamer_tpu.audio.constants import HOP_LEN, N_BINS, SR
        from osu_dreamer_tpu.ops.resonator import TILE, resonate_frames_pallas

        K = TILE + 23  # spans a tile boundary so the carry path is live
        frames = jnp.asarray(
            rng.normal(size=(2, K, HOP_LEN)).astype(np.float32)
        )

        solo = jnp.stack([
            resonate_frames_pallas(frames[i], HOP_LEN, N_BINS, SR, interpret=True)
            for i in range(2)
        ])
        vmapped = jax.vmap(
            lambda f: resonate_frames_pallas(f, HOP_LEN, N_BINS, SR, interpret=True)
        )(frames)
        np.testing.assert_allclose(np.asarray(vmapped), np.asarray(solo), atol=1e-6)


class TestFusedNormRopeAttention:
    """ops/fused_attention.py (norm+rope+attention megakernel, fwd+bwd) vs
    the jnp composition, in Pallas interpret mode on CPU."""

    def _inputs(self, B, L, H, D, dtype=jnp.bfloat16):
        k1, k2, k3 = jax.random.split(KEY, 3)
        qkv = (jax.random.normal(k1, (B, L, 3 * H * D)) * 0.7).astype(dtype)
        qg = jax.random.uniform(k2, (D,), jnp.float32, 0.5, 1.5)
        kg = jax.random.uniform(k3, (D,), jnp.float32, 0.5, 1.5)
        return qkv, qg, kg

    @pytest.mark.parametrize("B,L,H,D", [(2, 152, 4, 64), (1, 130, 2, 32)])
    @pytest.mark.slow
    def test_matches_reference(self, B, L, H, D):
        from osu_dreamer_tpu.ops import (
            fused_norm_rope_attention,
            rope_attention_reference,
        )

        qkv, qg, kg = self._inputs(B, L, H, D)
        ref = np.asarray(rope_attention_reference(qkv, qg, kg, H), np.float32)
        got = np.asarray(
            fused_norm_rope_attention(qkv, qg, kg, H, True), np.float32
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-2)

    def test_padded_length_masked(self):
        """L not a multiple of the 16-row bf16 tile: padded key rows must
        not leak into the softmax"""
        from osu_dreamer_tpu.ops import (
            fused_norm_rope_attention,
            rope_attention_reference,
        )

        qkv, qg, kg = self._inputs(1, 77, 2, 32)
        ref = np.asarray(rope_attention_reference(qkv, qg, kg, 2), np.float32)
        got = np.asarray(fused_norm_rope_attention(qkv, qg, kg, 2, True), np.float32)
        np.testing.assert_allclose(got, ref, atol=2e-2)

    @pytest.mark.slow
    def test_gradients(self):
        """custom-VJP backward kernel (d_qkv + both gamma grads) vs autodiff
        through the reference composition"""
        from osu_dreamer_tpu.ops import (
            fused_norm_rope_attention,
            rope_attention_reference,
        )

        qkv, qg, kg = self._inputs(1, 64, 2, 32, dtype=jnp.float32)

        def loss_fused(a, b, c):
            return jnp.sum(fused_norm_rope_attention(a, b, c, 2, True) ** 2)

        def loss_ref(a, b, c):
            return jnp.sum(rope_attention_reference(a, b, c, 2) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(qkv, qg, kg)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, qg, kg)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-2, atol=2e-2,
            )

    @pytest.mark.slow
    def test_module_dispatch(self, monkeypatch):
        """RoPEAttention routed through the kernel equals its XLA path"""
        from jax.experimental.pallas import tpu as pltpu

        from osu_dreamer_tpu.nn import attention as attn_mod
        from osu_dreamer_tpu.nn.attention import RoPEAttention

        x = jax.random.normal(KEY, (2, 40, 24), jnp.float32)
        mod = RoPEAttention(n_heads=2, head_dim=64, out_dim=24, dtype=jnp.float32)
        params = mod.init(KEY, x)
        base = np.asarray(mod.apply(params, x), np.float32)

        monkeypatch.setattr(attn_mod, "_flash_ok", lambda *a: True)
        with pltpu.force_tpu_interpret_mode():
            fused = np.asarray(mod.apply(params, x), np.float32)
        np.testing.assert_allclose(fused, base, atol=2e-2)


class TestLongFlashAttention:
    """ops/long_attention.py (full-song inference lengths, forward kernel)
    vs jax.nn.dot_product_attention, in Pallas interpret mode on CPU."""

    def _inputs(self, B, L, H, D, dtype=jnp.bfloat16):
        k1, k2, k3 = jax.random.split(KEY, 3)
        q = (jax.random.normal(k1, (B, L, H, D)) * 0.7).astype(dtype)
        k = (jax.random.normal(k2, (B, L, H, D)) * 0.7).astype(dtype)
        v = (jax.random.normal(k3, (B, L, H, D)) * 0.7).astype(dtype)
        return q, k, v

    @pytest.mark.parametrize("B,L,H,D", [(2, 512, 2, 64), (1, 256, 4, 32)])
    def test_matches_reference(self, B, L, H, D):
        from osu_dreamer_tpu.ops.long_attention import long_flash_attention

        q, k, v = self._inputs(B, L, H, D)
        ref = np.asarray(
            jax.nn.dot_product_attention(q, k, v).reshape(B, L, H * D),
            np.float32,
        )
        got = np.asarray(long_flash_attention(q, k, v, True), np.float32)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-2)

    def test_ragged_length_masked(self):
        """L not a multiple of BLOCK_Q: padded key rows must not leak into
        the softmax (exercises the in-kernel iota mask)"""
        from osu_dreamer_tpu.ops.long_attention import long_flash_attention

        q, k, v = self._inputs(1, 300, 2, 64)
        ref = np.asarray(
            jax.nn.dot_product_attention(q, k, v).reshape(1, 300, 128),
            np.float32,
        )
        got = np.asarray(long_flash_attention(q, k, v, True), np.float32)
        np.testing.assert_allclose(got, ref, atol=2e-2)

    @pytest.mark.slow
    def test_gradients(self):
        """custom-VJP backward (XLA composition fallback) vs autodiff
        through the reference — correctness under jax.grad is still required
        even though no training path attends at long L"""
        from osu_dreamer_tpu.ops.long_attention import long_flash_attention

        q, k, v = self._inputs(1, 288, 2, 64, dtype=jnp.float32)

        def loss_fused(q, k, v):
            return jnp.sum(long_flash_attention(q, k, v, True) ** 2)

        def loss_ref(q, k, v):
            y = jax.nn.dot_product_attention(q, k, v)
            return jnp.sum(y.reshape(1, 288, 128) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-2, atol=2e-2,
            )

    def test_fits_gate(self):
        from osu_dreamer_tpu.ops.long_attention import (
            MAX_LONG_LEN,
            MAX_RESIDENT_LEN,
            long_attention_fits,
        )

        assert long_attention_fits(744, 16, 64)  # 2-min song, denoiser heads
        # marathon songs route to the k-blocked variant instead of XLA
        assert long_attention_fits(MAX_RESIDENT_LEN + 1, 16, 64)
        assert long_attention_fits(4096, 16, 64)  # ~11-min song
        assert long_attention_fits(MAX_LONG_LEN, 16, 64)
        assert not long_attention_fits(MAX_LONG_LEN + 1, 16, 64)
        assert not long_attention_fits(744, 1, 96)  # HD % 128 != 0

    @pytest.mark.slow
    def test_blocked_matches_resident(self):
        """the k-blocked online-softmax variant (marathon songs) equals the
        k/v-resident kernel and the XLA reference, including a ragged tail
        k-block (L % BLOCK_K != 0 exercises the running-max masking)"""
        from osu_dreamer_tpu.ops.long_attention import (
            _blocked_impl,
            _fwd_impl,
        )

        for L in (1024, 900):
            q, k, v = self._inputs(1, L, 2, 64)
            ref = np.asarray(
                jax.nn.dot_product_attention(q, k, v).reshape(1, L, 128),
                np.float32,
            )
            got_blocked = np.asarray(_blocked_impl(q, k, v, True), np.float32)
            np.testing.assert_allclose(got_blocked, ref, atol=2e-2)
            got_resident = np.asarray(_fwd_impl(q, k, v, True), np.float32)
            np.testing.assert_allclose(got_blocked, got_resident, atol=2e-2)

    @pytest.mark.slow
    def test_blocked_dispatch_beyond_resident_cap(self):
        """L=4096 (beyond the resident VMEM cap, VERDICT r2 item 4): the
        public entry dispatches to the blocked kernel and matches XLA.
        Kept small in heads/batch — interpret mode pays the full O(L^2)."""
        from osu_dreamer_tpu.ops import long_attention as la

        L = 4096
        q, k, v = self._inputs(1, L, 2, 64)
        assert not la._resident_fits(L, 128)   # this shape routes blocked
        assert not la._resident_fits(L, 1024)  # so does the flagship model
        ref = np.asarray(
            jax.nn.dot_product_attention(q, k, v).reshape(1, L, 128),
            np.float32,
        )
        got = np.asarray(la.long_flash_attention(q, k, v, True), np.float32)
        np.testing.assert_allclose(got, ref, atol=2e-2)

    def test_module_dispatch(self, monkeypatch):
        """RoPEAttention routed through the long kernel equals its XLA path"""
        from jax.experimental.pallas import tpu as pltpu

        from osu_dreamer_tpu.nn import attention as attn_mod
        from osu_dreamer_tpu.nn.attention import RoPEAttention

        x = jax.random.normal(KEY, (1, 300, 24), jnp.float32)
        mod = RoPEAttention(n_heads=2, head_dim=64, out_dim=24, dtype=jnp.float32)
        params = mod.init(KEY, x)
        base = np.asarray(mod.apply(params, x), np.float32)

        monkeypatch.setattr(attn_mod, "_long_flash_ok", lambda *a: True)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(mod.apply(params, x), np.float32)
        np.testing.assert_allclose(got, base, atol=2e-2)


def test_fused_attention_gate_scales_with_head_width():
    """the VMEM cap scales with n_heads*head_dim: the measured budget was
    L=256 at HD=1024; doubling HD must halve the admissible length instead
    of passing the gate and failing Pallas compilation"""
    from osu_dreamer_tpu.ops.fused_attention import fused_attention_fits
    from osu_dreamer_tpu.ops.long_attention import long_attention_fits

    assert fused_attention_fits(256, 16, 64)        # HD=1024 baseline
    assert not fused_attention_fits(256, 32, 64)    # HD=2048 at L=256
    assert fused_attention_fits(128, 32, 64)        # halved L fits
    assert not fused_attention_fits(256, 16, 62)    # lane misalignment

    assert long_attention_fits(2048, 16, 64)        # HD=1024 baseline
    from osu_dreamer_tpu.ops.long_attention import _resident_fits

    # HD=2048 blows the k/v-resident VMEM budget at L=2048, but the gate
    # still passes: the k-blocked variant (L-independent VMEM) takes over
    assert not _resident_fits(2048, 2048)
    assert long_attention_fits(2048, 32, 64)

