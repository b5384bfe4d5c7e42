"""NN building blocks: shapes, invariants, schedule values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osu_dreamer_tpu.nn import (
    AttnPool,
    FilmStack,
    LRScheduleArgs,
    RMSNorm,
    RoPEAttention,
    SwiGLU,
    fourier_features,
    make_lr_schedule,
    mmd_imq,
    rms_norm,
    rope,
)

KEY = jax.random.PRNGKey(0)
F32 = jnp.float32


class TestRMSNorm:
    def test_unit_rms(self):
        x = jax.random.normal(KEY, (2, 7, 16)) * 5.0
        y = rms_norm(x)
        rms = jnp.sqrt(jnp.mean(y * y, axis=-1))
        np.testing.assert_allclose(np.asarray(rms), 1.0, atol=1e-3)

    def test_gain(self):
        x = jax.random.normal(KEY, (2, 3, 8))
        m = RMSNorm(8, gain=1e-3)
        p = m.init(KEY, x)
        y = m.apply(p, x)
        assert float(jnp.abs(y).max()) < 0.01


class TestRope:
    def test_preserves_norm(self):
        x = jax.random.normal(KEY, (1, 9, 2, 8))
        y = rope(x)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(x), axis=-1),
            np.linalg.norm(np.asarray(y), axis=-1),
            atol=1e-5,
        )

    def test_position_zero_identity(self):
        x = jax.random.normal(KEY, (1, 4, 1, 8))
        y = rope(x)
        np.testing.assert_allclose(np.asarray(y[0, 0]), np.asarray(x[0, 0]), atol=1e-6)

    def test_matches_reference_rotation(self):
        """rope equals explicit per-pair rotation by position * inv_freq"""
        D, L = 8, 8
        x = np.random.default_rng(0).normal(size=(1, L, 1, D)).astype(np.float32)
        y = np.asarray(rope(jnp.asarray(x)))
        inv = 10000.0 ** (np.arange(0, D, 2) / -D)
        for p in range(L):
            ang = p * inv
            c, s = np.cos(ang), np.sin(ang)
            x1, x2 = x[0, p, 0, : D // 2], x[0, p, 0, D // 2 :]
            expect = np.concatenate([x1 * c - x2 * s, x1 * s + x2 * c])
            np.testing.assert_allclose(y[0, p, 0], expect, atol=1e-5)


class TestBlocks:
    def test_swiglu_shape(self):
        x = jax.random.normal(KEY, (2, 6, 16))
        m = SwiGLU(16, expand=4, radius=2, dtype=F32)
        p = m.init(KEY, x)
        assert m.apply(p, x).shape == x.shape

    def test_filmstack_identity_at_init(self):
        """zero-init FiLM + 1e-3 block norms: the stack is ~input at init"""
        x = jax.random.normal(KEY, (2, 6, 16))
        cond = jax.random.normal(KEY, (2, 4))
        m = FilmStack(dim=16, cond_dim=4, n_layers=2, dtype=F32)
        p = m.init(KEY, x, cond)
        y = m.apply(p, x, cond)
        # output is rms-normed input plus tiny residuals
        np.testing.assert_allclose(np.asarray(y), np.asarray(rms_norm(x)), atol=0.05)

    def test_filmstack_unconditional(self):
        x = jax.random.normal(KEY, (2, 6, 16))
        m = FilmStack(dim=16, cond_dim=0, n_layers=1, dtype=F32)
        p = m.init(KEY, x)
        assert m.apply(p, x).shape == x.shape

    def test_attention_shape(self):
        x = jax.random.normal(KEY, (2, 10, 16))
        m = RoPEAttention(n_heads=2, head_dim=8, out_dim=16, dtype=F32)
        p = m.init(KEY, x)
        assert m.apply(p, x).shape == (2, 10, 16)

    def test_attnpool(self):
        x = jax.random.normal(KEY, (2, 10, 16))
        m = AttnPool(out_dim=4, head_dim=8, n_heads=2, dtype=F32)
        p = m.init(KEY, x)
        assert m.apply(p, x).shape == (2, 4)


class TestFourierFeatures:
    def test_deterministic_and_bounded(self):
        x = jnp.linspace(0, 1, 7)[:, None]
        a = fourier_features(x, 32, 16)
        b = fourier_features(x, 32, 16)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(jnp.abs(a).max()) <= (2 / 32) ** 0.5 + 1e-6


class TestSchedule:
    def test_phases(self):
        sch = make_lr_schedule(1e-3, LRScheduleArgs(warmup_steps=100, warmup_init=0.1, decay_start=1000))
        assert abs(float(sch(0)) - 1e-4) < 1e-9
        assert abs(float(sch(100)) - 1e-3) < 1e-9
        assert abs(float(sch(500)) - 1e-3) < 1e-9
        assert abs(float(sch(4000)) - 1e-3 * 0.5) < 1e-8


class TestMMD:
    def test_discriminates(self):
        k1, k2 = jax.random.split(KEY)
        z = jax.random.normal(k1, (32, 8))
        prior = jax.random.normal(k2, (32, 8))
        matched = float(mmd_imq(z, prior))
        shifted = float(mmd_imq(z + 3.0, prior))
        assert shifted > matched + 0.1


def test_gspmd_policy_disables_kernel_gates(monkeypatch):
    """build_parallelism's GSPMD flag must flip every auto kernel gate to
    the partitionable XLA paths (GSPMD cannot partition tpu_custom_call)"""
    from osu_dreamer_tpu.nn.attention import _pallas_attn_enabled
    from osu_dreamer_tpu.nn.blocks import _pallas_swiglu_default
    from osu_dreamer_tpu.ops import policy

    monkeypatch.delenv("OSU_DREAMER_XLA_ATTN", raising=False)
    monkeypatch.delenv("ODT_FUSED_SWIGLU", raising=False)
    try:
        policy.set_gspmd_sharding(True)
        assert not _pallas_attn_enabled()
        assert not _pallas_swiglu_default()
    finally:
        policy.set_gspmd_sharding(False)
