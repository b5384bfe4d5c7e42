"""Train-step smoke tests: one jitted step per stage runs, updates state,
produces finite losses; tiny overfit checks that losses go down."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osu_dreamer_tpu.models.diffusion import DiffusionModelArgs
from osu_dreamer_tpu.models.diffusion.model import BackboneArgs
from osu_dreamer_tpu.models.diffusion.train import (
    DiffusionTrainArgs,
    LatentBatch,
    init_diffusion_training,
)
from osu_dreamer_tpu.models.latent import LatentModelArgs
from osu_dreamer_tpu.models.latent.model import StackArgs
from osu_dreamer_tpu.models.latent.train import (
    Batch,
    LatentTrainArgs,
    init_latent_training,
)
from osu_dreamer_tpu.models.style import StyleModelArgs
from osu_dreamer_tpu.models.style.train import StyleTrainArgs, init_style_training

KEY = jax.random.PRNGKey(0)

TINY_LATENT = LatentModelArgs(
    emb_dim=4,
    style_dim=8,
    n_downs=2,
    stride=3,
    h_dim=16,
    stack=StackArgs(n_layers=1, expand=2, radius=1),
    style_head_dim=8,
    style_heads=2,
)

TINY_DIFFUSION = DiffusionModelArgs(
    emb_dim=4,
    a_dim=16,
    style_dim=8,
    global_cond_dim=16,
    backbone_dim=16,
    u_head_dim=8,
    backbone=BackboneArgs(depth=1, expand=2, head_dim=8, n_heads=2, radius=1),
)

TINY_STYLE = StyleModelArgs(style_dim=8, label_features=16, h_dim=16, depth=2, expand=2)


@pytest.mark.slow
class TestLatentStep:
    def test_step_runs_and_learns(self):
        seq_len = 2 * TINY_LATENT.chunk_size * 2  # two halves, chunk-aligned
        model, state, step = init_latent_training(
            TINY_LATENT, LatentTrainArgs(), KEY, seq_len
        )
        k1, k2 = jax.random.split(KEY)
        batch = Batch(
            audio=jax.random.uniform(k1, (2, seq_len, 72)),
            chart=jnp.concatenate(
                [
                    jax.random.uniform(k2, (2, seq_len, 7)),
                    jax.random.uniform(k2, (2, seq_len, 2)),
                ],
                axis=-1,
            ),
            labels=jnp.ones((2, 5)) * 5.0,
        )

        state, aux = step(state, batch)
        assert int(state.step) == 1
        first = float(aux["loss"])
        assert np.isfinite(first)
        assert bool(state.loss_ema_ready)

        for _ in range(5):
            state, aux = step(state, batch)
        assert np.isfinite(float(aux["loss"]))
        assert int(state.step) == 6


@pytest.mark.slow
class TestDiffusionStep:
    def test_step_runs_and_learns(self):
        model, state, step = init_diffusion_training(
            TINY_DIFFUSION, DiffusionTrainArgs(), KEY, seq_len=8
        )
        k1, k2, k3 = jax.random.split(KEY, 3)
        batch = LatentBatch(
            h=jax.random.normal(k1, (4, 8, 16)),
            z=jax.random.normal(k2, (4, 8, 4)),
            s=jax.random.normal(k3, (4, 8)),
            labels=jnp.ones((4, 5)),
        )
        losses = []
        for _ in range(8):
            state, aux = step(state, batch)
            losses.append(float(aux["loss"]))
        assert all(np.isfinite(l) for l in losses)
        # EMA params track the live params
        diff = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(
                lambda e, p: float(jnp.abs(e - p).sum()), state.ema_params, state.params
            ),
        )
        assert diff > 0.0  # EMA lags behind

    def test_sample_shapes(self):
        from osu_dreamer_tpu.models.diffusion import DiffusionModel

        model = DiffusionModel(TINY_DIFFUSION)
        params = model.init(
            KEY, jnp.zeros((1, 8, 16)), jnp.zeros((3, 8)), jnp.zeros((3, 8, 4))
        )
        out = jax.jit(
            lambda p, a, s, r: model.apply(p, a, s, r, 4, method=DiffusionModel.sample)
        )(params, jnp.zeros((1, 8, 16)), jnp.zeros((3, 8)), KEY)
        assert out.shape == (3, 8, 4)
        assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
class TestStyleStep:
    def test_step_runs_and_overfits(self):
        model, state, step = init_style_training(TINY_STYLE, StyleTrainArgs(), KEY)
        k1, k2 = jax.random.split(KEY)
        s = jax.random.normal(k1, (16, 8))
        s = s / jnp.sqrt((s**2).mean(axis=1, keepdims=True))  # RMS-normalized
        labels = jax.random.uniform(k2, (16, 5)) * 10.0

        losses = []
        for _ in range(30):
            state, aux = step(state, s, labels)
            losses.append(float(aux["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_sample_shapes(self):
        from osu_dreamer_tpu.models.style import StyleModel

        model = StyleModel(TINY_STYLE)
        params = model.init(KEY, jnp.zeros((2, 8)), jnp.zeros((2, 5)))
        out = jax.jit(
            lambda p, l, r: model.apply(p, l, r, 4, method=StyleModel.sample)
        )(params, jnp.ones((5, 5)), KEY)
        assert out.shape == (5, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_sample_guidance(self):
        """guidance=1 must reproduce plain conditional sampling bit-for-bit
        (same program: the null branch is never built); guidance>1 changes
        the samples but keeps them finite and shaped"""
        from osu_dreamer_tpu.models.style import StyleModel

        model = StyleModel(TINY_STYLE)
        params = model.init(KEY, jnp.zeros((2, 8)), jnp.zeros((2, 5)))
        # zero-init output heads make the displacement field identically
        # zero at init (guidance would be invisible); randomize them
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
        params = jax.tree.unflatten(
            treedef,
            [l + 0.1 * jax.random.normal(k, l.shape, l.dtype)
             for l, k in zip(leaves, keys)],
        )
        labels = jnp.tile(jnp.asarray([[3.0, 9.0, 8.0, 4.0, 5.0]]), (4, 1))

        def sample(g):
            return model.apply(
                params, labels, KEY, 4, g, method=StyleModel.sample
            )

        base = np.asarray(sample(1.0))
        guided = np.asarray(jax.jit(sample, static_argnums=0)(2.5))
        assert guided.shape == base.shape == (4, 8)
        assert np.isfinite(guided).all()
        assert not np.allclose(guided, base)


@pytest.mark.slow
class TestLDMSongBatching:
    def test_batched_songs_song_major_and_no_cross_talk(self):
        """S>1 batches songs through one program: output rows are song-major
        (S*D), and each song's audio encoding equals its solo encoding (no
        leakage across the batch dim)"""
        from osu_dreamer_tpu.models.inference import LDM, LDMArgs

        args = LDMArgs(latent=TINY_LATENT, style=TINY_STYLE, diffusion=TINY_DIFFUSION)
        model = LDM(args)
        Lp = 4 * TINY_LATENT.chunk_size
        spec = jax.random.uniform(jax.random.PRNGKey(1), (2, Lp, 72))
        labels = jnp.asarray([[5.0, 9, 8, 4, 6], [3.0, 7, 6, 3, 5], [1.0, 4, 3, 2, 4]])
        params = model.init(KEY, spec[:1], labels, KEY, 1, 1)

        chart, out_labels = model.apply(params, spec, labels, KEY, 2, 2)
        assert chart.shape == (6, Lp, 9) and out_labels.shape == (6, 5)
        assert np.isfinite(np.asarray(chart)).all()

        # per-song audio encodings must match the solo path exactly
        def enc(sp):
            return model.apply(params, sp, method=lambda m, sp: m.latent.encode_audio(sp))

        _, h_batch = enc(spec)
        for s in range(2):
            _, h_solo = enc(spec[s : s + 1])
            np.testing.assert_allclose(
                np.asarray(h_batch[s]), np.asarray(h_solo[0]), atol=1e-5
            )

        # determinism: same key -> same charts
        chart2, _ = model.apply(params, spec, labels, KEY, 2, 2)
        np.testing.assert_array_equal(np.asarray(chart), np.asarray(chart2))
