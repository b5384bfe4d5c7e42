"""Stage-2 latent denoiser: a distance-field ("distance marching") flow model.

Capability parity with reference models/diffusion/ (model.py, backbone.py):
predicts, for a noised latent x_t, the scalar distance-to-manifold u (in the
per-frame metric) and the unit direction field v; sampling is sphere tracing
``x <- x - eta * u * v`` with a self-calibrating step size derived from the
first predicted distance (model.py:117-137, after arXiv:2602.02928).

TPU-first notes: the whole sampling loop is ONE ``lax.scan`` inside jit —
the eta calibration uses the step-0 prediction carried on device, so there
are no host syncs between steps; audio/style conditioning is precomputed
once and closed over by the scan body.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import sqrt

import jax
import jax.numpy as jnp
from flax import linen as nn

from osu_dreamer_tpu.nn import RoPEAttention, SwiGLU, rms_norm, zeros_init
from osu_dreamer_tpu.nn.blocks import DepthwiseConv

# sigmoid(ndtri(.99)): the 99th-percentile interpolation time of the
# logit-normal t used in training — the finest resolvable noise level
_T99 = 0.9110007125548362


@dataclass
class BackboneArgs:
    depth: int = 8
    expand: int = 4
    head_dim: int = 64
    n_heads: int = 16
    radius: int = 2
    dropout: float = 0.0
    # mesh axis the sequence is sharded over (sequence parallelism): set via
    # the config's `parallel: {sp: N}` block; attention becomes ring
    # attention with global rotary offsets, the FFN/u-head convs halo-
    # exchange across shard boundaries, and reductions over length pmean —
    # sharded compute equals the unsharded model (tests/test_parallel.py)
    seq_axis: str | None = None


@dataclass
class DiffusionModelArgs:
    emb_dim: int = 6
    a_dim: int = 128
    style_dim: int = 32
    global_cond_dim: int = 512
    backbone_dim: int = 512
    u_head_dim: int = 64
    backbone: BackboneArgs = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.backbone is None:
            self.backbone = BackboneArgs()

    @property
    def d0_sq(self) -> float:
        """E[d^2] between N(0,I) noise and per-frame RMS-normalized latents"""
        return 2.0 * self.emb_dim

    @property
    def c0(self) -> float:
        """noise floor smoothing the field near the manifold"""
        return (1.0 - _T99) ** 2 * self.d0_sq

    @property
    def u_scale(self) -> float:
        return sqrt(self.d0_sq)


# softplus(bias) = .5  =>  u starts at its marginal mean E[1-t]*u_scale
_U_BIAS_INIT = -0.4328


def _local_slice_of_global_noise(
    rng: jax.Array, B: int, l_local: int, emb: int, axis_name: str
) -> jnp.ndarray:
    """under shard_map: generate the full-length N(0,1) field on every shard
    and take this shard's span — cheap, and keeps sharded runs numerically
    identical to unsharded ones for the same key"""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    full = jax.random.normal(rng, (B, l_local * n, emb), jnp.float32)
    return jax.lax.dynamic_slice_in_dim(full, idx * l_local, l_local, axis=1)


class BackboneLayer(nn.Module):
    """pre-norm transformer layer, doubly FiLM-gated by the global cond, with
    the local audio features added ahead of attention (reference
    backbone.py:52-88)"""

    dim: int
    args: BackboneArgs
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, audio: jnp.ndarray, cond: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        a = self.args

        def film(name):
            ssg = nn.Dense(3 * self.dim, kernel_init=zeros_init, bias_init=zeros_init,
                           dtype=self.dtype, name=name)(cond)
            return jnp.split(ssg, 3, axis=-1)  # (B, C) each

        scale, shift, gate = film("film_attn")
        # the attention module fuses the pre-norm + FiLM + audio inject into
        # its qkv projection (ONE Pallas kernel on TPU; nn/attention.py)
        h = RoPEAttention(
            a.n_heads, a.head_dim, self.dim, self.dtype,
            seq_axis=a.seq_axis, name="attn",
        )(
            x,
            film=(scale, shift),
            add=nn.Dense(self.dim, dtype=self.dtype, name="audio_proj")(audio),
        )
        x = x + rms_norm(h) * gate[:, None, :]

        scale, shift, gate = film("film_ffn")
        gate = gate[:, None, :]
        h = rms_norm(x) * (1 + scale[:, None, :]) + shift[:, None, :]
        h = SwiGLU(
            self.dim, a.expand, a.radius, a.dropout, self.dtype,
            seq_axis=a.seq_axis, name="ffn",
        )(h, train=train)
        x = x + rms_norm(h) * gate
        return x


class Backbone(nn.Module):
    dim: int
    args: BackboneArgs
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, audio: jnp.ndarray, cond: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        for i in range(self.args.depth):
            x = BackboneLayer(self.dim, self.args, self.dtype, name=f"layer{i}")(
                x, audio, cond, train=train
            )
        return rms_norm(x)


class DiffusionModel(nn.Module):
    args: DiffusionModelArgs
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        a = self.args
        self.audio_in = nn.Dense(a.a_dim, dtype=self.dtype, name="audio_in")
        self.style_in = nn.Dense(a.global_cond_dim, dtype=self.dtype, name="style_in")
        self.proj_in = nn.Dense(a.backbone_dim, dtype=self.dtype, name="proj_in")
        self.net = Backbone(a.backbone_dim, a.backbone, self.dtype, name="net")
        self.proj_out = nn.Dense(
            a.emb_dim, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="proj_out",
        )

        # lightweight distance head reading the raw noised input
        U = a.u_head_dim
        # tap-sum depthwise convs (nn.DepthwiseConv): XLA grouped convs over
        # 6/64 channels run at <5% lane utilization on TPU. NOTE: the swap
        # renamed these params (Conv_i -> DepthwiseConv_i under flax
        # auto-naming) — value-compatible shapes, but checkpoints written
        # before the swap need a path rename to restore; accepted pre-release
        # (no published artifacts)
        self.u_convs = nn.Sequential(
            [
                DepthwiseConv(a.emb_dim, 3, dtype=self.dtype),
                nn.Dense(U, dtype=self.dtype),
                nn.silu,
                DepthwiseConv(U, 3, dtype=self.dtype),
                nn.Dense(U, dtype=self.dtype),
                nn.silu,
            ],
            name="u_convs",
        )
        self.u_film = nn.Dense(
            2 * U, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="u_film",
        )
        self.u_out = nn.Dense(
            1,
            kernel_init=zeros_init,
            bias_init=nn.initializers.constant(_U_BIAS_INIT),
            dtype=self.dtype,
            name="u_out",
        )

    def precompute_cond(
        self, audio: jnp.ndarray, style: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """project conditioning once (reused across every sampling step)"""
        return nn.silu(self.audio_in(audio)), nn.silu(self.style_in(style))

    def predict(
        self, audio_c: jnp.ndarray, cond_g: jnp.ndarray, xt: jnp.ndarray,
        train: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """-> (u (B,), v (B, l, E))"""
        h = self.proj_in(xt)
        h = self.net(h, audio_c, cond_g, train=train)
        v = self.proj_out(h)

        sp = self.args.backbone.seq_axis
        if sp is None:
            f = self.u_convs(xt).mean(axis=1)  # (B, U)
        else:
            # sequence-parallel: each radius-1 conv gets its OWN 1-frame
            # ring halo (global edges zero) so the padding semantics match
            # the unsharded stack exactly — SAME zero-pads each conv's
            # INPUT, so the second conv's edge neighbor must be a literal
            # zero, not the first conv's output on a zero-padded frame (a
            # single 2-frame halo through both convs diverges at the global
            # sequence edges). The time mean is pmean'd so every shard
            # carries the same global u.
            from osu_dreamer_tpu.ops.ring_attention import halo_exchange

            conv1, dense1, act1, conv2, dense2, act2 = self.u_convs.layers
            y = act1(dense1(conv1(halo_exchange(xt, 1, sp))[:, 1:-1]))
            f = act2(dense2(conv2(halo_exchange(y, 1, sp))[:, 1:-1]))
            f = jax.lax.pmean(f.mean(axis=1), sp)
        scale, shift = jnp.split(self.u_film(cond_g), 2, axis=-1)
        f = f * (1 + scale) + shift
        u = self.args.u_scale * nn.softplus(self.u_out(f).astype(jnp.float32))[:, 0]
        return u, v

    def __call__(
        self, audio: jnp.ndarray, style: jnp.ndarray, xt: jnp.ndarray,
        train: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        audio_c, cond_g = self.precompute_cond(audio, style)
        return self.predict(audio_c, cond_g, xt, train=train)

    def sample(
        self,
        audio: jnp.ndarray,   # (#B, l, A)
        style: jnp.ndarray,   # (B, S)
        rng: jax.Array,
        num_steps: int,
    ) -> jnp.ndarray:
        """sphere tracing as one lax.scan; eta is calibrated on device from
        the first prediction so the distance contracts geometrically from u0
        to the noise floor sqrt(c0) over the step budget"""
        assert audio.ndim == 3 and audio.shape[-1] == self.args.a_dim, (
            f"audio must be (#B, l, {self.args.a_dim}), got {audio.shape}"
        )
        assert style.shape[-1] == self.args.style_dim, f"bad style shape {style.shape}"
        B = style.shape[0]
        sp = self.args.backbone.seq_axis
        if sp is None:
            x0 = jax.random.normal(
                rng, (B, audio.shape[1], self.args.emb_dim), jnp.float32
            )
        else:
            # sequence-parallel: every shard draws the SAME global noise and
            # slices its local span — sharded sampling is bit-deterministic
            # and equals the unsharded sampler for a given key
            x0 = _local_slice_of_global_noise(
                rng, B, audio.shape[1], self.args.emb_dim, sp
            )

        audio_c, cond_g = self.precompute_cond(audio, style)

        sqrt_c0 = sqrt(self.args.c0)
        u0 = self.predict(audio_c, cond_g, x0)[0].mean()
        eta = 1.0 - (sqrt_c0 / jnp.maximum(u0, sqrt_c0 + 1e-6)) ** (1.0 / num_steps)

        def step(x, _):
            u, v = self.predict(audio_c, cond_g, x)
            return x - eta * u[:, None, None] * v.astype(jnp.float32), None

        x, _ = jax.lax.scan(step, x0, None, length=num_steps)
        return x
