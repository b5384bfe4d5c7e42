"""Stage-1 chart autoencoder (WAE): dense beatmap signal -> latent z + style s.

Capability parity with reference models/latent/ (model.py, unet.py,
spec_features.py): a stride-3^n U-Net compresses the 9-channel chart signal
27x in time into a 6-dim per-frame latent plus a 32-dim per-map style code;
the decoder reconstructs chart logits from (z, s) and audio-encoder skip
connections with FiLM(style) modulation; a small MLP predicts the 5
difficulty labels from s.

TPU-first notes: channel-last (B, L, C) so every 1x1 conv is an MXU matmul;
down/up-sampling by reshape-mean / repeat (no strided conv gymnastics);
whole model runs in bf16 with fp32 parameters and fp32 norm statistics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from osu_dreamer_tpu.audio import A_DIM
from osu_dreamer_tpu.nn import AttnPool, FilmStack, RMSNorm, rms_norm, zeros_init
from osu_dreamer_tpu.nn.blocks import DepthwiseConv
from osu_dreamer_tpu.signal import HIT_DIM, NUM_LABELS, X_DIM


@dataclass
class StackArgs:
    """shape of every residual stack in the autoencoder (reference
    unet.py LayerArgs)"""

    n_layers: int = 8
    expand: int = 4
    radius: int = 2


@dataclass
class LatentModelArgs:
    emb_dim: int = 6
    style_dim: int = 32
    n_downs: int = 3
    stride: int = 3
    h_dim: int = 128
    stack: StackArgs = field(default_factory=StackArgs)
    style_head_dim: int = 64
    style_heads: int = 16

    @property
    def chunk_size(self) -> int:
        return self.stride**self.n_downs


def _stack(dim: int, cond_dim: int, args: StackArgs, dtype, name: str) -> FilmStack:
    return FilmStack(
        dim=dim, cond_dim=cond_dim, n_layers=args.n_layers,
        expand=args.expand, radius=args.radius, dtype=dtype, name=name,
    )


class SpecFeatures(nn.Module):
    """audio stem: (B, L, 72 freq bins) -> (B, L, h_dim) via strided 2-D convs
    over (time, freq) (reference spec_features.py:11-33)"""

    h_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, spec: jnp.ndarray) -> jnp.ndarray:
        # norms carry affine gains like the reference's (RMSNorm(8/32/d_a),
        # spec_features.py:20-31) — per-channel stem gains are trainable
        x = spec[..., None]  # (B, L, F, 1)
        x = nn.Conv(8, (3, 8), strides=(1, 6), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="c1")(x)
        x = nn.silu(RMSNorm(8, name="n1")(x))
        x = nn.Conv(32, (3, 6), strides=(1, 4), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="c2")(x)
        x = nn.silu(RMSNorm(32, name="n2")(x))
        B, L = x.shape[:2]
        x = x.reshape(B, L, -1)  # flatten (freq, channel)
        x = nn.Dense(self.h_dim, dtype=self.dtype, name="proj")(x)
        return nn.silu(RMSNorm(self.h_dim, name="n3")(x))


class Downsample(nn.Module):
    """depthwise antialias conv + mean-pool by `stride` (reshape, no conv stride)"""

    dim: int
    stride: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = 1 + 2 * (self.stride // 2)
        # tap-sum depthwise (param-compatible with the grouped nn.Conv it
        # replaces): XLA grouped convs over narrow channels run at a few
        # percent lane utilization on TPU — see nn.DepthwiseConv
        x = DepthwiseConv(self.dim, k, dtype=self.dtype, name="dw")(x)
        B, L, C = x.shape
        return x.reshape(B, L // self.stride, self.stride, C).mean(axis=2)


class Upsample(nn.Module):
    """nearest-repeat by `stride` + depthwise smoothing conv"""

    dim: int
    stride: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.repeat(x, self.stride, axis=1)
        k = 1 + 2 * (self.stride // 2)
        return DepthwiseConv(self.dim, k, dtype=self.dtype, name="dw")(x)


class SkipMixer(nn.Module):
    """inject an encoder skip: x + norm(proj(skip)) * zero_gate(x)
    (reference unet.py mixer:116-127)"""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, skip: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        proj = RMSNorm(self.dim, name="norm")(
            nn.Dense(self.dim, dtype=self.dtype, name="proj")(skip)
        )
        gate = nn.Dense(self.dim, kernel_init=zeros_init, bias_init=zeros_init,
                        dtype=self.dtype, name="gate")(x)
        return x + proj * gate


class UNetEncoder(nn.Module):
    """n_downs x [stack -> skip -> downsample]; returns (skips, bottom)"""

    dim: int
    n_downs: int
    stride: int
    stack: StackArgs
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[list[jnp.ndarray], jnp.ndarray]:
        skips = []
        for i in range(self.n_downs):
            x = _stack(self.dim, 0, self.stack, self.dtype, f"stack{i}")(x)
            skips.append(x)
            x = Downsample(self.dim, self.stride, self.dtype, name=f"down{i}")(x)
        return skips, x


class UNetDecoder(nn.Module):
    """n_downs x [upsample -> mix skip -> FiLM(style) stack]"""

    dim: int
    cond_dim: int
    n_downs: int
    stride: int
    stack: StackArgs
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, skips: list[jnp.ndarray], x: jnp.ndarray, cond: jnp.ndarray
    ) -> jnp.ndarray:
        for i in range(self.n_downs):
            x = Upsample(self.dim, self.stride, self.dtype, name=f"up{i}")(x)
            skip = skips[-(i + 1)]
            skip = jnp.broadcast_to(skip, (x.shape[0], *skip.shape[1:]))
            x = SkipMixer(self.dim, self.dtype, name=f"mix{i}")(skip, x)
            x = _stack(self.dim, self.cond_dim, self.stack, self.dtype, f"stack{i}")(x, cond)
        return x


class LatentModel(nn.Module):
    """the full chart WAE; submethods are exposed through `method=` so the
    pipeline can call encoder/decoder pieces independently"""

    args: LatentModelArgs
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        a = self.args
        self.chart_stem = nn.Dense(a.h_dim, dtype=self.dtype, name="chart_stem")
        self.chart_encoder = UNetEncoder(
            a.h_dim, a.n_downs, a.stride, a.stack, self.dtype, name="chart_encoder"
        )
        self.spec_stem = SpecFeatures(a.h_dim, self.dtype, name="spec_stem")
        self.audio_unet = UNetEncoder(
            a.h_dim, a.n_downs, a.stride, a.stack, self.dtype, name="audio_unet"
        )
        self.style_stack = _stack(a.h_dim, 0, a.stack, self.dtype, "style_stack")
        self.style_pool = AttnPool(
            a.style_dim, a.style_head_dim, a.style_heads, self.dtype, name="style_pool"
        )
        self.temporal_stack = _stack(a.h_dim, a.style_dim, a.stack, self.dtype, "temporal_stack")
        self.temporal_proj = nn.Dense(a.emb_dim, dtype=self.dtype, name="temporal_proj")
        self.emb_proj = nn.Dense(a.h_dim, dtype=self.dtype, name="emb_proj")
        self.decoder = UNetDecoder(
            a.h_dim, a.style_dim, a.n_downs, a.stride, a.stack, self.dtype, name="decoder"
        )
        self.head = nn.Dense(X_DIM, dtype=self.dtype, name="head")
        self.label_mlp = nn.Sequential(
            [
                nn.Dense(a.h_dim, dtype=self.dtype),
                nn.silu,
                nn.Dense(NUM_LABELS, dtype=self.dtype),
            ],
            name="label_mlp",
        )

    def encode_chart(self, chart: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(B, L, 9) -> z (B, L/27, E), s (B, S); both per-frame/-map RMS-normalized"""
        assert chart.ndim == 3 and chart.shape[-1] == X_DIM, f"chart must be (B, L, {X_DIM}), got {chart.shape}"
        assert chart.shape[1] % self.args.chunk_size == 0, (
            f"L={chart.shape[1]} must be a multiple of chunk_size={self.args.chunk_size}"
        )
        _, bottom = self.chart_encoder(self.chart_stem(chart))
        s = rms_norm(self.style_pool(self.style_stack(bottom)))
        z = rms_norm(self.temporal_proj(self.temporal_stack(bottom, s)))
        return z, s

    def encode_audio(self, spec: jnp.ndarray) -> tuple[list[jnp.ndarray], jnp.ndarray]:
        """(B, L, 72) -> (skips, h (B, L/27, H))"""
        assert spec.ndim == 3 and spec.shape[-1] == A_DIM, f"spec must be (B, L, {A_DIM}), got {spec.shape}"
        assert spec.shape[1] % self.args.chunk_size == 0, (
            f"L={spec.shape[1]} must be a multiple of chunk_size={self.args.chunk_size}"
        )
        return self.audio_unet(self.spec_stem(spec))

    def decode_logits(
        self,
        z: jnp.ndarray,
        s: jnp.ndarray,
        *,
        spec: Optional[jnp.ndarray] = None,
        skips: Optional[list[jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        if skips is None:
            assert spec is not None
            skips, _ = self.encode_audio(spec)
        x = self.decoder(skips, self.emb_proj(z), s)
        return self.head(x)

    def predict_labels(self, s: jnp.ndarray) -> jnp.ndarray:
        return self.label_mlp(s)

    def decode(
        self,
        z: jnp.ndarray,
        s: jnp.ndarray,
        *,
        spec: Optional[jnp.ndarray] = None,
        skips: Optional[list[jnp.ndarray]] = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """logits -> (chart signal with sigmoided hit channels, labels in [0,10])"""
        logits = self.decode_logits(z, s, spec=spec, skips=skips)
        chart = jnp.concatenate(
            [nn.sigmoid(logits[..., :HIT_DIM]), logits[..., HIT_DIM:]], axis=-1
        )
        labels = jnp.clip(self.predict_labels(s), 0.0, 10.0)
        return chart, labels

    def __call__(
        self, spec: jnp.ndarray, z: jnp.ndarray, s: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """training forward: (chart logits, label predictions)"""
        return self.decode_logits(z, s, spec=spec), self.predict_labels(s)

    def init_all(self, spec: jnp.ndarray, chart: jnp.ndarray):
        """initialization entry point touching every submodule (flax only
        creates parameters on paths the init function actually traces)"""
        z, s = self.encode_chart(chart)
        return self.decode_logits(z, s, spec=spec), self.predict_labels(s)
