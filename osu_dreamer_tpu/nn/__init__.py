"""JAX NN building blocks shared by all models.

Capability parity with reference L3 (``osu_dreamer/common/``): rms_norm,
SwiGLU conv-FFN, RoPE self-attention, random Fourier features, warmup/decay
LR schedule, WAE-MMD regularizer — plus the FiLM-gated residual stack and
attention pooling the reference keeps in its model files.

All blocks are channel-last (B, L, C): on TPU the channel dim maps onto the
128-wide lane dimension and 1x1 convs become plain MXU matmuls.
"""

from .norm import RMSNorm, rms_norm
from .blocks import FilmStack, SwiGLU, zeros_init
from .attention import RoPEAttention, rope
from .features import fourier_features
from .pool import AttnPool
from .schedule import LRScheduleArgs, make_lr_schedule
from .mmd import mmd_imq

__all__ = [
    "AttnPool",
    "FilmStack",
    "LRScheduleArgs",
    "RMSNorm",
    "RoPEAttention",
    "SwiGLU",
    "fourier_features",
    "make_lr_schedule",
    "mmd_imq",
    "rms_norm",
    "rope",
    "zeros_init",
]
