"""Pallas TPU kernels for the hot ops."""

from .ring_attention import ring_attention, sequence_parallel_attention
from .swiglu import fused_swiglu, swiglu_reference

__all__ = [
    "fused_swiglu",
    "ring_attention",
    "sequence_parallel_attention",
    "swiglu_reference",
]
