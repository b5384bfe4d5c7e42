"""Pallas TPU kernels for the hot ops."""

from .fused_attention import (
    fused_attention_fits,
    fused_norm_rope_attention,
    rope_attention_reference,
)
from .film_layer import film_layer_reference, fused_film_layer
from .ring_attention import ring_attention, sequence_parallel_attention
from .swiglu import fused_swiglu, swiglu_reference

__all__ = [
    "film_layer_reference",
    "fused_attention_fits",
    "fused_film_layer",
    "fused_norm_rope_attention",
    "fused_swiglu",
    "ring_attention",
    "rope_attention_reference",
    "sequence_parallel_attention",
    "swiglu_reference",
]
