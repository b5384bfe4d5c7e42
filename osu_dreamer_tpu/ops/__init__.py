"""Pallas TPU kernels for the hot ops."""

from .swiglu import fused_swiglu, swiglu_reference

__all__ = ["fused_swiglu", "swiglu_reference"]
