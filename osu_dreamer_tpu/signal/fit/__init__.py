"""Slider curve fitting: reconstruct editable slider control points from a
dense predicted cursor path.

Parity with reference data/beatmap/slider/: MAP model selection over slider
families (decode_slider.py), constrained Bernstein least squares
(fit_bezier.py), Kasa circle fit with renderability gates (fit_arc.py), and
the empirical family prior (slider_prior.py).
"""

from .select import fit_slider

__all__ = ["fit_slider"]
