"""MAP slider-curve selection with branch-and-bound short-circuiting.

Parity with reference data/beatmap/slider/decode_slider.py: every candidate
curve is scored by ``sse / (2 * noise^2) - log P(family)`` (a MAP objective
with gaussian observation noise of 16 osu!px); since sse >= 0, a family's
prior penalty lower-bounds its cost, so candidate families are visited
cheapest-prior first and the search stops as soon as no remaining family can
beat the incumbent.
"""

from __future__ import annotations

import numpy as np

from .arc_fit import fit_arc
from .bezier_fit import fit_poly, fit_segment
from .prior import log_prior_arc, log_prior_poly, log_prior_single_bezier

# expected cursor noise in osu!px: larger trusts the prior more (simpler curves)
NOISE_SCALE_PX = 16.0
MAX_SINGLE_BEZIER_CTRL = 8
MAX_POLY_SEGMENTS = 16


def fit_slider(
    cursor_xy: np.ndarray,
    start_idx: int,
    end_idx: int,
    num_repeats: int,
    noise_scale: float = NOISE_SCALE_PX,
) -> tuple[str, float, list[np.ndarray]]:
    """fit the best slider curve to one slide of the cursor path.

    `cursor_xy` is the (2, L) cursor signal in osu!px; the slider spans frames
    [start_idx, end_idx] and traverses its path `num_repeats` times, so only
    the first slide's worth of frames is fitted.

    returns (curve type "P"|"B", pixel length, integer control points);
    length 0 signals a degenerate slider the caller should emit as a circle.
    """
    one_slide_end = round(start_idx + (end_idx - start_idx) / num_repeats)
    points = cursor_xy[:, start_idx : one_slide_end + 1].T  # (L, 2)
    if points.shape[0] < 2:
        return "B", 0.0, []

    inv_two_var = 1.0 / (2.0 * noise_scale**2)

    best_cost = np.inf
    # (type, curve list | precomputed (length, ctrl)) — lengths and integer
    # control points are only materialized for the winner: GL-quadrature
    # lengths + rounding across every candidate was ~40% of fitter time
    best_type = "B"
    best_curves: list = []
    best_final: tuple[float, list[np.ndarray]] | None = (0.0, [])

    def consider(cost: float, curve_type: str, curves: list) -> bool:
        nonlocal best_cost, best_type, best_curves, best_final
        # `not (cost < best)` rather than `cost >= best`: a NaN cost (NaN
        # cursor input) must never win, and must not poison the pruning
        if not (cost < best_cost):
            return False
        best_cost = cost
        best_type = curve_type
        best_curves = curves
        best_final = None
        return True

    # 1. perfect arc (length/ctrl come out of the fit itself — precomputed)
    arc = fit_arc(points)
    if arc is not None:
        sse, length, ctrl = arc
        if consider(sse * inv_two_var - log_prior_arc(), "P", []):
            best_final = (length, ctrl)

    # 2. single bezier, cheapest prior first (the prior is not monotonic in
    #    degree: the cubic spike beats the quadratic)
    candidates = sorted(
        (-log_prior_single_bezier(n), n)
        for n in range(2, min(MAX_SINGLE_BEZIER_CTRL, points.shape[0]) + 1)
    )
    for penalty, n_ctrl in candidates:
        if penalty >= best_cost:
            break  # all remaining single beziers pay at least this much
        curve, sse = fit_segment(points, n_ctrl)
        consider(sse * inv_two_var + penalty, "B", [curve])

    # 3. poly-line then poly-bezier, growing segment counts
    for n_ctrl, all_lines in ((2, True), (4, False)):
        if -log_prior_poly(2, all_lines) >= best_cost:
            continue  # even this family's cheapest member can't win
        for curves, sse in fit_poly(points, n_ctrl, MAX_POLY_SEGMENTS):
            m = len(curves)
            consider(
                sse * inv_two_var - log_prior_poly(m, all_lines),
                "B",
                list(curves),
            )
            if -log_prior_poly(m + 1, all_lines) >= best_cost:
                break  # the penalty only grows from here

    if best_final is None:
        length = float(sum(c.length for c in best_curves))
        # concatenated segments reproduce osu!'s repeated-point boundaries
        ctrl = [p.round().astype(int) for c in best_curves for p in c.pts]
        best_final = (length, ctrl)
    return best_type, best_final[0], best_final[1]
