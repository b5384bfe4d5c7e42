"""osu! domain layer: parser, timing points, slider geometry."""

import numpy as np
import pytest

from osu_dreamer_tpu.osu import Beatmap, BeatmapParseError, Circle, Spinner
from osu_dreamer_tpu.osu.paths import (
    ArcSlider,
    BezierPath,
    LineSlider,
    MultiBezierSlider,
    slider_from_control_points,
)


def make_slider(ctrl_pts, length=0.0, slides=1, t=0, beat_length=500.0, mult=1.0):
    pts = [np.array(p, dtype=float) for p in ctrl_pts]
    return slider_from_control_points(t, beat_length, mult, False, 0, slides, length, pts)


class TestParser:
    def test_metadata_and_difficulty(self, sample_osu_text):
        bm = Beatmap(sample_osu_text)
        assert bm.title == "Test Song"
        assert bm.artist == "Test Artist"
        assert bm.version == "Insane"
        assert bm.mode == 0
        assert (bm.hp, bm.cs, bm.od, bm.ar) == (6.0, 4.0, 8.0, 9.0)
        assert bm.slider_mult == 1.8
        assert bm.beat_divisor == 4

    def test_ar_falls_back_to_od(self):
        text = (
            "[Difficulty]\nOverallDifficulty: 7\n\n"
            "[TimingPoints]\n0,500,4,2,0,60,1,0\n\n"
            "[HitObjects]\n0,0,100,1,0,\n"
        )
        bm = Beatmap(text)
        assert bm.ar == bm.od == 7.0

    def test_breaks(self, sample_osu_text):
        bm = Beatmap(sample_osu_text)
        assert len(bm.breaks) == 1
        assert (bm.breaks[0].t, bm.breaks[0].u) == (20000, 24000)

    def test_timing_points_inherited(self, sample_osu_text):
        bm = Beatmap(sample_osu_text)
        assert len(bm.timing_points) == 2
        first, second = bm.timing_points
        assert first.beat_length == 500.0 and first.slider_mult == 1.0
        # -50 => slider velocity multiplier 2.0
        assert second.beat_length == 500.0 and second.slider_mult == 2.0

    def test_slider_mult_clamped(self):
        text = (
            "[TimingPoints]\n0,500,4,2,0,60,1,0\n100,-1,4,2,0,60,0,0\n\n"
            "[HitObjects]\n0,0,100,1,0,\n"
        )
        bm = Beatmap(text)
        assert bm.timing_points[-1].slider_mult == 10.0

    def test_inherited_before_uninherited_skipped(self):
        text = (
            "[TimingPoints]\n0,-50,4,2,0,60,0,0\n100,500,4,2,0,60,1,0\n\n"
            "[HitObjects]\n0,0,100,1,0,\n"
        )
        bm = Beatmap(text)
        assert len(bm.timing_points) == 1
        assert bm.timing_points[0].beat_length == 500.0

    def test_timing_point_at(self, sample_osu_text):
        bm = Beatmap(sample_osu_text)
        assert bm.timing_point_at(0) is None
        assert bm.timing_point_at(1000).slider_mult == 1.0
        assert bm.timing_point_at(9500).slider_mult == 2.0

    def test_hit_objects(self, sample_osu_text):
        bm = Beatmap(sample_osu_text)
        kinds = [type(o).__name__ for o in bm.hit_objects]
        assert kinds == [
            "Circle", "Circle", "Circle", "Spinner",
            "LineSlider", "ArcSlider", "MultiBezierSlider",
        ]
        assert bm.hit_objects[0].new_combo
        assert bm.hit_objects[1].whistle and not bm.hit_objects[1].clap
        assert bm.hit_objects[2].clap

    def test_monotonicity_enforced(self):
        text = (
            "[TimingPoints]\n0,500,4,2,0,60,1,0\n\n"
            "[HitObjects]\n0,0,1000,12,0,5000,\n0,0,2000,1,0,\n"
        )
        with pytest.raises(BeatmapParseError):
            Beatmap(text)

    def test_no_hit_objects_raises(self):
        with pytest.raises(BeatmapParseError):
            Beatmap("[TimingPoints]\n0,500,4,2,0,60,1,0\n\n[HitObjects]\n")

    def test_nan_timing_point_raises(self):
        with pytest.raises(BeatmapParseError):
            Beatmap("[TimingPoints]\n0,nan,4,2,0,60,1,0\n\n[HitObjects]\n0,0,100,1,0,\n")

    def test_star_rating_sane(self, sample_osu_text):
        bm = Beatmap(sample_osu_text)
        assert 0.0 < bm.sr < 12.0


class TestBezierPath:
    def test_line_length(self):
        c = BezierPath(np.array([[0.0, 0.0], [3.0, 4.0]]))
        assert abs(c.length - 5.0) < 1e-9

    def test_quadratic_endpoints(self):
        c = BezierPath(np.array([[0.0, 0.0], [1.0, 2.0], [2.0, 0.0]]))
        ends = c.at(np.array([0.0, 0.5, 1.0]))
        np.testing.assert_allclose(ends[0], [0, 0])
        np.testing.assert_allclose(ends[1], [1.0, 1.0])  # midpoint of quadratic
        np.testing.assert_allclose(ends[2], [2, 0])

    def test_high_degree_stable(self):
        pts = np.random.default_rng(1).normal(size=(40, 2)) * 100
        c = BezierPath(pts)
        vals = c.at(np.linspace(0, 1, 17))
        assert np.isfinite(vals).all()
        np.testing.assert_allclose(vals[0], pts[0], atol=1e-8)
        np.testing.assert_allclose(vals[-1], pts[-1], atol=1e-8)

    def test_split_preserves_curve(self):
        pts = np.array([[0.0, 0.0], [50.0, 100.0], [100.0, -20.0], [150.0, 30.0]])
        c = BezierPath(pts)
        left, right = c.split(0.3)
        np.testing.assert_allclose(left.at(np.array([1.0]))[0], c.at(np.array([0.3]))[0])
        np.testing.assert_allclose(right.at(np.array([0.0]))[0], c.at(np.array([0.3]))[0])
        np.testing.assert_allclose(
            left.at(np.array([0.5]))[0], c.at(np.array([0.15]))[0], atol=1e-9
        )
        np.testing.assert_allclose(
            right.at(np.array([0.5]))[0], c.at(np.array([0.65]))[0], atol=1e-9
        )
        # Gauss-Legendre quadrature accuracy differs between the whole curve
        # and its halves; they agree to well under a hundredth of a pixel
        assert abs(left.length + right.length - c.length) < 1e-2


class TestSliderDispatch:
    def test_two_points_line(self):
        s = make_slider([[0, 0], [100, 0]], length=50)
        assert isinstance(s, LineSlider)
        # declared length reparameterizes the endpoint
        np.testing.assert_allclose(s.pos_at(np.array([1.0]))[0], [50, 0])
        assert s.length == 50

    def test_line_length_computed_when_zero(self):
        s = make_slider([[0, 0], [30, 40]], length=0)
        assert s.length == 50.0

    def test_three_collinear_monotone_is_line(self):
        s = make_slider([[0, 0], [50, 0], [100, 0]], length=100)
        assert isinstance(s, LineSlider)

    def test_three_collinear_backtrack_is_bezier(self):
        s = make_slider([[0, 0], [100, 0], [50, 0]], length=100)
        assert isinstance(s, MultiBezierSlider)

    def test_three_repeated_end_is_line(self):
        s = make_slider([[0, 0], [100, 50], [100, 50]], length=0)
        assert isinstance(s, LineSlider)

    def test_perfect_arc(self):
        # points on a circle of radius 100 centered at origin
        s = make_slider([[100, 0], [0, 100], [-100, 0]], length=0)
        assert isinstance(s, ArcSlider)
        assert abs(s.radius - 100.0) < 1e-6
        np.testing.assert_allclose(s.center, [0, 0], atol=1e-6)
        # half-circle length
        assert abs(s.length - np.pi * 100) < 1e-6
        mid = s.pos_at(np.array([0.5]))[0]
        np.testing.assert_allclose(mid, [0, 100], atol=1e-6)

    def test_huge_radius_backtrack_is_bezier(self):
        # nearly-collinear with a backtrack: circumradius blows up
        s = make_slider([[0, 0], [500, 1], [10, 0]], length=0)
        assert isinstance(s, MultiBezierSlider)

    def test_four_points_bezier(self):
        s = make_slider([[0, 0], [50, 100], [100, 100], [150, 0]], length=0)
        assert isinstance(s, MultiBezierSlider)
        assert len(s.segments) == 1

    def test_repeated_point_splits_segments(self):
        s = make_slider([[0, 0], [100, 0], [100, 0], [100, 100]], length=0)
        assert isinstance(s, MultiBezierSlider)
        assert len(s.segments) == 2

    def test_bezier_extend_when_longer(self):
        # geometric length 100, declared 200 -> extended in a straight line
        s = make_slider([[0, 0], [50, 0], [100, 0], [100, 0], [100, 1]], length=200)
        assert isinstance(s, MultiBezierSlider)
        end = s.pos_at(np.array([1.0]))[0]
        assert abs(np.linalg.norm(end - np.array([100, 1])) - (200 - 101)) < 2.0

    def test_bezier_truncate_when_shorter(self):
        s = make_slider([[0, 0], [100, 0], [100, 0], [200, 0]], length=150)
        end = s.pos_at(np.array([1.0]))[0]
        np.testing.assert_allclose(end, [150, 0], atol=1e-6)

    def test_slide_duration_and_end_time(self):
        s = make_slider([[0, 0], [100, 0]], length=100, slides=2, beat_length=500, mult=1.0)
        # 100px / (1.0 * 100) * 500ms = 500ms per slide
        assert s.slide_duration == 500.0
        assert s.end_time() == 1000
        np.testing.assert_allclose(s.end_pos(), [0, 0])  # even slides end at start

    def test_velocity_line(self):
        s = make_slider([[0, 0], [100, 0]], length=100, beat_length=1000)
        v = s.vel_at(np.array([0.3]))[0]
        np.testing.assert_allclose(v, [0.1, 0.0])  # 100px over 1000ms


class TestEvents:
    def test_circle(self):
        c = Circle(100, True, 0b1110, 10, 20)
        assert c.end_time() == 100
        assert c.whistle and c.finish and c.clap
        np.testing.assert_allclose(c.start_pos(), [10, 20])

    def test_spinner(self):
        s = Spinner(100, False, 0, 900)
        assert s.end_time() == 900
        np.testing.assert_allclose(s.start_pos(), [256, 192])
