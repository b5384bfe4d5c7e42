"""Signal codec: hit/cursor encode + decode, disk format, full round-trip."""

import io

import numpy as np
import pytest

from osu_dreamer_tpu.audio import get_frame_times
from osu_dreamer_tpu.osu import Beatmap, Circle, Slider, Spinner
from osu_dreamer_tpu.signal import (
    Channel,
    HitChannels,
    MapMetadata,
    X_DIM,
    cursor_signal,
    decode_beatmap,
    decode_hit_signal,
    get_labels,
    hit_signal,
    read_beatmap,
    write_beatmap,
)
from osu_dreamer_tpu.signal.hits import (
    decode_events,
    decode_extents,
    events_signal,
    extents_signal,
)
from osu_dreamer_tpu.signal.timing import timing_signal


@pytest.fixture
def bm(sample_osu_text):
    return Beatmap(sample_osu_text)


@pytest.fixture
def frame_times(bm):
    end = max(o.end_time() for o in bm.hit_objects) + 1000
    from osu_dreamer_tpu.audio import get_frame_for_time

    return get_frame_times(get_frame_for_time(end))


class TestEvents:
    def test_bump_peaks_at_event(self):
        ft = get_frame_times(400)
        sig = events_signal([600.0], ft)
        peak = np.argmax(sig)
        assert abs(ft[peak] - 600.0) < 6.0
        assert sig[peak] > 0.9

    def test_windowing_matches_dense_computation(self):
        ft = get_frame_times(600)
        ts = [100.0, 115.0, 2000.0, 3500.0]
        sig = events_signal(ts, ft)
        dense = np.exp(
            -0.5 / 100.0 * (np.asarray(ts)[None] - ft[:, None]) ** 2
        ).max(axis=1)
        # identical wherever the dense value survives uint8 quantization
        mask = dense > 1.0 / 510
        np.testing.assert_allclose(sig[mask], dense[mask], atol=1e-12)

    def test_decode_events_roundtrip(self):
        ft = get_frame_times(500)
        ts = [250.0, 800.0, 1400.0, 2500.0]
        found = decode_events(events_signal(ts, ft))
        assert len(found) == len(ts)
        for t, fi in zip(ts, found):
            assert abs(ft[fi] - t) < 6.0

    def test_empty(self):
        ft = get_frame_times(100)
        assert events_signal([], ft).sum() == 0.0


class TestExtents:
    def test_mask_and_roundtrip(self):
        ft = get_frame_times(500)
        regions = [(100.0, 400.0), (1000.0, 1800.0)]
        sig = extents_signal(regions, ft)
        assert set(np.unique(sig)) <= {0.0, 1.0}
        starts, ends = decode_extents(sig)
        assert len(starts) == 2
        for (s, e), (s_exp, e_exp) in zip(zip(starts, ends), regions):
            assert abs(ft[s] - s_exp) < 12.0
            assert abs(ft[e] - e_exp) < 12.0

    def test_signal_starting_high(self):
        sig = np.array([1.0, 1.0, 0.0, 0.0, 1.0, 1.0, 0.0])
        starts, ends = decode_extents(sig)
        # leading high region has no rising edge; only the second is paired
        assert starts == [3] and ends == [5]

    def test_unterminated_extent_dropped(self):
        sig = np.array([0.0, 1.0, 1.0, 1.0])
        starts, ends = decode_extents(sig)
        assert starts == [] and ends == []


class TestHitSignal:
    def test_shape_and_channels(self, bm, frame_times):
        sig = hit_signal(bm, frame_times)
        assert sig.shape == (7, len(frame_times))
        assert sig.min() >= 0 and sig.max() <= 1

    def test_decode_recovers_objects(self, bm, frame_times):
        sig = hit_signal(bm, frame_times)
        hits = decode_hit_signal(sig)
        assert len(hits) == len(bm.hit_objects)

        for hit, obj in zip(hits, bm.hit_objects):
            onset_frame = hit[0]
            assert abs(frame_times[onset_frame] - obj.t) < 6.0
            assert hit[1] == obj.new_combo
            assert hit[2] == obj.whistle
            assert hit[3] == obj.finish
            assert hit[4] == obj.clap
            if isinstance(obj, Spinner):
                assert len(hit) == 7 and hit[6] == 0
            elif isinstance(obj, Slider):
                assert len(hit) == 7 and hit[6] == obj.slides
            else:
                assert len(hit) == 5


class TestCursorSignal:
    def test_shape_and_range(self, bm, frame_times):
        sig = cursor_signal(bm, frame_times)
        assert sig.shape == (2, len(frame_times))
        assert sig.min() >= -0.01 and sig.max() <= 1.01

    def test_rest_position_after_map(self, bm, frame_times):
        sig = cursor_signal(bm, frame_times)
        last_obj = bm.hit_objects[-1]
        end_xy = last_obj.end_pos() / np.array([512.0, 384.0])
        np.testing.assert_allclose(sig[:, -1], end_xy, atol=1e-6)

    def test_spinner_pinned_to_center(self, bm, frame_times):
        spinner = next(o for o in bm.hit_objects if isinstance(o, Spinner))
        mid_t = (spinner.t + spinner.end_time()) / 2
        fi = int(np.searchsorted(frame_times, mid_t))
        sig = cursor_signal(bm, frame_times)
        np.testing.assert_allclose(sig[:, fi], [0.5, 0.5], atol=1e-6)

    def test_slider_follow_reflects(self):
        # 2-slide slider: cursor must return to the start
        text = (
            "[Difficulty]\nApproachRate: 9\nSliderMultiplier: 1\n\n"
            "[TimingPoints]\n0,1000,4,2,0,60,1,0\n\n"
            "[HitObjects]\n100,100,1000,2,0,L|300:100,2,200\n"
        )
        bm = Beatmap(text)
        slider = bm.hit_objects[0]
        ft = get_frame_times(1200)
        sig = cursor_signal(bm, ft) * np.array([[512.0], [384.0]])
        mid_fi = int(np.searchsorted(ft, slider.t + slider.slide_duration))
        end_fi = int(np.searchsorted(ft, slider.end_time())) - 1
        np.testing.assert_allclose(sig[:, mid_fi], [300, 100], atol=8)
        np.testing.assert_allclose(sig[:, end_fi], [100, 100], atol=8)


class TestTimingSignal:
    def test_phases(self, bm, frame_times):
        sig = timing_signal(bm, frame_times)
        assert sig.shape == (2, len(frame_times))
        assert (sig >= 0).all() and (sig < 1).all()


class TestDiskFormat:
    def test_roundtrip(self, bm, frame_times):
        buf = io.BytesIO()
        write_beatmap(buf, bm, frame_times)
        buf.seek(0)
        enc, labels = read_beatmap(buf)
        assert enc.shape == (X_DIM, len(frame_times))
        np.testing.assert_allclose(labels, get_labels(bm))

        direct = np.concatenate([hit_signal(bm, frame_times), cursor_signal(bm, frame_times)])
        assert np.abs(enc[:7] - direct[:7]).max() < 1.0 / 255
        assert np.abs(enc[7:] - direct[7:]).max() < 1e-3


class TestFullRoundTrip:
    def test_encode_decode_reparse(self, bm, frame_times):
        """beatmap -> signals -> .osu text -> reparse: object count, kinds,
        times, and hit sounds survive the round trip"""
        enc = np.concatenate([hit_signal(bm, frame_times), cursor_signal(bm, frame_times)])
        text = decode_beatmap(
            MapMetadata("a.mp3", "T", "A"), get_labels(bm), enc
        )
        rec = Beatmap(text)

        assert len(rec.hit_objects) == len(bm.hit_objects)
        for orig, back in zip(bm.hit_objects, rec.hit_objects):
            assert abs(orig.t - back.t) < 12
            assert orig.whistle == back.whistle
            assert orig.finish == back.finish
            assert orig.clap == back.clap
            if isinstance(orig, Spinner):
                assert isinstance(back, Spinner)
                assert abs(orig.end_time() - back.end_time()) < 12
            elif isinstance(orig, Slider):
                assert isinstance(back, Slider)
                assert back.slides == orig.slides
                assert abs(orig.end_time() - back.end_time()) < 30
                # recovered path endpoints near the original's
                np.testing.assert_allclose(
                    back.start_pos(), orig.start_pos(), atol=12
                )
            else:
                assert isinstance(back, Circle)
                np.testing.assert_allclose(back.start_pos(), orig.start_pos(), atol=6)


class TestSliderFitter:
    def test_cached_projector_matches_direct_lstsq(self):
        """the (span length, degree, pin pattern)-keyed projector cache must
        reproduce a from-scratch least-squares solve for every pin pattern"""
        from osu_dreamer_tpu.signal.fit.bezier_fit import (
            _fit_segment_resid,
            bernstein_basis,
        )

        rng = np.random.default_rng(7)
        for L in (5, 23, 80):
            points = rng.uniform(0, 400, (L, 2))
            for n_ctrl in (2, 3, min(5, L), min(8, L)):
                for pin_start in (False, True):
                    for pin_end in (False, True):
                        curve, resid = _fit_segment_resid(
                            points, n_ctrl, pin_start, pin_end
                        )
                        T = bernstein_basis(np.linspace(0, 1, L), n_ctrl)
                        ctrl = np.zeros((n_ctrl, 2))
                        free = np.ones(n_ctrl, bool)
                        if pin_start:
                            free[0] = False
                            ctrl[0] = points[0]
                        if pin_end:
                            free[-1] = False
                            ctrl[-1] = points[-1]
                        rhs = points - T[:, ~free] @ ctrl[~free]
                        sol, *_ = np.linalg.lstsq(T[:, free], rhs, rcond=None)
                        ctrl[free] = sol
                        np.testing.assert_allclose(curve.pts, ctrl, atol=1e-8)
                        np.testing.assert_allclose(
                            resid, T @ ctrl - points, atol=1e-8
                        )
                        if pin_start:
                            np.testing.assert_allclose(curve.pts[0], points[0])
                        if pin_end:
                            np.testing.assert_allclose(curve.pts[-1], points[-1])

    def test_winner_finalization(self):
        """fit_slider materializes length/control points only for the winning
        candidate — check the returned values are consistent for a clean arc
        and a clean cubic (the two family branches)"""
        from osu_dreamer_tpu.osu.paths import BezierPath
        from osu_dreamer_tpu.signal.fit import fit_slider

        # clean circular arc -> P type, length ~= R * sweep
        theta = np.linspace(0.3, 2.1, 60)
        arc = np.stack([250 + 120 * np.cos(theta), 200 + 120 * np.sin(theta)])
        ctype, length, ctrl = fit_slider(arc, 0, arc.shape[1] - 1, 1)
        assert ctype == "P"
        assert length == pytest.approx(120 * (2.1 - 0.3), rel=0.02)
        assert len(ctrl) == 3

        # clean S-shaped cubic -> B type, length matches the fitted curve's
        pts = np.array([[50.0, 50.0], [150, 300], [350, -100], [450, 150]])
        path = BezierPath(pts)
        t = np.linspace(0, 1, 80)
        cubic = path.at(t).T
        ctype, length, ctrl = fit_slider(cubic, 0, cubic.shape[1] - 1, 1)
        assert ctype == "B"
        assert length == pytest.approx(path.length, rel=0.02)
        fitted = np.asarray(ctrl, float)
        np.testing.assert_allclose(fitted[0], pts[0], atol=3)
        np.testing.assert_allclose(fitted[-1], pts[-1], atol=3)


class TestSerializerDegenerateInputs:
    """an untrained or saturated model must still produce a writable .osu"""

    def _decode(self, sig):
        from osu_dreamer_tpu.signal.serialize import MapMetadata

        meta = MapMetadata(**{f: "t" for f in MapMetadata.__dataclass_fields__})
        return decode_beatmap(meta, np.array([3.0, 9, 8, 4, 5]), sig)

    def _objects(self, text):
        return [l for l in text.split("[HitObjects]")[1].strip().splitlines() if l]

    def test_zero_signal(self):
        text = self._decode(np.zeros((9, 500), np.float32))
        assert self._objects(text) == []
        assert "[TimingPoints]" in text

    def test_saturated_signal(self):
        sig = np.full((9, 500), 0.99, np.float32)
        sig[7:] = 0.5
        text = self._decode(sig)  # no local maxima -> no onsets, no crash
        assert self._objects(text) == []

    def test_tiny_signal(self):
        assert self._decode(np.zeros((9, 10), np.float32))


class TestSerializerFuzz:
    """randomized signals through every serializer mode: the output must
    always be writable and, when objects exist, reparseable — snapping
    guarantees monotonic starts regardless of input"""

    @pytest.mark.parametrize("mode", [
        {}, {"infer_tempo": True}, {"snap_divisor": 4}, {"snap_divisor": 1},
    ])
    def test_random_signals_always_serialize(self, mode):
        from osu_dreamer_tpu.signal.serialize import MapMetadata

        meta = MapMetadata(**{f: "t" for f in MapMetadata.__dataclass_fields__})
        labels = np.array([3.0, 9, 8, 4, 5])
        for seed in range(12):
            rng = np.random.default_rng(seed)
            # up to ~70 s: long enough that tempo inference SEGMENTS the
            # song (>= 2 analysis windows), exercising multi-grid snapping
            L = int(rng.integers(50, 12000))
            sig = rng.random((9, L), np.float32)
            # shape the channels like a (bad) model: smooth-ish bumps
            k = np.ones(3) / 3
            for c in range(7):
                sig[c] = np.convolve(sig[c] ** 3, k, mode="same")
            text = decode_beatmap(meta, labels, sig, **mode)
            lines = [
                l for l in text.split("[HitObjects]")[1].strip().splitlines() if l
            ]
            if not lines:
                continue
            if mode.get("snap_divisor"):
                # snapped outputs must reparse: monotonic, ends after starts
                Beatmap(text)
            ts = [int(l.split(",")[2]) for l in lines]
            if mode.get("snap_divisor"):
                assert all(b > a for a, b in zip(ts, ts[1:])), (mode, seed)
            else:
                assert all(b >= a for a, b in zip(ts, ts[1:])), (mode, seed)


class TestDecodeEdgeCases:
    """regressions from review: flag attribution in dense streams, slide
    extents longer than their sustain, zero-declared-length sliders"""

    def _enc(self, L, onset_ms, ft, chan_events):
        from osu_dreamer_tpu.signal.hits import events_signal

        sig = np.zeros((7, L), np.float32)
        sig[0] = events_signal(onset_ms, ft)
        for ch, ts in chan_events.items():
            sig[ch] = events_signal(ts, ft)
        return sig

    def test_flag_attaches_to_nearest_onset(self):
        """two onsets 2 frames apart: a whistle peak exactly on the FIRST
        onset's frame must attach to it, not be overwritten by the second
        onset's tolerance window"""
        from osu_dreamer_tpu.audio import get_frame_times
        from osu_dreamer_tpu.signal.encoding import Channel
        from osu_dreamer_tpu.signal.hits import decode_hit_signal

        L = 120
        ft = get_frame_times(L)
        t0, t1 = float(ft[50]), float(ft[52])
        sig = self._enc(L, [t0, t1], ft, {Channel.WHISTLE: [t0]})
        hits = decode_hit_signal(sig)
        assert len(hits) == 2
        (o0, _, w0, *_), (o1, _, w1, *_) = hits
        assert w0 and not w1, hits

    def test_long_slide_extent_stays_slider(self):
        """slide extent > 2x sustain (independent model channels) must not
        round num_slides to 0 and morph the hold into a spinner"""
        from osu_dreamer_tpu.audio import get_frame_times
        from osu_dreamer_tpu.signal.encoding import Channel
        from osu_dreamer_tpu.signal.hits import decode_hit_signal, extents_signal

        L = 200
        ft = get_frame_times(L)
        t0 = float(ft[20])
        sig = self._enc(L, [t0], ft, {})
        sig[Channel.SUSTAIN] = extents_signal([(t0, float(ft[30]))], ft)
        sig[Channel.SLIDE] = extents_signal([(t0, float(ft[60]))], ft)
        hits = decode_hit_signal(sig)
        assert len(hits) == 1 and len(hits[0]) == 7
        *_, num_slides = hits[0]
        assert num_slides >= 1, hits

    def test_zero_declared_length_slider_has_duration(self):
        from osu_dreamer_tpu.osu.paths import slider_from_control_points

        s = slider_from_control_points(
            1000, 500.0, 1.0, False, 0, 1, 0.0,
            [np.array([0.0, 0.0]), np.array([100.0, 0.0])],
        )
        assert s.slide_duration > 0
        assert s.end_time() > 1000
        # vel_at must not divide by zero
        v = s.vel_at(np.array([0.5]))
        assert np.isfinite(v).all()
