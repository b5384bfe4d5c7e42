"""Star-rating calibration and property suite (VERDICT r1 item 4).

rosu-pp (the reference's SR source, osu/beatmap.py:67-75) is a Rust crate
that cannot run in this environment and no ranked `.osu` corpus ships with
the image, so direct golden comparison is impossible offline. What this
suite pins instead:

1. scale plausibility — constructed patterns matching well-understood osu!
   difficulty archetypes (slow Easy rhythm, steady Insane stream, spaced
   high-BPM jumps) must land in the star bands those archetypes occupy on
   the official scale. This catches the failure mode that matters for
   training: a systematically wrong scale silently changes what
   ``--diff 5 ...`` means.
2. monotonicity — SR must increase with BPM, with spacing, and with circle
   size (smaller circles), and be invariant to AR/OD/HP (which the classic
   model ignores by construction).
3. regression goldens — current outputs pinned to 3 decimals so algorithm
   edits are deliberate.
4. C++/python agreement — the native path must match the numpy fallback.

Residual risk (documented in osu/difficulty.py): the classic two-skill
model tracks rosu's *current* algorithm only approximately; re-validate
against rosu-pp on a real corpus when egress is available.
"""

import numpy as np
import pytest

from osu_dreamer_tpu.osu import Beatmap
from osu_dreamer_tpu.osu.difficulty import _star_rating_py, star_rating


def pattern_osu(
    n: int = 120,
    interval_ms: int = 150,
    spacing: float = 120.0,
    cs: float = 4.0,
    ar: float = 9.0,
    od: float = 8.0,
) -> str:
    """n circles in a horizontal zig-zag: constant rhythm, constant spacing"""
    objs = []
    t, x, y, direction = 1000, 100, 192, 1
    for i in range(n):
        objs.append(f"{int(x)},{int(y)},{t},{5 if i % 8 == 0 else 1},0,0:0:0:0:")
        t += interval_ms
        nx = x + direction * spacing
        if nx > 450 or nx < 60:
            direction *= -1
            nx = x + direction * spacing
        x = nx
    return (
        "osu file format v14\n\n[General]\nMode: 0\n\n"
        "[Metadata]\nTitle: P\nArtist: T\nCreator: c\nVersion: v\n\n"
        f"[Difficulty]\nHPDrainRate: 5\nCircleSize: {cs}\n"
        f"OverallDifficulty: {od}\nApproachRate: {ar}\n"
        "SliderMultiplier: 1.4\nSliderTickRate: 1\n\n"
        "[TimingPoints]\n0,500,4,2,0,60,1,0\n\n"
        "[HitObjects]\n" + "\n".join(objs) + "\n"
    )


def sr_of(**kw) -> float:
    return star_rating(Beatmap(pattern_osu(**kw)))


class TestScalePlausibility:
    """archetype patterns must land in their official-scale star bands"""

    def test_easy_rhythm(self):
        # ~75 BPM 1/1 taps, modest spacing, big circles: Easy territory
        sr = sr_of(interval_ms=800, spacing=80, cs=3)
        assert 0.3 <= sr <= 2.2, sr

    def test_normal_rhythm(self):
        # 140 BPM 1/2 (214 ms), small steps, big circles: Normal band
        sr = sr_of(interval_ms=214, spacing=60, cs=3)
        assert 1.5 <= sr <= 3.4, sr

    def test_insane_stream(self):
        # 180 BPM 1/4 stream (83 ms) of overlapping circles (50 raw px):
        # Insane-to-low-Expert band
        sr = sr_of(interval_ms=83, spacing=50, cs=4)
        assert 4.0 <= sr <= 6.3, sr

    def test_expert_jumps(self):
        # 200 BPM 1/2 (150 ms) full-screen-ish jumps: Expert band
        sr = sr_of(interval_ms=150, spacing=260, cs=4.2)
        assert 5.0 <= sr <= 8.0, sr


def slider_osu(n: int = 80, beat_ms: int = 428, length: float = 140.0,
               spacing: float = 100.0) -> str:
    """slider-heavy map: one 1-beat slider every two beats (Normal-style)"""
    objs = []
    t, x, d = 1000, 100, 1
    for _ in range(n):
        x2 = int(min(max(x + d * length, 20), 492))
        objs.append(f"{int(x)},192,{t},2,0,L|{x2}:192,1,{length}")
        t += beat_ms * 2
        x = x2 + d * spacing
        if x > 450 or x < 60:
            d *= -1
            x = max(60, min(450, x))
    head = pattern_osu(n=1).split("[HitObjects]")[0]
    return head + "[HitObjects]\n" + "\n".join(objs) + "\n"


def burst_osu(bursts: int = 40, bpm: int = 180) -> str:
    """9-note 1/4 bursts separated by 2-beat gaps (tech-map rhythm)"""
    q = int(60000 / bpm / 4)
    objs = []
    t, x, d = 1000, 100, 1
    for _ in range(bursts):
        for i in range(9):
            objs.append(f"{int(x)},192,{t},{5 if i == 0 else 1},0,0:0:0:0:")
            t += q
            x += d * 30
            if x > 450 or x < 60:
                d *= -1
        t += q * 8
    head = pattern_osu(n=1).split("[HitObjects]")[0]
    return head + "[HitObjects]\n" + "\n".join(objs) + "\n"


class TestWidenedArchetypes:
    """broader archetype coverage (VERDICT r2 item 7): slider-heavy, burst,
    and slow-jump patterns plus a length-invariance property. Real-corpus
    validation against rosu-pp still needs an egress host —
    benchmarks/sr_crossval.py is the one-command harness for it."""

    def test_slider_heavy_normal(self):
        # 140 BPM 1/1 sliders, modest spacing: Easy/Normal band
        sr = star_rating(Beatmap(slider_osu()))
        assert 0.8 <= sr <= 2.5, sr

    def test_burst_tech(self):
        # 180 BPM 9-note 1/4 bursts with breathing room: Hard/Insane band
        sr = star_rating(Beatmap(burst_osu()))
        assert 3.5 <= sr <= 5.5, sr

    def test_slow_jumps(self):
        # 90 BPM 1/2 (330 ms) wide jumps: Hard band
        sr = sr_of(n=150, interval_ms=330, spacing=260)
        assert 2.3 <= sr <= 4.5, sr

    def test_length_invariance(self):
        # the weighted-peaks sum saturates: tripling a map's length at the
        # same pattern must not materially raise its stars
        short = sr_of(n=200, interval_ms=100, spacing=110)
        long_ = sr_of(n=600, interval_ms=100, spacing=110)
        assert abs(long_ - short) < 0.25, (short, long_)

    def test_streams_denser_than_sliders(self):
        assert sr_of(n=200, interval_ms=83, spacing=50) > star_rating(
            Beatmap(slider_osu())
        )


class TestProperties:
    def test_monotone_in_bpm(self):
        srs = [sr_of(interval_ms=i) for i in (400, 250, 150, 100, 75)]
        assert all(a < b for a, b in zip(srs, srs[1:])), srs

    def test_monotone_in_spacing(self):
        srs = [sr_of(spacing=s) for s in (40, 90, 150, 220, 300)]
        assert all(a < b for a, b in zip(srs, srs[1:])), srs

    def test_smaller_circles_harder(self):
        assert sr_of(cs=6) > sr_of(cs=4) > sr_of(cs=2)

    def test_ar_od_invariant(self):
        # classic model reads positions/times/cs only
        assert sr_of(ar=4, od=3) == pytest.approx(sr_of(ar=10, od=10))

    def test_short_map_zero(self):
        assert sr_of(n=1) == 0.0


class TestRegressionGoldens:
    """pin current outputs: algorithm changes must be deliberate"""

    CASES = [
        dict(interval_ms=800, spacing=80, cs=3),
        dict(interval_ms=150, spacing=120, cs=4),
        dict(interval_ms=83, spacing=50, cs=4),
    ]

    def test_goldens(self):
        got = [round(sr_of(**kw), 3) for kw in self.CASES]
        expected = [0.861, 4.924, 5.524]
        np.testing.assert_allclose(got, expected, atol=2e-3)


def test_native_matches_python():
    from osu_dreamer_tpu import native

    if not native.available():
        pytest.skip("native extension not built")
    for kw in (dict(), dict(interval_ms=83, spacing=105), dict(spacing=260, cs=5)):
        bm = Beatmap(pattern_osu(**kw))
        assert star_rating(bm) == pytest.approx(_star_rating_py(bm), rel=1e-6)


def test_sub50ms_gaps_decay_by_raw_delta():
    """the classic model clamps only the strain-increment divisor at 50 ms;
    decay runs on the raw delta — stacked/burst patterns must accumulate
    MORE strain than the same pattern spaced at exactly 50 ms (previously
    both were clamped identically, underestimating dense maps)"""
    def pattern(interval_ms: float) -> str:
        hits = "\n".join(
            f"{100 + (i % 2) * 100},{192},{1000 + int(i * interval_ms)},1,0,0:0:0:0:"
            for i in range(200)
        )
        return (
            "osu file format v14\n\n[General]\nAudioFilename: a.mp3\nMode: 0\n\n"
            "[Metadata]\nTitle: t\nArtist: a\nCreator: c\nVersion: v\n\n"
            "[Difficulty]\nHPDrainRate: 5\nCircleSize: 4\nOverallDifficulty: 5\n"
            "ApproachRate: 5\nSliderMultiplier: 1\nSliderTickRate: 1\n\n"
            "[TimingPoints]\n1000,500,4,0,0,50,1,0\n\n[HitObjects]\n" + hits
        )

    sr_dense = star_rating(Beatmap(pattern(20.0)))
    sr_50 = star_rating(Beatmap(pattern(50.0)))
    assert sr_dense > sr_50, (sr_dense, sr_50)
    # py and native must agree on the changed path
    bm = Beatmap(pattern(20.0))
    assert abs(star_rating(bm) - _star_rating_py(bm)) < 1e-6


class TestRealisticFixtures:
    """frozen hand-designed .osu fixtures (tests/fixtures/) with expected
    official-scale star bands — pins the SR calibration tighter than the
    synthetic archetypes (VERDICT r3 item 10; widened to 6 maps spanning
    ~1-7 stars in round 5). Patterns: a sparse 90 BPM 1/1 Easy; a format-v7
    112 BPM Normal with NO ApproachRate line (the old-style AR←OD parser
    path); a CS 6.5 tiny-circle 160 BPM Hard; a 180 BPM 1/2-jump +
    1/4-triple Insane; a 200 BPM stream/jump-alternating Expert; a 200 BPM
    cross-screen-jump + 9-note-stream Extra. Bands are generous enough to
    absorb classic-model drift but tight enough that a scale regression
    (e.g. a broken strain decay or distance weight) trips them; ordering
    across all six is asserted strictly."""

    FIXTURES = {
        # name -> (lo, hi) expected star band
        "gentle-easy.osu": (0.6, 2.0),
        "oldstyle-normal.osu": (1.0, 2.6),
        "highcs-hard.osu": (3.0, 4.8),
        "standard-insane.osu": (3.8, 5.8),
        "stream-expert.osu": (5.0, 6.8),
        "jump-extra.osu": (5.8, 8.2),
    }

    ORDER = [
        "gentle-easy.osu",
        "oldstyle-normal.osu",
        "highcs-hard.osu",
        "standard-insane.osu",
        "stream-expert.osu",
        "jump-extra.osu",
    ]

    def _sr(self, name):
        from pathlib import Path

        p = Path(__file__).parent / "fixtures" / name
        return star_rating(Beatmap(p.read_text()))

    @pytest.mark.parametrize("name", sorted(FIXTURES))
    def test_band(self, name):
        lo, hi = self.FIXTURES[name]
        sr = self._sr(name)
        assert lo <= sr <= hi, f"{name}: SR {sr:.2f} outside [{lo}, {hi}]"

    def test_ordering(self):
        srs = [self._sr(n) for n in self.ORDER]
        assert all(a < b for a, b in zip(srs, srs[1:])), dict(zip(self.ORDER, srs))

    def test_oldstyle_ar_falls_back_to_od(self):
        from pathlib import Path

        p = Path(__file__).parent / "fixtures" / "oldstyle-normal.osu"
        text = p.read_text()
        assert "ApproachRate" not in text
        bm = Beatmap(text)
        assert bm.ar == bm.od == 5.0

    def test_native_matches_python_on_fixtures(self):
        from pathlib import Path

        from osu_dreamer_tpu import native

        if not native.available():
            pytest.skip("native library not built")
        for name in self.FIXTURES:
            p = Path(__file__).parent / "fixtures" / name
            bm = Beatmap(p.read_text())
            py = _star_rating_py(bm)
            nat = star_rating(bm)
            assert abs(py - nat) < 1e-6, (name, py, nat)
