"""C++ native runtime: parity with the pure-python paths."""

import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


@pytest.fixture(scope="module")
def native():
    from osu_dreamer_tpu import native as native_mod

    if not native_mod.available():
        rc = subprocess.run(["make", "-C", str(REPO / "native")], capture_output=True)
        if rc.returncode != 0 or not native_mod.available():
            pytest.skip("native library not buildable")
    return native_mod


class TestWavDecode:
    def test_matches_python_parser(self, native, tmp_path, rng):
        from osu_dreamer_tpu.audio.decode import _decode_wav

        wave = (np.tanh(rng.normal(size=(4096, 2))) * 0.8).astype(np.float32)
        payload = (wave.reshape(-1) * 32767).astype("<i2").tobytes()
        path = tmp_path / "t.wav"
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 4, 4, 16))
            f.write(b"data" + struct.pack("<I", len(payload)) + payload)

        got, rate = native.wav_decode(path.read_bytes())
        exp, exp_rate = _decode_wav(path)
        assert rate == exp_rate == 44100
        np.testing.assert_allclose(got, exp, atol=1e-6)


class TestResample:
    def test_tone_preserved(self, native):
        rate_in, rate_out = 44100, 16384
        t = np.arange(rate_in) / rate_in
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        out = native.resample(tone, rate_in, rate_out)
        assert abs(len(out) - rate_out) <= 1
        spec = np.abs(np.fft.rfft(out[1000:-1000] * np.hanning(len(out) - 2000)))
        peak_hz = np.argmax(spec) * rate_out / (len(out) - 2000)
        assert abs(peak_hz - 440) < 4
        # amplitude preserved within a couple dB
        assert 0.8 < np.abs(out[1000:-1000]).max() < 1.2

    def test_identity(self, native, rng):
        w = rng.normal(size=1000).astype(np.float32)
        np.testing.assert_array_equal(native.resample(w, 16384, 16384), w)


class TestResonate:
    def test_matches_python_iir(self, native, rng):
        from osu_dreamer_tpu.audio.constants import HOP_LEN, SR, resonator_freqs
        from osu_dreamer_tpu.audio.spectrogram import (
            resonator_alphas,
            resonate_reference,
        )

        wave = rng.normal(size=HOP_LEN * 13).astype(np.float32)
        freqs = resonator_freqs()
        got = native.resonate(wave, freqs, resonator_alphas(freqs), HOP_LEN, SR)
        exp = resonate_reference(wave)
        np.testing.assert_allclose(got.real, exp.real, atol=1e-5)
        np.testing.assert_allclose(got.imag, exp.imag, atol=1e-5)


class TestStarRating:
    def test_matches_python(self, native, sample_osu_text):
        from osu_dreamer_tpu.osu import Beatmap
        from osu_dreamer_tpu.osu.difficulty import _star_rating_py

        bm = Beatmap(sample_osu_text)
        native_sr = bm.sr  # dispatches to native when available
        py_sr = _star_rating_py(bm)
        assert abs(native_sr - py_sr) < 1e-6


class TestExtensibleWavNative:
    def test_extensible_float32_via_subformat_guid(self, native, rng):
        """the NATIVE decoder must read the SubFormat GUID too — the Python
        fallback was fixed first and load_wave PREFERS the native path, so a
        native-only regression would silently feed noise to the featurizer"""
        wave = np.tanh(rng.normal(size=4096)).astype(np.float32) * 0.8
        payload = wave.tobytes()
        guid = struct.pack("<H", 3) + b"\x00\x00" + bytes(12)
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16384, 16384 * 4, 4, 32)
        fmt += struct.pack("<HHI", 22, 32, 4) + guid
        data = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        got, rate = native.wav_decode(data)
        assert rate == 16384
        np.testing.assert_allclose(np.asarray(got).reshape(-1), wave, atol=1e-6)

    def test_sub_byte_depth_rejected_not_sigfpe(self, native):
        """4-bit ADPCM-style depths previously divided by ZERO bytes-per-
        frame (integer math) -> SIGFPE killing the process; must error"""
        fmt = struct.pack("<HHIIHH", 1, 1, 16384, 16384, 1, 4)
        payload = bytes(64)
        data = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        with pytest.raises(Exception):
            native.wav_decode(data)


class TestResampleAliasing:
    def test_downsample_rejects_out_of_band_tone(self, native):
        """a tone ABOVE the output Nyquist must be attenuated, not aliased
        into band — the Kaiser window half-width must stretch with the
        decimation ratio or the sinc truncates after a few sidelobes"""
        rate_in, rate_out = 44100, 16384
        t = np.arange(rate_in) / rate_in
        tone = np.sin(2 * np.pi * 12000.0 * t).astype(np.float32)  # > 8192 Hz
        out = native.resample(tone, rate_in, rate_out)
        mid = np.asarray(out[1000:-1000])
        assert np.abs(mid).max() < 0.02, np.abs(mid).max()


class TestNativeSliderFit:
    """C++ MAP slider fitter (odn_fit_slider) vs the numpy oracle
    (signal/fit/select.py): same family, same rounded control points, same
    length — across arcs, lines, beziers, and noisy random walks."""

    def _shapes(self, rng, trial):
        kind = trial % 4
        L = int(rng.integers(5, 150))
        t = np.linspace(0, 1, L)
        if kind == 0:  # arc
            th = rng.uniform(0.3, 2.8)
            r = rng.uniform(30, 300)
            c = rng.uniform(100, 300, 2)
            xy = c[:, None] + r * np.vstack([np.cos(th * t), np.sin(th * t)])
        elif kind == 1:  # line
            p0, p1 = rng.uniform(0, 400, 2), rng.uniform(0, 400, 2)
            xy = p0[:, None] * (1 - t) + p1[:, None] * t
        elif kind == 2:  # cubic bezier
            P = rng.uniform(0, 400, (4, 2))
            B = np.array([(1 - t) ** 3, 3 * t * (1 - t) ** 2, 3 * t ** 2 * (1 - t), t ** 3])
            xy = P.T @ B
        else:  # wiggly random walk (forces poly families)
            xy = np.cumsum(rng.normal(0, 8, (2, L)), axis=1) + 200
        return xy + rng.normal(0, 2.0, xy.shape), L

    def test_matches_numpy_oracle(self, native):
        from osu_dreamer_tpu.signal.fit.select import fit_slider

        rng = np.random.default_rng(1234)
        for trial in range(80):
            xy, L = self._shapes(rng, trial)
            tn, ln, cn = fit_slider(xy, 0, L - 1, 1, use_native=True)
            tp, lp, cp = fit_slider(xy, 0, L - 1, 1, use_native=False)
            assert tn == tp, f"trial {trial}: family {tn} != {tp}"
            assert abs(ln - lp) < max(1e-6 * max(lp, 1.0), 1e-3), (trial, ln, lp)
            assert len(cn) == len(cp), (trial, len(cn), len(cp))
            for a, b in zip(cn, cp):
                assert (a == b).all(), (trial, a, b)

    def test_repeats_and_degenerate(self, native):
        from osu_dreamer_tpu.signal.fit.select import fit_slider

        rng = np.random.default_rng(7)
        xy = np.cumsum(rng.normal(0, 6, (2, 90)), axis=1) + 200
        # 3 repeats: only the first third is fitted — both paths agree
        tn, ln, cn = fit_slider(xy, 0, 89, 3, use_native=True)
        tp, lp, cp = fit_slider(xy, 0, 89, 3, use_native=False)
        assert tn == tp and abs(ln - lp) < 1e-3
        assert all((a == b).all() for a, b in zip(cn, cp))
        # single-frame span: degenerate -> circle signal, both paths
        assert fit_slider(xy, 4, 4, 1, use_native=True)[1] == 0.0
        assert fit_slider(xy, 4, 4, 1, use_native=False)[1] == 0.0

    def test_nan_cursor_never_wins(self, native):
        """NaN cursor input must not poison the branch-and-bound: the fit
        returns SOMETHING (possibly length 0) without crashing"""
        from osu_dreamer_tpu.signal.fit.select import fit_slider

        xy = np.full((2, 40), np.nan)
        t, length, ctrl = fit_slider(xy, 0, 39, 1, use_native=True)
        assert t in ("P", "B")
