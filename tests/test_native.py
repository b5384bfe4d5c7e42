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
