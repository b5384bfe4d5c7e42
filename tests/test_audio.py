"""Audio layer: resonator-bank spectrogram and WAV decode."""

import io
import struct

import jax.numpy as jnp

import numpy as np
import pytest

from osu_dreamer_tpu.audio import (
    A_DIM,
    HOP_LEN,
    SR,
    get_frame_for_time,
    get_frame_times,
    load_wave,
    make_spec,
    read_spec,
    write_spec,
)
from osu_dreamer_tpu.audio.constants import resonator_freqs
from osu_dreamer_tpu.audio.spectrogram import (
    _normalize_power,
    _resonate_frames,
    resonate_reference,
)


class TestConstants:
    def test_values(self):
        assert A_DIM == 72
        assert SR == 16384
        assert HOP_LEN == 98

    def test_frame_time_roundtrip(self):
        times = get_frame_times(100)
        assert times[0] == 0.0
        for i in (0, 13, 99):
            assert get_frame_for_time(times[i]) == i

    def test_freqs_log_spaced(self):
        f = resonator_freqs()
        assert len(f) == 72
        assert abs(f[0] - 32.0) < 1e-4
        ratios = f[1:] / f[:-1]
        np.testing.assert_allclose(ratios, ratios[0], rtol=1e-5)


class TestResonatorBank:
    def test_matmul_scan_matches_sequential_iir(self, rng):
        """the MXU matmul + associative-scan formulation must equal the exact
        sample-by-sample IIR recurrence"""
        n = HOP_LEN * 37 + 13
        wave = rng.normal(size=n).astype(np.float32)
        n_frames = int(np.ceil(n / HOP_LEN))

        padded = np.zeros(n_frames * HOP_LEN, dtype=np.float32)
        padded[:n] = wave
        fast = np.asarray(_resonate_frames(padded, n_frames))  # (K, F, 2)
        exact = resonate_reference(wave)  # (K, F) complex

        # fp32 matmul+scan vs float128-path sequential IIR: agreement to ~1e-3
        # absolute on O(1) states (keeps the dB-scale spectrogram bit-stable)
        np.testing.assert_allclose(fast[..., 0], exact.real, atol=5e-3)
        np.testing.assert_allclose(fast[..., 1], exact.imag, atol=5e-3)

    def test_pure_tone_peaks_at_matching_bin(self):
        freqs = resonator_freqs()
        bin_idx = 36
        t = np.arange(SR * 2) / SR
        wave = np.sin(2 * np.pi * freqs[bin_idx] * t).astype(np.float32)
        spec = make_spec(wave)
        # skip the attack transient, look at the steady state
        steady = spec[:, spec.shape[1] // 2]
        assert abs(int(np.argmax(steady)) - bin_idx) <= 1

    def test_spec_shape_and_range(self, rng):
        wave = rng.normal(size=SR).astype(np.float32) * 0.1
        spec = make_spec(wave)
        assert spec.shape == (72, int(np.ceil(SR / HOP_LEN)))
        assert spec.min() >= 0.0 and spec.max() <= 1.0
        assert abs(spec.max() - 1.0) < 1e-6  # loudest frame maps to 1

    def test_silence(self):
        spec = make_spec(np.zeros(HOP_LEN * 10, dtype=np.float32))
        assert np.isfinite(spec).all()

    def test_normalization_60db_window(self):
        import jax.numpy as jnp

        power = jnp.array([[1.0, 1e-4, 1e-6, 1e-8]])
        sig = np.asarray(_normalize_power(power))[0]
        assert sig[0] == 1.0
        np.testing.assert_allclose(sig[1], 0.0, atol=1e-5)  # window floor -> 0
        assert sig[2] == 0.0 and sig[3] == 0.0


class TestSpecDiskFormat:
    def test_roundtrip(self, rng):
        spec = rng.random((72, 100)).astype(np.float32)
        buf = io.BytesIO()
        write_spec(buf, spec)
        buf.seek(0)
        rec = read_spec(buf)
        assert rec.shape == spec.shape
        assert np.abs(rec - spec).max() <= 0.5 / 255 + 1e-9


def _write_wav(path, data: np.ndarray, rate: int, bits: int = 16):
    """minimal WAV writer for tests"""
    channels = data.shape[1] if data.ndim == 2 else 1
    flat = data.reshape(-1)
    if bits == 16:
        payload = (np.clip(flat, -1, 1) * 32767).astype("<i2").tobytes()
        fmt_code = 1
    else:
        payload = flat.astype("<f4").tobytes()
        fmt_code = 3
    block = channels * bits // 8
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, fmt_code, channels, rate, rate * block, block, bits))
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)


class TestWavDecode:
    def test_pcm16_mono(self, tmp_path, rng):
        # keep |wave| < 1 so int16 quantization doesn't clip
        wave = np.tanh(rng.normal(size=SR)).astype(np.float32) * 0.9
        path = tmp_path / "a.wav"
        _write_wav(path, wave, SR)
        out = load_wave(path)
        assert out.shape == (SR,)
        np.testing.assert_allclose(out, wave, atol=1e-3)

    def test_float32_stereo_resampled(self, tmp_path):
        rate_in = 44100
        t = np.arange(rate_in) / rate_in
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        stereo = np.stack([tone, tone], axis=1)
        path = tmp_path / "b.wav"
        _write_wav(path, stereo, rate_in, bits=32)
        out = load_wave(path)
        # one second at 44100 -> about SR samples
        assert abs(len(out) - SR) < 64
        # spectral peak still at 440 Hz
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        peak_hz = np.argmax(spec) * SR / len(out)
        assert abs(peak_hz - 440) < 5


class TestSpecForModel:
    def test_matches_host_path_and_bucket_semantics(self):
        from osu_dreamer_tpu.audio import make_spec_for_model

        t = np.arange(SR * 3) / SR
        w = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        spec = make_spec(w)  # host path, exact length
        dev = np.asarray(make_spec_for_model(w, 27))  # device path, bucketed

        real = spec.shape[1]
        assert dev.shape[1] % 27 == 0 and dev.shape[1] >= real
        # the device path quantizes the wave to int16 (-96 dB noise); in the
        # log-domain 60 dB display window, bins near the floor can shift by a
        # few percent of full scale — loud bins stay essentially exact
        diff = np.abs(dev[0, :real] - spec.T)
        assert diff.max() < 5e-2
        loud = spec.T > 0.5
        assert diff[loud].max() < 5e-3
        # padding region is edge-replicated (allclose, not exact: XLA may
        # fuse the normalize into the gather and recompute replicated rows
        # with different instruction-level rounding)
        np.testing.assert_allclose(
            dev[0, real:], np.broadcast_to(dev[0, real - 1], dev[0, real:].shape),
            atol=1e-5,
        )


class TestBatchedFeaturize:
    def test_batch_matches_solo(self):
        """spec_for_model_batch rows equal per-song solo featurizes (incl.
        per-song peak normalization with different loudness/lengths)"""
        from osu_dreamer_tpu.audio import (
            SR,
            make_spec_for_model,
            prep_wave_for_model,
            spec_for_model_batch,
        )

        rng = np.random.default_rng(0)
        t = np.arange(SR * 2) / SR
        w1 = (0.8 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        w2 = (0.2 * np.sin(2 * np.pi * 440 * t[: SR]) ).astype(np.float32)
        chunk = 27

        b1, r1, nf, of = prep_wave_for_model(w1, chunk)
        b2, r2, nf2, of2 = prep_wave_for_model(w2, chunk)
        assert (nf, of) == (nf2, of2)  # same ~6 s bucket

        batch = spec_for_model_batch(
            jnp.asarray(np.stack([b1, b2])),
            jnp.asarray(np.asarray([r1, r2], np.int32)),
            nf, of,
        )
        np.testing.assert_allclose(
            np.asarray(batch[0]), np.asarray(make_spec_for_model(w1, chunk)[0]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(batch[1]), np.asarray(make_spec_for_model(w2, chunk)[0]),
            atol=1e-6,
        )


class TestExtensibleWav:
    def test_extensible_float32_decodes_via_subformat_guid(self, tmp_path, rng):
        """WAVE_FORMAT_EXTENSIBLE's real format code lives in the SubFormat
        GUID; an extensible IEEE-float file must route to the float decoder
        (previously forced to int PCM -> full-scale noise)"""
        import struct

        from osu_dreamer_tpu.audio.decode import _decode_wav

        wave = np.tanh(rng.normal(size=4096)).astype(np.float32) * 0.8
        payload = wave.tobytes()
        # fmt body: std 16 bytes + cbSize 22 + valid bits + channel mask +
        # SubFormat GUID (leading u16 = 3: IEEE float)
        guid = struct.pack("<H", 3) + b"\x00\x00" + bytes(12)
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16384, 16384 * 4, 4, 32)
        fmt += struct.pack("<HHI", 22, 32, 4) + guid
        data = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        p = tmp_path / "ext.wav"
        p.write_bytes(data)
        out, rate = _decode_wav(p)
        assert rate == 16384
        np.testing.assert_allclose(out[:, 0], wave, atol=1e-6)

    def test_extensible_pcm16_still_decodes(self, tmp_path, rng):
        import struct

        from osu_dreamer_tpu.audio.decode import _decode_wav

        wave = (np.tanh(rng.normal(size=2048)) * 0.8 * 32767).astype(np.int16)
        payload = wave.tobytes()
        guid = struct.pack("<H", 1) + b"\x00\x00" + bytes(12)
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16384, 16384 * 2, 2, 16)
        fmt += struct.pack("<HHI", 22, 16, 4) + guid
        data = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        p = tmp_path / "extpcm.wav"
        p.write_bytes(data)
        out, rate = _decode_wav(p)
        np.testing.assert_allclose(out[:, 0], wave / 32768.0, atol=1e-4)
