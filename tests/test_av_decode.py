"""First-party libav decode shim (native/audiodecode_av.cpp): compressed
audio -> mono float32 at SR, replacing the reference's torchcodec dependency
(reference data/load_audio.py:36-37). Fixtures are synthesized offline by
the shim's own test encoder; opus is the HF corpus's format
(reference data/dataset.py:37), flac is lossless (exact round trip).
"""

import numpy as np
import pytest

from osu_dreamer_tpu import native
from osu_dreamer_tpu.audio import SR
from osu_dreamer_tpu.audio.decode import load_wave

pytestmark = pytest.mark.skipif(
    not native.av_available(), reason="libav shim not built (make -C native)"
)

ENC_SR = 48000  # aac/opus encoders require standard rates; decode resamples


def _tone(sr: int, seconds: float = 3.0, freq: float = 220.0) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _aligned_rmse(out: np.ndarray, ref: np.ndarray) -> float:
    """min RMSE over small shifts (codecs add delay/padding)"""
    seg = ref[SR : 2 * SR]
    best = np.inf
    for off in range(-3000, 3001, 10):
        cand = out[SR + off : 2 * SR + off]
        if len(cand) == len(seg):
            best = min(best, float(np.sqrt(np.mean((cand - seg) ** 2))))
    return best


@pytest.mark.parametrize(
    "codec,suffix,tol",
    [
        ("flac", ".flac", 1e-4),   # lossless + rate conversion only
        ("aac", ".m4a", 2e-2),
        ("opus", ".opus", 6e-2),   # the HF corpus codec
    ],
)
def test_compressed_round_trip(tmp_path, codec, suffix, tol):
    path = tmp_path / f"tone{suffix}"
    native.av_encode(path, codec, _tone(ENC_SR), ENC_SR)

    out = load_wave(path)
    ref = _tone(SR)
    assert abs(len(out) - len(ref)) < SR // 4, (len(out), len(ref))
    assert _aligned_rmse(out, ref) < tol


def test_flac_native_rate_exact(tmp_path):
    """FLAC at SR itself: bit-faithful decode, no resampling involved"""
    path = tmp_path / "tone.flac"
    ref = _tone(SR)
    native.av_encode(path, "flac", ref, SR)
    out = load_wave(path)
    assert len(out) == len(ref)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_container_tags(tmp_path):
    """first-party tag reader (libavformat metadata) feeds predict's
    title/artist resolution when --title/--artist are omitted"""
    path = tmp_path / "tagged.flac"
    native.av_encode(
        path, "flac", _tone(SR, 1.0), SR, title="Song Name", artist="Some Artist"
    )
    title, artist = native.av_tags(path)
    assert title == "Song Name" and artist == "Some Artist"

    from osu_dreamer_tpu.cli.commands import _resolve_metadata

    t, a = _resolve_metadata(path, None, None)
    assert t == "Song Name" and a == "Some Artist"
    # explicit flags win over tags
    t, a = _resolve_metadata(path, "Override", None)
    assert t == "Override" and a == "Some Artist"


def test_undecodable_raises(tmp_path):
    from osu_dreamer_tpu.audio.decode import AudioDecodeError

    bad = tmp_path / "junk.opus"
    bad.write_bytes(b"this is not audio at all" * 10)
    with pytest.raises(AudioDecodeError):
        load_wave(bad)
