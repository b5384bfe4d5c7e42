"""ctypes bindings for the first-party C++ runtime (native/osudreamer_native.cpp).

Provides host-side hot paths — WAV decode, windowed-sinc resampling, the
exact resonator bank, star rating — replacing the reference's third-party
native deps (torchcodec / resonators / rosu-pp, SURVEY.md §2.9). Every entry
point has a pure-python/numpy fallback in its consumer module; ``available()``
reports whether the shared library is loaded. Build with ``make -C native``.
"""

from __future__ import annotations

import ctypes
from ctypes import POINTER, c_double, c_float, c_int32, c_int64, c_uint8
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "libosudreamer.so"
_lib: ctypes.CDLL | None = None


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("channels", c_int32),
        ("sample_rate", c_int32),
        ("n_frames", c_int64),
    ]


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))

    lib.odn_wav_info.argtypes = [POINTER(c_uint8), c_int64, POINTER(_WavInfo)]
    lib.odn_wav_info.restype = c_int32
    lib.odn_wav_decode.argtypes = [POINTER(c_uint8), c_int64, POINTER(c_float)]
    lib.odn_wav_decode.restype = c_int32
    lib.odn_resample_out_len.argtypes = [c_int64, c_int32, c_int32]
    lib.odn_resample_out_len.restype = c_int64
    lib.odn_resample.argtypes = [
        POINTER(c_float), c_int64, c_int32, c_int32, POINTER(c_float),
    ]
    lib.odn_resample.restype = c_int32
    lib.odn_resonate.argtypes = [
        POINTER(c_float), c_int64, POINTER(c_float), POINTER(c_float),
        c_int32, c_int32, c_int32, POINTER(c_float), POINTER(c_float),
    ]
    lib.odn_resonate.restype = c_int32
    lib.odn_star_rating.argtypes = [
        POINTER(c_double), POINTER(c_double), POINTER(c_double), c_int64, c_double,
    ]
    lib.odn_star_rating.restype = c_double
    lib.odn_fit_slider.argtypes = [
        POINTER(c_double), c_int64, c_double,           # pts, L, inv_two_var
        c_double, POINTER(c_double), c_int32,           # lp_arc, lp_single, max_single
        POINTER(c_double), POINTER(c_double), c_int32,  # lp_poly_line, lp_poly_bez, max_seg
        ctypes.c_char_p, POINTER(c_double),             # out_type, out_length
        POINTER(c_double), POINTER(c_int32),            # out_ctrl, out_n_ctrl
    ]
    lib.odn_fit_slider.restype = c_int32

    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(POINTER(c_float))


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF bytes -> ((frames, channels) float32, sample_rate)"""
    lib = _load()
    assert lib is not None
    buf = np.frombuffer(data, np.uint8)
    info = _WavInfo()
    rc = lib.odn_wav_info(buf.ctypes.data_as(POINTER(c_uint8)), len(buf), ctypes.byref(info))
    if rc != 0:
        raise ValueError(f"native wav parse failed ({rc})")
    out = np.empty(info.n_frames * info.channels, np.float32)
    rc = lib.odn_wav_decode(buf.ctypes.data_as(POINTER(c_uint8)), len(buf), _fptr(out))
    if rc != 0:
        raise ValueError(f"native wav decode failed ({rc})")
    return out.reshape(info.n_frames, info.channels), info.sample_rate


def resample(wave: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    wave = np.ascontiguousarray(wave, np.float32)
    n_out = lib.odn_resample_out_len(len(wave), rate_in, rate_out)
    out = np.empty(n_out, np.float32)
    rc = lib.odn_resample(_fptr(wave), len(wave), rate_in, rate_out, _fptr(out))
    if rc != 0:
        raise ValueError(f"native resample failed ({rc})")
    return out


def resonate(
    wave: np.ndarray, freqs: np.ndarray, alphas: np.ndarray, hop: int, sample_rate: int
) -> np.ndarray:
    """-> (n_frames, n_bins) complex64 resonator states at frame boundaries"""
    lib = _load()
    assert lib is not None
    wave = np.ascontiguousarray(wave, np.float32)
    freqs = np.ascontiguousarray(freqs, np.float32)
    alphas = np.ascontiguousarray(alphas, np.float32)
    n_frames = -(-len(wave) // hop)
    out_re = np.empty((n_frames, len(freqs)), np.float32)
    out_im = np.empty((n_frames, len(freqs)), np.float32)
    rc = lib.odn_resonate(
        _fptr(wave), len(wave), _fptr(freqs), _fptr(alphas),
        len(freqs), hop, sample_rate, _fptr(out_re), _fptr(out_im),
    )
    if rc != 0:
        raise ValueError(f"native resonate failed ({rc})")
    return out_re.astype(np.complex64) + 1j * out_im.astype(np.complex64)


# ------------------------------------------------- libav decode shim --
# separate shared object (native/audiodecode_av.cpp) linking the system
# FFmpeg libraries — the first-party replacement for torchcodec's decoders

_AV_LIB_PATH = Path(__file__).parent / "libosudreamer_av.so"
_av_lib: ctypes.CDLL | None = None


def _load_av() -> ctypes.CDLL | None:
    global _av_lib
    if _av_lib is not None:
        return _av_lib
    if not _AV_LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_AV_LIB_PATH))
    except OSError:  # system libav missing at runtime
        return None
    lib.odn_av_decode.argtypes = [
        ctypes.c_char_p, c_int32, POINTER(POINTER(c_float)),
    ]
    lib.odn_av_decode.restype = c_int64
    lib.odn_av_free.argtypes = [POINTER(c_float)]
    lib.odn_av_free.restype = None
    lib.odn_av_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, POINTER(c_float), c_int64, c_int32,
        ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.odn_av_encode.restype = c_int32
    lib.odn_av_tags.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, c_int32,
    ]
    lib.odn_av_tags.restype = c_int32
    _av_lib = lib
    return lib


def av_available() -> bool:
    return _load_av() is not None


def av_decode(path: str | Path, target_sr: int) -> np.ndarray:
    """decode any libav-supported audio file -> mono float32 at target_sr"""
    lib = _load_av()
    assert lib is not None
    out_ptr = POINTER(c_float)()
    n = lib.odn_av_decode(str(path).encode(), target_sr, ctypes.byref(out_ptr))
    if n < 0:
        raise ValueError(f"libav decode failed for {path} (code {n})")
    try:
        wave = np.ctypeslib.as_array(out_ptr, shape=(n,)).copy()
    finally:
        lib.odn_av_free(out_ptr)
    return wave


def av_tags(path: str | Path) -> tuple[str, str]:
    """(title, artist) container tags via libavformat (ID3 / Vorbis
    comments / MP4 atoms); empty strings when absent"""
    lib = _load_av()
    assert lib is not None
    title = ctypes.create_string_buffer(512)
    artist = ctypes.create_string_buffer(512)
    rc = lib.odn_av_tags(str(path).encode(), title, artist, 512)
    if rc != 0:
        return "", ""
    return (
        title.value.decode("utf-8", errors="replace"),
        artist.value.decode("utf-8", errors="replace"),
    )


def av_encode(
    path: str | Path, codec: str, wave: np.ndarray, sr: int,
    title: str = "", artist: str = "",
) -> None:
    """TEST helper: encode a mono wave with the named libav codec"""
    lib = _load_av()
    assert lib is not None
    w = np.ascontiguousarray(wave, np.float32)
    rc = lib.odn_av_encode(
        str(path).encode(), codec.encode(), _fptr(w), len(w), sr,
        title.encode(), artist.encode(),
    )
    if rc != 0:
        raise ValueError(f"libav encode ({codec}) failed for {path} (code {rc})")


def star_rating(times: np.ndarray, xs: np.ndarray, ys: np.ndarray, cs: float) -> float:
    lib = _load()
    assert lib is not None
    t = np.ascontiguousarray(times, np.float64)
    x = np.ascontiguousarray(xs, np.float64)
    y = np.ascontiguousarray(ys, np.float64)
    dptr = lambda a: a.ctypes.data_as(POINTER(c_double))
    return float(lib.odn_star_rating(dptr(t), dptr(x), dptr(y), len(t), cs))
