"""ctypes bindings to the native (C++) host-side format-conversion engine.

The reference's runtime is C++; the host-side byte-level work in this
framework (the L1 format matrix, ref: src/SoundFormatRawConversions.cpp) is
likewise native: ``native/src/formatconv.cpp``, built as a shared library
(CMake, or a direct g++ fallback) and bound here via ctypes — no Python in
the per-sample loops.

The library is built lazily on first use and cached next to the package;
every consumer (``formats.host.transfer_samples``) falls back to the numpy
path automatically if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["get_lib", "native_available", "transfer_rect",
           "transfer_rect_path", "shaped_dither_block"]

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "src", "formatconv.cpp",
)
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SO = os.path.join(_CACHE_DIR, "libbbcatdsp_native.so")


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    os.makedirs(_CACHE_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SRC):
            return None
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.fc_transfer.restype = ctypes.c_int
        lib.fc_transfer.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.fc_version.restype = ctypes.c_int
        try:  # v2 symbols (a stale pre-v2 .so simply lacks them)
            lib.fc_shaped_dither.restype = None
            lib.fc_shaped_dither.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
            ]
        except AttributeError:
            pass
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return get_lib() is not None


def transfer_rect(
    src: np.ndarray, src_fmt: int, src_be: bool, src_channel: int,
    src_channels: int, dst: np.ndarray, dst_fmt: int, dst_be: bool,
    dst_channel: int, dst_channels: int, nchannels: int, nframes: int,
) -> bool:
    """Native rectangle transfer on uint8 buffers; False if unavailable."""
    return transfer_rect_path(
        src, src_fmt, src_be, src_channel, src_channels,
        dst, dst_fmt, dst_be, dst_channel, dst_channels,
        nchannels, nframes,
    ) >= 0


def transfer_rect_path(
    src: np.ndarray, src_fmt: int, src_be: bool, src_channel: int,
    src_channels: int, dst: np.ndarray, dst_fmt: int, dst_be: bool,
    dst_channel: int, dst_channels: int, nchannels: int, nframes: int,
) -> int:
    """Like :func:`transfer_rect` but returns the engine's path code:
    0 = templated conversion loop, 1 = per-frame memmove, 2 = single bulk
    memmove (same-format fast paths, ref:
    SoundFormatRawConversions.cpp:20-62); -1 = native engine unavailable
    or bad format."""
    lib = get_lib()
    if lib is None:
        return -1
    return lib.fc_transfer(
        src.ctypes.data, int(src_fmt), int(src_be),
        src_channel, src_channels,
        dst.ctypes.data, int(dst_fmt), int(dst_be),
        dst_channel, dst_channels, nchannels, nframes,
    )


def shaped_dither_block(
    data: np.ndarray, r: np.ndarray, ehist: np.ndarray, h: np.ndarray,
    bits: int,
) -> np.ndarray | None:
    """Native error-feedback dither recurrence over ``data [nfr, nch]``
    (int32, MSB-aligned) with TPDF randoms ``r [nfr, nch]`` (float64,
    already centred), error history ``ehist [order, nch]`` (float64,
    updated IN PLACE) and feedback FIR ``h [order]``.  Returns the dithered
    int32 block, or ``None`` when the native engine is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "fc_shaped_dither"):
        return None
    nfr, nch = data.shape
    data32 = np.ascontiguousarray(data, np.int32)
    r64 = np.ascontiguousarray(r, np.float64)
    h64 = np.ascontiguousarray(h, np.float64)
    assert ehist.flags.c_contiguous and ehist.dtype == np.float64
    out = np.empty((nfr, nch), np.int32)
    lib.fc_shaped_dither(
        data32.ctypes.data, r64.ctypes.data, ehist.ctypes.data,
        h64.ctypes.data, ehist.shape[0], nfr, nch, int(bits),
        out.ctypes.data,
    )
    return out
