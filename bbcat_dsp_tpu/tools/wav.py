"""WAV file I/O through the L1 format layer.

Reads/writes PCM16/24/32 and float32/64 WAV via the same byte-level
conversion engine (native C++ or numpy) that the rest of the framework
uses — the host edge of the canonical ``[channels, time]`` float32 layout.
"""

from __future__ import annotations

import struct

import numpy as np

from ..formats.sample_format import SampleFormat, get_bytes_per_sample
from ..formats.host import transfer_samples
from ..formats.dither import Ditherer

__all__ = ["read_wav", "write_wav"]

_FMT_PCM = 1
_FMT_FLOAT = 3


def read_wav(path: str):
    """Read a WAV file -> ``(audio [C, T] float32, fs)``."""
    with open(path, "rb") as fp:
        data = fp.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    wformat, nch, fs, _, _, bits = fmt
    if wformat == _FMT_PCM and bits == 16:
        sfmt = SampleFormat.INT16
    elif wformat == _FMT_PCM and bits == 24:
        sfmt = SampleFormat.INT24
    elif wformat == _FMT_PCM and bits == 32:
        sfmt = SampleFormat.INT32
    elif wformat == _FMT_FLOAT and bits == 32:
        sfmt = SampleFormat.FLOAT
    elif wformat == _FMT_FLOAT and bits == 64:
        sfmt = SampleFormat.DOUBLE
    else:
        raise ValueError(f"{path}: unsupported format {wformat}/{bits}bit")
    bps = get_bytes_per_sample(sfmt)
    nframes = len(raw) // (bps * nch)
    out = np.zeros(nframes * nch * 4, np.uint8)
    transfer_samples(
        np.frombuffer(raw[: nframes * nch * bps], np.uint8), sfmt, False,
        0, nch, out, SampleFormat.FLOAT, False, 0, nch, nch, nframes,
    )
    audio = out.view(np.float32).reshape(nframes, nch).T.copy()
    return audio, float(fs)


def write_wav(path: str, audio: np.ndarray, fs: float,
              fmt: SampleFormat = SampleFormat.INT16,
              ditherer: Ditherer | None = None) -> None:
    """Write ``[C, T]`` float audio as WAV in ``fmt`` (optionally
    dithered)."""
    audio = np.atleast_2d(np.asarray(audio, np.float32))
    nch, nframes = audio.shape
    bps = get_bytes_per_sample(fmt)
    inter = np.ascontiguousarray(audio.T).reshape(-1)
    raw = np.zeros(nframes * nch * bps, np.uint8)
    transfer_samples(
        inter.view(np.uint8), SampleFormat.FLOAT, False, 0, nch,
        raw, fmt, False, 0, nch, nch, nframes, ditherer,
    )
    wformat = _FMT_PCM if fmt in (
        SampleFormat.INT16, SampleFormat.INT24, SampleFormat.INT32
    ) else _FMT_FLOAT
    bits = bps * 8
    byte_rate = int(fs) * nch * bps
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, wformat, nch, int(fs), byte_rate, nch * bps, bits
    )
    hdr += b"data" + struct.pack("<I", len(raw))
    with open(path, "wb") as fp:
        fp.write(hdr + raw.tobytes())
