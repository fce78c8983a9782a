"""Sample format taxonomy.

Parity with the reference's ``SampleFormat_t`` enum and per-format tables
(ref: src/SoundFormatConversions.h:20-37, src/SoundFormatConversions.cpp:14-40).

On device everything is a normalized representation:

* all integer formats are carried as int32, MSB-aligned — a 16-bit sample
  occupies the top 16 bits (value << 16), a 24-bit sample the top 24
  (value << 8).  This mirrors the reference's generated conversion bodies,
  which always widen to a 32-bit register before converting
  (ref: src/genconversions.php:180-218).
* float formats are float32 / float64.

Packed byte-level formats (3-byte int24, endianness) exist only at the host
I/O edge — see :mod:`bbcat_dsp_tpu.formats.host`.
"""

from __future__ import annotations

import enum

import numpy as np


class SampleFormat(enum.IntEnum):
    """Audio sample formats (ref: src/SoundFormatConversions.h:20-37)."""

    UNKNOWN = 0
    INT16 = 1
    INT24 = 2
    INT32 = 3
    FLOAT = 4
    DOUBLE = 5


#: number of formats (ref: SampleFormat_Count)
SAMPLE_FORMAT_COUNT = 6

_BITS = {
    SampleFormat.UNKNOWN: 0,
    SampleFormat.INT16: 16,
    SampleFormat.INT24: 24,
    SampleFormat.INT32: 32,
    SampleFormat.FLOAT: 32,
    SampleFormat.DOUBLE: 64,
}

_BYTES = {
    SampleFormat.UNKNOWN: 0,
    SampleFormat.INT16: 2,
    SampleFormat.INT24: 3,
    SampleFormat.INT32: 4,
    SampleFormat.FLOAT: 4,
    SampleFormat.DOUBLE: 8,
}

_NP_DTYPES = {
    np.dtype(np.int16): SampleFormat.INT16,
    np.dtype(np.int32): SampleFormat.INT32,
    np.dtype(np.float32): SampleFormat.FLOAT,
    np.dtype(np.float64): SampleFormat.DOUBLE,
}


def is_sample_integer(fmt: SampleFormat) -> bool:
    """ref: IsSampleInteger (src/SoundFormatConversions.h:75)."""
    return SampleFormat.INT16 <= fmt <= SampleFormat.INT32


def is_sample_float(fmt: SampleFormat) -> bool:
    """ref: IsSampleFloat (src/SoundFormatConversions.h:76)."""
    return SampleFormat.FLOAT <= fmt <= SampleFormat.DOUBLE


def get_bits_per_sample(fmt: SampleFormat) -> int:
    """ref: GetBitsPerSample (src/SoundFormatConversions.cpp:14-27)."""
    return _BITS[SampleFormat(fmt)]


def get_bytes_per_sample(fmt: SampleFormat) -> int:
    """ref: GetBytesPerSample (src/SoundFormatConversions.cpp:29-40)."""
    return _BYTES[SampleFormat(fmt)]


def sample_format_of(x) -> SampleFormat:
    """Return the format for a numpy array / dtype.

    ref: the ``SampleFormatOf`` overload set (src/SoundFormatConversions.h:59-69).
    Note int24 has no native dtype; packed int24 buffers are uint8 with a
    format tag carried separately.
    """
    dt = x.dtype if isinstance(x, np.ndarray) else np.dtype(x)
    try:
        return _NP_DTYPES[dt]
    except KeyError:
        return SampleFormat.UNKNOWN


def block_transfer_sanity_checks(
    src_channel: int,
    src_channels: int,
    dst_channel: int,
    dst_channels: int,
    nchannels: int,
    nframes: int,
    allow_single_channel: bool = True,
) -> tuple[bool, int, int, int, int]:
    """Clamp a rectangular transfer to valid bounds.

    Mirrors the reference's shared argument clamping + contiguous-collapse
    optimisation (ref: src/SoundFormatConversions.cpp:59-93): channel counts
    are clamped to what both buffers can supply, and when the transfer covers
    every channel of both buffers contiguously, many frames collapse into one
    frame of many channels (skipped when ``allow_single_channel`` is False,
    e.g. per-frame gain interpolation — ref: src/SoundMixing.cpp:36).

    Returns ``(valid, src_channel, dst_channel, nchannels, nframes)``.
    """
    if src_channel >= src_channels or dst_channel >= dst_channels:
        return (False, src_channel, dst_channel, 0, 0)
    nchannels = min(nchannels, src_channels - src_channel)
    nchannels = min(nchannels, dst_channels - dst_channel)
    if (
        allow_single_channel
        and nchannels == src_channels
        and nchannels == dst_channels
        and src_channel == 0
        and dst_channel == 0
    ):
        nchannels *= nframes
        nframes = 1
    valid = nchannels > 0 and nframes > 0
    return (valid, src_channel, dst_channel, nchannels, nframes)
