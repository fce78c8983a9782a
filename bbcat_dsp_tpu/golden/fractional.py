"""Golden fractional-sample read: 14-tap / 128-phase polyphase windowed sinc.

Scalar float64 reproduction of the reference semantics
(ref: src/FractionalSample.cpp:255-341):

* phase  fpos = 128 - 1 - (int(128*pos) % 128)
* base   bpos = (int(pos) + length - 14) % length   (result lags ~7 samples,
  documented group delay, ref: src/FractionalSample.h:29-33)
* res = sum_{k=0..13} filter[fpos + 128*k] * buffer[(bpos+k) % length]

The coefficient table is the reference's exact filter DATA (a numeric
contract, not code): 1792 values, all exact multiples of 2^-23, stored in
this package as q23 int32 (`filters/data/polyphase_sinc_14x128_q23.npy`) and
verified against ref: src/FractionalSample.cpp:17-243 to < 5e-14 absolute
(below the table's printed precision).
"""

from __future__ import annotations

import numpy as np

OVERSAMPLING = 128
TAPS = 14
ADDITIONAL_DELAY = TAPS  # ref: FractionalSampleAdditionalDelayRequired()


def polyphase_table() -> np.ndarray:
    """The 1792-entry polyphase filter table, float64, layout [tap*128+phase]."""
    from importlib.resources import files

    q = np.load(files("bbcat_dsp_tpu.filters.data") / "polyphase_sinc_14x128_q23.npy")
    return q.astype(np.float64) * 2.0**-23


_TABLE = None


def _table() -> np.ndarray:
    global _TABLE
    if _TABLE is None:
        _TABLE = polyphase_table()
    return _TABLE


def fractional_sample(
    buffer: np.ndarray, channel: int, channels: int, length: int, pos: float
) -> float:
    """Scalar fractional read from an interleaved circular buffer.

    ``buffer`` is flat interleaved ``[length*channels]`` (the reference's
    layout).  Exact parity with ref: src/FractionalSample.cpp:281-341.
    """
    filt = _table()
    fpos = OVERSAMPLING - 1 - (int(OVERSAMPLING * pos) % OVERSAMPLING)
    bpos = (int(pos) + length - TAPS) % length
    res = 0.0
    for k in range(TAPS):
        res += filt[fpos + OVERSAMPLING * k] * float(
            buffer[((bpos + k) % length) * channels + channel]
        )
    return res


def fractional_delay_block(
    buf: np.ndarray, positions: np.ndarray, length: int
) -> np.ndarray:
    """Vectorised golden helper: read many positions from a ``[channels,
    length]`` (channel-major) circular buffer.  ``positions`` is
    ``[channels, n]`` float.  Returns ``[channels, n]`` float64."""
    buf = np.asarray(buf, np.float64)
    channels = buf.shape[0]
    out = np.empty_like(np.asarray(positions, np.float64))
    inter = buf.T.reshape(-1)  # interleaved view for the scalar routine
    for c in range(channels):
        for i, p in enumerate(np.asarray(positions)[c]):
            out[c, i] = fractional_sample(inter, c, channels, length, float(p))
    return out
