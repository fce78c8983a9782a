"""Fractional-sample (polyphase windowed-sinc) delay reads on device.

TPU formulation of the reference's 14-tap / 128-phase polyphase read
(ref: src/FractionalSample.cpp:255-341): instead of a scalar 14-MAC loop per
output sample, all requested positions are resolved at once — a batched
gather of the 14 source samples per position plus a ``[N, 14] x [14]``
weighted reduction on the VPU.

Index contract (exact parity, ref: src/FractionalSample.cpp:283-291):

    phase fpos = 128 - 1 - (int(128 * pos) % 128)
    base  bpos = (int(pos) + length - 14) % length

so the result lags ~7 samples (documented group delay,
ref: src/FractionalSample.h:29-33).  The coefficient table is the
reference's exact filter data re-encoded as q23 int32
(see :mod:`bbcat_dsp_tpu.golden.fractional`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..golden.fractional import OVERSAMPLING, TAPS, ADDITIONAL_DELAY, polyphase_table

__all__ = [
    "OVERSAMPLING",
    "TAPS",
    "ADDITIONAL_DELAY",
    "additional_delay_required",
    "fractional_read",
    "FractionalDelayLine",
]

_TABLE_TP = None  # [128 phases, 14 taps] numpy float32 (host constant —
# cached as numpy, NOT jnp, so a jit trace never leaks a tracer here)


def _table_phase_major(dtype=jnp.float32) -> np.ndarray:
    """Polyphase table as ``[phase, tap]`` for gather-free weight lookup."""
    global _TABLE_TP
    if _TABLE_TP is None:
        t = polyphase_table().reshape(TAPS, OVERSAMPLING).T  # [phase, tap]
        _TABLE_TP = np.ascontiguousarray(t, np.float32)
    return _TABLE_TP.astype(dtype) if _TABLE_TP.dtype != dtype else _TABLE_TP


def additional_delay_required() -> int:
    """ref: FractionalSampleAdditionalDelayRequired(),
    src/FractionalSample.cpp:249-252."""
    return ADDITIONAL_DELAY


@jax.jit
def fractional_read(buf: jax.Array, pos: jax.Array) -> jax.Array:
    """Read fractional positions from a circular buffer.

    ``buf`` is ``[..., length]`` (channel-major, the TPU-native layout);
    ``pos`` is ``[..., n]`` float positions (broadcast against the leading
    dims of ``buf``).  Returns ``[..., n]`` samples in ``buf.dtype``.
    """
    length = buf.shape[-1]
    posf = pos.astype(jnp.float32)
    ipos = jnp.floor(posf).astype(jnp.int32)
    phase = (
        OVERSAMPLING - 1
        - (jnp.floor(posf * OVERSAMPLING).astype(jnp.int32) % OVERSAMPLING)
    )
    base = (ipos + length - TAPS) % length
    taps = jnp.arange(TAPS, dtype=jnp.int32)
    idx = (base[..., None] + taps) % length  # [..., n, 14]
    gathered = jnp.take_along_axis(
        jnp.broadcast_to(buf[..., None, :], idx.shape[:-1] + (buf.shape[-1],)),
        idx,
        axis=-1,
    )
    weights = jnp.asarray(_table_phase_major(buf.dtype))[phase]  # [..., n, 14]
    return jnp.sum(gathered * weights, axis=-1).astype(buf.dtype)


class FractionalDelayLine:
    """Streaming fractional delay: a circular write head + fractional reads.

    Composes a channel-major ring (write side) with :func:`fractional_read`;
    the ring must be at least ``max_delay + ADDITIONAL_DELAY`` long
    (headroom contract, ref: src/FractionalSample.cpp:249-252).
    """

    def __init__(self, nchannels: int, length: int, dtype=jnp.float32):
        self.length = int(length)
        self.buf = jnp.zeros((nchannels, self.length), dtype)
        self.writepos = 0  # host-side frame counter (monotonic mod length)

    def write(self, block: jax.Array) -> None:
        """Append ``[C, B]`` samples at the write head."""
        B = block.shape[-1]
        start = self.writepos % self.length
        self.buf = _ring_write(self.buf, block, start)
        self.writepos += B

    def read(self, delays: jax.Array) -> jax.Array:
        """Read at fractional ``delays[C, n]`` (in frames) behind the write
        head.  Accounts for the filter's built-in ~7-sample lag is the
        caller's choice; the raw contract matches the reference."""
        pos = (self.writepos % self.length) - jnp.asarray(delays) + self.length
        return fractional_read(self.buf, pos % self.length)


@partial(jax.jit, static_argnames=())
def _ring_write(buf: jax.Array, block: jax.Array, start) -> jax.Array:
    L = buf.shape[-1]
    B = block.shape[-1]
    idx = (start + jnp.arange(B)) % L
    return buf.at[..., idx].set(block)
