"""Generic circular buffer as a functional state pytree.

TPU-native equivalent of the reference's ``RingBuffer<T>``
(ref: src/RingBuffer.h:10-159): the mutable ring + write cursor becomes an
explicit ``(data [..., L], writepos)`` pytree threaded through pure jitted
ops.  Channel axes lead; time is the last (lane) axis.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["Ring", "ring_init", "ring_write", "ring_read_delayed", "ring_advance"]


class Ring(NamedTuple):
    data: jax.Array      # [..., length]
    writepos: jax.Array  # [] int32 (monotonic; wraps modulo length)


def ring_init(shape, length: int, dtype=jnp.float32) -> Ring:
    return Ring(
        data=jnp.zeros(tuple(shape) + (length,), dtype),
        writepos=jnp.zeros((), jnp.int32),
    )


@jax.jit
def ring_write(ring: Ring, block: jax.Array) -> Ring:
    """Write ``block [..., B]`` at the cursor and advance
    (ref: RingBuffer::Write, src/RingBuffer.h:68-107)."""
    L = ring.data.shape[-1]
    B = block.shape[-1]
    idx = jnp.mod(ring.writepos + jnp.arange(B), L)
    return Ring(
        data=ring.data.at[..., idx].set(block.astype(ring.data.dtype)),
        writepos=ring.writepos + B,
    )


@partial(jax.jit, static_argnames=("n",))
def ring_read_delayed(ring: Ring, delay, n: int = 1) -> jax.Array:
    """Read ``n`` consecutive samples starting ``delay`` samples behind the
    cursor (ref: RingBuffer::Read, src/RingBuffer.h:115-118)."""
    L = ring.data.shape[-1]
    start = ring.writepos - delay
    idx = jnp.mod(start + jnp.arange(n), L)
    out = ring.data[..., idx]
    return out[..., 0] if n == 1 else out


@jax.jit
def ring_advance(ring: Ring, n) -> Ring:
    """Advance the cursor without writing (zero-skip, ref: Advance,
    src/RingBuffer.h:124-127)."""
    return Ring(ring.data, ring.writepos + jnp.asarray(n, jnp.int32))
