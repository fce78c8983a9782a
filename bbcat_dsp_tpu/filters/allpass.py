"""All-pass filters as phase-parallel scans.

The reference recurrence (ref: src/AllPassFilter.h:69-74):

    y[n] = c*x[n] + w[n-d]          w[n] = x[n] - c*y[n]

Substituting y gives a pure one-tap lag-d recurrence on w alone:

    w[n] = (1 - c^2) * x[n] - c * w[n-d]

which decomposes into ``d`` independent first-order affine recurrences
(one per phase ``n mod d``) — each parallelised over time with
``jax.lax.associative_scan`` instead of the reference's per-sample ring
buffer walk.  The per-channel state is the ring of the last ``d`` w values
(exactly what the reference's RingBuffer holds).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["allpass_apply", "AllPassFilter", "AllPassFilterChain", "comb_apply"]


@partial(jax.jit, static_argnames=("delay",))
def allpass_apply(
    x: jax.Array,
    coeff,
    delay: int,
    w_ring: jax.Array | None = None,
):
    """All-pass over ``x[..., T]`` with integer ``delay`` d.

    ``w_ring[..., d]`` holds the previous d values of w chronologically
    (``w_ring[..., i] = w[n0 - d + i]``).  Returns ``(y, new_ring)``.
    """
    T = x.shape[-1]
    d = int(delay)
    c = jnp.asarray(coeff, x.dtype)
    if w_ring is None:
        w_ring = jnp.zeros(x.shape[:-1] + (d,), x.dtype)

    pad = (-T) % d
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    m = xp.shape[-1] // d
    xb = xp.reshape(x.shape[:-1] + (m, d))  # [..., m, d] phase-major blocks

    alpha = 1.0 - c * c
    v = alpha * xb  # [..., m, d]
    beta = jnp.broadcast_to(-c, v.shape)

    def compose(f, g):
        bf, vf = f
        bg, vg = g
        return bf * bg, bg * vf + vg

    bcum, vcum = jax.lax.associative_scan(compose, (beta, v), axis=-2)
    w = bcum * w_ring[..., None, :] + vcum  # w_k[m] per phase
    w_prev = jnp.concatenate([w_ring[..., None, :], w[..., :-1, :]], axis=-2)
    y = (c * xb + w_prev).reshape(xp.shape)[..., :T]

    # new ring = w at samples T-d .. T-1 (chronological); if the block is
    # shorter than the delay, the oldest part carries over from the old ring
    wflat = w.reshape(xp.shape)
    if T >= d:
        new_ring = wflat[..., T - d : T]
    else:
        new_ring = jnp.concatenate([w_ring[..., T:], wflat[..., :T]], axis=-1)
    return y, new_ring


@partial(jax.jit, static_argnames=("delay",))
def comb_apply(x: jax.Array, feedback, delay: int,
               y_ring: jax.Array | None = None):
    """Feedback comb ``y[n] = x[n] + g * y[n - d]`` over ``x[..., T]`` —
    the other classic reverb building block next to the all-pass
    (ref: src/AllPassFilter.h:12-15 notes).  Same phase-decomposed
    associative-scan structure; state is the ring of the last ``d``
    outputs.  Returns ``(y, new_ring)``."""
    T = x.shape[-1]
    d = int(delay)
    g = jnp.asarray(feedback, x.dtype)
    if y_ring is None:
        y_ring = jnp.zeros(x.shape[:-1] + (d,), x.dtype)
    pad = (-T) % d
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    m = xp.shape[-1] // d
    xb = xp.reshape(x.shape[:-1] + (m, d))

    def compose(f, g_):
        bf, vf = f
        bg, vg = g_
        return bf * bg, bg * vf + vg

    beta = jnp.broadcast_to(g, xb.shape)
    bcum, vcum = jax.lax.associative_scan(compose, (beta, xb), axis=-2)
    y = bcum * y_ring[..., None, :] + vcum
    yflat = y.reshape(xp.shape)[..., :T]
    if T >= d:
        new_ring = yflat[..., T - d:T]
    else:
        new_ring = jnp.concatenate([y_ring[..., T:], yflat], axis=-1)
    return yflat, new_ring


class AllPassFilter:
    """Multi-channel all-pass (ref: src/AllPassFilter.h:17-135)."""

    def __init__(self, nchannels: int, delay: int, coeff: float,
                 dtype=jnp.float32):
        self.delay = int(delay)
        self.coeff = float(coeff)
        self.w = jnp.zeros((nchannels, self.delay), dtype)

    def process(self, x: jax.Array) -> jax.Array:
        y, self.w = allpass_apply(x, self.coeff, self.delay, self.w)
        return y

    def reset(self) -> None:
        self.w = jnp.zeros_like(self.w)


class AllPassFilterChain:
    """Serial composition of all-pass filters
    (ref: src/AllPassFilter.h:138-256)."""

    def __init__(self, filters):
        self.filters = list(filters)

    def process(self, x: jax.Array) -> jax.Array:
        for f in self.filters:
            x = f.process(x)
        return x

    def reset(self) -> None:
        for f in self.filters:
            f.reset()
