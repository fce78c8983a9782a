"""Golden all-pass filter, float64.

Reproduces the reference recurrence (ref: src/AllPassFilter.h:69-74):

    w[n] = x[n] - c * y[n-?]  ... concretely the reference stores
    w[n] = x[n] - c * y[n] and emits y[n] = c * x[n] + w[n-d]

i.e. ``y[n] = c*x[n] + x[n-d] - c*y[n-d]`` — a Schroeder all-pass with
integer delay ``d`` per channel.
"""

from __future__ import annotations

import numpy as np


def allpass_process(x: np.ndarray, coeff: float, delay: int, w_init=None):
    """All-pass over ``[channels, time]``.  Returns ``(y, w_ring)``.

    ``w_ring`` is the per-channel ring of the last ``delay`` values of
    ``w[n] = x[n] - c*y[n]`` (ref: src/AllPassFilter.h:69-74 stores exactly
    this in its single ring buffer).
    """
    x = np.atleast_2d(np.asarray(x, np.float64))
    nch, n = x.shape
    w = np.zeros((nch, delay), np.float64) if w_init is None else np.asarray(
        w_init, np.float64
    ).copy()
    y = np.empty_like(x)
    pos = 0
    for i in range(n):
        delayed = w[:, pos].copy()
        yi = coeff * x[:, i] + delayed
        w[:, pos] = x[:, i] - coeff * yi
        y[:, i] = yi
        pos = (pos + 1) % delay
    return y, np.roll(w, -pos, axis=1)
