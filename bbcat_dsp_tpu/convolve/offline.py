"""Offline (bounce/export) convolution: big-chunk overlap-save.

Streaming partitioned convolution pays for its block latency with HBM
traffic proportional to ``N / B`` partitions per block.  When there is no
latency requirement (bouncing a mix, batch rendering), one big FFT per
chunk needs only a few passes over the signal.

NOTE on this backend: with no hardware FFT, transforms cost
~(n1 + n2) MACs/sample via the matmul Cooley-Tukey — the SAME order as the
partitioned streaming engine's per-sample cost — so offline mode trades
latency for simplicity (single pass, stateless), not for speed.  On a
backend with a native FFT it would also be the fast path.

Uses the same plane-FFT backend (Cooley-Tukey for the large transforms);
float32 throughout, >=90 dB vs the float64 golden model like everything
else.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .fft import irfft_planes, rfft_planes

__all__ = ["offline_convolve"]


def _cmul(a, b):
    return jnp.stack(
        [a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]], axis=0
    )


@partial(jax.jit, static_argnames=("n", "hop", "nchunks", "T"))
def _ols(xpad, H, n: int, hop: int, nchunks: int, T: int):
    C = xpad.shape[0]

    prec = jax.lax.Precision.HIGHEST  # large transforms: keep the 90 dB
    # margin (HIGH loses ~4 dB per doubling of transform size)

    def body(_, i):
        seg = jax.lax.dynamic_slice_in_dim(xpad, i * hop, n, axis=-1)
        spec = rfft_planes(seg, n, precision=prec)
        Y = irfft_planes(_cmul(spec, H), n, precision=prec)
        return _, Y[..., n - hop:]  # keep the valid hop samples

    _, ys = jax.lax.scan(body, None, jnp.arange(nchunks))
    y = jnp.moveaxis(ys, 0, 1).reshape(C, nchunks * hop)
    return y[:, :T]


def offline_convolve(x: jax.Array, ir, n_fft: int | None = None) -> jax.Array:
    """Convolve ``x [C, T]`` (or ``[T]``) with ``ir [C, N]`` / ``[N]``,
    returning the first ``T`` output samples (streaming-aligned).

    ``n_fft`` defaults to the smallest power of two >= 8N (amortising the
    IR-length overlap to ~1/8 of each transform).
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    ir2 = np.atleast_2d(np.asarray(ir, np.float64))
    C, T = x.shape
    if ir2.shape[0] == 1 and C > 1:
        ir2 = np.broadcast_to(ir2, (C, ir2.shape[1]))
    N = ir2.shape[1]
    if n_fft is None:
        n_fft = 1 << int(np.ceil(np.log2(max(8 * N, 2048))))
    if n_fft < 2 * N:
        raise ValueError(f"n_fft={n_fft} too small for {N}-tap IR")
    hop = n_fft - N + 1
    spec = np.fft.rfft(np.concatenate(
        [ir2, np.zeros((C, n_fft - N))], -1), axis=-1)
    H = jnp.asarray(np.stack([spec.real, spec.imag]).astype(np.float32))

    nchunks = -(-T // hop)
    # left-pad N-1 (overlap-save history) and right-pad to whole chunks
    xpad = jnp.pad(
        x, [(0, 0), (N - 1, nchunks * hop - T + n_fft)]
    )[:, : (nchunks - 1) * hop + n_fft]
    y = _ols(xpad, H, n_fft, hop, nchunks, T)
    return y[0] if squeeze else y
