"""FFT abstraction boundary.

The reference had a pluggable FFT interface with FFTW and KISS backends
(ref: README:46-51, documented-absent sources; debian/control:5 fftw3
dependency).  Here the same module boundary exists so backends can be
swapped: the default is XLA's native FFT (TPU-lowered), and the registry
leaves room for a Pallas radix kernel should XLA's lowering ever be the
bottleneck on a future chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rfft", "irfft", "register_backend", "backends"]


def _xla_rfft(x: jax.Array, n: int) -> jax.Array:
    return jnp.fft.rfft(x, n=n, axis=-1)


def _xla_irfft(x: jax.Array, n: int) -> jax.Array:
    return jnp.fft.irfft(x, n=n, axis=-1)


_BACKENDS: dict[str, tuple] = {"xla": (_xla_rfft, _xla_irfft)}
_DEFAULT = "xla"


def register_backend(name: str, rfft_fn, irfft_fn) -> None:
    _BACKENDS[name] = (rfft_fn, irfft_fn)


def backends() -> list[str]:
    return sorted(_BACKENDS)


def rfft(x: jax.Array, n: int, backend: str = _DEFAULT) -> jax.Array:
    """Real FFT of the last axis, zero-padded/truncated to length ``n``."""
    return _BACKENDS[backend][0](x, n)


def irfft(x: jax.Array, n: int, backend: str = _DEFAULT) -> jax.Array:
    """Inverse real FFT producing ``n`` real samples on the last axis."""
    return _BACKENDS[backend][1](x, n)
