"""Shared Pallas-TPU helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["precise_dot"]


def precise_dot(a, b, prec):
    """``a @ b`` at the fft module's precision semantics inside a kernel.

    Mosaic only lowers DEFAULT/HIGHEST dot precision, so HIGH (XLA's
    3-pass bf16 operand splitting, ~1.2e-5 operand error at ~half the
    HIGHEST cost) is reproduced manually."""
    if prec == jax.lax.Precision.HIGHEST:
        return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(ah, bh, preferred_element_type=jnp.float32)
            + jnp.dot(ah, bl, preferred_element_type=jnp.float32)
            + jnp.dot(al, bh, preferred_element_type=jnp.float32))
