"""Shared Pallas-TPU helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["precise_dot", "split_bf16", "precise_dot_split"]


def split_bf16(x):
    """Split ``x`` (f32) into the (hi, lo) bf16 operand pair of XLA's
    Precision.HIGH 3-pass algorithm.  Host-side pre-splitting of large
    matmul CONSTANTS keeps the split copies out of kernel VMEM — the
    perm-FFT kernels OOM'd the 16 MB scoped-vmem limit on v5e purely on
    in-kernel re-splits of their 4.2 MB stage-matrix pair (one hi/lo copy
    per dot; four dots per direction)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def precise_dot_split(ah, al, bh, bl):
    """``a @ b`` at Precision.HIGH given pre-split bf16 operand pairs
    (see :func:`split_bf16`); bit-identical to :func:`precise_dot` at
    prec=HIGH because the split is the same operation either side of the
    kernel boundary."""
    return (jnp.dot(ah, bh, preferred_element_type=jnp.float32)
            + jnp.dot(ah, bl, preferred_element_type=jnp.float32)
            + jnp.dot(al, bh, preferred_element_type=jnp.float32))


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
