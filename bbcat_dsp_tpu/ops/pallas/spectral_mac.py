"""Pallas TPU kernel: fused frequency-domain-FIR multiply-accumulate.

The hot inner op of the non-uniform convolver head
(:func:`bbcat_dsp_tpu.convolve.nonuniform._head_mac`):

    acc[i] = sum_p  X[P + i - p] * H[p]          (complex, plane layout)

This kernel keeps the full spectra history in VMEM and walks the P
partitions on the grid, accumulating into a VMEM-resident output — one HBM
read of X and H and one write of acc, the information-theoretic minimum.

Status: verified bit-exact against the XLA formulation on real TPU
hardware.  XLA's own fusion of the shifted multiply-adds already sits
within ~25 % of the traffic bound for production shapes, so this kernel is
an optional backend (`use_pallas=True` / BBCAT_DSP_PALLAS_MAC=1) rather
than the default; it exists as the escape hatch for shapes where XLA's
fusion heuristics fall off, and as the template for deeper fusions
(rFFT -> MAC -> irFFT in one kernel) on future chips.

VMEM budget: X [2, P+R, C, F] + H tile + acc [2, R, C, F]; for the
flagship shape (P=16, R=8, C=64, F=513) that is ~8.7 MB — comfortably
inside the 16 MB/core budget.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["head_mac_pallas", "pallas_mac_enabled"]


def pallas_mac_enabled() -> bool:
    return os.environ.get("BBCAT_DSP_PALLAS_MAC", "0") == "1"


def _kernel(ratio: int, nparts: int, x_ref, h_ref, o_ref):
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    s = nparts - p  # window start into the (P+R)-deep spectra history
    xr = x_ref[0, pl.ds(s, ratio)]
    xi = x_ref[1, pl.ds(s, ratio)]
    hr = h_ref[0, 0]
    hi = h_ref[1, 0]
    o_ref[0] += xr * hr - xi * hi
    o_ref[1] += xr * hi + xi * hr


@partial(jax.jit, inline=True, static_argnames=("ratio", "interpret"))
def head_mac_pallas(
    xext: jax.Array, H: jax.Array, ratio: int, interpret: bool = False
) -> jax.Array:
    """``xext [2, P+ratio, C, F]``, ``H [2, P, C, F]`` ->
    ``acc [2, ratio, C, F]``."""
    _, P, C, F = H.shape
    return pl.pallas_call(
        partial(_kernel, ratio, P),
        grid=(P,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full spectra history
            pl.BlockSpec((2, 1, C, F), lambda p: (0, p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, ratio, C, F), lambda p: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, ratio, C, F), jnp.float32),
        interpret=interpret,
    )(xext, H)
