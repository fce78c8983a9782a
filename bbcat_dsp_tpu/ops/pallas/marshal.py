"""Pallas TPU kernels: render-group marshalling.

The non-uniform render group moves the signal between its two natural
shapes — channel-major ``[C, T]`` at the API boundary and window-major
``[Pt, C, B2]`` inside the tail path — and assembles the output as
``y = y_head + delayed`` where ``delayed`` is the tail outputs shifted by
the 2-slot pending schedule.  XLA lowers these steps as chains of
relayout copies + a pad/concat fusion + an add: 4.6 ms of pure HBM
traffic per pod render group, measured (docs/PERFORMANCE.md "Config #5
residual attribution").  Each kernel here does the same job in the
minimum number of HBM passes:

* :func:`gather_supers_pallas` — ``x [C, T] -> [Pt, C, B2]`` in ONE
  read + ONE write (XLA: relayout copy + transpose copy, 2x the traffic).

* :func:`delayed_add_pallas` — ``y[c, j*B2:] = y_head[c, j*B2:] +
  (pending[j] if j < 2 else out_tail[j-2])`` in one fused pass (XLA:
  concat fusion + two relayout copies + add).

Both are pure data movement: bandwidth-bound, trivially correct per
(channel-tile, super-block) grid step, and shape-agnostic in Pt (no
alignment requirement on the window count — the reason this marshalling
exists as kernels instead of a C-major state relayout, whose [.., Pt, F]
arrays would tile-pad Pt=14 -> 16).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_supers_pallas", "delayed_add_pallas"]


def _gather_kernel(x_ref, o_ref):
    o_ref[0] = x_ref[...]


@partial(jax.jit, inline=True, static_argnames=("nsup", "ct", "interpret"))
def gather_supers_pallas(x: jax.Array, nsup: int, ct: int | None = None,
                         interpret: bool = False) -> jax.Array:
    """``x [C, T]`` -> ``[nsup, C, T // nsup]`` (window-major view) in one
    HBM read + one write."""
    C, T = x.shape
    B2 = T // nsup
    if ct is None:
        ct = 8 if C % 8 == 0 else C
    return pl.pallas_call(
        _gather_kernel,
        grid=(nsup, C // ct),
        in_specs=[
            pl.BlockSpec((ct, B2), lambda j, c: (c, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ct, B2), lambda j, c: (j, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsup, C, B2), x.dtype),
        interpret=interpret,
    )(x)


def _delayed_add_kernel(yh_ref, pend_ref, tail_ref, o_ref):
    j = pl.program_id(1)
    d = jnp.where(j < 2, pend_ref[0], tail_ref[0])
    o_ref[...] = yh_ref[...] + d


@partial(jax.jit, inline=True, static_argnames=("ct", "interpret"))
def delayed_add_pallas(y_head: jax.Array, pending: jax.Array,
                       out_tail: jax.Array, ct: int | None = None,
                       interpret: bool = False) -> jax.Array:
    """Fused pending-schedule output assembly.

    ``y_head [C, T]`` (T = Pt*B2), ``pending [2, C, B2]``,
    ``out_tail [Pt, C, B2]`` ->
    ``y[c, j] = y_head[c, j] + (pending[j] if j < 2 else out_tail[j-2])``.

    Both candidate blocks are fetched per grid step (their index maps
    clamp) and the select is a VMEM ``where`` — the wasted fetch is two
    ``[ct, B2]`` blocks per channel tile, noise against the four full
    HBM passes the XLA formulation paid."""
    C, T = y_head.shape
    Pt = out_tail.shape[0]
    B2 = T // Pt
    if ct is None:
        ct = 8 if C % 8 == 0 else C
    return pl.pallas_call(
        _delayed_add_kernel,
        grid=(C // ct, Pt),
        in_specs=[
            pl.BlockSpec((ct, B2), lambda c, j: (c, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct, B2),
                         lambda c, j: (jnp.minimum(j, 1), c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct, B2),
                         lambda c, j: (jnp.maximum(j - 2, 0), c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ct, B2), lambda c, j: (c, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, T), y_head.dtype),
        interpret=interpret,
    )(y_head, pending, out_tail)
