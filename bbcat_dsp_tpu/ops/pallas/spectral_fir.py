"""Pallas TPU kernels: channel-tiled frequency-domain FIR MACs.

These are the production kernels for LARGE channel counts (the pod-scale
capacity point, BASELINE config #5: 1024 ch x 64k taps), where the whole
spectral queue cannot sit in VMEM at once and the XLA formulation's fused
slice-multiply-add chain re-reads HBM well above the traffic bound.

Two kernels, both tiling channels on the grid and accumulating in a
VMEM-resident output across the partition axis (one HBM read of the queue
and the IR spectra, one write of the accumulator — the information-theoretic
minimum for the op):

``rotated_mac_pallas``
    The uniform/tail overlap-save MAC with a compile-time queue cursor:

        acc[c, f] = sum_p queue[(slot - p) mod P, c, f] * H[p, c, f]

    (complex over re/im planes).  The rotation is folded into the BlockSpec
    index map — grid step (c, p) fetches queue block ``(slot - p) mod P`` —
    so no gather and no scalar prefetch is involved (the structures the
    remote Mosaic compiler rejected in round 1).

``head_mac_tiled_pallas``
    The batched head FIR over ``ratio`` in-flight small blocks:

        acc[i, c, f] = sum_p xext[P + i - p, c, f] * H[p, c, f]

    The P+R-deep spectra history for one channel tile stays VMEM-resident
    across the inner p loop (its index map ignores p), the sliding window is
    a dynamic slice on the leading partition axis, and H streams one
    partition at a time.

Numerics: float32, same p-accumulation order as the XLA path (any residual
difference is FMA contraction inside a product term, ~1 ulp).

Reference lineage: this implements the documented-absent Convolver /
BlockConvolver capability's hot loop (ref: README:38-44) at pod scale;
SURVEY.md SS2.2 "simd_utils -> VPU-vectorized kernels".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rotated_mac_pallas", "head_mac_tiled_pallas"]


def _pick_ct(C: int, per_channel_bytes: int, budget: int = 7 << 20) -> int:
    """Largest channel tile (divisor of C, power-of-two-ish) whose working
    set stays under ``budget`` bytes (pipeline double-buffering doubles it
    again, so keep this well below the 16 MB VMEM).  Floor of 8: the tile
    sits on the sublane axis, whose block size must be a multiple of 8."""
    ct = C
    while ct > 8 and (ct * per_channel_bytes > budget or C % ct):
        ct //= 2
    return max(8, ct) if C % 8 == 0 else C


def _rot_kernel(nparts: int, slot: int, q_ref, h_ref, o_ref):
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    qr = q_ref[0, 0]
    qi = q_ref[1, 0]
    hr = h_ref[0, 0]
    hi = h_ref[1, 0]
    o_ref[0] += qr * hr - qi * hi
    o_ref[1] += qr * hi + qi * hr


@partial(jax.jit, static_argnames=("slot", "ct", "interpret"))
def rotated_mac_pallas(
    queue: jax.Array,
    H: jax.Array,
    slot: int,
    ct: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """``queue [2, P, C, F]``, ``H [2, P, C, F]``, compile-time cursor
    ``slot`` -> ``acc [2, C, F]`` with ``acc = sum_p queue[(slot-p)%P]*H[p]``
    (complex via planes)."""
    _, P, C, F = H.shape
    if ct is None:
        # block working set per grid step: queue tile + H tile (+ out tile)
        ct = _pick_ct(C, 3 * 2 * F * 4)
    return pl.pallas_call(
        partial(_rot_kernel, P, slot),
        grid=(C // ct, P),
        in_specs=[
            pl.BlockSpec(
                (2, 1, ct, F),
                lambda c, p: (0, (slot - p) % P, c, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, 1, ct, F), lambda c, p: (0, p, c, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, ct, F), lambda c, p: (0, c, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, C, F), jnp.float32),
        interpret=interpret,
    )(queue, H)


def _head_kernel(nparts: int, ratio: int, x_ref, h_ref, o_ref):
    p = pl.program_id(1)

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


@partial(jax.jit, static_argnames=("ratio", "ct", "interpret"))
def head_mac_tiled_pallas(
    xext: jax.Array,
    H: jax.Array,
    ratio: int,
    ct: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """``xext [2, P+R, C, F]``, ``H [2, P, C, F]`` -> ``acc [2, R, C, F]``
    with ``acc[i] = sum_p xext[P+i-p]*H[p]`` (complex via planes)."""
    _, P, C, F = H.shape
    if ct is None:
        # resident history (P+R deep) + streamed H + R-deep accumulator;
        # the history block is pipeline-double-buffered across channel
        # tiles, so keep this budget conservative
        ct = _pick_ct(C, (2 * (P + ratio) + 2 + 2 * ratio) * F * 4,
                      budget=3 << 20)
    return pl.pallas_call(
        partial(_head_kernel, P, ratio),
        grid=(C // ct, P),
        in_specs=[
            pl.BlockSpec(
                (2, P + ratio, ct, F),
                lambda c, p: (0, 0, c, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, 1, ct, F), lambda c, p: (0, p, c, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, ratio, ct, F), lambda c, p: (0, 0, c, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, ratio, C, F), jnp.float32),
        interpret=interpret,
    )(xext, H)
