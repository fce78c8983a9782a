"""Pallas TPU kernels: channel-tiled frequency-domain FIR MACs.

These are the production kernels for LARGE channel counts (the pod-scale
capacity point, BASELINE config #5: 1024 ch x 64k taps), where the whole
spectral queue cannot sit in VMEM at once and the XLA formulation's fused
slice-multiply-add chain re-reads HBM well above the traffic bound.

Three kernels, all tiling channels on the grid and accumulating in a
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

``windowed_grouped_mac_pallas``
    The whole-render-group tail engine: shift-theorem window assembly from
    raw half-spectra, all P overlap-save MAC outputs and the slot-encoded
    queue writeback in one pass (see its docstring).

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

__all__ = [
    "rotated_mac_pallas",
    "head_mac_tiled_pallas",
    "windowed_grouped_mac_pallas",
]


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


@partial(jax.jit, inline=True, static_argnames=("slot", "ct", "interpret"))
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


def _wgrouped_kernel(nparts: int, slot0: int, sec: int, tail: int, ft: int,
                     q_ref, xt_ref, pv_ref, h_ref,
                     o_ref, q2_ref, xw_ref):
    P = nparts
    # ---- window assembly into VMEM scratch (once per tile):
    # Xw[j] = xt[j-1] + s[k] xt[j], with xt[-1] = prev.  The shift-theorem
    # sign is (-1)^k in the STANDARD bin order (sec == 1) and constant per
    # k2 section of length ``sec`` in the permuted layout — both are
    # (-1)^(bin // sec) over the GLOBAL bin index (tile start f0 = i*ft) —
    # except over the permuted layout's Nyquist TAIL (bins >= ``tail``),
    # where the sign alternates per element: (-1)^(bin - tail).
    shp = xt_ref.shape[-2:]
    f0 = pl.program_id(1) * ft
    gbin = f0 + jax.lax.broadcasted_iota(jnp.int32, shp, 1)
    exp = jnp.where(gbin < tail, gbin // sec, gbin - tail)
    s = (1 - 2 * (exp % 2)).astype(xt_ref.dtype)
    for j in range(P):
        if j == 0:
            pr, pi = pv_ref[0], pv_ref[1]
        else:
            pr, pi = xt_ref[0, j - 1], xt_ref[1, j - 1]
        xw_ref[0, j] = pr + s * xt_ref[0, j]
        xw_ref[1, j] = pi + s * xt_ref[1, j]
    # ---- P^2 MAC over [past | windows]
    for j in range(P):
        acc_r = None
        acc_i = None
        for p in range(P):
            d = j - p
            if d >= 0:  # window assembled this group
                vr = xw_ref[0, d]
                vi = xw_ref[1, d]
            else:  # past window, slot-encoded in the queue
                k = (slot0 + P + d) % P
                vr = q_ref[0, k]
                vi = q_ref[1, k]
            hr = h_ref[0, p]
            hi = h_ref[1, p]
            tr = vr * hr - vi * hi
            ti = vr * hi + vi * hr
            acc_r = tr if acc_r is None else acc_r + tr
            acc_i = ti if acc_i is None else acc_i + ti
        o_ref[0, j] = acc_r
        o_ref[1, j] = acc_i
    # ---- rolled writeback: slot s <- window of group step (s-slot0)%P
    for sl in range(P):
        q2_ref[0, sl] = xw_ref[0, (sl - slot0) % P]
        q2_ref[1, sl] = xw_ref[1, (sl - slot0) % P]


@partial(jax.jit, inline=True,
         static_argnames=("slot0", "sign_section", "sign_tail", "ct", "ft",
                          "interpret"))
def windowed_grouped_mac_pallas(
    queue: jax.Array,
    xt: jax.Array,
    prev: jax.Array,
    H: jax.Array,
    slot0: int,
    sign_section: int = 1,
    sign_tail: int | None = None,
    ct: int | None = None,
    ft: int | None = None,
    interpret: bool = False,
):
    """Window assembly + all-P-outputs overlap-save MAC + queue writeback
    for a whole render group, in ONE kernel.

    ``queue [2, P, C, F]`` (slot-encoded past windows), ``xt [2, P, C, F]``
    (this group's HALF-window spectra, chronological), ``prev [2, C, F]``
    (previous half-window spectrum), ``H [2, P, C, F]`` ->

        Xw[j]   = xt[j-1] + (-1)^k xt[j]     (xt[-1] = prev)
        out[j]  = sum_p V[P+j-p] * H[p]      (V = [past | Xw])
        queue'  = Xw rolled into slot encoding

    One grid step owns one ``(ct, ft)`` channel-frequency tile: queue, xt
    and H are each read from HBM exactly ONCE, windows are assembled into
    VMEM scratch, the full static P^2 MAC accumulates in VMEM and
    out/queue' are written once — the materialised [prev|xt] concat, the
    multiply-subtract window pass, the [past|new] concat and the sliding
    hist slices of the XLA formulation (~13 GB at the pod config) all
    disappear."""
    _, P, C, F = H.shape
    if sign_tail is None:
        sign_tail = F  # no alternating tail (standard layout)
    if ct is None:
        ct = 8 if C % 8 == 0 else C
    if ft is None:
        # 6 resident [2, P, ct, ft] slabs (q, xt, h, out, q2, scratch) —
        # in/outs double-buffered by the pipeline; keep under ~12 MB VMEM.
        per_lane = 6 * 2 * P * ct * 4
        cap = max(128, ((5 << 20) // per_lane) // 128 * 128)
        best = None
        for cand in range(128, min(cap, ((F + 127) // 128) * 128) + 1, 128):
            total = -(-F // cand) * cand
            if best is None or total < best[0] or (
                    total == best[0] and cand > best[1]):
                best = (total, cand)
        ft = best[1]
    nf = -(-F // ft)
    spec = pl.BlockSpec(
        (2, P, ct, ft), lambda c, f: (0, 0, c, f), memory_space=pltpu.VMEM
    )
    pspec = pl.BlockSpec(
        (2, ct, ft), lambda c, f: (0, c, f), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_wgrouped_kernel, P, slot0, sign_section, sign_tail, ft),
        grid=(C // ct, nf),
        in_specs=[spec, spec, pspec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((2, P, C, F), jnp.float32),
            jax.ShapeDtypeStruct((2, P, C, F), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, P, ct, ft), jnp.float32)],
        # the queue is rewritten IN PLACE: q2 depends only on the xw
        # scratch (never on q_ref) and each grid step owns its own (c, f)
        # tile, so aliasing is race-free — and the render-level donation
        # no longer needs a full-queue protect copy (~1.4 ms at config #5)
        input_output_aliases={0: 1},
        interpret=interpret,
    )(queue, xt, prev, H)


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


@partial(jax.jit, inline=True, static_argnames=("ratio", "ct", "interpret"))
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
