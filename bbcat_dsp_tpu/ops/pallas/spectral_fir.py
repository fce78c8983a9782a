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

``xt_grouped_mac_pallas``
    The whole-render-group tail engine: shift-theorem window assembly from
    raw half-spectra (the xt-slot queue layout) and all P overlap-save MAC
    outputs in one pass, with NO queue writeback (see its docstring).

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
    "xt_grouped_mac_pallas",
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


def _xtgrouped_kernel(nparts: int, slot0: int, sec: int, tail: int, ft: int,
                      q_ref, xt_ref, h_ref, o_ref, xw_ref):
    P = nparts
    # ---- window assembly into VMEM scratch (once per tile): the 2P half
    # spectra [queue (slot-rotated) | xt] give the 2P-1 windows
    # w[k] = t[k] + s t[k+1] (shift theorem).  The sign is (-1)^bin in the
    # STANDARD bin order (sec == 1) and constant per k2 section of length
    # ``sec`` in the permuted layout — both are (-1)^(bin // sec) over the
    # GLOBAL bin index (tile start f0 = i*ft) — except over the permuted
    # layout's Nyquist TAIL (bins >= ``tail``), where the sign alternates
    # per element: (-1)^(bin - tail).
    shp = xt_ref.shape[-2:]
    f0 = pl.program_id(1) * ft
    gbin = f0 + jax.lax.broadcasted_iota(jnp.int32, shp, 1)
    exp = jnp.where(gbin < tail, gbin // sec, gbin - tail)
    s = (1 - 2 * (exp % 2)).astype(xt_ref.dtype)

    def t(i):  # chronological half spectrum i (0 .. 2P-1)
        if i < P:
            k = (slot0 + i) % P
            return q_ref[0, k], q_ref[1, k]
        return xt_ref[0, i - P], xt_ref[1, i - P]

    for k in range(2 * P - 1):
        ar, ai = t(k)
        br, bi = t(k + 1)
        xw_ref[0, k] = ar + s * br
        xw_ref[1, k] = ai + s * bi
    # ---- P^2 MAC: out[j] = sum_p w[P-1+j-p] * H[p]
    for j in range(P):
        acc_r = None
        acc_i = None
        for p in range(P):
            vr = xw_ref[0, P - 1 + j - p]
            vi = xw_ref[1, P - 1 + j - p]
            hr = h_ref[0, p]
            hi = h_ref[1, p]
            tr = vr * hr - vi * hi
            ti = vr * hi + vi * hr
            acc_r = tr if acc_r is None else acc_r + tr
            acc_i = ti if acc_i is None else acc_i + ti
        o_ref[0, j] = acc_r
        o_ref[1, j] = acc_i


@partial(jax.jit, inline=True,
         static_argnames=("slot0", "sign_section", "sign_tail", "ct", "ft",
                          "interpret"))
def xt_grouped_mac_pallas(
    queue: jax.Array,
    xt: jax.Array,
    H: jax.Array,
    slot0: int,
    sign_section: int = 1,
    sign_tail: int | None = None,
    ct: int | None = None,
    ft: int | None = None,
    interpret: bool = False,
):
    """Whole-render-group tail MAC over the xt-slot queue layout: window
    assembly from raw half spectra + all P overlap-save outputs, NO
    writeback (the caller's new carry is ``xt`` itself).

    ``queue [2, P, C, F]`` (slot-encoded past HALF-window spectra),
    ``xt [2, P, C, F]`` (this group's half spectra, chronological),
    ``H [2, P, C, F]`` ->

        t       = [queue rotated by slot0 | xt]          (2P half spectra)
        w[k]    = t[k] + (-1)^bin t[k+1]                 (2P-1 windows)
        out[j]  = sum_p w[P-1+j-p] * H[p]

    One grid step owns one ``(ct, ft)`` channel-frequency tile: queue, xt
    and H are each read from HBM exactly ONCE and only the accumulator is
    written — vs the round-4 windowed kernel this also drops the P-deep
    assembled-window queue writeback (473 MB/group at the pod config),
    the last structural saving STATUS.md r4 identified."""
    _, P, C, F = H.shape
    if sign_tail is None:
        sign_tail = F  # no alternating tail (standard layout)
    if ct is None:
        ct = 8 if C % 8 == 0 else C
    if ft is None:
        # resident slabs per (ct, ft) tile: q + xt + h + out (P-deep) and
        # the (2P-1)-deep window scratch ~ 6 P-deep slabs; in/outs
        # double-buffered by the pipeline; keep under ~12 MB VMEM.
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
    return pl.pallas_call(
        partial(_xtgrouped_kernel, P, slot0, sign_section, sign_tail, ft),
        grid=(C // ct, nf),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((2, P, C, F), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 2 * P - 1, ct, ft), jnp.float32)],
        # the accumulator reuses the QUEUE's buffer: after this kernel the
        # caller's queue carry is ``xt`` (nothing reads the old queue
        # again), each grid step reads only its own (c, f) queue tile
        # before writing that tile's acc, and the alias keeps peak HBM at
        # the round-4 level (one fewer 473 MB live buffer at config #5 —
        # the difference that pushed the render over the co-tenant
        # free-memory line and failed it with async InvalidArgument)
        input_output_aliases={0: 0},
        interpret=interpret,
    )(queue, xt, H)


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
