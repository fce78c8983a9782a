"""Pallas TPU kernels: permuted-layout half-window transforms.

Fused in-VMEM versions of :func:`bbcat_dsp_tpu.convolve.fft._perm_rfft_half`
and :func:`_perm_irfft_tail` (see that module's layout derivation).  The
XLA formulation is already transpose-free, but it materialises the
radix-stage intermediate (``[.., r, n1]`` complex — ~940 MB per direction
per render group at the pod config) between the fused elementwise pass and
the stage matmul.  Here one kernel invocation per row tile keeps every
intermediate in VMEM: the radix stage runs as butterflied radix-2 DIT
over the unrolled axis (``fft._radix_fft`` — zero-half/real-input
pruning, compile-time twiddles), the stage-B twiddle rides the same
registers, and ONE big-M matmul pair per tile (all k2 rows concatenated;
the stage matrix is shared) runs on the MXU with the fft module's
precision semantics (HIGH reproduced by manual bf16 operand splitting —
Mosaic only lowers DEFAULT/HIGHEST — exactly as :mod:`fused_head` does).

Shapes (r = 8, n1 = n // r, n1h1 = n1//2 + 1, m = n//2):

``perm_rfft_half_pallas``:  x3 ``[rows, r//2, n1]`` (a free reshape of the
half-window ``[rows, m]``) -> spectra ``[2, rows, r, n1h1]`` (a free
reshape of the flat permuted ``[2, rows, r*n1h1]``).

``perm_irfft_tail_pallas``: spec ``[2, rows, r, n1h1]`` -> tail samples
``[rows, r//2, n1]`` (free reshape of ``[rows, m]``).

Reference lineage: documented-absent FFT/BlockConvolver capability (ref:
README:38-51); SURVEY.md §7 hard part #2 (Pallas FFT at speed of light).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import precise_dot as _dot
from .common import precise_dot_split as _dot_split
from .common import split_bf16 as _split

__all__ = ["perm_rfft_half_pallas", "perm_irfft_tail_pallas"]

# Largest inner-transform length whose stage matrices fit the kernels'
# VMEM budget: the [n1, n1h1] constant pair is 4.2 MB at n1=1024 but
# 16.8 MB at n1=2048, past the ~16 MB scoped-vmem limit before any data
# blocks.  The hooks gate on this; the XLA formulation serves larger
# sizes, and fft.resolve_spectral_spec warns LOUDLY when a forced-kernel
# config resolves past the ceiling (VERDICT r3 #8).
#
# Decision on extending to n1 = 2048 (evaluated, not built): no shipped
# or BASELINE config reaches n1 > 1024 — the auto radix window
# (fft._perm_radix, 256 <= n1 <= 1024) covers tail FFTs up to n = 32768
# (super-block 16384 = 4x the pod config), and beyond that the perm
# layout itself stops resolving.  Serving n1 = 2048 would need the
# pre-split bf16 constant pairs streamed in two [n1, n1/4] column tiles
# (two dot passes per direction, partial-sum concat in VMEM): ~8.4 MB
# resident constants + double the dot issue overhead.  A/B estimate from
# the measured radix trend (the dense [n1, n1h1] stage dot dominates and
# SHRINKING n1 won — 26.9x -> 32.8x RT going n1 512 -> 256 at config #5):
# an n1=2048 kernel would sit BELOW the radix-32 path it would replace,
# so the extension has negative expected value; the right response to a
# hypothetical n1=2048 geometry is a larger radix (already automatic).
MAX_KERNEL_N1 = 1024


def _kara() -> bool:
    """In-kernel complex-matmul formulation: Karatsuba = 3 stage dots
    instead of 4 (25% fewer MXU passes at ~1.5x the rounding, still
    Precision.HIGH-class).  Defaults to Karatsuba — the v5e config-#5 A/B
    measured it ~7% faster end-to-end (30.4x -> 32.4x RT at radix 32) —
    overridable via BBCAT_DSP_KERNEL_CMATMUL, falling back to the
    module-wide BBCAT_DSP_CMATMUL when that is set explicitly (so a
    full-classic A/B run flips both).  Read at trace time, like
    fft._cmatmul."""
    import os

    v = os.environ.get(
        "BBCAT_DSP_KERNEL_CMATMUL",
        os.environ.get("BBCAT_DSP_CMATMUL", "karatsuba"))
    return v == "karatsuba"


def _alt_sign(shape, dtype):
    """``(-1)^j`` along the last axis — the exact Nyquist-bin DFT weights
    (column n1/2 of the stage matrix), kept off the MXU so the dots stay
    exactly 128-lane-aligned."""
    j = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return jnp.where(j % 2 == 0, 1.0, -1.0).astype(dtype)


def _fwd_kernel(n: int, r: int, prec, kara: bool, x_ref, twr_ref, twi_ref,
                *rest):
    from ...convolve.fft import _radix_fft

    o_ref = rest[-1]
    # butterflied radix stage over the unrolled axis (shared subterms in
    # registers; zero half and real input prune to ~(r/2)·log2(r)
    # butterflies)
    xs = [(x_ref[:, j], None) for j in range(r // 2)]
    xs += [(None, None)] * (r // 2)
    Y = _radix_fft(xs, -1.0)
    trs = []
    tis = []
    for k2 in range(r):
        yr, yi = Y[k2]
        if yr is None:
            yr = jnp.zeros_like(x_ref[:, 0])
        if yi is None:
            yi = jnp.zeros_like(yr)
        twr = twr_ref[k2]
        twi = twi_ref[k2]
        trs.append(yr * twr - yi * twi)
        tis.append(yr * twi + yi * twr)
    # one big-M matmul pair for all k2 rows (C1 shared): [r*rt, n1]
    rt = x_ref.shape[0]
    n1 = x_ref.shape[-1]
    tr = jnp.concatenate(trs, axis=0)
    ti = jnp.concatenate(tis, axis=0)
    if prec == jax.lax.Precision.HIGHEST:
        c1r_ref, c1i_ref = rest[:-1]
        c1r = c1r_ref[...]
        c1i = c1i_ref[...]
        zr = _dot(tr, c1r, prec) - _dot(ti, c1i, prec)
        zi = _dot(tr, c1i, prec) + _dot(ti, c1r, prec)
    elif kara:
        # HIGH + Karatsuba: 3 pre-split constant pairs (Cr, Ci, Cr+Ci),
        # 3 stage dots (9 MXU passes instead of 12).  The Nyquist column
        # (k1 = n1/2, where C1[j] = (-1)^j exactly) is NOT in the dots:
        # the constants arrive sliced to n1/2 columns so every MXU tile is
        # exactly 128-aligned (n1/2+1 wastes a whole second lane tile),
        # and the Nyquist bin is an exact-f32 VPU sign-sum instead
        (c1rh_ref, c1rl_ref, c1ih_ref, c1il_ref,
         c1sh_ref, c1sl_ref) = rest[:-1]
        trh, trl = _split(tr)
        tih, til = _split(ti)
        tsh, tsl = _split(tr + ti)
        t1 = _dot_split(trh, trl, c1rh_ref[...], c1rl_ref[...])
        t2 = _dot_split(tih, til, c1ih_ref[...], c1il_ref[...])
        t3 = _dot_split(tsh, tsl, c1sh_ref[...], c1sl_ref[...])
        sgn = _alt_sign((1, n1), tr.dtype)
        zr = jnp.concatenate(
            [t1 - t2, jnp.sum(tr * sgn, -1, keepdims=True)], axis=-1)
        zi = jnp.concatenate(
            [t3 - t1 - t2, jnp.sum(ti * sgn, -1, keepdims=True)], axis=-1)
    else:
        # HIGH: the stage-matrix pair arrives PRE-SPLIT (bf16 hi/lo) so
        # the kernel holds 4.2 MB of constants total instead of the f32
        # pair PLUS one hi/lo re-split per dot (4 dots -> 20.9 MB measured
        # scoped-vmem on v5e, past the 16 MB limit); tr/ti split ONCE and
        # reused across their two dots each.  Nyquist column on the VPU
        # (see the Karatsuba branch)
        c1rh_ref, c1rl_ref, c1ih_ref, c1il_ref = rest[:-1]
        c1rh = c1rh_ref[...]
        c1rl = c1rl_ref[...]
        c1ih = c1ih_ref[...]
        c1il = c1il_ref[...]
        trh, trl = _split(tr)
        tih, til = _split(ti)
        zr = (_dot_split(trh, trl, c1rh, c1rl)
              - _dot_split(tih, til, c1ih, c1il))
        zi = (_dot_split(trh, trl, c1ih, c1il)
              + _dot_split(tih, til, c1rh, c1rl))
        sgn = _alt_sign((1, n1), tr.dtype)
        zr = jnp.concatenate(
            [zr, jnp.sum(tr * sgn, -1, keepdims=True)], axis=-1)
        zi = jnp.concatenate(
            [zi, jnp.sum(ti * sgn, -1, keepdims=True)], axis=-1)
    for k2 in range(r):
        o_ref[0, :, k2] = zr[k2 * rt:(k2 + 1) * rt]
        o_ref[1, :, k2] = zi[k2 * rt:(k2 + 1) * rt]


@partial(jax.jit, static_argnames=("n", "rt", "interpret", "kara"))
def perm_rfft_half_pallas(x3: jax.Array, n: int, rt: int | None = None,
                          interpret: bool = False,
                          kara: bool | None = None) -> jax.Array:
    """``x3 [rows, r//2, n1]`` -> permuted spectra ``[2, rows, r, n1h1]``.

    ``kara`` fixes the in-kernel stage-dot formulation (engines pass it
    from their frozen SpectralSpec); ``None`` reads the env toggle."""
    from ...convolve import fft as _fft

    rows, rh, n1 = x3.shape
    r = 2 * rh
    n1h1 = n1 // 2 + 1
    prec = _fft._PREC
    twr, twi = _fft._perm_consts(n, r)[:2]
    cr, ci = _fft._cmats(n1)
    c1r = jnp.asarray(cr[:, :n1h1])
    c1i = jnp.asarray(ci[:, :n1h1])
    if rt is None:
        # bound the concatenated big-M stage operands so the radix-stage
        # registers + tr/ti splits + dot partials + the 4.2 MB (pre-split)
        # constant pair stay inside the 16 MB scoped-VMEM limit; rt=64 at
        # n1=1024 measured 20.9 MB on v5e with in-kernel const splits —
        # the splits are hoisted to the host now, but 1<<18 (rt=32)
        # keeps the data-side share conservative
        rt = max(8, min(32, (1 << 18) // (r * n1)))
        while rt > 8 and rows % rt:
            rt //= 2
    if rows % rt:
        # pad rows up to the tile size (zeros transform to zeros) instead
        # of putting the whole batch in one tile — a large odd row count
        # would otherwise blow the VMEM budget for direct API callers
        pad = -rows % rt
        out = perm_rfft_half_pallas(
            jnp.pad(x3, ((0, pad), (0, 0), (0, 0))), n, rt=rt,
            interpret=interpret, kara=kara)
        return out[:, :rows]
    if kara is None:
        kara = _kara()
    if prec == jax.lax.Precision.HIGHEST:
        consts = (c1r, c1i)
        kara = False
        ncols = n1h1
    else:
        # HIGH paths: Nyquist column on the VPU, so the dot constants
        # carry exactly n1/2 columns (one fewer lane tile per operand)
        c1r = c1r[:, : n1h1 - 1]
        c1i = c1i[:, : n1h1 - 1]
        ncols = n1h1 - 1
        if kara:
            consts = _split(c1r) + _split(c1i) + _split(c1r + c1i)
        else:
            consts = _split(c1r) + _split(c1i)
    cspec = pl.BlockSpec((n1, ncols), lambda g: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_fwd_kernel, n, r, prec, kara),
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((rt, r // 2, n1), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, n1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, n1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [cspec] * len(consts),
        out_specs=pl.BlockSpec((2, rt, r, n1h1), lambda g: (0, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, rows, r, n1h1), jnp.float32),
        # the big-M stage dot's operands + partials measured 17.8 MB at
        # rt=32/n1=1024 against Mosaic's default 16 MB scoped-vmem budget;
        # v5e has 128 MB of VMEM — raise the scoped limit rather than
        # shrink the MXU tile
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x3, jnp.asarray(twr), jnp.asarray(twi), *consts)


def _inv_kernel(n: int, r: int, prec, kara: bool, s_ref, wr_ref, wi_ref,
                twr_ref, twi_ref, *rest):
    from ...convolve.fft import _radix_fft

    o_ref = rest[-1]
    inv_n = 1.0 / n
    rt = s_ref.shape[1]
    # one big-M matmul pair over all k2 rows (E1 shared): [r*rt, n1h1]
    xr = jnp.concatenate(
        [s_ref[0, :, k2] * wr_ref[k2] for k2 in range(r)], axis=0)
    xi = jnp.concatenate(
        [s_ref[1, :, k2] * wi_ref[k2] for k2 in range(r)], axis=0)
    if prec == jax.lax.Precision.HIGHEST:
        e1r_ref, e1i_ref = rest[:-1]
        e1r = e1r_ref[...]
        e1i = e1i_ref[...]
        gr = _dot(xr, e1r, prec) - _dot(xi, e1i, prec)
        gi = _dot(xr, e1i, prec) + _dot(xi, e1r, prec)
    else:
        # HIGH paths contract over exactly n1/2 bins on the MXU (the
        # constants arrive with the Nyquist ROW dropped, so the contract
        # dim is 128-aligned instead of wasting a whole K tile on bin
        # n1/2); the Nyquist row of E1 is cos(pi t1) = (-1)^t1, sin = 0,
        # so its rank-1 contribution is an exact-f32 sign-broadcast add
        n1 = o_ref.shape[-1]
        nh = xr.shape[-1] - 1
        sgn = _alt_sign((1, n1), xr.dtype)
        g_nr = xr[:, nh:] * sgn
        g_ni = xi[:, nh:] * sgn
        xr = xr[:, :nh]
        xi = xi[:, :nh]
        if kara:
            # HIGH + Karatsuba (see the forward kernel)
            (e1rh_ref, e1rl_ref, e1ih_ref, e1il_ref,
             e1sh_ref, e1sl_ref) = rest[:-1]
            xrh, xrl = _split(xr)
            xih, xil = _split(xi)
            xsh, xsl = _split(xr + xi)
            t1 = _dot_split(xrh, xrl, e1rh_ref[...], e1rl_ref[...])
            t2 = _dot_split(xih, xil, e1ih_ref[...], e1il_ref[...])
            t3 = _dot_split(xsh, xsl, e1sh_ref[...], e1sl_ref[...])
            gr = t1 - t2 + g_nr
            gi = t3 - t1 - t2 + g_ni
        else:
            # HIGH with pre-split constants + one-time xr/xi splits (see
            # the forward kernel's VMEM note)
            e1rh_ref, e1rl_ref, e1ih_ref, e1il_ref = rest[:-1]
            e1rh = e1rh_ref[...]
            e1rl = e1rl_ref[...]
            e1ih = e1ih_ref[...]
            e1il = e1il_ref[...]
            xrh, xrl = _split(xr)
            xih, xil = _split(xi)
            gr = (_dot_split(xrh, xrl, e1rh, e1rl)
                  - _dot_split(xih, xil, e1ih, e1il) + g_nr)
            gi = (_dot_split(xrh, xrl, e1ih, e1il)
                  + _dot_split(xih, xil, e1rh, e1rl) + g_ni)
    bs = []
    for k2 in range(r):
        g_r = gr[k2 * rt:(k2 + 1) * rt]
        g_i = gi[k2 * rt:(k2 + 1) * rt]
        twr = twr_ref[k2]
        twi = twi_ref[k2]
        bs.append((g_r * twr + g_i * twi, g_i * twr - g_r * twi))
    # butterflied inverse radix recombination; tail rows, real parts only
    Yt = _radix_fft(bs, 1.0)
    for t2 in range(r // 2):
        o_ref[:, t2] = Yt[r // 2 + t2][0] * inv_n


@partial(jax.jit, static_argnames=("n", "rt", "interpret", "kara"))
def perm_irfft_tail_pallas(spec: jax.Array, n: int, rt: int | None = None,
                           interpret: bool = False,
                           kara: bool | None = None) -> jax.Array:
    """``spec [2, rows, r, n1h1]`` -> tail samples ``[rows, r//2, n1]``.

    ``kara`` as in :func:`perm_rfft_half_pallas`."""
    from ...convolve import fft as _fft

    _, rows, r, n1h1 = spec.shape
    n1 = n // r
    prec = _fft._PREC
    twr, twi, wr, wi = _fft._perm_consts(n, r)
    cr, ci = _fft._cmats(n1)
    e1r = jnp.asarray(cr[:n1h1])
    e1i = jnp.asarray(-ci[:n1h1])
    if rt is None:
        # same scoped-VMEM bound as the forward kernel (see there)
        rt = max(8, min(32, (1 << 18) // (r * n1)))
        while rt > 8 and rows % rt:
            rt //= 2
    if rows % rt:
        # pad rows up to the tile size rather than one whole-batch tile
        # (VMEM blow-up for direct API callers with odd row counts)
        pad = -rows % rt
        out = perm_irfft_tail_pallas(
            jnp.pad(spec, ((0, 0), (0, pad), (0, 0), (0, 0))), n, rt=rt,
            interpret=interpret, kara=kara)
        return out[:rows]
    if kara is None:
        kara = _kara()
    if prec == jax.lax.Precision.HIGHEST:
        econsts = (e1r, e1i)
        kara = False
        krows = n1h1
    else:
        # HIGH paths: Nyquist ROW handled as a rank-1 VPU term in the
        # kernel, so the dot constants contract over exactly n1/2 bins
        e1r = e1r[: n1h1 - 1]
        e1i = e1i[: n1h1 - 1]
        krows = n1h1 - 1
        if kara:
            econsts = _split(e1r) + _split(e1i) + _split(e1r + e1i)
        else:
            econsts = _split(e1r) + _split(e1i)
    consts = pl.BlockSpec((r, n1), lambda g: (0, 0),
                          memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((r, n1h1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM)
    espec = pl.BlockSpec((krows, n1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_inv_kernel, n, r, prec, kara),
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((2, rt, r, n1h1), lambda g: (0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, wspec, consts, consts,
        ] + [espec] * len(econsts),
        out_specs=pl.BlockSpec((rt, r // 2, n1), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, r // 2, n1), jnp.float32),
        # same scoped-vmem headroom as the forward kernel (see there)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(spec, jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(twr),
      jnp.asarray(twi), *econsts)
