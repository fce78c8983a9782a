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

I/O is FLAT and tile-aligned (round 4): the kernels read and write the
engine's own flat spectral arrays directly —

``perm_rfft_half_pallas``:  x ``[rows, m]`` (m = n//2, the half window)
-> spectra ``[2, rows, F]`` in the tile-aligned permuted order
(r sections of n1/2 lanes, each a multiple of 128, then the r-bin
Nyquist tail at lane r*n1/2 — itself 128-aligned).

``perm_irfft_tail_pallas``: spec ``[2, rows, F]`` -> tail samples
``[rows, m]``.

The previous kernel I/O was 4-D ``[.., r, n1//2+1]``: the 129-lane minor
dim padded to 256 in the TPU (8,128) tiled layout, which doubled the
kernels' physical HBM traffic AND made the hook reshapes to the engine's
flat layout real relayouts (4.3 ms per pod render group, measured —
docs/PERFORMANCE.md "Config #5 residual attribution").  With flat aligned
I/O every hook reshape is a leading-axis split: a free bitcast.

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
# VMEM budget: the [n1, n1/2] constant pair is 2.1 MB at n1=1024 but
# 8.4 MB at n1=2048 (pre-split bf16 pairs double that), past the scoped
# budget once data blocks join.  The hooks gate on this; the XLA
# formulation serves larger sizes, and fft.resolve_spectral_spec warns
# LOUDLY when a forced-kernel config resolves past the ceiling
# (VERDICT r3 #8).
#
# Decision on extending to n1 = 2048 (evaluated, not built): no shipped
# or BASELINE config reaches n1 > 1024 — the auto radix window
# (fft._perm_radix, 256 <= n1 <= 1024) covers tail FFTs up to n = 32768
# (super-block 16384 = 4x the pod config), and beyond that the perm
# layout itself stops resolving.  Serving n1 = 2048 would need the
# pre-split bf16 constant pairs streamed in two [n1, n1/4] column tiles
# (two dot passes per direction, partial-sum concat in VMEM): ~8.4 MB
# resident constants + double the dot issue overhead.  A/B estimate from
# the measured radix trend (the dense stage dot dominates and SHRINKING
# n1 won — 26.9x -> 32.8x RT going n1 512 -> 256 at config #5): an
# n1=2048 kernel would sit BELOW the radix-32 path it would replace, so
# the extension has negative expected value; the right response to a
# hypothetical n1=2048 geometry is a larger radix (already automatic).
MAX_KERNEL_N1 = 1024

# The kernels require tile-aligned sections: n1/2 a multiple of the
# 128-lane tile (holds throughout the auto radix window's 256..1024).
MIN_KERNEL_N1 = 256


def kernel_serves_n1(n1: int) -> bool:
    """True when the fused perm-FFT kernels can serve inner length ``n1``:
    inside the VMEM ceiling window AND tile-aligned (n1/2 a multiple of
    the 128-lane tile — an in-window non-power-of-two like n1=384 would
    reintroduce the (8,128) padding the flat layout exists to remove)."""
    return MIN_KERNEL_N1 <= n1 <= MAX_KERNEL_N1 and n1 % 256 == 0


def _kara() -> bool:
    """In-kernel complex-matmul formulation: Karatsuba = 3 stage dots
    instead of 4 (25% fewer MXU passes at ~1.5x the rounding, still
    Precision.HIGH-class).  Defaults to Karatsuba — the v5e config-#5 A/B
    measured it ~7% faster end-to-end (30.4x -> 32.4x RT at radix 32) —
    overridable via BBCAT_DSP_KERNEL_CMATMUL, falling back to the
    module-wide BBCAT_DSP_CMATMUL when that is set explicitly (so a
    full-classic A/B run flips both).  Engines pass their frozen
    SpectralSpec.kernel_cmatmul instead (the ``kara`` wrapper arg)."""
    return resolve_kernel_cmatmul() == "karatsuba"


def resolve_kernel_cmatmul() -> str:
    """CANONICAL resolution of the in-kernel stage-dot formulation:
    ``BBCAT_DSP_KERNEL_CMATMUL`` if set, else ``BBCAT_DSP_CMATMUL`` if
    that is set explicitly (a full-classic A/B flips both), else
    ``"karatsuba"``.  ``fft.resolve_spectral_spec`` freezes this value
    into engine specs — keep exactly one implementation of the rule."""
    import os

    return os.environ.get(
        "BBCAT_DSP_KERNEL_CMATMUL",
        os.environ.get("BBCAT_DSP_CMATMUL", "karatsuba"))


def _alt_sign(shape, dtype):
    """``(-1)^j`` along the last axis — the exact Nyquist DFT weights
    (column/row n1/2 of the stage matrix), kept off the MXU so the dots
    stay exactly 128-lane-aligned."""
    j = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return jnp.where(j % 2 == 0, 1.0, -1.0).astype(dtype)


def _fwd_kernel(n: int, r: int, prec, kara: bool, x_ref, twr_ref, twi_ref,
                *rest):
    from ...convolve.fft import _radix_fft

    o_ref = rest[-1]
    n1 = n // r
    h = n1 // 2
    rt = x_ref.shape[0]
    # butterflied radix stage over the section axis (shared subterms in
    # registers; zero half and real input prune to ~(r/2)·log2(r)
    # butterflies).  Sections are aligned slices of the flat half window.
    xs = [(x_ref[:, j * n1:(j + 1) * n1], None) for j in range(r // 2)]
    xs += [(None, None)] * (r // 2)
    Y = _radix_fft(xs, -1.0)
    sgn = _alt_sign((1, n1), x_ref.dtype)
    trs = []
    tis = []
    nyrs = []
    nyis = []
    for k2 in range(r):
        yr, yi = Y[k2]
        if yr is None:
            yr = jnp.zeros_like(x_ref[:, :n1])
        if yi is None:
            yi = jnp.zeros_like(yr)
        twr = twr_ref[k2]
        twi = twi_ref[k2]
        tr = yr * twr - yi * twi
        ti = yr * twi + yi * twr
        trs.append(tr)
        tis.append(ti)
        # this section's Nyquist bin (k1 = n1/2): exact (-1)^j weights on
        # the VPU in EVERY precision mode (the weights are exact f32)
        nyrs.append(jnp.sum(tr * sgn, axis=-1, keepdims=True))
        nyis.append(jnp.sum(ti * sgn, axis=-1, keepdims=True))
    # one big-M matmul pair for all k2 rows (C1 shared): [r*rt, n1]
    tr = jnp.concatenate(trs, axis=0)
    ti = jnp.concatenate(tis, axis=0)
    # stage dots contract to exactly n1/2 columns — every MXU tile is
    # 128-aligned (the Nyquist column is the VPU sum above)
    if prec == jax.lax.Precision.HIGHEST:
        c1r_ref, c1i_ref = rest[:-1]
        c1r = c1r_ref[...]
        c1i = c1i_ref[...]
        zr = _dot(tr, c1r, prec) - _dot(ti, c1i, prec)
        zi = _dot(tr, c1i, prec) + _dot(ti, c1r, prec)
    elif kara:
        # HIGH + Karatsuba: 3 pre-split constant pairs (Cr, Ci, Cr+Ci),
        # 3 stage dots (9 MXU passes instead of 12)
        (c1rh_ref, c1rl_ref, c1ih_ref, c1il_ref,
         c1sh_ref, c1sl_ref) = rest[:-1]
        trh, trl = _split(tr)
        tih, til = _split(ti)
        tsh, tsl = _split(tr + ti)
        t1 = _dot_split(trh, trl, c1rh_ref[...], c1rl_ref[...])
        t2 = _dot_split(tih, til, c1ih_ref[...], c1il_ref[...])
        t3 = _dot_split(tsh, tsl, c1sh_ref[...], c1sl_ref[...])
        zr = t1 - t2
        zi = t3 - t1 - t2
    else:
        # HIGH: pre-split bf16 hi/lo constant pairs; tr/ti split ONCE and
        # reused across their two dots each
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
    # flat tile-aligned stores: section k2 at lanes [k2*h, (k2+1)*h)
    for k2 in range(r):
        o_ref[0, :, k2 * h:(k2 + 1) * h] = zr[k2 * rt:(k2 + 1) * rt]
        o_ref[1, :, k2 * h:(k2 + 1) * h] = zi[k2 * rt:(k2 + 1) * rt]
    # Nyquist tail [rt, r] at the 128-aligned lane offset r*h
    o_ref[0, :, r * h:r * h + r] = jnp.concatenate(nyrs, axis=-1)
    o_ref[1, :, r * h:r * h + r] = jnp.concatenate(nyis, axis=-1)


@partial(jax.jit, inline=True, static_argnames=("n", "rt", "interpret", "kara", "radix"))
def perm_rfft_half_pallas(x: jax.Array, n: int, rt: int | None = None,
                          interpret: bool = False,
                          kara: bool | None = None,
                          radix: int | None = None) -> jax.Array:
    """``x [rows, m]`` (m = n//2) -> flat permuted spectra ``[2, rows, F]``
    (F = r*(n1//2+1), tile-aligned order — see fft.py).

    ``kara`` fixes the in-kernel stage-dot formulation (engines pass it
    from their frozen SpectralSpec); ``None`` reads the env toggle.
    ``radix`` likewise fixes the layout radix (``None`` -> env)."""
    from ...convolve import fft as _fft

    rows, m = x.shape
    assert m == n // 2, (m, n)
    r = radix if radix is not None else _fft._perm_radix(n)
    n1 = n // r
    h = n1 // 2
    F = r * (h + 1)
    prec = _fft._PREC
    twr, twi = _fft._perm_consts(n, r)[:2]
    cr, ci = _fft._cmats(n1)
    c1r = jnp.asarray(cr[:, :h])
    c1i = jnp.asarray(ci[:, :h])
    if rt is None:
        # bound the concatenated big-M stage operands so the radix-stage
        # registers + tr/ti splits + dot partials + the constant pair stay
        # inside the scoped-VMEM limit (see compiler_params below)
        rt = max(8, min(32, (1 << 18) // (r * n1)))
        while rt > 8 and rows % rt:
            rt //= 2
    if rows % rt:
        # pad rows up to the tile size (zeros transform to zeros) instead
        # of putting the whole batch in one tile — a large odd row count
        # would otherwise blow the VMEM budget for direct API callers
        pad = -rows % rt
        out = perm_rfft_half_pallas(
            jnp.pad(x, ((0, pad), (0, 0))), n, rt=rt,
            interpret=interpret, kara=kara, radix=r)
        return out[:, :rows]
    if kara is None:
        kara = _kara()
    if prec == jax.lax.Precision.HIGHEST:
        consts = (c1r, c1i)
        kara = False
    elif kara:
        consts = _split(c1r) + _split(c1i) + _split(c1r + c1i)
    else:
        consts = _split(c1r) + _split(c1i)
    cspec = pl.BlockSpec((n1, h), lambda g: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_fwd_kernel, n, r, prec, kara),
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((rt, m), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, n1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, n1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [cspec] * len(consts),
        out_specs=pl.BlockSpec((2, rt, F), lambda g: (0, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, rows, F), jnp.float32),
        # the big-M stage dot's operands + partials need headroom past
        # Mosaic's default 16 MB scoped-vmem budget at rt=32/n1=1024;
        # v5e has 128 MB of VMEM — raise the scoped limit rather than
        # shrink the MXU tile
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x, jnp.asarray(twr), jnp.asarray(twi), *consts)


def _inv_kernel(n: int, r: int, prec, kara: bool, s_ref, wr_ref, wi_ref,
                twr_ref, twi_ref, *rest):
    from ...convolve.fft import _radix_fft

    o_ref = rest[-1]
    inv_n = 1.0 / n
    n1 = n // r
    h = n1 // 2
    rt = s_ref.shape[1]
    # weighted sections (hermitian-half weights, [r, h] constants), one
    # big-M matmul pair over all k2 rows (E1 shared): [r*rt, h]
    xr = jnp.concatenate(
        [s_ref[0, :, k2 * h:(k2 + 1) * h] * wr_ref[k2] for k2 in range(r)],
        axis=0)
    xi = jnp.concatenate(
        [s_ref[1, :, k2 * h:(k2 + 1) * h] * wi_ref[k2] for k2 in range(r)],
        axis=0)
    if prec == jax.lax.Precision.HIGHEST:
        e1r_ref, e1i_ref = rest[:-1]
        e1r = e1r_ref[...]
        e1i = e1i_ref[...]
        gr = _dot(xr, e1r, prec) - _dot(xi, e1i, prec)
        gi = _dot(xr, e1i, prec) + _dot(xi, e1r, prec)
    elif kara:
        # HIGH + Karatsuba (see the forward kernel)
        (e1rh_ref, e1rl_ref, e1ih_ref, e1il_ref,
         e1sh_ref, e1sl_ref) = rest[:-1]
        xrh, xrl = _split(xr)
        xih, xil = _split(xi)
        xsh, xsl = _split(xr + xi)
        t1 = _dot_split(xrh, xrl, e1rh_ref[...], e1rl_ref[...])
        t2 = _dot_split(xih, xil, e1ih_ref[...], e1il_ref[...])
        t3 = _dot_split(xsh, xsl, e1sh_ref[...], e1sl_ref[...])
        gr = t1 - t2
        gi = t3 - t1 - t2
    else:
        # HIGH with pre-split constants + one-time xr/xi splits (see the
        # forward kernel's VMEM note)
        e1rh_ref, e1rl_ref, e1ih_ref, e1il_ref = rest[:-1]
        e1rh = e1rh_ref[...]
        e1rl = e1rl_ref[...]
        e1ih = e1ih_ref[...]
        e1il = e1il_ref[...]
        xrh, xrl = _split(xr)
        xih, xil = _split(xi)
        gr = (_dot_split(xrh, xrl, e1rh, e1rl)
              - _dot_split(xih, xil, e1ih, e1il))
        gi = (_dot_split(xrh, xrl, e1ih, e1il)
              + _dot_split(xih, xil, e1rh, e1rl))
    # Nyquist contribution: of the r tail bins only position 0 (the true
    # bin n/2) carries hermitian weight (1.0, real part — the mirrors and
    # the imaginary part are zero-weighted); its E1 row is exactly
    # (-1)^t1, a rank-1 VPU term added to section k2 = 0 alone
    sgn = _alt_sign((1, n1), xr.dtype)
    g_n0 = s_ref[0, :, r * h:r * h + 1] * sgn               # [rt, n1]
    bs = []
    for k2 in range(r):
        g_r = gr[k2 * rt:(k2 + 1) * rt]
        g_i = gi[k2 * rt:(k2 + 1) * rt]
        if k2 == 0:
            g_r = g_r + g_n0
        twr = twr_ref[k2]
        twi = twi_ref[k2]
        bs.append((g_r * twr + g_i * twi, g_i * twr - g_r * twi))
    # butterflied inverse radix recombination; tail rows, real parts only,
    # stored as aligned flat sections of the output half window
    Yt = _radix_fft(bs, 1.0)
    for t2 in range(r // 2):
        o_ref[:, t2 * n1:(t2 + 1) * n1] = Yt[r // 2 + t2][0] * inv_n


@partial(jax.jit, inline=True, static_argnames=("n", "rt", "interpret", "kara"))
def perm_irfft_tail_pallas(spec: jax.Array, n: int, rt: int | None = None,
                           interpret: bool = False,
                           kara: bool | None = None) -> jax.Array:
    """Flat permuted spectra ``[2, rows, F]`` -> tail samples
    ``[rows, m]`` (m = n//2).

    ``kara`` as in :func:`perm_rfft_half_pallas`."""
    from ...convolve import fft as _fft

    _, rows, F = spec.shape
    # F = r*(n1/2 + 1) = n/2 + r, so the radix is recoverable from shape
    r = F - n // 2
    n1 = n // r
    h = n1 // 2
    assert r > 0 and n % r == 0 and F == r * (h + 1), (F, n, r)
    m = n // 2
    prec = _fft._PREC
    twr, twi, wr, wi = _fft._perm_consts(n, r)
    wr = wr[:, :h]  # section weights; the Nyquist tail is the rank-1 term
    wi = wi[:, :h]
    cr, ci = _fft._cmats(n1)
    e1r = jnp.asarray(cr[:h])
    e1i = jnp.asarray(-ci[:h])
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
            jnp.pad(spec, ((0, 0), (0, pad), (0, 0))), n, rt=rt,
            interpret=interpret, kara=kara)
        return out[:rows]
    if kara is None:
        kara = _kara()
    if prec == jax.lax.Precision.HIGHEST:
        econsts = (e1r, e1i)
        kara = False
    elif kara:
        econsts = _split(e1r) + _split(e1i) + _split(e1r + e1i)
    else:
        econsts = _split(e1r) + _split(e1i)
    consts = pl.BlockSpec((r, n1), lambda g: (0, 0),
                          memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((r, h), lambda g: (0, 0),
                         memory_space=pltpu.VMEM)
    espec = pl.BlockSpec((h, n1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_inv_kernel, n, r, prec, kara),
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((2, rt, F), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            wspec, wspec, consts, consts,
        ] + [espec] * len(econsts),
        out_specs=pl.BlockSpec((rt, m), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, m), jnp.float32),
        # same scoped-vmem headroom as the forward kernel (see there)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(spec, jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(twr),
      jnp.asarray(twi), *econsts)
