"""Pallas TPU super-kernel: fused rFFT -> spectral MAC -> irFFT head stage.

One kernel runs the ENTIRE batched head of the non-uniform convolver
(:func:`bbcat_dsp_tpu.convolve.nonuniform._head_step`) for a channel tile:

  1. half-window forward DFTs of the small blocks (MXU matmuls against
     the cos/-sin matrices — the TPU backend has no fft/complex),
  2. window assembly via the shift theorem
     (``W_i = Xhalf_{i-1} + (-1)^k Xhalf_i``),
  3. the P-partition frequency-domain FIR MAC over a VMEM-resident
     window-history,
  4. tail-only inverse DFTs (overlap-save keeps only the last B samples).

Intermediate spectra NEVER touch HBM, and for long batches (a whole
render group) the kernel grids TIME as the inner grid axis with the
carry LIVING IN THE OUTPUT BLOCK: Pallas revisiting semantics keep the
``xcarry``/``prev`` out-blocks and the ``H`` in-block VMEM-resident for
the whole row of time steps, so per group the kernel reads x + H(once) +
carry(once) and writes y + carry(once) — ~3x less HBM than the chunked
per-call formulation it replaces (H and carry re-read per chunk).

DFT matmuls follow the fft module's precision setting
(:func:`bbcat_dsp_tpu.convolve.fft.set_precision` — HIGH by default,
matching the unfused path): Mosaic only lowers DEFAULT/HIGHEST dot
precision, so HIGH is reproduced by manual bf16 operand splitting.

Capability lineage: documented-absent BlockConvolver/Convolver hot path
(ref: README:38-44); SURVEY.md §7 hard part #2 (fused spectral kernel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import precise_dot

# channel-tile VMEM budget for the auto ct heuristic below; module-level
# so shape experiments can tighten it without editing the heuristic
_CT_BUDGET_BYTES = 7 << 20

__all__ = ["fused_head_pallas"]

def _dot(a, b):
    from ...convolve import fft as _fft

    return precise_dot(a, b, _fft._PREC)


def _kernel(P: int, R: int, B: int, F: int, ct: int,
            x_ref, xc_ref, prev_ref, h_ref,
            ch_ref, sh_ref, ic_ref, is_ref, sg_ref,
            y_ref, xco_ref, po_ref):
    """One (channel-tile, time-chunk) grid step of ``R`` small blocks.

    The carry state lives in the OUTPUT refs (xco/po): their block index
    ignores the time axis, so Pallas keeps them VMEM-resident across the
    whole time row and flushes once per channel tile.  Time step 0 seeds
    them from the input carry."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        xco_ref[...] = xc_ref[...]
        po_ref[...] = prev_ref[...]

    # 1. half-window forward DFTs, all R blocks in one [R*ct, B] matmul
    xstk = jnp.concatenate(
        [x_ref[:, i * B:(i + 1) * B] for i in range(R)], axis=0
    )  # [R*ct, B]
    hre = _dot(xstk, ch_ref[...]).reshape(R, ct, F)
    him = _dot(xstk, sh_ref[...]).reshape(R, ct, F)

    # 2. window assembly: W_i = ext_i + s * ext_{i+1}, ext = [prev, h0..h{R-1}]
    sg = sg_ref[0]  # [F]
    wre = jnp.concatenate(
        [(po_ref[0] if i == 0 else hre[i - 1])[None] + sg * hre[i][None]
         for i in range(R)], axis=0)  # [R, ct, F]
    wim = jnp.concatenate(
        [(po_ref[1] if i == 0 else him[i - 1])[None] + sg * him[i][None]
         for i in range(R)], axis=0)

    # 3. P-partition MAC over the virtual [carry | new] window history —
    #    per partition the R-row sliding window is assembled from static
    #    slices of the carry state and the new-window values
    accr = jnp.zeros((R, ct, F), jnp.float32)
    acci = jnp.zeros((R, ct, F), jnp.float32)
    for p in range(P):
        if p == 0:
            xr, xi = wre, wim
        elif p < R:
            xr = jnp.concatenate([xco_ref[0, P - p:P], wre[:R - p]], axis=0)
            xi = jnp.concatenate([xco_ref[1, P - p:P], wim[:R - p]], axis=0)
        else:
            xr = xco_ref[0, P - p:P - p + R]
            xi = xco_ref[1, P - p:P - p + R]
        hr = h_ref[0, p]
        hi = h_ref[1, p]
        accr += xr * hr - xi * hi
        acci += xr * hi + xi * hr

    # 4. tail-only inverse DFTs, one [R*ct, F] matmul pair
    ystk = (_dot(accr.reshape(R * ct, F), ic_ref[...])
            + _dot(acci.reshape(R * ct, F), is_ref[...]))  # [R*ct, B]
    for i in range(R):
        y_ref[:, i * B:(i + 1) * B] = ystk[i * ct:(i + 1) * ct]

    # 5. carry update (AFTER the MAC read the old state): last P windows,
    # last half spectrum
    if R < P:
        xco_ref[0, :P - R] = xco_ref[0, R:]
        xco_ref[1, :P - R] = xco_ref[1, R:]
        xco_ref[0, P - R:] = wre
        xco_ref[1, P - R:] = wim
    else:
        xco_ref[0] = wre[R - P:]
        xco_ref[1] = wim[R - P:]
    po_ref[0] = hre[R - 1]
    po_ref[1] = him[R - 1]


@partial(jax.jit, inline=True, static_argnames=("block", "ct", "rt", "interpret"))
def fused_head_pallas(
    x: jax.Array,        # [C, n*B]
    xcarry: jax.Array,   # [2, P, C, F]
    prev: jax.Array,     # [2, C, F]
    H: jax.Array,        # [2, P, C, F]
    block: int,
    ct: int | None = None,
    rt: int | None = None,
    interpret: bool = False,
):
    """Fused head step over ``n`` small blocks (any multiple of the
    internal time chunk): returns ``(y [C, n*B], xcarry' [2,P,C,F],
    prev' [2,C,F])`` — contract identical to chaining the unfused
    ``_head_spectra -> _head_mac -> irfft_tail_planes`` composition."""
    from ...convolve.fft import _mats, half_engine_layout, half_window_signs

    if half_engine_layout(2 * block) != "std":
        # the in-VMEM DFT below assumes NATURAL bin order; feeding it a
        # permuted-layout head would return wrong audio, not an error
        raise ValueError(
            "fused_head_pallas requires the standard spectral layout, but "
            f"half_engine_layout({2 * block}) resolves 'perm' — route the "
            "head through the unfused path (ops_pallas_hook.maybe_fused_head "
            "does this automatically) or force BBCAT_DSP_PERM_LAYOUT=0"
        )
    _, P, C, F = H.shape
    B = block
    n = 2 * B
    nblocks = x.shape[-1] // B
    if rt is None:
        # time chunk: long batches grid time internally (carry resident);
        # prefer 16 blocks/step, fall back to the largest divisor
        rt = nblocks
        if nblocks > 16:
            for cand in (16, 14, 12, 8, 7, 4, 2, 1):
                if nblocks % cand == 0:
                    rt = cand
                    break
    R = rt
    cos, msin, icos, isin = _mats(n)
    ch = jnp.asarray(cos[:B])            # [B, F] half-window forward
    sh = jnp.asarray(msin[:B])
    ic = jnp.asarray(icos[:, B:])        # [F, B] tail-only inverse
    is_ = jnp.asarray(isin[:, B:])
    sg = jnp.asarray(half_window_signs(n))[None]  # [1, F]

    if ct is None:
        ct = C
        # per-channel f32 elements resident per tile: carry in/out + H
        # (6PF), new-window/half-spectra/accumulator stacks (~8RF), x/y,
        # prev/po; streamed blocks are pipeline-double-buffered on top.
        # Constants (DFT matrices, ~4.2 MB) are tile-independent and NOT
        # in this budget — 7 MB here lands ~14-15 MB total, inside the
        # 16 MB scoped-vmem limit with the compiler's own temporaries.
        per_ch = (6 * P + 8 * R + 8) * F + 4 * R * B
        while ct > 8 and (ct * per_ch * 4 > _CT_BUDGET_BYTES or C % ct):
            ct //= 2

    grid = (C // ct, nblocks // R)
    kernel = partial(_kernel, P, R, B, F, ct)
    y, xco, po = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ct, R * B), lambda c, t: (c, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, P, ct, F), lambda c, t: (0, 0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ct, F), lambda c, t: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, P, ct, F), lambda c, t: (0, 0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, F), lambda c, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, F), lambda c, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, B), lambda c, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, B), lambda c, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda c, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ct, R * B), lambda c, t: (c, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, P, ct, F), lambda c, t: (0, 0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ct, F), lambda c, t: (0, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, nblocks * B), jnp.float32),
            jax.ShapeDtypeStruct((2, P, C, F), jnp.float32),
            jax.ShapeDtypeStruct((2, C, F), jnp.float32),
        ],
        interpret=interpret,
    )(x, xcarry, prev, H, ch, sh, ic, is_, sg)
    return y, xco, po
