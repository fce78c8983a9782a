"""Late-bound hook connecting convolve to the optional Pallas kernels
(avoids a convolve <-> ops import cycle).

Policy (BBCAT_DSP_PALLAS_MAC):
  "auto" (default) - use the Pallas MAC kernels where the hardware A/B
      showed them winning (docs/PERFORMANCE.md "Pod-scale MAC"):  XLA's
      fused slice-multiply-add chain degrades with the partition count
      (measured v5e, F=4097: P=14/C=1024 7.7x slower, P=14/C=128 5.7x,
      P=64/C=64/F=513 8.5x; only the few-partition tail P=6 broke even),
  "1" - always use Pallas kernels.
  "0" - never (pure XLA formulation).

Every hook takes an optional explicit ``mode`` (and the perm-FFT pair a
full ``SpectralSpec``): engines pass their CONSTRUCTION-time frozen values
so a later env change cannot alter a built engine's program; ``None``
falls back to the env read (trace-time) for direct functional callers.
"""

from __future__ import annotations

import os
from functools import partial

# auto-mode gates, from the v5e A/B sweeps (docs/PERFORMANCE.md):
# rotated MAC wins for P >= 8 at any C >= 16 measured; the head FIR wins
# from C >= 64 (1.5x) and grows with C.  The original round-2 sweep put
# the fused-head gate at C >= 128 (-74% at C=64 then) and the element
# floors at 2M/512k — but the tile-aligned perm order + flat kernel I/O
# (round 4) changed the economics: re-measured at the 64ch x 32k-tap
# headline geometry, forcing ALL kernels is +23% device RTF (1102 ->
# 1352x; fused head alone +12%, the rest +11%) and +11 dB SNR (bf16-split
# HIGH everywhere).  Round 5 closed the C < 64 gap with DEVICE-attributed
# traces at the same geometry scaled down (BENCH_GATE_SWEEP.json —
# wall-clock there is relay-noise; device_rtf is the decision column):
# forcing the full stack wins at EVERY measured C — +4.5% at C=8,
# +30% at C=16, +41% at C=32, parity at C=64 (gates already open).
# Floors lowered so those geometries engage; the element floors still
# keep genuinely tiny shapes (unit-test sizes, F < ~256) on the XLA path
# where dispatch cost dominates any kernel win.
_ROT_MIN_PARTS = 8
_ROT_MIN_ELEMS = 128 * 1024         # P*C*F per plane (C=8 tail: 198k)
_HEAD_MIN_ELEMS = 64 * 1024         # P*C*F per plane (C=8 head: 65.7k)
_FUSED_MIN_CH = 8


def _mode() -> str:
    return os.environ.get("BBCAT_DSP_PALLAS_MAC", "auto")


def _interpret() -> bool:
    """Non-TPU backends run the kernels through the Pallas interpreter."""
    import jax

    return jax.default_backend() not in ("tpu",)


def maybe_pallas_mac(xext, H, ratio, mode: str | None = None):
    """Head MAC hook: ``None`` -> caller runs the XLA formulation."""
    if mode is None:
        mode = _mode()
    if mode == "0":
        return None
    _, P, C, F = H.shape
    if mode != "1" and (P * C * F < _HEAD_MIN_ELEMS
                        or C < _FUSED_MIN_CH or C % 8):
        return None
    from .ops.pallas import adjoint

    if C % 8 == 0 and C >= 16:
        from .ops.pallas.spectral_fir import head_mac_tiled_pallas

        kern = partial(head_mac_tiled_pallas, ratio=ratio,
                       interpret=_interpret())
    else:
        from .ops.pallas.spectral_mac import head_mac_pallas

        kern = partial(head_mac_pallas, ratio=ratio, interpret=_interpret())
    return adjoint.linear_vjp(
        kern, partial(adjoint.xla_head_mac, ratio=ratio))(xext, H)


def maybe_fused_head(x, xcarry, prev, H, block: int,
                     mode: str | None = None, layout: str | None = None):
    """Fused rFFT->MAC->irfft head super-kernel hook: ``None`` -> caller
    runs the unfused composition.  Gated separately
    (BBCAT_DSP_PALLAS_FUSED_HEAD=0/1/auto) so the super-kernel can be
    A/B'd against the unfused XLA pipeline independently of the MACs.
    ``layout`` is the head engine's frozen spectral layout when known."""
    if mode is None:
        mode = os.environ.get("BBCAT_DSP_PALLAS_FUSED_HEAD", _mode())
    if mode == "0":
        return None
    if layout is None:
        from .convolve.fft import half_engine_layout

        layout = half_engine_layout(2 * block)
    if layout != "std":
        return None  # the kernel's in-VMEM DFT assumes natural bin order
    _, P, C, F = H.shape
    if mode != "1" and (P * C * F < _HEAD_MIN_ELEMS
                        or C < _FUSED_MIN_CH or C % 8):
        return None
    from .ops.pallas import adjoint
    from .ops.pallas.fused_head import fused_head_pallas

    return adjoint.linear_vjp(
        partial(fused_head_pallas, block=block, interpret=_interpret()),
        partial(adjoint.xla_fused_head, block=block),
    )(x, xcarry, prev, H)


def maybe_xt_grouped_mac(queue, xt, H, slot0: int,
                         sign_section: int = 1,
                         sign_tail: int | None = None,
                         mode: str | None = None):
    """Whole-group tail MAC over the xt-slot queue layout (window assembly
    from raw half spectra in-kernel, NO queue writeback): ``None`` ->
    caller runs the XLA roll/concat/window/slide formulation.
    ``sign_section``/``sign_tail`` describe the shift signs of the
    caller's spectral layout (``fft.half_sign_section`` /
    ``fft.half_sign_tail``)."""
    if mode is None:
        mode = _mode()
    if mode == "0":
        return None
    _, P, C, F = H.shape
    if C % 8 or C < 16:
        # hard floor (even forced): ct=8 tiling at C=8 is unmeasured AND
        # the round-5 C=8 sweep cell won +4.5% WITHOUT this kernel, so
        # auto parity with the measured composite keeps it off there
        return None
    if mode != "1" and (P < 2 or P * C * F < _ROT_MIN_ELEMS):
        return None
    from .ops.pallas import adjoint
    from .ops.pallas.spectral_fir import xt_grouped_mac_pallas

    tail_ix = F if sign_tail is None else sign_tail
    return adjoint.linear_vjp(
        partial(xt_grouped_mac_pallas, slot0=slot0,
                sign_section=sign_section, sign_tail=sign_tail,
                interpret=_interpret()),
        partial(adjoint.xla_xt_grouped_mac, slot0=slot0,
                sec=sign_section, tail=tail_ix),
    )(queue, xt, H)


def _permfft_mode(spec=None) -> str | None:
    """BBCAT_DSP_PALLAS_PERMFFT gate, shared by both directions:
    "auto" (default) runs the fused kernels on TPU — the v5e A/B at
    config #5 measured perm+kernels 26.9-32.8x RT vs 23.5x std / 21.4x
    XLA-perm, radix-dependent — and declines off-TPU (the interpreter
    is orders of magnitude slower than the XLA formulation); "1" forces
    (interpreted off-TPU, how the CPU tests exercise kernel parity);
    "0" disables.  A frozen ``spec`` supplies the mode instead of env."""
    mode = (spec.permfft if spec is not None
            else os.environ.get("BBCAT_DSP_PALLAS_PERMFFT", "auto"))
    if mode == "0":
        return None
    if mode != "1" and _interpret():
        return None
    return mode


def maybe_perm_rfft_half(x, n: int, spec=None):
    """Fused permuted-layout half-window forward transform (``None`` ->
    the XLA formulation in fft._perm_rfft_half runs).  Kernel I/O is the
    engine's FLAT spectral layout, so the reshapes here only split/merge
    leading axes — free bitcasts."""
    if _permfft_mode(spec) is None:
        return None
    lead = x.shape[:-1]
    m = n // 2
    rows = 1
    for d in lead:
        rows *= int(d)
    from .convolve.fft import _perm_radix
    from .ops.pallas.perm_fft import kernel_serves_n1, perm_rfft_half_pallas

    r = spec.radix if spec is not None else _perm_radix(n)
    if (not r or not kernel_serves_n1(n // r)
            or x.shape[-1] != m or rows < 8 or rows % 8):
        return None
    from .ops.pallas import adjoint

    n1 = n // r
    out = adjoint.linear_vjp(
        partial(perm_rfft_half_pallas, n=n, interpret=_interpret(),
                kara=(spec.kernel_cmatmul == "karatsuba")
                if spec is not None else None, radix=r),
        partial(adjoint.xla_perm_rfft_half, n=n, spec=spec),
    )(x.reshape(rows, m))
    return out.reshape((2,) + tuple(lead) + (r * (n1 // 2 + 1),))


def maybe_perm_irfft_tail(spec_planes, n: int, spec=None):
    """Fused permuted-layout tail inverse (``None`` -> XLA path).  Flat
    kernel I/O — boundary reshapes are leading-axis bitcasts."""
    if _permfft_mode(spec) is None:
        return None
    lead = spec_planes.shape[1:-1]
    rows = 1
    for d in lead:
        rows *= int(d)
    from .convolve.fft import _perm_radix
    from .ops.pallas.perm_fft import kernel_serves_n1, perm_irfft_tail_pallas

    r = spec.radix if spec is not None else _perm_radix(n)
    if (not r or not kernel_serves_n1(n // r)
            or rows < 8 or rows % 8):
        return None
    from .ops.pallas import adjoint

    F = r * (n // r // 2 + 1)
    out = adjoint.linear_vjp(
        partial(perm_irfft_tail_pallas, n=n, interpret=_interpret(),
                kara=(spec.kernel_cmatmul == "karatsuba")
                if spec is not None else None),
        partial(adjoint.xla_perm_irfft_tail, n=n, spec=spec),
    )(spec_planes.reshape(2, rows, F))
    return out.reshape(tuple(lead) + (n // 2,))


def maybe_gather_supers(x, nsup: int, mode: str | None = None):
    """One-pass ``[C, T] -> [nsup, C, B2]`` marshalling transpose
    (``None`` -> caller uses reshape+moveaxis, which XLA lowers as two
    relayout copies)."""
    if mode is None:
        mode = _mode()
    if mode == "0":
        return None
    C, T = x.shape
    if C % 8 or C < 16 or T % nsup:
        return None
    if mode != "1" and C * T < _ROT_MIN_ELEMS:
        return None
    from .ops.pallas import adjoint
    from .ops.pallas.marshal import gather_supers_pallas

    return adjoint.linear_vjp(
        partial(gather_supers_pallas, nsup=nsup, interpret=_interpret()),
        partial(adjoint.xla_gather_supers, nsup=nsup),
    )(x)


def maybe_delayed_add(y_head, pending, out_tail, mode: str | None = None):
    """Fused pending-schedule output assembly (``None`` -> caller runs
    the XLA concat/moveaxis/add formulation)."""
    if mode is None:
        mode = _mode()
    if mode == "0":
        return None
    C, T = y_head.shape
    Pt = out_tail.shape[0]
    if C % 8 or C < 16 or T % Pt or pending.shape[0] != 2:
        return None
    if mode != "1" and C * T < _ROT_MIN_ELEMS:
        return None
    from .ops.pallas import adjoint
    from .ops.pallas.marshal import delayed_add_pallas

    return adjoint.linear_vjp(
        partial(delayed_add_pallas, interpret=_interpret()),
        adjoint.xla_delayed_add,
    )(y_head, pending, out_tail)


def maybe_rotated_mac(queue, H, slot: int, mode: str | None = None):
    """Static-cursor overlap-save MAC hook (uniform/tail engines):
    ``None`` -> caller runs the XLA static-slice formulation."""
    if mode is None:
        mode = _mode()
    if mode == "0":
        return None
    _, P, C, F = H.shape
    if C % 8 or C < 16:
        return None
    if mode != "1" and (P < _ROT_MIN_PARTS or P * C * F < _ROT_MIN_ELEMS):
        return None
    from .ops.pallas import adjoint
    from .ops.pallas.spectral_fir import rotated_mac_pallas

    return adjoint.linear_vjp(
        partial(rotated_mac_pallas, slot=slot, interpret=_interpret()),
        partial(adjoint.xla_rotated_mac, slot=slot),
    )(queue, H)
