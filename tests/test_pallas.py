"""Pallas kernels vs XLA formulations (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from bbcat_dsp_tpu.ops.pallas import head_mac_pallas
from bbcat_dsp_tpu.convolve.nonuniform import _head_mac


def test_head_mac_pallas_matches_xla(rng):
    P, ratio, C, F = 8, 4, 8, 129
    xext = jnp.asarray(rng.standard_normal((2, P + ratio, C, F)).astype(np.float32))
    H = jnp.asarray(rng.standard_normal((2, P, C, F)).astype(np.float32))
    a = np.asarray(_head_mac(xext, H, ratio))
    b = np.asarray(head_mac_pallas(xext, H, ratio, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_rotated_mac_pallas_matches_xla(rng):
    """Channel-tiled static-cursor MAC == the static-slice loop, for every
    cursor position (same accumulation order; tolerance covers FMA
    contraction differences between the interpreter and numpy)."""
    from bbcat_dsp_tpu.ops.pallas import rotated_mac_pallas

    P, C, F = 5, 16, 65
    queue = jnp.asarray(rng.standard_normal((2, P, C, F)).astype(np.float32))
    H = jnp.asarray(rng.standard_normal((2, P, C, F)).astype(np.float32))
    for slot in range(P):
        acc_r = np.zeros((C, F), np.float32)
        acc_i = np.zeros((C, F), np.float32)
        q = np.asarray(queue)
        h = np.asarray(H)
        for p in range(P):
            sl = (slot - p) % P
            acc_r = acc_r + (q[0, sl] * h[0, p] - q[1, sl] * h[1, p])
            acc_i = acc_i + (q[0, sl] * h[1, p] + q[1, sl] * h[0, p])
        got = np.asarray(
            rotated_mac_pallas(queue, H, slot, ct=8, interpret=True)
        )
        np.testing.assert_allclose(got[0], acc_r, atol=2e-5)
        np.testing.assert_allclose(got[1], acc_i, atol=2e-5)


def test_head_mac_tiled_pallas_matches_xla(rng):
    from bbcat_dsp_tpu.ops.pallas import head_mac_tiled_pallas

    P, ratio, C, F = 8, 4, 16, 129
    xext = jnp.asarray(
        rng.standard_normal((2, P + ratio, C, F)).astype(np.float32))
    H = jnp.asarray(rng.standard_normal((2, P, C, F)).astype(np.float32))
    a = np.asarray(_head_mac(xext, H, ratio))
    b = np.asarray(head_mac_tiled_pallas(xext, H, ratio, ct=8, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_xt_grouped_mac_pallas_matches_reference(rng):
    """Whole-group xt-layout MAC kernel == the overlap-save definition:
    half spectra t = [queue rotated by slot0 | xt], windows
    w[k] = t[k] + (-1)^bin t[k+1], out[j] = sum_p w[P-1+j-p]*H[p], for
    every cursor.  No writeback output — the caller carries xt itself."""
    from bbcat_dsp_tpu.ops.pallas import xt_grouped_mac_pallas

    P, C, F = 5, 16, 65
    signs = (-1.0) ** np.arange(F)
    for slot0 in range(P):
        q = rng.standard_normal((2, P, C, F)).astype(np.float32)
        xt = rng.standard_normal((2, P, C, F)).astype(np.float32)
        h = rng.standard_normal((2, P, C, F)).astype(np.float32)
        out = xt_grouped_mac_pallas(
            jnp.asarray(q), jnp.asarray(xt), jnp.asarray(h), slot0,
            interpret=True)
        tpast = q[:, (np.arange(P) + slot0) % P]
        tseq = np.concatenate([tpast, xt], axis=1)
        w = (tseq[:, :-1] + signs * tseq[:, 1:]).astype(np.float32)
        Wc, Hc = w[0] + 1j * w[1], h[0] + 1j * h[1]
        ref = np.stack([
            sum(Wc[P - 1 + j - p] * Hc[p] for p in range(P))
            for j in range(P)])
        got = np.asarray(out)[0] + 1j * np.asarray(out)[1]
        np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fused_head_pallas_matches_unfused(rng):
    """Fused rFFT->MAC->irFFT head super-kernel == the unfused
    ``_head_step`` composition (y AND the streaming state outputs), for
    both carry regimes: R < P (carry partially retained) and R >= P
    (carry fully replaced by new windows).  Tolerance covers the kernel's
    manual bf16-split HIGH matmuls vs the CPU float32 DFT (~1e-5 rel)."""
    import jax

    from bbcat_dsp_tpu.convolve import fft as cfft
    from bbcat_dsp_tpu.convolve.nonuniform import (
        _head_mac,
        _head_spectra,
    )
    from bbcat_dsp_tpu.convolve.fft import irfft_tail_planes
    from bbcat_dsp_tpu.ops.pallas.fused_head import fused_head_pallas

    old_backend = cfft.default_backend
    cfft.default_backend = lambda: "dftmm"  # match the kernel's DFT path
    try:
        P, B, C = 8, 32, 8
        F = B + 1
        for R in (4, 8, 16):
            x = jnp.asarray(
                rng.standard_normal((C, R * B)).astype(np.float32))
            xcarry = jnp.asarray(
                rng.standard_normal((2, P, C, F)).astype(np.float32))
            prev = jnp.asarray(
                rng.standard_normal((2, C, F)).astype(np.float32))
            H = jnp.asarray(
                rng.standard_normal((2, P, C, F)).astype(np.float32))

            Xnew, prev_ref = _head_spectra(prev, x, B, R)
            xext = jnp.concatenate([xcarry, Xnew], axis=1)
            acc = _head_mac(xext, H, R)
            y_ref = jnp.moveaxis(
                irfft_tail_planes(acc, 2 * B), 0, 1).reshape(C, R * B)
            xc_ref = xext[:, -P:]

            y, xco, po = fused_head_pallas(x, xcarry, prev, H, B,
                                           interpret=True)
            scale = float(jnp.max(jnp.abs(y_ref))) + 1e-9
            np.testing.assert_allclose(
                np.asarray(y) / scale, np.asarray(y_ref) / scale, atol=2e-4)
            np.testing.assert_allclose(
                np.asarray(xco), np.asarray(xc_ref), atol=5e-4)
            np.testing.assert_allclose(
                np.asarray(po), np.asarray(prev_ref), atol=5e-4)

        # time-gridded long batch (internal chunking, carry resident in
        # the output block) == chaining single-chunk calls
        x = jnp.asarray(
            rng.standard_normal((C, 32 * B)).astype(np.float32))
        xcarry = jnp.asarray(
            rng.standard_normal((2, P, C, F)).astype(np.float32))
        prev = jnp.asarray(rng.standard_normal((2, C, F)).astype(np.float32))
        H = jnp.asarray(
            rng.standard_normal((2, P, C, F)).astype(np.float32))
        y1, xc1, pv1 = fused_head_pallas(x[:, :16 * B], xcarry, prev, H, B,
                                         interpret=True)
        y2, xc2, pv2 = fused_head_pallas(x[:, 16 * B:], xc1, pv1, H, B,
                                         interpret=True)
        yg, xcg, pvg = fused_head_pallas(x, xcarry, prev, H, B,
                                         interpret=True)
        exp = jnp.concatenate([y1, y2], axis=-1)
        scale = float(jnp.max(jnp.abs(exp))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(yg) / scale, np.asarray(exp) / scale, atol=2e-5)
        np.testing.assert_allclose(np.asarray(xcg), np.asarray(xc2),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(pvg), np.asarray(pv2),
                                   atol=1e-5)
    finally:
        cfft.default_backend = old_backend
        jax.clear_caches()


def test_xt_grouped_mac_hook_integration(rng, monkeypatch):
    """The multichannel render path routes its tail group (window assembly
    + MAC) through the xt-layout kernel under BBCAT_DSP_PALLAS_MAC=1,
    result unchanged."""
    import jax
    import bbcat_dsp_tpu.ops_pallas_hook as hook
    from bbcat_dsp_tpu.convolve import NonUniformConvolver

    C, B, ratio = 16, 32, 2
    B2 = B * ratio
    ir = rng.standard_normal((C, B * ratio + 4 * B2)) * 0.3
    x = rng.standard_normal((C, 12 * B2)).astype(np.float32)

    monkeypatch.setenv("BBCAT_DSP_PALLAS_MAC", "0")
    jax.clear_caches()
    a = NonUniformConvolver(ir, block=B, ratio=ratio)
    y_ref = np.asarray(a.process(jnp.asarray(x)))

    calls = {"n": 0}
    real = hook.maybe_xt_grouped_mac

    def counting(queue, xt, H, slot0, **kw):
        r = real(queue, xt, H, slot0, **kw)
        if r is not None:
            calls["n"] += 1
        return r

    monkeypatch.setattr(hook, "maybe_xt_grouped_mac", counting)
    monkeypatch.setenv("BBCAT_DSP_PALLAS_MAC", "1")
    jax.clear_caches()
    b = NonUniformConvolver(ir, block=B, ratio=ratio)
    y_pal = np.asarray(b.process(jnp.asarray(x)))
    monkeypatch.delenv("BBCAT_DSP_PALLAS_MAC")
    jax.clear_caches()
    assert calls["n"] > 0, "grouped MAC kernel was never engaged"
    np.testing.assert_allclose(y_pal, y_ref, atol=3e-4)


def test_rotated_mac_hook_auto_threshold(rng, monkeypatch):
    """auto mode routes the tail MAC through the Pallas kernel only above
    the traffic-bound threshold; forced mode matches the XLA render."""
    import bbcat_dsp_tpu.ops_pallas_hook as hook
    from bbcat_dsp_tpu.convolve import BlockConvolver

    C, B, N = 16, 32, 4 * 32
    ir = rng.standard_normal((C, N)) * 0.3
    x = rng.standard_normal((C, 8 * B)).astype(np.float32)

    monkeypatch.setenv("BBCAT_DSP_PALLAS_MAC", "0")
    a = BlockConvolver(ir, block=B)
    y_ref = np.asarray(a.process(jnp.asarray(x)))

    monkeypatch.setenv("BBCAT_DSP_PALLAS_MAC", "1")
    b = BlockConvolver(ir, block=B)
    y_pal = np.asarray(b.process(jnp.asarray(x)))
    np.testing.assert_allclose(y_pal, y_ref, atol=1e-5)

    # auto: tiny shape stays on XLA (hook returns None below threshold)
    monkeypatch.setenv("BBCAT_DSP_PALLAS_MAC", "auto")
    assert hook.maybe_rotated_mac(
        jnp.zeros((2, 4, 16, 65)), jnp.zeros((2, 4, 16, 65)), 0
    ) is None


def test_pallas_mac_hook_integration(rng, monkeypatch):
    """BBCAT_DSP_PALLAS_MAC=1 routes the non-uniform head MAC through the
    kernel (interpreted off-TPU) with identical results."""
    import os
    import jax.numpy as jnp
    from bbcat_dsp_tpu.convolve import NonUniformConvolver

    B, ratio, T = 32, 4, 32 * 4 * 4
    ir = rng.standard_normal(3 * 32 * 4) * 0.3
    x = rng.standard_normal((1, T)).astype(np.float32)
    a = NonUniformConvolver(ir, block=B, ratio=ratio)
    y_ref = np.asarray(a.process(jnp.asarray(x)))
    monkeypatch.setenv("BBCAT_DSP_PALLAS_MAC", "1")
    import jax
    jax.clear_caches()
    b = NonUniformConvolver(ir, block=B, ratio=ratio)
    y_pal = np.asarray(b.process(jnp.asarray(x)))
    monkeypatch.delenv("BBCAT_DSP_PALLAS_MAC")
    jax.clear_caches()
    # mode "1" also forces the fused head super-kernel, whose manual
    # bf16-split HIGH matmuls differ from the CPU reference's full-f32
    # DFT at ~1e-5 relative — tolerance covers precision, not structure
    np.testing.assert_allclose(y_pal, y_ref, atol=3e-4)


def test_gather_supers_matches_moveaxis(rng):
    """Marshalling transpose kernel == reshape+moveaxis, including
    non-multiple-of-8 window counts (no alignment requirement on Pt)."""
    from bbcat_dsp_tpu.ops.pallas.marshal import gather_supers_pallas

    for C, Pt, B2 in ((16, 5, 256), (8, 14, 128), (32, 2, 512)):
        x = rng.standard_normal((C, Pt * B2)).astype(np.float32)
        got = np.asarray(gather_supers_pallas(jnp.asarray(x), Pt,
                                              interpret=True))
        want = np.moveaxis(x.reshape(C, Pt, B2), 1, 0)
        np.testing.assert_array_equal(got, want)


def test_delayed_add_matches_xla_formulation(rng):
    """Fused pending-schedule output assembly == the concat/moveaxis/add
    formulation it replaces (bit-exact: same adds, no reassociation)."""
    from bbcat_dsp_tpu.ops.pallas.marshal import delayed_add_pallas

    for C, Pt, B2 in ((16, 5, 256), (8, 14, 128), (16, 2, 512)):
        yh = rng.standard_normal((C, Pt * B2)).astype(np.float32)
        pend = rng.standard_normal((2, C, B2)).astype(np.float32)
        ot = rng.standard_normal((Pt, C, B2)).astype(np.float32)
        got = np.asarray(delayed_add_pallas(
            jnp.asarray(yh), jnp.asarray(pend), jnp.asarray(ot),
            interpret=True))
        delayed = np.concatenate([pend, ot], 0)
        want = yh + np.moveaxis(delayed[:Pt], 0, 1).reshape(C, Pt * B2)
        np.testing.assert_array_equal(got, want)


def test_auto_gates_engage_at_headline_geometry(monkeypatch):
    """Regression for the round-4 gate retune: at the HEADLINE geometry
    (C=64, 32k taps, B=512, ratio 8 -> head P=16/F=513, tail Pt=6/F=4097)
    auto mode must engage the full kernel stack (hardware A/B: +23%
    device RTF, +11 dB SNR).  Kernels are stubbed -- this tests the GATE
    decisions, not the kernels (covered above)."""
    import bbcat_dsp_tpu.ops_pallas_hook as hook

    hits = []
    monkeypatch.setattr("bbcat_dsp_tpu.ops.pallas.fused_head."
                        "fused_head_pallas",
                        lambda *a, **k: hits.append("fused") or jnp.zeros(1))
    monkeypatch.setattr("bbcat_dsp_tpu.ops.pallas.spectral_fir."
                        "xt_grouped_mac_pallas",
                        lambda *a, **k: hits.append("grouped") or jnp.zeros(1))
    monkeypatch.setattr("bbcat_dsp_tpu.ops.pallas.marshal."
                        "gather_supers_pallas",
                        lambda *a, **k: hits.append("gather") or jnp.zeros(1))
    monkeypatch.setattr("bbcat_dsp_tpu.ops.pallas.marshal."
                        "delayed_add_pallas",
                        lambda *a, **k: hits.append("delayed") or jnp.zeros(1))

    C, B, F = 64, 512, 513
    Pt, B2, F2 = 6, 4096, 4097
    z = jnp.zeros  # gates look at shapes only
    assert hook.maybe_fused_head(z((C, 8 * B)), z((2, 16, C, F)),
                                 z((2, C, F)), z((2, 16, C, F)), B,
                                 mode="auto", layout="std") is not None
    assert hook.maybe_xt_grouped_mac(
        z((2, Pt, C, F2)), z((2, Pt, C, F2)),
        z((2, Pt, C, F2)), 0, mode="auto") is not None
    assert hook.maybe_gather_supers(z((C, Pt * B2)), Pt,
                                    mode="auto") is not None
    assert hook.maybe_delayed_add(z((C, Pt * B2)), z((2, C, B2)),
                                  z((Pt, C, B2)), mode="auto") is not None
    assert hits == ["fused", "grouped", "gather", "delayed"]

    # round-5 retune (BENCH_GATE_SWEEP.json, device-attributed): the
    # scaled-down headline geometries now engage too — C=32 fused head
    # on (+41% forced-vs-auto device RTF), C=16 grouped MAC on (+30%)
    hits.clear()
    assert hook.maybe_fused_head(z((32, 8 * B)), z((2, 16, 32, F)),
                                 z((2, 32, F)), z((2, 16, 32, F)), B,
                                 mode="auto", layout="std") is not None
    assert hook.maybe_xt_grouped_mac(
        z((2, Pt, 16, F2)), z((2, Pt, 16, F2)),
        z((2, Pt, 16, F2)), 0, mode="auto") is not None
    assert hits == ["fused", "grouped"]

    # genuinely tiny shapes stay on the XLA path: the element floors
    # (dispatch-dominated unit-test sizes) and the C=8 grouped hard floor
    assert hook.maybe_fused_head(z((8, 8 * 32)), z((2, 4, 8, 33)),
                                 z((2, 8, 33)), z((2, 4, 8, 33)), 32,
                                 mode="auto", layout="std") is None
    assert hook.maybe_xt_grouped_mac(
        z((2, Pt, 8, F2)), z((2, Pt, 8, F2)),
        z((2, Pt, 8, F2)), 0, mode="1") is None
