"""Non-uniform (two-level) partitioned convolution vs golden/uniform."""

import numpy as np
import jax.numpy as jnp

from bbcat_dsp_tpu import golden
from bbcat_dsp_tpu.convolve import BlockConvolver, NonUniformConvolver
from conftest import snr_db


def test_nonuniform_matches_direct(rng):
    B, ratio, T = 32, 4, 32 * 4 * 6
    N = 2 * ratio * B + 3 * ratio * B + 17  # head + 3+ tail partitions
    ir = rng.standard_normal(N) * np.exp(-np.arange(N) / 300.0)
    x = rng.standard_normal(T)
    conv = NonUniformConvolver(ir, block=B, ratio=ratio)
    y = np.asarray(conv.process(jnp.asarray(x[None], jnp.float32)))[0]
    ref = golden.direct_convolve(x, ir)[:T]
    assert snr_db(ref, y) > 90.0


def test_nonuniform_short_ir(rng):
    """IR shorter than the head -> tail is a zero stub, still exact."""
    B, ratio, T = 32, 4, 32 * 4 * 4
    ir = rng.standard_normal(100)
    x = rng.standard_normal(T)
    conv = NonUniformConvolver(ir, block=B, ratio=ratio)
    y = np.asarray(conv.process(jnp.asarray(x[None], jnp.float32)))[0]
    ref = golden.direct_convolve(x, ir)[:T]
    assert snr_db(ref, y) > 90.0


def test_nonuniform_streaming_equals_render(rng):
    B, ratio = 32, 4
    SB = B * ratio
    T = SB * 5
    N = 3 * SB
    ir = rng.standard_normal((2, N)) * 0.2
    x = rng.standard_normal((2, T)).astype(np.float32)
    a = NonUniformConvolver(ir, block=B, ratio=ratio)
    y_r = np.asarray(a.process(jnp.asarray(x)))
    b = NonUniformConvolver(ir, block=B, ratio=ratio)
    outs = [np.asarray(b.process_block(jnp.asarray(x[:, i*SB:(i+1)*SB])))
            for i in range(5)]
    np.testing.assert_allclose(np.concatenate(outs, -1), y_r, atol=1e-5)


def test_nonuniform_matches_uniform_engine(rng):
    B, ratio = 64, 4
    N, T = 2048, 64 * 4 * 8
    ir = rng.standard_normal(N) * np.exp(-np.arange(N) / 500.0)
    x = rng.standard_normal(T).astype(np.float32)
    u = BlockConvolver(ir, block=B)
    yu = np.asarray(u.process(jnp.asarray(x[None])))[0]
    nu = NonUniformConvolver(ir, block=B, ratio=ratio)
    yn = np.asarray(nu.process(jnp.asarray(x[None])))[0]
    assert snr_db(yu, yn) > 100.0


def test_nonuniform_swap_click_free(rng):
    B, ratio = 32, 4
    SB = B * ratio
    T = SB * 8
    N = 3 * SB
    h1 = rng.standard_normal(N) * 0.3
    h2 = rng.standard_normal(N) * 0.3
    x = rng.standard_normal((1, T)).astype(np.float32)
    conv = NonUniformConvolver(h1, block=B, ratio=ratio)
    outs = []
    for i in range(8):
        if i == 3:
            conv.set_filter(h2)
        outs.append(np.asarray(conv.process_block(
            jnp.asarray(x[:, i*SB:(i+1)*SB]))))
    y = np.concatenate(outs, -1)[0]
    # steady state after the swap + tail-delay settle equals pure h2
    ref = golden.direct_convolve(x[0], h2)[:T]
    settle = 6 * SB
    assert snr_db(ref[settle:], y[settle:]) > 90.0
    # no large discontinuity anywhere (click check)
    d = np.abs(np.diff(y))
    assert d.max() < 20 * np.median(np.abs(y) + 1e-9)


def test_small_block_streaming_matches_batched(rng):
    """Per-small-block low-latency path == batched super-block path."""
    B, ratio = 32, 4
    SB = B * ratio
    T = SB * 5
    N = 3 * SB
    ir = rng.standard_normal((2, N)) * 0.2
    x = rng.standard_normal((2, T)).astype(np.float32)
    a = NonUniformConvolver(ir, block=B, ratio=ratio)
    y_batched = np.asarray(a.process(jnp.asarray(x)))
    b = NonUniformConvolver(ir, block=B, ratio=ratio)
    outs = [np.asarray(b.process_small_block(jnp.asarray(x[:, i*B:(i+1)*B])))
            for i in range(T // B)]
    np.testing.assert_allclose(np.concatenate(outs, -1), y_batched, atol=2e-5)


def test_small_block_swap_click_free(rng):
    """IR exchange while streaming per-small-block: continuous transition,
    steady state equals the new IR."""
    B, ratio = 32, 4
    SB = B * ratio
    T = SB * 8
    N = 3 * SB
    h1 = rng.standard_normal(N) * 0.3
    h2 = rng.standard_normal(N) * 0.3
    x = rng.standard_normal((1, T)).astype(np.float32)
    conv = NonUniformConvolver(h1, block=B, ratio=ratio)
    outs = []
    for i in range(T // B):
        if i == 9:
            conv.set_filter(h2)
        outs.append(np.asarray(conv.process_small_block(
            jnp.asarray(x[:, i*B:(i+1)*B]))))
    y = np.concatenate(outs, -1)[0]
    ref = golden.direct_convolve(x[0], h2)[:T]
    settle = 6 * SB
    assert snr_db(ref[settle:], y[settle:]) > 90.0
    d = np.abs(np.diff(y))
    assert d.max() < 20 * np.median(np.abs(y) + 1e-9)


def test_static_slot_render_matches_dynamic(rng):
    """The zero-gather static-slot render == the dynamic-slot fallback."""
    from bbcat_dsp_tpu.convolve.nonuniform import nonuniform_render

    B, ratio = 32, 4
    SB = B * ratio
    N = 3 * SB
    ir = rng.standard_normal((2, N)) * 0.2
    a = NonUniformConvolver(ir, block=B, ratio=ratio)
    Pt = a.tail_parts
    T = SB * Pt * 2  # multiple of tail partition count -> fast path
    x = rng.standard_normal((2, T)).astype(np.float32)
    y_fast = np.asarray(a.process(jnp.asarray(x)))
    # second call continues with correct host-tracked slot
    y_fast2 = np.asarray(a.process(jnp.asarray(x)))

    b = NonUniformConvolver(ir, block=B, ratio=ratio)
    s = b.state
    s, y1 = nonuniform_render(s, b.H_head, b.H_tail, jnp.asarray(x), B)
    s, y2 = nonuniform_render(s, b.H_head, b.H_tail, jnp.asarray(x), B)
    np.testing.assert_allclose(y_fast, np.asarray(y1), atol=1e-5)
    np.testing.assert_allclose(y_fast2, np.asarray(y2), atol=1e-5)


def test_per_channel_swap(rng):
    B, ratio = 32, 4
    SB = B * ratio
    T = SB * 8
    N = 3 * SB
    h = rng.standard_normal((2, N)) * 0.3
    h1 = rng.standard_normal(N) * 0.3
    x = rng.standard_normal((2, T)).astype(np.float32)
    conv = NonUniformConvolver(h, block=B, ratio=ratio)
    outs = []
    for i in range(8):
        if i == 3:
            conv.set_filter(h1, channel=1)  # only channel 1 swaps
        outs.append(np.asarray(conv.process_block(
            jnp.asarray(x[:, i*SB:(i+1)*SB]))))
    y = np.concatenate(outs, -1)
    settle = 6 * SB
    ref0 = golden.direct_convolve(x[0], h[0])[:T]
    ref1 = golden.direct_convolve(x[1], h1)[:T]
    assert snr_db(ref0[settle:], y[0, settle:]) > 90.0
    assert snr_db(ref1[settle:], y[1, settle:]) > 90.0


def test_looped_render_matches_repeated(rng):
    """nonuniform_render_looped == chained nonuniform_render calls (the
    bench's measurement primitive must be semantically identical)."""
    from bbcat_dsp_tpu.convolve.nonuniform import (
        nonuniform_render, nonuniform_render_looped)

    B, ratio = 32, 4
    SB = B * ratio
    N = 3 * SB
    ir = rng.standard_normal((2, N)) * 0.2
    conv = NonUniformConvolver(ir, block=B, ratio=ratio)
    Pt = conv.tail_parts
    T = SB * Pt
    xs = rng.standard_normal((3, 2, T)).astype(np.float32)
    s1 = conv.state
    tails_ref = []
    for i in range(3):
        s1, y = nonuniform_render(s1, conv.H_head, conv.H_tail,
                                  jnp.asarray(xs[i]), B, tail_slot0=0)
        tails_ref.append(np.asarray(y[:, -1]))

    conv2 = NonUniformConvolver(ir, block=B, ratio=ratio)
    s2, tails = nonuniform_render_looped(
        conv2.state, conv2.H_head, conv2.H_tail, jnp.asarray(xs), B,
        tail_slot0=0)
    np.testing.assert_allclose(np.asarray(tails),
                               np.stack(tails_ref), atol=1e-5)


def test_mixed_mode_slot_tracking(rng):
    """process_block / process_small_block advance the host tail-step
    mirror so a later process() picks the correct static slot (regression:
    stale slot silently corrupted the render)."""
    B, ratio = 32, 4
    SB = B * ratio
    N = 3 * SB
    ir = rng.standard_normal(N) * 0.2
    conv = NonUniformConvolver(ir, block=B, ratio=ratio)
    Pt = conv.tail_parts
    T1 = SB * 2               # two super-blocks via process_block
    T2 = SB * Pt              # then a fast-path render
    x = rng.standard_normal(T1 + T2).astype(np.float32)
    y1a = np.asarray(conv.process_block(jnp.asarray(x[None, :SB])))
    y1b = np.asarray(conv.process_block(jnp.asarray(x[None, SB:2*SB])))
    y2 = np.asarray(conv.process(jnp.asarray(x[None, 2*SB:])))
    y = np.concatenate([y1a, y1b, y2], -1)[0]
    ref = golden.direct_convolve(x, ir)[: y.size]
    assert snr_db(ref, y) > 90.0
