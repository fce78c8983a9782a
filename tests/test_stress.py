"""Long-stream / fuzz stress tests — catches cursor and state-carry bugs
that short streams can't expose."""

import numpy as np
import jax.numpy as jnp

from bbcat_dsp_tpu import golden
from bbcat_dsp_tpu.convolve import BlockConvolver, NonUniformConvolver
from bbcat_dsp_tpu.loudness import LoudnessMeter
from bbcat_dsp_tpu.models import EQDelayPipeline
from bbcat_dsp_tpu.filters import FilterType
from bbcat_dsp_tpu.utils import load_state, save_state
from conftest import snr_db


def test_long_stream_no_drift(rng):
    """1000 blocks through the uniform convolver: the tail of the stream
    still matches direct convolution (queue cursor wraps ~80 times)."""
    B, N = 64, 768
    nblocks = 1000
    T = B * nblocks
    ir = rng.standard_normal(N) * np.exp(-np.arange(N) / 150.0)
    x = rng.standard_normal(T).astype(np.float32)
    conv = BlockConvolver(ir, block=B)
    y = np.asarray(conv.process(jnp.asarray(x[None])))[0]
    ref = golden.direct_convolve(x, ir)[:T]
    tail = slice(T - 4 * B, T)
    assert snr_db(ref[tail], y[tail]) > 90.0


def test_many_swaps_fuzz(rng):
    """Random IR swaps at random blocks stay continuous and land on the
    final IR's steady state."""
    B, N = 64, 512
    nblocks = 60
    irs = [rng.standard_normal(N) * 0.3 for _ in range(5)]
    swap_at = sorted(rng.choice(np.arange(5, nblocks - 12), 4, replace=False))
    x = rng.standard_normal((1, B * nblocks)).astype(np.float32)
    conv = BlockConvolver(irs[0], block=B, nparts=N // B)
    cur = 0
    outs = []
    for i in range(nblocks):
        if swap_at and i == swap_at[0]:
            swap_at = swap_at[1:]
            cur += 1
            conv.set_filter(irs[cur])
        outs.append(np.asarray(conv.process_block(
            jnp.asarray(x[:, i*B:(i+1)*B]))))
    y = np.concatenate(outs, -1)[0]
    ref = golden.direct_convolve(x[0], irs[cur])[: B * nblocks]
    settle = (max(0, nblocks - 10)) * B
    assert snr_db(ref[settle:], y[settle:]) > 90.0
    d = np.abs(np.diff(y))
    assert d.max() < 25 * np.median(np.abs(y) + 1e-9)


def test_doppler_modulated_delay(rng):
    """Per-sample delay modulation (doppler) through EQDelayPipeline matches
    the golden fractional reader at every probed output."""
    C, B = 1, 128
    T = 2 * B
    eq = np.stack([golden.biquad_coeffs(FilterType.FLAT, 1000, 48000.0)])
    pipe = EQDelayPipeline(eq, nchannels=C, block=B, max_delay=100.0,
                           fs=48000.0)
    x = rng.standard_normal((C, T)).astype(np.float32)
    # delay sweeps 20 -> 60 samples across the stream (approaching source)
    delays = np.linspace(20.0, 60.0, T, dtype=np.float32).reshape(1, T)
    y1 = np.asarray(pipe.process_block(jnp.asarray(x[:, :B]), delays[:, :B]))
    y2 = np.asarray(pipe.process_block(jnp.asarray(x[:, B:]), delays[:, B:]))
    y = np.concatenate([y1, y2], -1)
    L = pipe.length
    ring = np.zeros(L)
    ring[:T] = x[0]  # FLAT EQ passes input through (b0=1)
    for i in [150, 200, 255]:
        pos = (i - delays[0, i]) % L
        want = golden.fractional_sample(ring, 0, 1, L, float(pos))
        assert abs(y[0, i] - want) < 2e-3, i


def test_meter_checkpoint_resume(tmp_path, rng):
    """LoudnessMeter state round-trips through checkpointing mid-stream."""
    fs = 48000.0
    x = (rng.standard_normal((2, int(fs * 2))) * 0.1).astype(np.float32)
    a = LoudnessMeter(2, fs)
    chunk = a.step * 4
    n = x.shape[1] // chunk
    for i in range(n // 2):
        a.process(jnp.asarray(x[:, i*chunk:(i+1)*chunk]))
    p = str(tmp_path / "meter.ckpt")
    save_state(p, a.state)
    b = LoudnessMeter(2, fs)
    b.state = load_state(p, like=b.state)
    for m in (a, b):
        for i in range(n // 2, n):
            m.process(jnp.asarray(x[:, i*chunk:(i+1)*chunk]))
    assert abs(a.integrated() - b.integrated()) < 1e-6
    assert abs(a.short_term() - b.short_term()) < 1e-6


def test_nonuniform_long_stream(rng):
    """Tail pending alignment survives many super-blocks (fast and fallback
    render paths chained)."""
    B, ratio = 32, 4
    SB = B * ratio
    N = 3 * SB
    ir = rng.standard_normal(N) * np.exp(-np.arange(N) / 120.0)
    conv = NonUniformConvolver(ir, block=B, ratio=ratio)
    Pt = conv.tail_parts
    T1 = SB * Pt * 3   # fast path
    T2 = SB * (Pt + 1)  # fallback path
    x = rng.standard_normal(T1 + T2 + T1).astype(np.float32)
    ys = [
        np.asarray(conv.process(jnp.asarray(x[None, :T1]))),
        np.asarray(conv.process(jnp.asarray(x[None, T1:T1+T2]))),
        np.asarray(conv.process(jnp.asarray(x[None, T1+T2:]))),
    ]
    y = np.concatenate(ys, -1)[0]
    ref = golden.direct_convolve(x, ir)[: y.size]
    assert snr_db(ref, y) > 90.0
