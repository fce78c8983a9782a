"""Filters vs golden oracle: biquads, cascades, interpolation, all-pass,
fractional delay (SURVEY.md §4 test strategy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bbcat_dsp_tpu import golden
from bbcat_dsp_tpu.filters import (
    FilterType,
    biquad_coeffs,
    biquad_apply,
    cascade_apply,
    bank_init,
    bank_set_stage,
    bank_process,
    BiQuadFilterBank,
    BiQuadCascade,
    BiQuadBlock,
    allpass_apply,
    fractional_read,
    cascade_response,
)
from conftest import snr_db

FS = 48000.0

ALL_TYPES = list(FilterType)


@pytest.mark.parametrize("ftype", ALL_TYPES)
def test_coeffs_match_golden(ftype):
    c1 = biquad_coeffs(ftype, 1234.0, FS, gain=5.5, bandwidth=0.7)
    c2 = golden.biquad_coeffs(ftype, 1234.0, FS, gain=5.5, bandwidth=0.7)
    np.testing.assert_allclose(c1, c2, rtol=0, atol=0)


@pytest.mark.parametrize("engine", ["scan", "assoc"])
def test_biquad_vs_golden(rng, engine):
    c = golden.biquad_coeffs(FilterType.PEQ, 1000, FS, gain=6, bandwidth=1)
    x = rng.standard_normal(2048).astype(np.float32)
    y_ref, _ = golden.biquad_process(x, c)
    y, _ = biquad_apply(jnp.asarray(x), jnp.asarray(c, jnp.float32),
                        engine=engine)
    assert snr_db(y_ref, np.asarray(y)) > 90.0


@pytest.mark.parametrize("engine", ["scan", "assoc"])
def test_biquad_state_streaming(rng, engine):
    """Block-wise streaming == one-shot (state carry correctness)."""
    c = jnp.asarray(
        golden.biquad_coeffs(FilterType.LSH, 300, FS, gain=-4), jnp.float32
    )
    x = rng.standard_normal((3, 1024)).astype(np.float32)
    y_full, s_full = biquad_apply(jnp.asarray(x), c, engine=engine)
    s = None
    outs = []
    for i in range(4):
        y, s = biquad_apply(jnp.asarray(x[:, i * 256:(i + 1) * 256]), c, s,
                            engine=engine)
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs, axis=1)
    # scan is deterministic sample-serial; assoc reassociates across block
    # boundaries, so consistency is float32-level rather than bitwise
    assert snr_db(np.asarray(y_full), y_stream) > (120.0 if engine == "scan" else 80.0)
    np.testing.assert_allclose(np.asarray(s_full), np.asarray(s), atol=1e-4)


def test_high_q_filter_snr(rng):
    """Poles near the unit circle (RLB-style a2~0.99) must still hit 90 dB
    in float32 via the associative scan (SURVEY.md §7 hard part #1)."""
    c = golden.k_weighting_coeffs(FS)[1]  # RLB high-pass, a2 = 0.99007...
    x = rng.standard_normal(48000).astype(np.float32)
    y_ref, _ = golden.biquad_process(x, c)
    y, _ = biquad_apply(jnp.asarray(x), jnp.asarray(c, jnp.float32))
    assert snr_db(y_ref, np.asarray(y)) > 90.0


def test_cascade_vs_golden(rng):
    coeffs = np.stack([
        golden.biquad_coeffs(FilterType.HPF12, 80, FS),
        golden.biquad_coeffs(FilterType.PEQ, 400, FS, gain=-3, bandwidth=1.5),
        golden.biquad_coeffs(FilterType.PEQ, 2500, FS, gain=4, bandwidth=0.8),
        golden.biquad_coeffs(FilterType.HSH, 9000, FS, gain=2),
    ])
    x = rng.standard_normal(4096).astype(np.float32)
    y_ref, _ = golden.cascade_process(x, coeffs)
    y, _ = cascade_apply(jnp.asarray(x), jnp.asarray(coeffs, jnp.float32))
    assert snr_db(y_ref, np.asarray(y)) > 90.0


def test_cascade_systolic_is_delayed_serial(rng):
    """Systolic mode == serial cascade delayed by S-1 samples
    (ref: src/BiQuad.h:591-624 semantics)."""
    coeffs = np.stack([
        golden.biquad_coeffs(FilterType.LPF12, 5000, FS),
        golden.biquad_coeffs(FilterType.PEQ, 1000, FS, gain=3),
        golden.biquad_coeffs(FilterType.HPF6, 50, FS),
    ])
    x = rng.standard_normal(1024).astype(np.float32)
    y_ser, _ = cascade_apply(jnp.asarray(x), jnp.asarray(coeffs, jnp.float32))
    y_sys, _ = cascade_apply(jnp.asarray(x), jnp.asarray(coeffs, jnp.float32),
                             systolic=True)
    S = coeffs.shape[0]
    assert snr_db(np.asarray(y_ser)[: 1024 - (S - 1)],
                  np.asarray(y_sys)[S - 1:]) > 90.0


def test_interpolated_coeffs_vs_golden(rng):
    """Click-free coefficient ramps match the reference's per-sample
    shared-controller interpolation (ref: src/BiQuad.cpp:379-395)."""
    c_old = golden.biquad_coeffs(FilterType.PEQ, 1000, FS, gain=0)
    c_new = golden.biquad_coeffs(FilterType.PEQ, 1000, FS, gain=9)
    x = rng.standard_normal(600).astype(np.float32)
    y_ref, _, _ = golden.biquad_process_interpolated(x, c_old, c_new, 400)

    st = bank_init(1, 1)
    st = bank_set_stage(st, 0, c_old, 0)
    st = bank_set_stage(st, 0, c_new, 400)
    st, y = bank_process(st, jnp.asarray(x)[None])
    assert snr_db(y_ref, np.asarray(y)[0]) > 90.0
    assert float(st.mul[0]) == 0.0


def test_bank_multichannel_streaming(rng):
    bank = BiQuadFilterBank(2, 4, fs=FS)
    bank.set_filter(0, FilterType.PEQ, 500, gain=5)
    bank.set_filter(1, FilterType.HSH, 8000, gain=-6)
    x = rng.standard_normal((4, 512)).astype(np.float32)
    y1 = np.asarray(bank.process(jnp.asarray(x[:, :256])))
    y2 = np.asarray(bank.process(jnp.asarray(x[:, 256:])))
    y = np.concatenate([y1, y2], axis=1)

    coeffs = np.stack([
        golden.biquad_coeffs(FilterType.PEQ, 500, FS, gain=5),
        golden.biquad_coeffs(FilterType.HSH, 8000, FS, gain=-6),
    ])
    for c in range(4):
        y_ref, _ = golden.cascade_process(x[c], coeffs)
        assert snr_db(y_ref, y[c]) > 90.0


def test_response_matches_measured(rng):
    """CalcResponse analytic check: measured gain of a sine == |H| (the
    reference's intended validation method, SURVEY.md §4)."""
    c = biquad_coeffs(FilterType.PEQ, 2000, FS, gain=6, bandwidth=1)
    t = np.arange(9600)
    x = np.sin(2 * np.pi * 2000 * t / FS).astype(np.float32)
    y, _ = biquad_apply(jnp.asarray(x), jnp.asarray(c, jnp.float32))
    y = np.asarray(y)[4800:]
    measured = 20 * np.log10(np.sqrt(np.mean(y**2)) / np.sqrt(0.5))
    predicted = 20 * np.log10(abs(golden.biquad_response(c, 2000, FS)))
    assert abs(measured - predicted) < 0.05


def test_biquad_block(rng):
    coeffs = np.stack([golden.biquad_coeffs(FilterType.LPF12, 4000, FS)])
    blk = BiQuadBlock(coeffs, nchannels=2, block_size=256)
    x = rng.standard_normal((2, 512)).astype(np.float32)
    y = np.concatenate(
        [np.asarray(blk.process_block(jnp.asarray(x[:, :256]))),
         np.asarray(blk.process_block(jnp.asarray(x[:, 256:])))], axis=1)
    for c in range(2):
        y_ref, _ = golden.cascade_process(x[c], coeffs)
        assert snr_db(y_ref, y[c]) > 90.0


@pytest.mark.parametrize("delay,T", [(7, 512), (16, 500), (5, 3)])
def test_allpass_vs_golden(rng, delay, T):
    x = rng.standard_normal((2, T)).astype(np.float32)
    y_ref, w_ref = golden.allpass_process(x, 0.5, delay)
    y, w = allpass_apply(jnp.asarray(x), 0.5, delay)
    assert snr_db(y_ref, np.asarray(y)) > 90.0
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-5)


def test_allpass_streaming(rng):
    x = rng.standard_normal((2, 256)).astype(np.float32)
    y_full, _ = allpass_apply(jnp.asarray(x), 0.3, 7)
    w = None
    outs = []
    for i in range(4):
        y, w = allpass_apply(jnp.asarray(x[:, i * 64:(i + 1) * 64]), 0.3, 7, w)
        outs.append(np.asarray(y))
    assert snr_db(np.asarray(y_full), np.concatenate(outs, 1)) > 120.0


def test_fractional_read_vs_golden(rng):
    L = 128
    buf = rng.standard_normal((3, L))
    pos = rng.uniform(14, L - 1, size=(3, 17))
    ref = golden.fractional_delay_block(buf, pos, L)
    out = fractional_read(jnp.asarray(buf, jnp.float32),
                          jnp.asarray(pos, jnp.float32))
    assert snr_db(ref, np.asarray(out)) > 90.0


def test_fractional_integer_positions(rng):
    """At integer positions the polyphase read reproduces the (lagged)
    buffer contents to the table's DC accuracy."""
    L = 64
    buf = rng.standard_normal((1, L))
    pos = np.arange(20, 40, dtype=np.float64)[None]
    ref = golden.fractional_delay_block(buf, pos, L)
    out = fractional_read(jnp.asarray(buf, jnp.float32),
                          jnp.asarray(pos, jnp.float32))
    np.testing.assert_allclose(np.asarray(out)[0], ref[0], atol=1e-4)


def test_cascade_response_product():
    coeffs = np.stack([
        golden.biquad_coeffs(FilterType.PEQ, 1000, FS, gain=6),
        golden.biquad_coeffs(FilterType.PEQ, 1000, FS, gain=-6),
    ])
    h = cascade_response(coeffs, np.array([1000.0, 2000.0]), FS)
    np.testing.assert_allclose(np.abs(h), 1.0, atol=1e-9)


def test_write_response_dump(tmp_path):
    """1000-point log-spaced response dump (ref: src/BiQuad.cpp:351-370)."""
    from bbcat_dsp_tpu.filters import write_response

    c = golden.biquad_coeffs(FilterType.LPF12, 1000.0, FS)
    path = tmp_path / "coeffs.dat"
    f = write_response(path, c, FS)
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 1000 and len(f) == 1000
    assert f[0] == pytest.approx(10.0) and f[-1] == pytest.approx(FS / 2)
    # parse back and spot-check against the analytic response
    fs_back, db_back = np.array([list(map(float, ln.split())) for ln in lines]).T
    np.testing.assert_allclose(fs_back, f, rtol=1e-5)
    expect = 20 * np.log10(np.abs(cascade_response(c, f, FS)))
    np.testing.assert_allclose(db_back, expect, atol=1e-4)
    # LPF12 with the default BW=1 octave is ~-6.6 dB at cutoff; deep into
    # the stopband it falls off at -12 dB/octave
    i_c = np.argmin(np.abs(f - 1000.0))
    assert -8.0 < db_back[i_c] < -5.0
    assert db_back[-1] < -40.0


@pytest.mark.parametrize("ftype", ALL_TYPES)
def test_modal_engine_all_types_snr(rng, ftype):
    """Every RBJ filter type through the default (modal) engine >= 90 dB."""
    kw = {}
    if ftype in (FilterType.PEQ, FilterType.LSH, FilterType.HSH):
        kw["gain"] = 7.5
    c = golden.biquad_coeffs(ftype, 740.0, FS, bandwidth=0.8, **kw)
    x = rng.standard_normal(16384).astype(np.float32)
    y_ref, _ = golden.biquad_process(x, c)
    y, _ = biquad_apply(jnp.asarray(x), np.asarray(c))
    assert snr_db(y_ref, np.asarray(y)) > 90.0


def test_fractional_delay_line_streaming(rng):
    """FractionalDelayLine: streamed writes + delayed reads track the
    golden polyphase reader."""
    from bbcat_dsp_tpu.filters import FractionalDelayLine

    line = FractionalDelayLine(2, 256)
    x = rng.standard_normal((2, 192)).astype(np.float32)
    line.write(jnp.asarray(x[:, :64]))
    line.write(jnp.asarray(x[:, 64:128]))
    line.write(jnp.asarray(x[:, 128:]))
    delays = jnp.asarray([[30.5], [75.25]], jnp.float32)
    out = np.asarray(line.read(delays))
    ring = np.zeros((2, 256), np.float64)
    ring[:, :192] = x
    for c, d in [(0, 30.5), (1, 75.25)]:
        pos = (192 - d) % 256
        want = golden.fractional_sample(
            np.ascontiguousarray(ring.T).reshape(-1), c, 2, 256, float(pos)
        )
        assert abs(out[c, 0] - want) < 1e-3


def test_parallel_cascade_engine(rng):
    """Whole-cascade parallel (partial-fraction) form: one batched scan,
    >= 90 dB vs the serial golden; streaming state carries exactly."""
    from bbcat_dsp_tpu.filters import cascade_apply, parallel_cascade_params

    coeffs = np.stack([
        golden.biquad_coeffs(FilterType.PEQ, 100.0 * (i + 1), FS,
                             gain=(-1.0) ** i * 3.0)
        for i in range(8)
    ])
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    ref = np.stack([golden.cascade_process(x[c], coeffs)[0] for c in range(2)])
    y, st = cascade_apply(jnp.asarray(x), coeffs, engine="parallel")
    assert snr_db(ref, np.asarray(y)) > 90.0
    # streaming
    y1, s = cascade_apply(jnp.asarray(x[:, :1024]), coeffs, engine="parallel")
    y2, s = cascade_apply(jnp.asarray(x[:, 1024:]), coeffs, states=s,
                          engine="parallel")
    ystream = np.concatenate([np.asarray(y1), np.asarray(y2)], -1)
    assert snr_db(np.asarray(y), ystream) > 100.0


def test_parallel_cascade_rejects_repeated_poles():
    """Double-pole filters must raise so callers fall back to modal."""
    from bbcat_dsp_tpu.filters import parallel_cascade_params

    c = np.stack([golden.biquad_coeffs(FilterType.HPF12, 80, FS)])
    with pytest.raises(ValueError):
        parallel_cascade_params(c)


def test_resample_sine_accuracy():
    """Arbitrary-ratio resampling: a 1 kHz sine upsampled 48k->96k matches
    the analytic sine (with the table's ~7-sample group delay) to the
    128-phase table's quantisation floor."""
    from bbcat_dsp_tpu.filters import resample
    from bbcat_dsp_tpu.filters.fractional import ADDITIONAL_DELAY

    fs, ratio = 48000.0, 2.0
    t = np.arange(4096) / fs
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x[None]), ratio))[0]
    n = y.size
    # output k reads input position k/ratio + 14; the table's measured
    # effective group delay is 8 samples -> signal time (k/ratio + 6)/fs
    tt = (np.arange(n) / ratio + ADDITIONAL_DELAY - 8.0) / fs
    ref = np.sin(2 * np.pi * 1000.0 * tt)
    m = slice(100, n - 100)
    assert snr_db(ref[m], y[m]) > 55.0


def test_resampler_streaming_matches_oneshot(rng):
    from bbcat_dsp_tpu.filters import Resampler, resample

    C, B, nblk = 2, 256, 6
    ratio = 0.9173
    x = rng.standard_normal((C, B * nblk)).astype(np.float32)
    r = Resampler(C, ratio, B)
    outs = [np.asarray(r.process(jnp.asarray(x[:, i*B:(i+1)*B])))
            for i in range(nblk)]
    y_stream = np.concatenate(outs, -1)
    # one-shot over the zero-history-padded stream (same absolute positions)
    from bbcat_dsp_tpu.filters.fractional import ADDITIONAL_DELAY, fractional_read
    hist = np.zeros((C, ADDITIONAL_DELAY + B), np.float32)
    full = np.concatenate([hist, x], -1)
    n = y_stream.shape[-1]
    pos = np.arange(n) / ratio + hist.shape[-1]
    y_ref = np.asarray(fractional_read(
        jnp.asarray(full), jnp.asarray(np.broadcast_to(pos, (C, n)),
                                       jnp.float32)))
    # the two paths round positions at different absolute offsets in
    # float32, so isolated polyphase-bin flips (1/128-sample timing jitter)
    # are expected; the stream must keep exact sample COUNT and agree
    # everywhere else
    assert y_stream.shape == y_ref.shape
    diff = np.abs(y_stream - y_ref)
    assert np.mean(diff > 1e-4) < 0.02
    assert snr_db(y_ref, y_stream) > 30.0


def test_filter_manager(rng):
    """Named configs assigned to channel groups; JSON loading; unassigned
    channels pass through (ref: README:53-54 FilterManager spec)."""
    from bbcat_dsp_tpu.filters import FilterManager

    fm = FilterManager(fs=FS)
    fm.define("voice", [(FilterType.HPF12, 120.0), (FilterType.PEQ, 3000.0, 4.0)])
    fm.define_from_json(
        '{"music": {"stages": [{"type": "LSH", "freq": 200, "gain": 3}]}}'
    )
    assert fm.names() == ["music", "voice"]
    fm.assign_range([0, 1], "voice")
    fm.assign(2, "music")
    x = rng.standard_normal((4, 512)).astype(np.float32)
    y = np.asarray(fm.process(jnp.asarray(x)))
    voice_coeffs = np.stack([
        golden.biquad_coeffs(FilterType.HPF12, 120.0, FS),
        golden.biquad_coeffs(FilterType.PEQ, 3000.0, FS, gain=4.0),
    ])
    music_coeffs = np.stack([
        golden.biquad_coeffs(FilterType.LSH, 200.0, FS, gain=3.0)])
    for c in (0, 1):
        ref, _ = golden.cascade_process(x[c], voice_coeffs)
        assert snr_db(ref, y[c]) > 90.0
    ref, _ = golden.cascade_process(x[2], music_coeffs)
    assert snr_db(ref, y[2]) > 90.0
    np.testing.assert_array_equal(y[3], x[3])  # unassigned passthrough
    # response query
    h = fm.response("voice", np.array([50.0]))
    assert abs(h[0]) < 0.3  # HPF kills 50 Hz
    # streaming continuity across process calls
    y2 = np.asarray(fm.process(jnp.asarray(x)))
    ref2, _ = golden.cascade_process(
        np.concatenate([x[0], x[0]]), voice_coeffs)
    assert snr_db(ref2[512:], y2[0]) > 90.0


def test_modal_params_need_f64_coeffs(rng):
    """Regression: factoring poles from float32-ROUNDED coefficients loses
    ~30 dB through discriminant cancellation for near-real-axis pole pairs
    (LSH at 200 Hz).  Wrappers must hand float64 host coefficients to the
    modal engine."""
    c64 = golden.biquad_coeffs(FilterType.LSH, 200.0, FS, gain=3.0)
    x = rng.standard_normal(4096).astype(np.float32)
    ref, _ = golden.biquad_process(x, c64)
    y64, _ = biquad_apply(jnp.asarray(x), c64)                    # f64 design
    y32, _ = biquad_apply(jnp.asarray(x), c64.astype(np.float32))  # f32 first
    assert snr_db(ref, np.asarray(y64)) > 110.0
    # the f32-cast path is measurably worse (documents why wrappers keep f64)
    assert snr_db(ref, np.asarray(y64)) > snr_db(ref, np.asarray(y32)) + 10.0
