"""BS.1770 loudness vs golden + standard reference values."""

import numpy as np
import jax.numpy as jnp

from bbcat_dsp_tpu import golden
from bbcat_dsp_tpu.loudness import (
    LoudnessMeter,
    integrated_loudness,
    true_peak_db,
)

FS = 48000.0


def _sine(freq, secs, level_db, fs=FS):
    t = np.arange(int(secs * fs)) / fs
    return np.sin(2 * np.pi * freq * t) * 10 ** (level_db / 20.0)


def test_997hz_sine_reference_level():
    """BS.1770: 997 Hz 0 dBFS mono sine reads -3.01 LKFS (stereo copy
    -> +3 dB -> ~0 LKFS at -3 dB each...); use the standard mono case."""
    x = _sine(997.0, 3.0, 0.0)
    L = float(integrated_loudness(jnp.asarray(x[None], jnp.float32), FS))
    assert abs(L - (-3.01)) < 0.1


def test_matches_golden_multichannel(rng):
    x = rng.standard_normal((5, int(FS * 2))).astype(np.float32) * 0.1
    # make the channels different levels
    x *= np.array([1.0, 0.5, 0.25, 0.8, 0.3])[:, None]
    ref = golden.integrated_loudness(x, FS)
    L = float(integrated_loudness(jnp.asarray(x), FS))
    assert abs(L - ref) < 0.05


def test_gating_silence_excluded(rng):
    """Loud burst + long silence: gating must keep the integrated value at
    the burst level (within tolerance), not average the silence in."""
    burst = _sine(997.0, 1.0, -20.0)
    silence = np.zeros(int(FS * 4))
    x = np.concatenate([burst, silence])
    ref = golden.integrated_loudness(x[None], FS)
    L = float(integrated_loudness(jnp.asarray(x[None], jnp.float32), FS))
    assert abs(L - ref) < 0.1
    # partial burst/silence boundary blocks legitimately pull the gated
    # value slightly below the pure-tone -23.0 LKFS
    assert -24.5 < L < -22.5


def test_streaming_meter_matches_oneshot(rng):
    x = (rng.standard_normal((2, int(FS * 3))) * 0.05).astype(np.float32)
    meter = LoudnessMeter(2, FS)
    step = meter.step
    chunk = step * 5
    for i in range(x.shape[1] // chunk):
        meter.process(jnp.asarray(x[:, i * chunk:(i + 1) * chunk]))
    ref = golden.integrated_loudness(x, FS)
    assert abs(meter.integrated() - ref) < 0.1
    # momentary/short-term sanity: close to integrated for stationary noise
    assert abs(meter.momentary() - ref) < 1.0
    assert abs(meter.short_term() - ref) < 0.5


def test_true_peak_sine():
    """A 0 dBFS sine not sampled at its crest still reads ~0 dBTP."""
    fs = FS
    t = np.arange(4800) / fs
    # 997.3 Hz, phase chosen so samples straddle the crest
    x = np.sin(2 * np.pi * 997.3 * t + 0.3)
    tp = float(true_peak_db(jnp.asarray(x[None], jnp.float32))[0])
    assert abs(tp - 0.0) < 0.1


def test_true_peak_intersample_overs():
    """Classic inter-sample over: +3 dBTP square-ish signal."""
    fs = FS
    t = np.arange(4800)
    # alternating near-Nyquist signal with inter-sample peaks above 0 dBFS
    x = np.sin(2 * np.pi * (fs / 4) * t / fs + np.pi / 4)
    tp = float(true_peak_db(jnp.asarray(x[None], jnp.float32))[0])
    sample_peak = 20 * np.log10(np.abs(x).max())
    assert tp > sample_peak + 0.5  # detects inter-sample peak
    assert abs(tp - 0.0) < 0.35  # true crest of the sine is 1.0


def test_loudness_range(rng):
    """LRA of an alternating loud/quiet program is ~ the level difference;
    LRA of stationary noise is near zero (EBU R128 semantics)."""
    fs = FS
    loud = _sine(997.0, 8.0, -15.0)
    quiet = _sine(997.0, 8.0, -35.0)
    x = np.concatenate([loud, quiet, loud, quiet]).astype(np.float32)
    m = LoudnessMeter(1, fs)
    chunk = m.step * 10
    for i in range(x.size // chunk):
        m.process(jnp.asarray(x[None, i*chunk:(i+1)*chunk]))
    lra = m.loudness_range()
    assert 12.0 < lra < 22.0  # ~20 LU spread, softened by gating/percentiles

    m2 = LoudnessMeter(1, fs)
    y = (rng.standard_normal(int(fs * 10)) * 0.05).astype(np.float32)
    for i in range(y.size // chunk):
        m2.process(jnp.asarray(y[None, i*chunk:(i+1)*chunk]))
    assert m2.loudness_range() < 1.5


def test_k_weighting_other_sample_rates():
    """The analogue-prototype redesign holds at 44.1 kHz: a 997 Hz sine
    still reads -3.01 LKFS (mono, 0 dBFS)."""
    fs = 44100.0
    t = np.arange(int(fs * 3)) / fs
    x = np.sin(2 * np.pi * 997.0 * t).astype(np.float32)
    L = float(integrated_loudness(jnp.asarray(x[None]), fs))
    assert abs(L - (-3.01)) < 0.1
    ref = golden.integrated_loudness(x[None], fs)
    assert abs(L - ref) < 0.05
