"""EBU Tech 3341 / Tech 3342 compliance cases for the BS.1770 meter.

The published minimum test signals for loudness metering ("EBU mode"):
Tech 3341 cases 1-6 (M/S/I on synthetic 997 Hz sines, tolerance +/-0.1 LU)
and Tech 3342 cases 1-4 (LRA on level-stepped sines, tolerance +/-1 LU).
Cases 7-8 (3341) and 5-6 (3342) are authentic-programme WAV files and are
not synthesizable — excluded by construction.

Signals are generated in-repo per the specs: 997 Hz sines, dBFS =
full-scale-sine peak convention, stereo (both channels driven) unless the
case says otherwise.  (ref capability: ITU1770MultiChannelLoudness,
reference README:65-66; meter: bbcat_dsp_tpu/loudness/itu1770.py)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bbcat_dsp_tpu.loudness import LoudnessMeter, integrated_loudness

FS = 48000.0


def sine(db_fs: float, seconds: float, nch: int = 2, f: float = 997.0):
    """[nch, T] sine at ``db_fs`` (peak re full scale) on every channel."""
    t = np.arange(round(seconds * FS)) / FS
    x = 10.0 ** (db_fs / 20.0) * np.sin(2 * np.pi * f * t)
    return np.broadcast_to(x, (nch, x.size)).astype(np.float32)


def seq(*segs):
    """Concatenate [(db, seconds), ...] stereo segments (phase-continuous
    amplitude steps are not required by the specs)."""
    return np.concatenate([sine(db, s) for db, s in segs], axis=-1)


def meter_feed(x: np.ndarray, nch: int = 2) -> LoudnessMeter:
    m = LoudnessMeter(nch, FS)
    chunk = int(FS)  # 1 s chunks (multiple of the 100 ms step)
    T = x.shape[-1]
    xj = jnp.asarray(x)
    for i in range(0, T - chunk + 1, chunk):
        m.process(xj[:, i:i + chunk])
    rem = T % chunk
    if rem:
        step = int(round(0.1 * FS))
        rem -= rem % step
        if rem:
            m.process(xj[:, T - (T % chunk):T - (T % chunk) + rem])
    return m


# ---------------------------------------------------------------- Tech 3341

def test_3341_case1_m_s_i():
    """Stereo 997 Hz at -23.0 dBFS, 20 s -> M = S = I = -23.0 +/-0.1."""
    x = sine(-23.0, 20.0)
    m = meter_feed(x)
    assert abs(m.momentary() - (-23.0)) <= 0.1
    assert abs(m.short_term() - (-23.0)) <= 0.1
    assert abs(m.integrated() - (-23.0)) <= 0.1
    assert abs(float(integrated_loudness(jnp.asarray(x), FS)) - (-23.0)) <= 0.1


def test_3341_case2_m_s_i():
    """Stereo 997 Hz at -33.0 dBFS, 20 s -> M = S = I = -33.0 +/-0.1."""
    x = sine(-33.0, 20.0)
    m = meter_feed(x)
    assert abs(m.momentary() - (-33.0)) <= 0.1
    assert abs(m.short_term() - (-33.0)) <= 0.1
    assert abs(m.integrated() - (-33.0)) <= 0.1
    assert abs(float(integrated_loudness(jnp.asarray(x), FS)) - (-33.0)) <= 0.1


def test_3341_case3_integrated_gating():
    """10 s @ -36 | 60 s @ -23 | 10 s @ -36 -> I = -23.0 +/-0.1 (the
    relative gate must drop the -36 dBFS flanks)."""
    x = seq((-36.0, 10.0), (-23.0, 60.0), (-36.0, 10.0))
    assert abs(float(integrated_loudness(jnp.asarray(x), FS)) - (-23.0)) <= 0.1
    # streaming histogram meter hits the same number
    assert abs(meter_feed(x).integrated() - (-23.0)) <= 0.1


def test_3341_case4_integrated_gating_deep():
    """-72/-36 flanks around 60 s @ -23 -> I = -23.0 +/-0.1 (absolute AND
    relative gates)."""
    x = seq((-72.0, 10.0), (-36.0, 10.0), (-23.0, 60.0),
            (-36.0, 10.0), (-72.0, 10.0))
    assert abs(float(integrated_loudness(jnp.asarray(x), FS)) - (-23.0)) <= 0.1


def test_3341_case5_integrated():
    """20 s @ -26 | 20.1 s @ -20 | 20 s @ -26 -> I = -23.0 +/-0.1."""
    x = seq((-26.0, 20.0), (-20.0, 20.1), (-26.0, 20.0))
    assert abs(float(integrated_loudness(jnp.asarray(x), FS)) - (-23.0)) <= 0.1
    assert abs(meter_feed(x).integrated() - (-23.0)) <= 0.1


def test_3341_case6_five_channel_weights():
    """3.0-style 5.0 case: L,R @ -28, C @ -24, Ls,Rs @ -30 dBFS (997 Hz,
    20 s) -> I = -23.0 +/-0.1 (exercises the 1.41 surround power weights)."""
    levels = [-28.0, -28.0, -24.0, -30.0, -30.0]  # L R C Ls Rs
    x = np.concatenate([sine(db, 20.0, nch=1) for db in levels], axis=0)
    assert abs(float(integrated_loudness(jnp.asarray(x), FS)) - (-23.0)) <= 0.1
    m = LoudnessMeter(5, FS)
    xj = jnp.asarray(x)
    for i in range(0, x.shape[-1], int(FS)):
        m.process(xj[:, i:i + int(FS)])
    assert abs(m.integrated() - (-23.0)) <= 0.1


# ---------------------------------------------------------------- Tech 3342

@pytest.mark.parametrize(
    "case,segs,lra",
    [
        (1, [(-20.0, 20.0), (-30.0, 20.0)], 10.0),
        (2, [(-15.0, 20.0), (-30.0, 20.0)], 15.0),
        (3, [(-40.0, 20.0), (-20.0, 20.0)], 20.0),
        (4, [(-50.0, 20.0), (-35.0, 20.0), (-20.0, 20.0),
             (-35.0, 20.0), (-50.0, 20.0)], 15.0),
    ],
)
def test_3342_lra(case, segs, lra):
    """EBU Tech 3342 LRA cases 1-4, tolerance +/-1 LU."""
    x = seq(*segs)
    m = meter_feed(x)
    assert abs(m.loudness_range() - lra) <= 1.0, (
        f"Tech 3342 case {case}: LRA {m.loudness_range():.2f} != {lra}"
    )
