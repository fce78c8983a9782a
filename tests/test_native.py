"""Native C++ format-conversion engine == numpy path, bit-exact."""

import itertools

import numpy as np
import pytest

from bbcat_dsp_tpu.formats.sample_format import SampleFormat, get_bytes_per_sample
from bbcat_dsp_tpu.formats import host
from bbcat_dsp_tpu.utils import native

FORMATS = [SampleFormat.INT16, SampleFormat.INT24, SampleFormat.INT32,
           SampleFormat.FLOAT, SampleFormat.DOUBLE]


def _random_packed(rng, fmt, be, nsamples):
    """Random but VALID packed bytes for a format (floats in [-2, 2])."""
    if fmt in (SampleFormat.FLOAT, SampleFormat.DOUBLE):
        vals = (rng.standard_normal(nsamples) * 0.7).astype(
            np.float32 if fmt == SampleFormat.FLOAT else np.float64
        )
        dt = vals.dtype.newbyteorder(">" if be else "<")
        return vals.astype(dt).tobytes()
    if fmt == SampleFormat.INT16:
        v = rng.integers(-2**15, 2**15, nsamples).astype(
            np.dtype(">i2" if be else "<i2"))
        return v.tobytes()
    if fmt == SampleFormat.INT32:
        v = rng.integers(-2**31, 2**31, nsamples).astype(
            np.dtype(">i4" if be else "<i4"))
        return v.tobytes()
    # int24: 3 random bytes/sample
    return rng.integers(0, 256, nsamples * 3).astype(np.uint8).tobytes()


def test_native_builds():
    assert native.native_available(), "native formatconv failed to build"
    assert native.get_lib().fc_version() == 1


@pytest.mark.parametrize(
    "sfmt,dfmt", list(itertools.product(FORMATS, FORMATS))
)
def test_native_matches_numpy_all_pairs(rng, sfmt, dfmt):
    assert native.native_available()
    for sbe, dbe in [(False, False), (True, False), (False, True), (True, True)]:
        nfr, sch, dch, nch = 17, 3, 4, 2
        raw = np.frombuffer(
            _random_packed(rng, sfmt, sbe, nfr * sch), np.uint8
        ).copy()
        dst_native = np.zeros(nfr * dch * get_bytes_per_sample(dfmt), np.uint8)
        dst_numpy = dst_native.copy()

        ok = host.transfer_samples(
            raw, sfmt, sbe, 1, sch, dst_native, dfmt, dbe, 2, dch,
            nch, nfr,
        )
        assert ok
        # force the numpy path
        orig = native.transfer_rect
        try:
            native.transfer_rect = lambda *a, **k: False
            ok = host.transfer_samples(
                raw, sfmt, sbe, 1, sch, dst_numpy, dfmt, dbe, 2, dch,
                nch, nfr,
            )
        finally:
            native.transfer_rect = orig
        assert ok
        np.testing.assert_array_equal(dst_native, dst_numpy)


def test_native_inplace_widening(rng):
    """In-place transfer where dst frames are wider than src frames — the
    backwards-walk case (ref: SoundFormatConversions.cpp:178-185)."""
    assert native.native_available()
    nfr = 9
    vals = (rng.standard_normal(nfr) * 0.5).astype(np.float32)
    buf = np.zeros(nfr * 2 * 4, np.uint8)
    buf[: nfr * 4] = np.frombuffer(vals.tobytes(), np.uint8)
    # mono float -> stereo-slot float, same buffer (1ch frames -> 2ch frames)
    ok = host.transfer_samples(
        buf, SampleFormat.FLOAT, False, 0, 1,
        buf, SampleFormat.FLOAT, False, 0, 2, 1, nfr,
    )
    assert ok
    got = buf.view(np.float32).reshape(nfr, 2)[:, 0]
    np.testing.assert_array_equal(got, vals)
