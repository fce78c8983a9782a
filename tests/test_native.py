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
    assert native.get_lib().fc_version() == 2


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


def test_same_format_bulk_copy_path_engages(rng):
    """Same-format same-endian rectangles take the memcpy fast paths (ref:
    __CopyMemory_{2,3,4,8}, SoundFormatRawConversions.cpp:20-62) and stay
    byte-exact.  Path codes: 2 = single bulk memmove (fully contiguous),
    1 = per-frame memmove (sub-rectangle), 0 = templated conversion."""
    assert native.native_available()
    for fmt in FORMATS:
        bps = get_bytes_per_sample(fmt)
        nfr, nch = 50, 8
        src = np.frombuffer(
            _random_packed(rng, fmt, False, nfr * nch), np.uint8
        ).copy()
        # fully contiguous: ONE bulk memmove
        dst = np.zeros_like(src)
        path = native.transfer_rect_path(
            src, fmt, False, 0, nch, dst, fmt, False, 0, nch, nch, nfr)
        assert path == 2, (fmt, path)
        np.testing.assert_array_equal(src, dst)
        # sub-rectangle: per-frame memmove, byte-exact vs a numpy gather
        dst2 = np.zeros(nfr * 16 * bps, np.uint8)
        path = native.transfer_rect_path(
            src, fmt, False, 2, nch, dst2, fmt, False, 5, 16, 4, nfr)
        assert path == 1, (fmt, path)
        s = src.reshape(nfr, nch * bps)[:, 2 * bps:6 * bps]
        d = dst2.reshape(nfr, 16 * bps)[:, 5 * bps:9 * bps]
        np.testing.assert_array_equal(s, d)
        # a converting pair still routes through the templated engine
        if fmt != SampleFormat.FLOAT:
            dstc = np.zeros(nfr * nch * 4, np.uint8)
            path = native.transfer_rect_path(
                src, fmt, False, 0, nch, dstc, SampleFormat.FLOAT, False,
                0, nch, nch, nfr)
            assert path == 0


def test_same_format_bulk_copy_inplace_widening(rng):
    """The memmove fast path keeps the backwards-walk in-place guarantee
    (ref: SoundFormatConversions.cpp:178-185)."""
    assert native.native_available()
    nfr = 33
    vals = (rng.standard_normal(nfr) * 0.5).astype(np.float32)
    buf = np.zeros(nfr * 2 * 4, np.uint8)
    buf[: nfr * 4] = np.frombuffer(vals.tobytes(), np.uint8)
    path = native.transfer_rect_path(
        buf, SampleFormat.FLOAT, False, 0, 1,
        buf, SampleFormat.FLOAT, False, 0, 2, 1, nfr)
    assert path == 1
    got = buf.view(np.float32).reshape(nfr, 2)[:, 0]
    np.testing.assert_array_equal(got, vals)


def test_native_shaped_dither_matches_python(rng):
    """fc_shaped_dither == the Python error-feedback loop, bit-exact,
    including the carried error history (same RNG stream by contract)."""
    from bbcat_dsp_tpu.formats.dither import ShapedDitherer
    from bbcat_dsp_tpu.utils import native as nat

    assert nat.native_available()
    data = (rng.integers(-2**26, 2**26, size=400 * 4) << 5).astype(np.int32)
    ch = np.tile(np.arange(4), 400)
    a = ShapedDitherer(shape=(1.0, -0.5, 0.25), seed=11)
    b = ShapedDitherer(shape=(1.0, -0.5, 0.25), seed=11)
    ya = a.dither_block(data, 12, channels=ch)

    orig = nat.shaped_dither_block
    try:
        nat.shaped_dither_block = lambda *args, **kw: None  # force python
        yb = b.dither_block(data, 12, channels=ch)
    finally:
        nat.shaped_dither_block = orig
    np.testing.assert_array_equal(ya, yb)
    np.testing.assert_allclose(a._ehist, b._ehist)
    # streaming == whole-signal through the native path too
    c = ShapedDitherer(shape=(1.0, -0.5, 0.25), seed=11)
    parts = [c.dither_block(blk, 12, channels=ch[: blk.size])
             for blk in np.split(data, 4)]
    np.testing.assert_array_equal(np.concatenate(parts), ya)
