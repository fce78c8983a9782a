"""L1 sample-format conversion tests.

Oracle strategy (SURVEY.md §4): exact integer math including saturation edges
(±1.0, >1.0 inputs, int min/max), verified against independent scalar
reference computations of the documented contract.
"""

import numpy as np
import pytest

from bbcat_dsp_tpu.formats import (
    SampleFormat,
    TPDFDitherer,
    block_transfer_sanity_checks,
    get_bits_per_sample,
    get_bytes_per_sample,
    host,
    is_sample_float,
    is_sample_integer,
    sample_format_of,
    transfer_samples,
)

F = SampleFormat


def scalar_float_to_int32(x: float) -> int:
    """Independent scalar model of the reference contract
    (src/genconversions.php:262-264)."""
    d = x * 2147483648.0
    d = min(max(d, -2147483648.0), 2147483647.0)
    return int(d)  # python int() truncates toward zero like a C cast


class TestTables:
    def test_bits_bytes(self):
        assert [get_bits_per_sample(f) for f in F] == [0, 16, 24, 32, 32, 64]
        assert [get_bytes_per_sample(f) for f in F] == [0, 2, 3, 4, 4, 8]

    def test_predicates(self):
        assert is_sample_integer(F.INT16) and is_sample_integer(F.INT32)
        assert not is_sample_integer(F.FLOAT)
        assert is_sample_float(F.DOUBLE) and not is_sample_float(F.INT24)

    def test_format_of(self):
        assert sample_format_of(np.zeros(3, np.int16)) == F.INT16
        assert sample_format_of(np.float32) == F.FLOAT
        assert sample_format_of(np.uint8) == F.UNKNOWN


class TestSaturation:
    @pytest.mark.parametrize(
        "x",
        [0.0, 1.0, -1.0, 0.5, -0.5, 1.5, -1.5, 2.0**-31, -(2.0**-31),
         1.0 - 2.0**-24, -(1.0 - 2.0**-24), 0.9999999999, -0.9999999999],
    )
    def test_float_to_int32_matches_scalar_contract(self, x):
        got = host.float_to_int32(np.array([x]))[0]
        assert got == scalar_float_to_int32(x)

    def test_full_scale_saturates(self):
        assert host.float_to_int32(np.array([1.0]))[0] == 2**31 - 1
        assert host.float_to_int32(np.array([-1.0]))[0] == -(2**31)
        assert host.float_to_int32(np.array([100.0]))[0] == 2**31 - 1
        assert host.float_to_int32(np.array([-100.0]))[0] == -(2**31)

    def test_int32_to_float_scale(self):
        v = np.array([2**31 - 1, -(2**31), 1 << 16], np.int32)
        f = host.int32_to_float(v)
        assert f.dtype == np.float32
        np.testing.assert_allclose(
            f, (v.astype(np.float32) * np.float32(2.0**-31)), rtol=0
        )
        d = host.int32_to_float(v, double=True)
        np.testing.assert_allclose(d, v.astype(np.float64) * 2.0**-31, rtol=0)


class TestPackUnpack:
    @pytest.mark.parametrize("fmt", [F.INT16, F.INT24, F.INT32, F.FLOAT, F.DOUBLE])
    @pytest.mark.parametrize("be", [False, True])
    def test_roundtrip(self, fmt, be, rng):
        if is_sample_integer(fmt):
            vals = rng.integers(-(2**31), 2**31, size=64, dtype=np.int64).astype(
                np.int32
            )
            # normalized values must be representable in the target width
            if fmt == F.INT16:
                vals = (vals >> 16) << 16
            elif fmt == F.INT24:
                vals = (vals >> 8) << 8
        else:
            vals = rng.standard_normal(64).astype(
                np.float64 if fmt == F.DOUBLE else np.float32
            )
        raw = host.pack(vals, fmt, be)
        assert raw.dtype == np.uint8
        assert raw.size == 64 * get_bytes_per_sample(fmt)
        back = host.unpack(raw, fmt, be)
        np.testing.assert_array_equal(back, vals)

    def test_int16_msb_alignment(self):
        raw = np.frombuffer(np.array([1, -1, 32767, -32768], "<i2").tobytes(), np.uint8)
        v = host.unpack(raw, F.INT16, False)
        np.testing.assert_array_equal(
            v, np.array([1 << 16, -1 << 16, 32767 << 16, -32768 << 16], np.int32)
        )

    def test_int24_sign_extension(self):
        # -1 as int24 LE = ff ff ff ; +1 = 01 00 00
        raw = np.array([0xFF, 0xFF, 0xFF, 0x01, 0x00, 0x00], np.uint8)
        v = host.unpack(raw, F.INT24, False)
        np.testing.assert_array_equal(v, np.array([-1 << 8, 1 << 8], np.int32))


class TestSanityChecks:
    def test_clamps_channels(self):
        ok, sc, dc, nch, nfr = block_transfer_sanity_checks(2, 4, 0, 8, 10, 5)
        assert ok and nch == 2 and nfr == 5

    def test_collapse(self):
        ok, sc, dc, nch, nfr = block_transfer_sanity_checks(0, 4, 0, 4, 4, 10)
        assert ok and nch == 40 and nfr == 1

    def test_no_collapse_when_disallowed(self):
        ok, sc, dc, nch, nfr = block_transfer_sanity_checks(
            0, 4, 0, 4, 4, 10, allow_single_channel=False
        )
        assert ok and nch == 4 and nfr == 10

    def test_invalid(self):
        ok, *_ = block_transfer_sanity_checks(5, 4, 0, 4, 1, 10)
        assert not ok


class TestTransferSamples:
    def test_float_to_int16_with_interleave(self, rng):
        # 8 frames of 2 channels float32, written into channels 1..2 of a
        # 4-channel int16 destination
        nfr, nch = 8, 2
        x = (rng.standard_normal((nfr, nch)) * 0.5).astype(np.float32)
        src = np.frombuffer(x.tobytes(), np.uint8).copy()
        dst = np.zeros(nfr * 4 * 2, np.uint8)
        assert transfer_samples(src, F.FLOAT, False, 0, nch, dst, F.INT16, False, 1, 4, nch, nfr)
        out = np.frombuffer(dst.tobytes(), "<i2").reshape(nfr, 4)
        expect = np.array(
            [[scalar_float_to_int32(v) >> 16 for v in row] for row in x.astype(np.float64)]
        )
        np.testing.assert_array_equal(out[:, 1:3], expect)
        np.testing.assert_array_equal(out[:, 0], 0)
        np.testing.assert_array_equal(out[:, 3], 0)

    def test_int16_to_int24_widening(self):
        vals = np.array([1000, -1000, 32767, -32768], "<i2")
        src = np.frombuffer(vals.tobytes(), np.uint8).copy()
        dst = np.zeros(4 * 3, np.uint8)
        assert transfer_samples(src, F.INT16, False, 0, 1, dst, F.INT24, False, 0, 1, 1, 4)
        back = host.unpack(dst, F.INT24, False)
        np.testing.assert_array_equal(back, vals.astype(np.int32) << 16)

    def test_endianness_swap(self, rng):
        vals = rng.integers(-(2**31), 2**31, 16, dtype=np.int64).astype(np.int32)
        src = np.frombuffer(vals.astype("<i4").tobytes(), np.uint8).copy()
        dst = np.zeros(16 * 4, np.uint8)
        assert transfer_samples(src, F.INT32, False, 0, 1, dst, F.INT32, True, 0, 1, 1, 16)
        np.testing.assert_array_equal(np.frombuffer(dst.tobytes(), ">i4"), vals)

    def test_double_roundtrip_snr(self, rng):
        from tests.conftest import snr_db

        x = rng.uniform(-0.9, 0.9, 1024).astype(np.float64)
        src = np.frombuffer(x.tobytes(), np.uint8).copy()
        mid = np.zeros(1024 * 3, np.uint8)  # int24
        transfer_samples(src, F.DOUBLE, False, 0, 1, mid, F.INT24, False, 0, 1, 1, 1024)
        out = np.zeros(1024 * 8, np.uint8)
        transfer_samples(mid, F.INT24, False, 0, 1, out, F.DOUBLE, False, 0, 1, 1, 1024)
        y = np.frombuffer(out.tobytes(), np.float64)
        assert snr_db(x, y) > 130.0  # 24-bit quantisation floor ≈ 146 dB - headroom

    def test_dither_decorrelates(self, rng):
        # constant small signal: undithered truncation is deterministic,
        # TPDF dither must spread it across adjacent codes with correct mean
        x = np.full(20000, 0.25 * 2.0**-16 + 2.0**-18, np.float32)
        src = np.frombuffer(x.tobytes(), np.uint8).copy()
        out_nd = np.zeros(x.size * 2, np.uint8)
        transfer_samples(src, F.FLOAT, False, 0, 1, out_nd, F.INT16, False, 0, 1, 1, x.size)
        nd = np.frombuffer(out_nd.tobytes(), "<i2").astype(np.float64)
        assert np.ptp(nd) == 0  # truncation: all identical
        out_d = np.zeros(x.size * 2, np.uint8)
        transfer_samples(
            src, F.FLOAT, False, 0, 1, out_d, F.INT16, False, 0, 1, 1, x.size,
            ditherer=TPDFDitherer(seed=7),
        )
        d = np.frombuffer(out_d.tobytes(), "<i2").astype(np.float64)
        assert np.ptp(d) >= 2  # spread across codes
        true_val = float(x[0]) * 2**15
        assert abs(d.mean() - true_val) < 0.05  # dithered mean ≈ true value
        assert abs(nd.mean() - true_val) > 0.2  # truncated mean is biased

    def test_shaped_dither_highpasses_noise_floor(self):
        """ShapedDitherer moves quantization noise out of the low band:
        error-feedback shaping by (1 - H(z)) (ref: the stateful per-channel
        extension point of Ditherer, src/SoundFormatConversions.h:39-54)."""
        from bbcat_dsp_tpu.formats import ShapedDitherer

        fs, n = 48000.0, 1 << 14
        t = np.arange(n) / fs
        x = (0.01 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32)
        src = np.frombuffer(x.tobytes(), np.uint8).copy()

        def quant_error(ditherer):
            out = np.zeros(n * 2, np.uint8)
            transfer_samples(src, F.FLOAT, False, 0, 1, out, F.INT16, False,
                             0, 1, 1, n, ditherer=ditherer)
            y = np.frombuffer(out.tobytes(), "<i2").astype(np.float64) / 2**15
            return y - x.astype(np.float64)

        e_tpdf = quant_error(TPDFDitherer(seed=3))
        e_shape = quant_error(ShapedDitherer(seed=3))

        w = np.hanning(n)
        def band_power(e, f_lo, f_hi):
            s = np.abs(np.fft.rfft(e * w)) ** 2
            f = np.fft.rfftfreq(n, 1 / fs)
            m = (f >= f_lo) & (f < f_hi)
            # notch the sine bin region out of the estimate
            m &= (f < 900.0) | (f > 1100.0)
            return float(np.mean(s[m]))

        lo_gain = 10 * np.log10(band_power(e_shape, 20.0, 3000.0)
                                / band_power(e_tpdf, 20.0, 3000.0))
        hi_gain = 10 * np.log10(band_power(e_shape, 18000.0, 24000.0)
                                / band_power(e_tpdf, 18000.0, 24000.0))
        assert lo_gain < -6.0   # audible band noise floor drops
        assert hi_gain > 3.0    # ...traded for ultrasonic-side noise
        # still unbiased and bounded
        assert abs(e_shape.mean()) < 2.0**-17
        assert np.max(np.abs(e_shape)) < 4.0 * 2.0**-15

    def test_shaped_dither_streaming_matches_whole(self, rng):
        """Per-channel feedback state carries across transfer_samples calls:
        block-streaming == one whole-signal call, bit-exact, 2 channels."""
        from bbcat_dsp_tpu.formats import ShapedDitherer

        n, nch = 1024, 2
        x = rng.uniform(-0.01, 0.01, (n, nch)).astype(np.float32)
        src = np.frombuffer(x.tobytes(), np.uint8).copy()

        whole = np.zeros(n * nch * 2, np.uint8)
        transfer_samples(src, F.FLOAT, False, 0, nch, whole, F.INT16, False,
                         0, nch, nch, n, ditherer=ShapedDitherer(seed=11))

        streamed = np.zeros(n * nch * 2, np.uint8)
        dit = ShapedDitherer(seed=11)
        B = 256
        for i in range(0, n, B):
            transfer_samples(
                src[i * nch * 4:(i + B) * nch * 4], F.FLOAT, False, 0, nch,
                streamed[i * nch * 2:(i + B) * nch * 2], F.INT16, False,
                0, nch, nch, B, ditherer=dit,
            )
        np.testing.assert_array_equal(whole, streamed)


class TestDeviceOps:
    def test_device_matches_host_away_from_edge(self, rng):
        import jax.numpy as jnp

        from bbcat_dsp_tpu.formats import device as dconv

        x = rng.uniform(-0.95, 0.95, 512).astype(np.float32)
        dev = np.asarray(dconv.float_to_int32(jnp.asarray(x)))
        hst = host.float_to_int32(x)
        # the device path scales in float32 (24-bit mantissa) while the host
        # path matches the reference's double math exactly, so low bits can
        # differ by up to one float32 ulp of 2^31 (= 256 counts, -138 dBFS)
        assert np.max(np.abs(dev.astype(np.int64) - hst.astype(np.int64))) <= 256

    def test_device_saturates(self):
        import jax.numpy as jnp

        from bbcat_dsp_tpu.formats import device as dconv

        v = np.asarray(dconv.float_to_int32(jnp.asarray([2.0, -2.0], jnp.float32)))
        assert v[0] > 2**31 - 256 and v[1] == -(2**31)

    def test_transfer_window(self, rng):
        import jax.numpy as jnp

        from bbcat_dsp_tpu.formats import device as dconv

        src = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
        dst = jnp.zeros((8, 16), jnp.float32)
        out = dconv.transfer_window(src, dst, src_channel=1, dst_channel=3, nchannels=2)
        np.testing.assert_array_equal(np.asarray(out[3:5]), np.asarray(src[1:3]))
        assert np.all(np.asarray(out[:3]) == 0) and np.all(np.asarray(out[5:]) == 0)

    def test_quantize_grid(self, rng):
        import jax.numpy as jnp

        from bbcat_dsp_tpu.formats import SampleFormat, quantize

        x = jnp.asarray((rng.standard_normal(256) * 0.5).astype(np.float32))
        q = np.asarray(quantize(x, SampleFormat.INT16))
        # every output on the 2^-15 grid
        np.testing.assert_allclose(q * 2**15, np.round(q * 2**15), atol=1e-6)


def test_transfer_samples_typed(rng):
    """Typed wrapper (ref: src/SoundFormatConversions.h:190-198): formats
    inferred from dtypes."""
    from bbcat_dsp_tpu.formats import transfer_samples_typed

    src = (rng.standard_normal((10, 3)) * 0.4).astype(np.float32)
    dst = np.zeros((10, 3), np.int16)
    assert transfer_samples_typed(src, 0, dst, 0, 3, 10)
    expect = np.trunc(
        np.clip(src.astype(np.float64) * 2**31, -2**31, 2**31 - 1)
    ).astype(np.int64) >> 16
    np.testing.assert_array_equal(dst, expect.astype(np.int16))


def test_cascade_loading_formats(rng):
    """Interleaved / split coefficient loading (ref: src/BiQuad.h:530-587):
    global gain + per-stage (b1,b2,a1,a2), b0 implied 1."""
    import jax.numpy as jnp
    from bbcat_dsp_tpu.filters import BiQuadCascade
    from bbcat_dsp_tpu import golden

    g = 0.5
    b1 = [0.2, -0.1]
    b2 = [0.05, 0.02]
    a1 = [-0.3, 0.1]
    a2 = [0.02, -0.05]
    inter = [g]
    for i in range(2):
        inter += [b1[i], b2[i], a1[i], a2[i]]
    c1 = BiQuadCascade.from_interleaved(inter)
    c2 = BiQuadCascade.from_split(g, b1, b2, a1, a2)
    x = rng.standard_normal(256).astype(np.float32)
    y1 = np.asarray(c1.process(jnp.asarray(x)))
    y2 = np.asarray(c2.process(jnp.asarray(x)))
    np.testing.assert_allclose(y1, y2, atol=1e-6)
    # golden: g applied once, stages serial with b0=1
    coeffs = np.stack([
        [g, g * b1[0], g * b2[0], a1[0], a2[0]],
        [1.0, b1[1], b2[1], a1[1], a2[1]],
    ])
    ref, _ = golden.cascade_process(x, coeffs)
    assert 10 * np.log10(np.sum(ref**2) / np.sum((ref - y1)**2)) > 90
