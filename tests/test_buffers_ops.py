"""Buffers, mixing, interpolators, analysis vs reference semantics."""

import numpy as np
import jax.numpy as jnp

from bbcat_dsp_tpu.buffers import (
    MultilayerBuffer,
    SoundDelayBuffer,
    SoundRingBuffer,
    ring_init,
    ring_read_delayed,
    ring_write,
)
from bbcat_dsp_tpu.formats.sample_format import SampleFormat
from bbcat_dsp_tpu.ops import (
    complex_interp_ramp,
    complex_interpolator,
    interp_ramp,
    interpolator,
    mix_samples,
    mix_samples_ramped,
    convolve2d,
)
from bbcat_dsp_tpu.analysis import Histogram, RunningAverage


def test_ring_write_read_delayed(rng):
    r = ring_init((2,), 16)
    x = rng.standard_normal((2, 10)).astype(np.float32)
    r = ring_write(r, jnp.asarray(x))
    # delay 1 = last written sample
    np.testing.assert_allclose(np.asarray(ring_read_delayed(r, 1)), x[:, -1])
    np.testing.assert_allclose(
        np.asarray(ring_read_delayed(r, 5, n=3)), x[:, -5:-2]
    )
    # wrap-around
    y = rng.standard_normal((2, 12)).astype(np.float32)
    r = ring_write(r, jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(ring_read_delayed(r, 1)), y[:, -1])
    # 22 samples written, delay 14 -> absolute samples 8,9 = x[:, -2:]
    np.testing.assert_allclose(
        np.asarray(ring_read_delayed(r, 14, n=2)), x[:, -2:]
    )


def test_delay_buffer_roundtrip(rng):
    buf = SoundDelayBuffer(3, 64)
    x = rng.standard_normal((3, 32)).astype(np.float32)
    buf.write(jnp.asarray(x))
    got = np.asarray(buf.read(delay=32, nframes=32))
    np.testing.assert_allclose(got, x)
    assert abs(buf.read_sample(1, 1) - x[1, -1]) < 1e-6


def test_delay_buffer_resize_preserves(rng):
    buf = SoundDelayBuffer(1, 32)
    x = rng.standard_normal((1, 20)).astype(np.float32)
    buf.write(jnp.asarray(x))
    buf.set_size(64)
    got = np.asarray(buf.read(delay=20, nframes=20))
    np.testing.assert_allclose(got, x)


def test_delay_buffer_packed_io(rng):
    buf = SoundDelayBuffer(2, 64)
    frames = (rng.standard_normal((16, 2)) * 0.4).astype(np.float32)
    raw = frames.reshape(-1).view(np.uint8)
    buf.write_packed(raw, SampleFormat.FLOAT, False, 0, 2, 16)
    out = buf.read_packed(SampleFormat.FLOAT, False, delay=16, nframes=16)
    np.testing.assert_allclose(
        out.view(np.float32).reshape(16, 2), frames, atol=1e-6
    )


def test_sound_ring_buffer_fifo(rng):
    rb = SoundRingBuffer(1, 16)
    assert rb.write_frames_available() == 15  # L-1 (ref modular arithmetic)
    assert rb.read_frames_available() == 0
    x = rng.standard_normal((1, 10)).astype(np.float32)
    assert rb.write(jnp.asarray(x)) == 10
    assert rb.read_frames_available() == 10
    assert rb.write_frames_available() == 5
    got = np.asarray(rb.read(6))
    np.testing.assert_allclose(got, x[:, :6])
    assert rb.read_frames_available() == 4
    assert rb.write_frames_available() == 11
    # clamped write
    y = rng.standard_normal((1, 20)).astype(np.float32)
    assert rb.write(jnp.asarray(y)) == 11
    got2 = np.asarray(rb.read(20))
    np.testing.assert_allclose(
        got2, np.concatenate([x[:, 6:], y[:, :11]], -1)
    )


def test_multilayer_mixing(rng):
    """Two producers at different block sizes mix into one stream
    (ref: src/MultilayerBuffer.h:22-43)."""
    ml = MultilayerBuffer(2, 1, capacity=64)
    a = rng.standard_normal((1, 24)).astype(np.float32)
    b = rng.standard_normal((1, 24)).astype(np.float32)
    # layer 0 writes 8-frame blocks, layer 1 writes 12-frame blocks
    ml.write_layer(0, jnp.asarray(a[:, :8]))
    ml.write_layer(1, jnp.asarray(b[:, :12]))
    assert ml.readable() == 8
    ml.write_layer(0, jnp.asarray(a[:, 8:16]))
    ml.write_layer(0, jnp.asarray(a[:, 16:24]))
    ml.write_layer(1, jnp.asarray(b[:, 12:24]))
    assert ml.readable() == 24
    got = np.asarray(ml.read(24))
    np.testing.assert_allclose(got, a + b, atol=1e-6)
    # slots are recycled after consume
    ml.write_layer(0, jnp.asarray(a[:, :8]))
    ml.write_layer(1, jnp.asarray(b[:, :8]))
    np.testing.assert_allclose(np.asarray(ml.read(8)), (a + b)[:, :8],
                               atol=1e-6)


def test_mix_samples_rect(rng):
    dst = jnp.zeros((4, 16))
    src = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    out = mix_samples(dst, src, mul=0.5, src_channel=1, dst_channel=2,
                      nchannels=2)
    expect = np.zeros((4, 16))
    expect[2:4] = 0.5 * np.asarray(src)[1:3]
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)


def test_mix_ramped_matches_scalar_loop(rng):
    """Ramped mix == the reference's per-frame interpolator loop
    (ref: src/SoundMixing.cpp:23-52)."""
    src = rng.standard_normal((1, 32)).astype(np.float32)
    it = interpolator(0.0, 1.0)
    dst, it2 = mix_samples_ramped(jnp.zeros((1, 32)), jnp.asarray(src), it,
                                  inc=0.05)
    # scalar golden loop
    cur, ref = 0.0, np.zeros(32)
    for i in range(32):
        ref[i] = cur * src[0, i]
        cur = min(cur + 0.05, 1.0)
    np.testing.assert_allclose(np.asarray(dst)[0], ref, atol=1e-6)
    assert abs(float(it2.current) - cur) < 1e-6


def test_complex_interpolator_group_landing():
    ci = complex_interpolator([0.0, 10.0], [1.0, 20.0])
    vals, ci2 = complex_interp_ramp(ci, 0.25, 6)
    v = np.asarray(vals)
    # both parameters land simultaneously at frame 4 (controller hits 0)
    np.testing.assert_allclose(v[:, 4], [1.0, 20.0], atol=1e-6)
    np.testing.assert_allclose(v[:, 0], [0.0, 10.0], atol=1e-6)
    assert float(ci2.controller) == 0.0


def test_conv2d_matches_scipy(rng):
    from scipy.signal import convolve2d as sp_conv2d

    img = rng.standard_normal((9, 11)).astype(np.float32)
    k = rng.standard_normal((3, 5)).astype(np.float32)
    for mode in ["same", "valid", "full"]:
        ours = np.asarray(convolve2d(jnp.asarray(img), jnp.asarray(k), mode))
        ref = sp_conv2d(img, k, mode=mode)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_running_average(rng):
    x = rng.standard_normal(64).astype(np.float32)
    ra = RunningAverage(8, shape=())
    m1 = np.asarray(ra.write(jnp.asarray(x[:32])))
    m2 = np.asarray(ra.write(jnp.asarray(x[32:])))
    means = np.concatenate([m1, m2])
    for i in range(64):
        lo = max(0, i - 7)
        np.testing.assert_allclose(means[i], x[lo:i + 1].mean(), atol=1e-5)


def test_running_average_alt_window(rng):
    x = rng.standard_normal(32).astype(np.float32)
    ra = RunningAverage(16, shape=(), alt_window=4)
    ra.write(jnp.asarray(x))
    np.testing.assert_allclose(ra.average(), x[-16:].mean(), atol=1e-5)
    np.testing.assert_allclose(ra.alt_average(), x[-4:].mean(), atol=1e-5)


def test_histogram_percentiles(rng):
    h = Histogram(100, 0.0, 1.0)
    data = rng.uniform(0, 1, 10000)
    h.write(data)
    assert abs(h.percentile_data(0.5) - 0.5) < 0.05
    assert abs(h.percentile_data(0.9) - 0.9) < 0.05
    assert abs(h.mean_data() - 0.5) < 0.02
    # clamping (ref: src/Histogram.h:103-107)
    h2 = Histogram(10, 0.0, 1.0)
    h2.write(np.array([-5.0, 5.0]))
    c = h2.counts()
    assert c[0] == 1 and c[-1] == 1


def test_histogram_write_to_file(tmp_path):
    h = Histogram(4, 0.0, 4.0)
    h.write(np.array([0.5, 1.5, 1.6, 3.2]))
    p = tmp_path / "h.dat"
    h.write_to_file(str(p))
    lines = p.read_text().strip().splitlines()
    assert len(lines) == 4


def test_multilayer_grows(rng):
    """ReserveSpace parity: the ring grows when a producer runs far ahead
    (ref: src/MultilayerBuffer.h:160-167)."""
    ml = MultilayerBuffer(2, 1, capacity=16)
    a = rng.standard_normal((1, 64)).astype(np.float32)
    b = rng.standard_normal((1, 64)).astype(np.float32)
    ml.write_layer(0, jnp.asarray(a))  # 64 frames in flight > 16 capacity
    assert ml.capacity >= 64
    ml.write_layer(1, jnp.asarray(b))
    got = np.asarray(ml.read(64))
    np.testing.assert_allclose(got, a + b, atol=1e-6)


def test_multilayer_aggregates_convolvers_at_different_block_sizes(rng):
    """The reference's motivating MultilayerBuffer scenario
    (ref: src/MultilayerBuffer.h:22-26): renderers with different partition
    sizes (here two convolvers at block 32 and 128) mix into one stream;
    the result equals the sum of the individual convolutions."""
    from bbcat_dsp_tpu.convolve import BlockConvolver
    from bbcat_dsp_tpu import golden
    from conftest import snr_db

    T = 512
    x = rng.standard_normal(T).astype(np.float32)
    ir_a = rng.standard_normal(96) * 0.3   # fast renderer, block 32
    ir_b = rng.standard_normal(384) * 0.2  # slow renderer, block 128
    conv_a = BlockConvolver(ir_a, block=32)
    conv_b = BlockConvolver(ir_b, block=128)
    ml = MultilayerBuffer(2, 1, capacity=1024)

    # producers run at their own block rates
    for i in range(T // 32):
        ya = conv_a.process_block(jnp.asarray(x[None, i*32:(i+1)*32]))
        ml.write_layer(0, ya)
    for i in range(T // 128):
        yb = conv_b.process_block(jnp.asarray(x[None, i*128:(i+1)*128]))
        ml.write_layer(1, yb)
    assert ml.readable() == T
    mixed = np.asarray(ml.read(T))[0]

    ref = (golden.direct_convolve(x, ir_a)[:T]
           + golden.direct_convolve(x, ir_b)[:T])
    assert snr_db(ref, mixed) > 90.0
