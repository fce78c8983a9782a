"""Hardware smoke test: run the key SNR checks on the REAL TPU.

The pytest suite runs on a virtual CPU mesh (fast, deterministic); this
script re-validates the numerically sensitive paths on actual hardware,
where the dftmm FFT backend, MXU precision modes, and the no-complex
constraint are live.

    python scripts/tpu_smoke.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def snr(ref, test):
    ref = np.asarray(ref, np.float64)
    test = np.asarray(test, np.float64)
    return 10 * np.log10(np.sum(ref**2) / np.sum((ref - test) ** 2))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from scipy.signal import fftconvolve

    from bbcat_dsp_tpu import golden
    from bbcat_dsp_tpu.convolve import (
        BlockConvolver,
        MatrixConvolver,
        NonUniformConvolver,
    )
    from bbcat_dsp_tpu.filters import FilterType, biquad_apply, biquad_coeffs
    from bbcat_dsp_tpu.loudness import integrated_loudness

    dev = jax.devices()[0]
    print(f"device: {dev}")
    rng = np.random.default_rng(0)
    ok = True

    def check(name, val, bound):
        nonlocal ok
        good = val > bound
        ok &= good
        print(f"  {name}: {val:.1f} dB ({'OK' if good else 'FAIL'} > {bound})")

    # modal biquad (incl. near-unit-circle RLB)
    for name, c in [
        ("PEQ 1k +6dB", golden.biquad_coeffs(FilterType.PEQ, 1000, 48000, 6)),
        ("RLB highpass", golden.k_weighting_coeffs(48000)[1]),
    ]:
        x = rng.standard_normal(48000).astype(np.float32)
        ref, _ = golden.biquad_process(x, c)
        y, _ = biquad_apply(jnp.asarray(x), np.asarray(c))
        check(f"biquad[{name}]", snr(ref, np.asarray(y)), 90.0)

    # uniform convolver
    B, N, T = 512, 4096, 512 * 16
    ir = rng.standard_normal(N) * np.exp(-np.arange(N) / 500.0)
    x = rng.standard_normal(T)
    conv = BlockConvolver(ir, block=B)
    y = np.asarray(conv.process(jnp.asarray(x[None], jnp.float32)))[0]
    check("uniform conv 4k-tap", snr(fftconvolve(x, ir)[:T], y), 90.0)

    # non-uniform flagship shape (one channel to keep runtime short)
    N2 = 32768
    ir2 = rng.standard_normal(N2) * np.exp(-np.arange(N2) / 4000.0)
    T2 = 4096 * 8
    x2 = rng.standard_normal(T2)
    nconv = NonUniformConvolver(ir2, block=512, ratio=8)
    y2 = np.asarray(nconv.process(jnp.asarray(x2[None], jnp.float32)))[0]
    check("nonuniform conv 32k-tap", snr(fftconvolve(x2, ir2)[:T2], y2), 90.0)

    # matrix (HRTF) convolver
    irm = rng.standard_normal((8, 2, 256)) * np.exp(-np.arange(256) / 60.0)
    x3 = rng.standard_normal((8, 512 * 4)).astype(np.float32)
    mc = MatrixConvolver(irm, block=512)
    outs = [np.asarray(mc.process_block(jnp.asarray(x3[:, i*512:(i+1)*512])))
            for i in range(4)]
    y3 = np.concatenate(outs, -1)
    ref3 = np.zeros_like(y3[0], dtype=np.float64)
    for i in range(8):
        ref3 += fftconvolve(x3[0 + i].astype(np.float64), irm[i, 0])[: y3.shape[-1]]
    check("matrix conv (out 0)", snr(ref3, y3[0]), 90.0)

    # loudness
    t = np.arange(48000 * 3) / 48000.0
    sine = (0.1 * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    L = float(integrated_loudness(jnp.asarray(sine[None]), 48000.0))
    good = abs(L - (-23.01)) < 0.2
    ok &= good
    print(f"  loudness 997Hz -20dBFS: {L:.2f} LKFS "
          f"({'OK' if good else 'FAIL'} ~ -23.01)")

    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
