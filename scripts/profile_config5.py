"""Where does config #5 (1024 ch x 64k taps) spend its time?

Times each stage of the non-uniform convolver separately on the real chip:
head window FFT, head MAC, head inverse FFT, tail FFT, tail MAC (static
slot), tail inverse FFT.  Uses device-resident repeat-scans so relay
dispatch cancels, and the short/long slope estimator.

    python scripts/profile_config5.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

FS = 48000.0


def slope(fn, n1=2, n2=8, reps=2):
    import jax.numpy as jnp

    fn(1)  # compile n=1? no — each n compiles separately; compile both:
    best = None
    fn(n1)
    fn(n2)

    def chain(n):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(n)
            float(jnp.sum(out))
            b = min(b, time.perf_counter() - t0)
        return b

    for _ in range(3):
        t1, t2 = chain(n1), chain(n2)
        per = (t2 - t1) / (n2 - n1)
        if per > 0.2 * t1 / n1:
            return per if best is None else min(best, per)
    return max(per, t2 / n2)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from functools import partial

    from bbcat_dsp_tpu.convolve.fft import (
        half_window_signs,
        irfft_tail_planes,
        rfft_half_planes,
    )
    from bbcat_dsp_tpu.convolve.nonuniform import _head_mac

    C, N, B, ratio = 1024, 65536, 512, 8
    SB = B * ratio
    P_head = 2 * ratio          # 16
    F = B + 1                   # 513
    P_tail = -(-(N - 2 * SB) // SB)  # 14
    F2 = SB + 1                 # 4097
    sb_seconds = SB / FS

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, SB)).astype(np.float32))
    xb = jnp.asarray(rng.standard_normal((ratio, C, B)).astype(np.float32))
    xext = jnp.asarray(
        rng.standard_normal((2, P_head + ratio, C, F)).astype(np.float32))
    Hh = jnp.asarray(
        rng.standard_normal((2, P_head, C, F)).astype(np.float32))
    acc = jnp.asarray(
        rng.standard_normal((2, ratio, C, F)).astype(np.float32))
    queue = jnp.asarray(
        rng.standard_normal((2, P_tail, C, F2)).astype(np.float32))
    Ht = jnp.asarray(
        rng.standard_normal((2, P_tail, C, F2)).astype(np.float32))
    acc2 = jnp.asarray(
        rng.standard_normal((2, 1, C, F2)).astype(np.float32))

    def mk(body, *args):
        @partial(jax.jit, static_argnames=("n",))
        def run(n, *a):
            def f(c, _):
                return body(c, *a[1:]), None
            out, _ = jax.lax.scan(f, a[0], None, length=n)
            return jnp.sum(out[0] if isinstance(out, tuple) else out)

        return lambda n: run(n, *args)

    stages = {}

    # head: window FFT assembly (one half-rFFT per small block + shift)
    s = jnp.asarray(half_window_signs(2 * B))

    def head_fft(prev, xb):
        xt = rfft_half_planes(xb, 2 * B)
        ext = jnp.concatenate([prev[:, None], xt], axis=1)
        X = ext[:, :-1] + s * ext[:, 1:]
        return X  # [2, ratio, C, F] chained via X as next "prev"? shapes differ

    # keep chaining trivial: feed X back rolled to [2, C, F]
    def head_fft_c(carry, xb):
        X = head_fft(carry, xb)
        return X[:, -1]

    stages["head_fft"] = mk(head_fft_c, jnp.zeros((2, C, F)), xb)

    def head_mac_c(carry, Hh):
        out = _head_mac(carry, Hh, ratio)
        # fold acc back into the first window positions to chain
        return carry.at[:, :ratio].set(out)

    stages["head_mac(P=16)"] = mk(head_mac_c, xext, Hh)

    def head_ifft_c(carry, _unused):
        y2 = irfft_tail_planes(carry, 2 * B)  # [ratio, C, B]
        return carry.at[:, :, :, 0].set(carry[:, :, :, 0] + jnp.mean(y2))

    stages["head_ifft"] = mk(head_ifft_c, acc, acc)

    def tail_fft_c(carry, _unused):
        xt = rfft_half_planes(carry, 2 * SB)  # [2, C, F2]
        return carry.at[:, 0].set(carry[:, 0] + xt[0, :, :SB] * 1e-9)

    stages["tail_fft"] = mk(tail_fft_c, x, x)

    def tail_mac_c(carry, Ht):
        q = carry
        acc_r = jnp.zeros_like(q[0, 0])
        acc_i = jnp.zeros_like(q[0, 0])
        for p in range(P_tail):
            slot = (0 - p) % P_tail
            acc_r = acc_r + (q[0, slot] * Ht[0, p] - q[1, slot] * Ht[1, p])
            acc_i = acc_i + (q[0, slot] * Ht[1, p] + q[1, slot] * Ht[0, p])
        return carry.at[:, 0].set(jnp.stack([acc_r, acc_i]))

    stages["tail_mac(P=14,static)"] = mk(tail_mac_c, queue, Ht)

    def tail_ifft_c(carry, _unused):
        y = irfft_tail_planes(carry, 2 * SB)  # [1, C, SB]
        return carry.at[:, :, :, 0].set(carry[:, :, :, 0] + jnp.mean(y))

    stages["tail_ifft"] = mk(tail_ifft_c, acc2, acc2)

    float(jnp.sum(jnp.ones((8, 128))))  # absorb backend init
    print(f"device: {jax.devices()[0]}  (per-SUPER-block costs, SB={SB} "
          f"samples = {sb_seconds * 1e3:.1f} ms of audio)")
    total = 0.0
    for name, fn in stages.items():
        dt = slope(fn)
        total += dt
        print(f"{name:24s} {dt * 1e3:8.3f} ms   ({sb_seconds / dt:7.1f}x RT)")
    print(f"{'TOTAL':24s} {total * 1e3:8.3f} ms   ({sb_seconds / total:7.1f}x RT)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
