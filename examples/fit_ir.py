"""Differentiable DSP demo: recover a room impulse response from
(input, output) recordings by gradient descent through the convolver.

    python examples/fit_ir.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # some site configs override the env var after the fact; re-assert it
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np
import jax.numpy as jnp
import optax

from bbcat_dsp_tpu.convolve import partition_ir
from bbcat_dsp_tpu.convolve.block import convolver_init, convolver_render
from bbcat_dsp_tpu.convolve.fft import rfft_planes


def main():
    rng = np.random.default_rng(0)
    B, N, T = 64, 256, 64 * 32
    true_ir = rng.standard_normal(N) * np.exp(-np.arange(N) / 60.0)
    x = jnp.asarray(rng.standard_normal((1, T)).astype(np.float32))
    H = partition_ir(true_ir, B)
    P = H.shape[1]
    _, y_target = convolver_render(convolver_init(1, B, P), H, x, B)

    def spectra(ir):
        parts = ir.reshape(P, B)
        padded = jnp.concatenate([parts, jnp.zeros_like(parts)], -1)
        return rfft_planes(padded, 2 * B)[:, :, None, :]

    @jax.jit
    def loss(ir):
        _, y = convolver_render(convolver_init(1, B, P), spectra(ir), x, B)
        return jnp.mean((y - y_target) ** 2)

    ir = jnp.zeros(P * B, jnp.float32)
    opt = optax.adam(3e-2)
    st = opt.init(ir)
    g = jax.jit(jax.grad(loss))
    for i in range(300):
        upd, st = opt.update(g(ir), st)
        ir = optax.apply_updates(ir, upd)
        if i % 50 == 0:
            print(f"step {i}: loss {float(loss(ir)):.3e}")
    err = np.asarray(ir)[:N] - true_ir
    snr = 10 * np.log10(np.sum(true_ir**2) / np.sum(err**2))
    print(f"recovered IR SNR: {snr:.1f} dB")


if __name__ == "__main__":
    main()
