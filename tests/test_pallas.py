"""Pallas kernels vs XLA formulations (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from bbcat_dsp_tpu.ops.pallas import head_mac_pallas
from bbcat_dsp_tpu.convolve.nonuniform import _head_mac


def test_head_mac_pallas_matches_xla(rng):
    P, ratio, C, F = 8, 4, 8, 129
    xext = jnp.asarray(rng.standard_normal((2, P + ratio, C, F)).astype(np.float32))
    H = jnp.asarray(rng.standard_normal((2, P, C, F)).astype(np.float32))
    a = np.asarray(_head_mac(xext, H, ratio))
    b = np.asarray(head_mac_pallas(xext, H, ratio, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_mac_hook_integration(rng, monkeypatch):
    """BBCAT_DSP_PALLAS_MAC=1 routes the non-uniform head MAC through the
    kernel (interpreted off-TPU) with identical results."""
    import os
    import jax.numpy as jnp
    from bbcat_dsp_tpu.convolve import NonUniformConvolver

    B, ratio, T = 32, 4, 32 * 4 * 4
    ir = rng.standard_normal(3 * 32 * 4) * 0.3
    x = rng.standard_normal((1, T)).astype(np.float32)
    a = NonUniformConvolver(ir, block=B, ratio=ratio)
    y_ref = np.asarray(a.process(jnp.asarray(x)))
    monkeypatch.setenv("BBCAT_DSP_PALLAS_MAC", "1")
    import jax
    jax.clear_caches()
    b = NonUniformConvolver(ir, block=B, ratio=ratio)
    y_pal = np.asarray(b.process(jnp.asarray(x)))
    monkeypatch.delenv("BBCAT_DSP_PALLAS_MAC")
    jax.clear_caches()
    np.testing.assert_allclose(y_pal, y_ref, atol=1e-5)
