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
