"""Test configuration.

Tests run on CPU with 8 virtual devices so that the multi-chip sharding paths
(`shard_map` / `pjit` over a Mesh) exercise the same code that runs on a TPU
pod slice (SURVEY.md §4: distributed tests without a cluster).

These env vars must be set before jax initialises its backends, which is why
they live at the top of conftest (imported before any test module).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-selects the TPU platform regardless of the
# JAX_PLATFORMS env var; the config update below is the override that
# actually sticks.  It must run before any backend is initialised.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    # BBCAT_TEST_SEED overrides for robustness sweeps (CI default fixed)
    return np.random.default_rng(int(os.environ.get("BBCAT_TEST_SEED", "1234")))


def snr_db(ref, test) -> float:
    """Signal-to-noise ratio of `test` against reference `ref`, in dB."""
    ref = np.asarray(ref, np.float64)
    test = np.asarray(test, np.float64)
    noise = ref - test
    p_sig = np.sum(ref**2)
    p_noise = np.sum(noise**2)
    if p_noise == 0:
        return np.inf
    return 10.0 * np.log10(p_sig / p_noise)
