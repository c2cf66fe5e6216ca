"""Test configuration: 8 virtual CPU devices, float64 enabled.

The reference validates its distributed kernels only on a real cluster
(SURVEY.md §4); here every strategy is testable on one host via XLA's
virtual CPU devices — the multi-chip mesh tests run on an 8-device CPU mesh
and the same code paths run unchanged on a TPU pod slice.
"""

import os

# Must be set before jax initializes its backends. The environment pins
# JAX_PLATFORMS=axon (TPU tunnel); tests run on virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
