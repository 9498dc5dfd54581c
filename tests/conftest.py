import os

# Tests run on a virtual 8-device CPU mesh so data-parallel sharding is
# exercised without TPU hardware. The device-count flag must be set before
# jax initializes its backends; the platform override must go through
# jax.config (the axon TPU plugin ignores the JAX_PLATFORMS env var).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
