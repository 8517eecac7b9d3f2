"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths compile and execute without TPU hardware.

Note: the environment's TPU plugin registers itself at interpreter startup
(sitecustomize) and programmatically forces the platform, so setting
JAX_PLATFORMS in os.environ is not enough — we must update jax.config after
import but before any backend is initialized.
"""

import os

# The environment's remote-TPU plugin (sitecustomize) registers itself in
# every python process whose env carries its sentinel var and programmatically
# dials the device tunnel, overriding JAX_PLATFORMS=cpu — during a tunnel
# outage that hangs CPU-only SUBPROCESS tests (demo/CLI/multihost smokes) at
# jax init. Scrub the sentinel so child interpreters skip the plugin; this
# process itself is handled by the jax.config.update below.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
