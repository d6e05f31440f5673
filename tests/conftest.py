"""Test harness: run on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reseed():
    from pyvbmp_tpu.utils import rng

    rng.seed(0)
    np.random.seed(0)
    yield
