"""Test harness: force CPU (the box exports JAX_PLATFORMS=axon which routes
everything through the single-TPU tunnel; the env var cannot be overridden on
this jax build — use config.update) and expose 8 virtual devices so sharding
paths are exercised without TPU hardware."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Default the smoother scans to the dense layout in tests: lane form exists
# for the TPU's (8,128) tiling and only bloats CPU trace time (~20s per
# DMBD-family test on this 1-core box). Numerical equivalence of the two
# layouts is covered explicitly by the lane_form=True tests in
# tests/test_parallel_scan.py.
os.environ.setdefault("PYVBMP_LANE_KALMAN_MAX_H", "0")
os.environ.setdefault("PYVBMP_LANE_HMM_MAX_K", "0")
# plane layout likewise defaults off in tests (dense is the reference path);
# tests/test_parallel_scan.py forces plane_form=True explicitly
os.environ.setdefault("PYVBMP_PLANE_KALMAN_MAX_H", "0")
os.environ.setdefault("PYVBMP_PLANE_HMM_MAX_K", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent jit cache: the suite is compile-dominated on this 1-core box.
# Host-keyed dir: XLA:CPU AOT entries from a different machine fail their
# feature check on load and silently force recompiles (utils/cache.py).
from pyvbmp_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache("/tmp/jax_comp_cache_cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reseed():
    from pyvbmp_tpu.utils import rng

    rng.seed(0)
    np.random.seed(0)
    yield
