"""Measure ONE LDS smoother arm on the chip: layout x fat-row dispatch.

Usage: python benchmarks/one_arm_lds.py <h> <plane_max> <fat:0|1> [T b iters]
Prints a single line: h, arm, it/s, ms/iter.  Kept separate from
layout_ab_large_dims.py so each (slow, tunnel-bound) compile runs in its
own bounded process.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    h = int(sys.argv[1])
    plane_max = int(sys.argv[2])
    fat = int(sys.argv[3])  # -1 = sequential lax.scan smoother
    T = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    b = int(sys.argv[5]) if len(sys.argv) > 5 else 100
    iters = int(sys.argv[6]) if len(sys.argv) > 6 else 20

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from pyvbmp_tpu.models import LinearDynamicalSystems
    from pyvbmp_tpu.ops import chunked_scan as cs
    from pyvbmp_tpu.ops import parallel_kalman as pk
    from pyvbmp_tpu.utils import rng

    pk.PLANE_KALMAN_MAX_H = plane_max
    cs.CHUNKED_SCAN_MIN_ROW_BYTES = 1 if fat == 1 else 0

    o = h
    data = np.asarray(jax.random.normal(jax.random.key(0), (T, b, o)), np.float32)
    rng.seed(0)
    m = LinearDynamicalSystems(
        obs_shape=(o,), hidden_dim=h, regression_dim=0,
        latent_noise="independent", parallel_scan=(fat >= 0),
    )
    t0 = time.perf_counter()
    m.update(jnp.asarray(data), iters=2)  # compile
    print("compiled in %.1fs" % (time.perf_counter() - t0), flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        m.update(jnp.asarray(data), iters=iters)
        best = min(best, time.perf_counter() - t0)
    if fat < 0:
        arm = "sequential"
    else:
        arm = ("plane" if h <= plane_max else "dense") + (
            "_chunked" if fat else "_level"
        )
    print(
        "lds h=%d %s: %.1f it/s (%.2f ms/iter)"
        % (h, arm, iters / best, 1e3 * best / iters),
        flush=True,
    )


if __name__ == "__main__":
    main()
