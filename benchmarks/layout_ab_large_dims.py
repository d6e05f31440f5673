"""A/B the smoother layouts at the large-dim scaling rows (round 4 tail).

The scaling table's weakest rows are LDS h=32 (12 it/s) and HMM K=32/64
(178/96 it/s) — all run the plane layout by default (gates at 32).  Plane
form does O(h^3) VPU FLOPs per combine matmul; the dense layout's real
(h, h) matmuls batch onto the MXU.  This measures device-side ms/iter for
each layout head-to-head so the dispatch gates can be tuned from data.

Usage: python benchmarks/layout_ab_large_dims.py [lds|hmm|all]

Measured (1x TPU v5e via axon, warm best-of-3, 20-iter fused updates):

    lds h=16 o=16  plane 135.4 it/s ( 7.38 ms/iter)   dense 16.9 it/s ( 59.06)
    lds h=32 o=32  plane  11.5 it/s (86.69 ms/iter)   dense  5.7 it/s (176.50)
    hmm K=32 d=4   plane  28.3 it/s (35.37 ms/iter)   dense 27.5 it/s ( 36.40)
    hmm K=64 d=8   plane   3.8 it/s (262.46 ms/iter)  dense  6.6 it/s (151.10)

Conclusion: the default gates are confirmed by measurement, not changed.
Kalman plane wins by 2-8x through h=32 (gate PLANE_KALMAN_MAX_H=32 is
right, and plane — not dense — is the correct h=32 endpoint); HMM plane
and dense tie at K=32 and dense wins 1.7x at K=64, so PLANE_HMM_MAX_K=32
puts the crossover exactly at the measured boundary.

Round-5 follow-up (benchmarks/one_arm_lds.py, one arm per process since
fresh axon compiles can wedge a multi-arm run): FOUR more formulations
measured at the h=32 cliff (T=200, b=100, warm best-of-3):

    dense + chunked scan   195.6 ms/iter  (fat-row hypothesis REFUTED)
    dense + level scan     176.5 ms/iter  (round-4 number reconfirmed)
    sequential lax.scan    247.0 ms/iter  (per-step latency-bound)
    Pallas fused kernel    infeasible     (Mosaic scoped-VMEM OOM 33.7M>16M)
    plane + level scan      86.7 ms/iter  (round 4 — still the best)

The binding term at h=32 is per-op small-batched-matmul kernel floors
inside each Schur combine — not HBM element passes — so serializing
combines (chunked in-chunk phase, sequential scan) loses and the plane
layout's time-batched level combines remain the right structure.  The
fat-row chunked trigger ships default-OFF (PYVBMP_CHUNKED_SCAN_MIN_ROW_BYTES).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _best(f, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def time_lds(h, o, T=200, b=100, iters=20):
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

    data = np.asarray(
        jax.random.normal(jax.random.key(0), (T, b, o)), np.float32
    )
    out = {}
    # round 5: fat rows (>= MIN_ROW_BYTES per time-row) route the dense
    # layout through the 3-pass chunked scan instead of the ~2log2(T)-pass
    # level scan; arm it explicitly both ways to measure the crossover
    arms = (
        ("plane", 32, 0),
        ("dense_level", 0, 0),
        ("dense_chunked", 0, 1),
    )
    for layout, maxh, fat in arms:
        if layout == "plane" and h > 32:
            continue  # plane compile is impractical past the gate
        pk.PLANE_KALMAN_MAX_H = maxh
        cs.CHUNKED_SCAN_MIN_ROW_BYTES = 1 if fat else 0
        from pyvbmp_tpu.utils import rng

        rng.seed(0)
        m = LinearDynamicalSystems(
            obs_shape=(o,), hidden_dim=h, regression_dim=0,
            latent_noise="independent", parallel_scan=True,
        )
        m.update(data, iters=2)  # compile
        dt = _best(lambda: m.update(data, iters=iters))
        out[layout] = iters / dt
        print(f"lds h={h} o={o} {layout}: {out[layout]:.1f} it/s "
              f"({1e3 * dt / iters:.2f} ms/iter)", flush=True)
    pk.PLANE_KALMAN_MAX_H = int(os.environ.get("PYVBMP_PLANE_KALMAN_MAX_H", "32"))
    cs.CHUNKED_SCAN_MIN_ROW_BYTES = int(
        os.environ.get("PYVBMP_CHUNKED_SCAN_MIN_ROW_BYTES", str(512 * 1024))
    )
    return out


def time_hmm(K, d=4, T=200, b=200, iters=20):
    import jax
    import jax.numpy as jnp
    from pyvbmp_tpu.dists import NormalInverseWishart
    from pyvbmp_tpu.models import HMM
    from pyvbmp_tpu.ops import parallel_hmm as ph

    rs = np.random.RandomState(0)
    data = jnp.asarray(rs.randn(T, b, d), jnp.float32)
    out = {}
    for layout, maxk in (("plane", 64), ("dense", 0)):
        ph.PLANE_HMM_MAX_K = maxk
        from pyvbmp_tpu.utils import rng

        rng.seed(0)
        m = HMM(
            NormalInverseWishart.create((d,), batch_shape=(K,)),
            parallel_scan=True,
        )
        m.update(data, iters=2)
        dt = _best(lambda: m.update(data, iters=iters))
        out[layout] = iters / dt
        print(f"hmm K={K} d={d} {layout}: {out[layout]:.1f} it/s "
              f"({1e3 * dt / iters:.2f} ms/iter)", flush=True)
    ph.PLANE_HMM_MAX_K = int(os.environ.get("PYVBMP_PLANE_HMM_MAX_K", "32"))
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("lds", "all"):
        time_lds(16, 16)
        time_lds(32, 32)
        time_lds(64, 64)
    if which in ("hmm", "all"):
        time_hmm(32)
        time_hmm(64, d=8)


if __name__ == "__main__":
    main()
