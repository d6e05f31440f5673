"""One-command chip acceptance: the checks that would have caught every
TPU-only regression seen so far.  Run on a real accelerator (NOT part of
the CPU pytest gate — the failures it guards against are bf16-MXU /
dispatch behaviors that CPU cannot reproduce).

    python benchmarks/tpu_acceptance.py

Checks:
  1. backend is an accelerator (no silent CPU fallback);
  2. PG classifier accuracy at DEFAULT settings (guards the round-5
     bf16-Schur collapse: dMixLT fell to 0.082 on chip while CPU was
     fine);
  3. DMBD ELBO trajectory vs a recorded CPU-f32 trajectory to <=1%
     relative (guards smoother/message-path precision drift);
  4. plane-vs-dense smoother equivalence ON CHIP at the Flocking h=14
     shape (the CPU gate covers it, but layout bugs can be
     backend-specific).
Exits nonzero on any failure.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    failures = []

    # 1 -- backend
    backend = jax.default_backend()
    print("backend:", backend, flush=True)
    if backend == "cpu":
        print("FAIL: running on CPU — acceptance checks need the chip")
        sys.exit(2)

    # 2 -- PG classifier accuracy at default settings
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bk", os.path.join(os.path.dirname(__file__), "classification_bakeoff.py")
    )
    bk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bk)
    Xtr, ytr, Xte, yte = bk.get_task("digits")
    K = 10
    Ytr = np.eye(K, dtype=np.float32)[ytr]
    jXtr, jYtr, jXte = jnp.asarray(Xtr), jnp.asarray(Ytr), jnp.asarray(Xte)
    from pyvbmp_tpu.transforms import dMixtureofLinearTransforms
    from pyvbmp_tpu.utils import rng

    rng.seed(0)
    m = dMixtureofLinearTransforms(K, Xtr.shape[1], 4)
    m.raw_update(jXtr, jYtr, iters=10)
    pY, _ = m.predict(jXte)
    acc = float((np.asarray(pY.mean())[..., 0].argmax(-1) == yte).mean())
    print("dMixLT digits accuracy (default precision): %.3f" % acc, flush=True)
    if acc < 0.85:
        failures.append("PG classifier collapsed (acc %.3f < 0.85)" % acc)

    # 3 -- DMBD ELBO trajectory vs recorded CPU-f32 values (same seed/config;
    # recorded 2026-08 round 5, jax CPU x86-64 f32)
    cpu_ref = [
        -7312.578, -2172.199, -2001.105, -1921.927,
        -1907.181, -1882.969, -1859.697, -1883.728,
    ]
    from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery

    rs = np.random.RandomState(0)
    y = np.cumsum(rs.randn(60, 8, 4, 2), 0).astype(np.float32) * 0.1
    rng.seed(0)
    dm = DynamicMarkovBlanketDiscovery(
        obs_shape=(4, 2), role_dims=(1, 2, 1), hidden_dims=(2, 2, 2),
        parallel_scan=True,
    )
    dm.update(jnp.asarray(y), iters=8)
    dev = max(
        abs(a - b) / max(1.0, abs(b)) for a, b in zip(dm.ELBO_save, cpu_ref)
    )
    print("DMBD ELBO max dev vs CPU-f32 reference: %.2e" % dev, flush=True)
    if dev > 1e-2:
        failures.append("DMBD ELBO drift vs CPU %.2e > 1e-2" % dev)

    # 4 -- plane vs dense equivalence on chip at the h=14 production shape
    from pyvbmp_tpu.models.lds import LinearDynamicalSystems
    from pyvbmp_tpu.ops.parallel_kalman import parallel_kalman_smoother

    rng.seed(0)
    lds = LinearDynamicalSystems((3,), 14, 0, 0, parallel_scan=True)
    yk = jax.random.normal(jax.random.key(2), (8, 2, 3))
    yv, uv, rv = lds.reshape_inputs(yk)
    parms = lds._latent_parms(lds.A)
    like = lds.log_likelihood_function(lds.obs_model, yv, rv)
    # compare at PINNED precision: at the bf16 default the two layouts'
    # different op orders legitimately diverge ~0.7% (measured), which
    # would mask real layout bugs; pinned, both should agree tightly
    def run(plane):
        with jax.default_matmul_precision("highest"):
            return jax.jit(
                lambda: parallel_kalman_smoother(
                    parms, lds.x0, like, uv, lane_form=False, plane_form=plane
                )
            )()

    a, b = run(False), run(True)
    worst = 0.0
    for x, z in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        denom = float(jnp.abs(x).max()) + 1e-30
        worst = max(worst, float(jnp.abs(x - z).max()) / denom)
    print("plane-vs-dense h=14 max rel dev on chip (pinned): %.2e" % worst,
          flush=True)
    if worst > 1e-3:
        failures.append("plane/dense divergence on chip %.2e" % worst)

    if failures:
        print("TPU ACCEPTANCE: FAIL")
        for f in failures:
            print(" -", f)
        sys.exit(1)
    print("TPU ACCEPTANCE: PASS")


if __name__ == "__main__":
    main()
