"""Benchmark driver: VB-EM iterations/sec on the flagship DMBD workload.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is wall-clock VB-EM iterations/sec for DynamicMarkovBlanketDiscovery
on a Lorenz-style batched workload (BASELINE.json config 5 scaled to fit the
bench budget).  ``vs_baseline`` compares against the torch-CPU reference
measured on this machine for the identical config (see
benchmarks/measure_reference.py; value stored in benchmarks/reference_times.json).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


# Benchmark configuration (kept modest so the reference is measurable on CPU).
CFG = dict(T=100, batch=20, n_obs=6, obs_dim=2, role_dims=(2, 2, 2),
           hidden_dims=(2, 2, 2), iters=10)


def make_data(cfg):
    import jax
    from pyvbmp_tpu.simulations import Lorenz

    sim = Lorenz()
    sim.num_steps = cfg["T"] * 5 + 10
    data = sim.simulate(cfg["batch"], key=jax.random.key(0))  # (t, batch, 3, 2)
    data = data[: cfg["T"], :, : cfg["n_obs"] // 2]
    # tile position/velocity channels into n_obs observables of obs_dim
    d = np.asarray(data)
    d = np.concatenate([d[..., 0], d[..., 1]], axis=-1)  # (T,batch,n_obs)
    d = np.stack([d, np.roll(d, 1, axis=0)], -1)  # (T,batch,n_obs,2)
    return d[: cfg["T"]].astype(np.float32)


def bench_ours(cfg, data):
    import jax
    import jax.numpy as jnp
    from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
    from pyvbmp_tpu.utils import rng

    rng.seed(0)
    y = jnp.asarray(data)
    model = DynamicMarkovBlanketDiscovery(
        obs_shape=(cfg["n_obs"], cfg["obs_dim"]),
        role_dims=cfg["role_dims"],
        hidden_dims=cfg["hidden_dims"],
    )
    model.update(y, iters=cfg["iters"])  # compile the fused multi-iter scan
    jax.block_until_ready(model.logZ)
    t0 = time.perf_counter()
    model.update(y, iters=cfg["iters"])
    jax.block_until_ready(model.logZ)
    dt = time.perf_counter() - t0
    return cfg["iters"] / dt, model.ELBO_save


def main():
    data = make_data(CFG)
    ips, elbos = bench_ours(CFG, data)

    ref_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks",
        "reference_times.json",
    )
    vs_baseline = None
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
        key = "dmbd_T%d_b%d" % (CFG["T"], CFG["batch"])
        if key in ref:
            ref_ips = ref[key]["iters_per_sec"]
            vs_baseline = ips / ref_ips
    print(
        json.dumps(
            {
                "metric": "DMBD VB-EM iterations/sec (T=%d, batch=%d, %d obs)"
                % (CFG["T"], CFG["batch"], CFG["n_obs"]),
                "value": round(ips, 3),
                "unit": "iters/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
