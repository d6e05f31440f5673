"""Batched GMM / HMM / LDS VB-EM iterations/sec — the remaining families in
BASELINE.json's metric ("batched GMM/HMM/LDS/DMBD"); DMBD and MixLDS have
their own benches.

Run: python benchmarks/core_models_bench.py {ref|ours}
Records the torch-CPU side into reference_times.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

GMM_CFG = dict(n=200000, nc=16, d=8, iters=10)
HMM_CFG = dict(T=200, batch=200, K=8, d=4, iters=10)
LDS_CFG = dict(T=200, batch=100, obs=4, hidden=2, iters=10)


def gmm_data(cfg, seed=0):
    rs = np.random.RandomState(seed)
    mus = rs.randn(cfg["nc"], cfg["d"]) * 4
    z = rs.randint(0, cfg["nc"], cfg["n"])
    return (mus[z] + rs.randn(cfg["n"], cfg["d"])).astype(np.float32)


def hmm_data(cfg, seed=0):
    rs = np.random.RandomState(seed)
    mus = rs.randn(cfg["K"], cfg["d"]) * 3
    z = np.zeros((cfg["T"], cfg["batch"]), np.int64)
    for t in range(1, cfg["T"]):
        stay = rs.rand(cfg["batch"]) < 0.9
        z[t] = np.where(stay, z[t - 1], rs.randint(0, cfg["K"], cfg["batch"]))
    return (mus[z] + rs.randn(cfg["T"], cfg["batch"], cfg["d"])).astype(np.float32)


def lds_data(cfg, seed=0):
    rs = np.random.RandomState(seed)
    th = 0.2
    A = np.asarray([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]) * 0.98
    C = rs.randn(cfg["obs"], cfg["hidden"])
    x = rs.randn(cfg["batch"], cfg["hidden"])
    ys = []
    for _ in range(cfg["T"]):
        x = x @ A.T + 0.05 * rs.randn(cfg["batch"], cfg["hidden"])
        ys.append(x @ C.T + 0.1 * rs.randn(cfg["batch"], cfg["obs"]))
    return np.stack(ys).astype(np.float32)


def bench_ref():
    import torch
    from models import GaussianMixtureModel, HMM, LinearDynamicalSystems
    from dists import NormalInverseWishart

    out = {}
    torch.manual_seed(0)
    X = torch.tensor(gmm_data(GMM_CFG))
    m = GaussianMixtureModel(GMM_CFG["nc"], GMM_CFG["d"])
    m.update(X, iters=1)  # warm
    t0 = time.perf_counter()
    m.update(X, iters=GMM_CFG["iters"])
    out["gmm"] = GMM_CFG["iters"] / (time.perf_counter() - t0)

    torch.manual_seed(0)
    Y = torch.tensor(hmm_data(HMM_CFG))
    obs = NormalInverseWishart((HMM_CFG["d"],), (HMM_CFG["K"],))
    m = HMM(obs)
    m.update(Y, iters=1)
    t0 = time.perf_counter()
    m.update(Y, iters=HMM_CFG["iters"])
    out["hmm"] = HMM_CFG["iters"] / (time.perf_counter() - t0)

    torch.manual_seed(0)
    y = torch.tensor(lds_data(LDS_CFG))
    m = LinearDynamicalSystems((LDS_CFG["obs"],), LDS_CFG["hidden"], 0, 0)
    m.update(y, iters=1)
    t0 = time.perf_counter()
    m.update(y, iters=LDS_CFG["iters"])
    out["lds"] = LDS_CFG["iters"] / (time.perf_counter() - t0)
    return out


def bench_ours():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from pyvbmp_tpu.models import (
        GaussianMixtureModel,
        HMM,
        LinearDynamicalSystems,
    )
    from pyvbmp_tpu.dists import NormalInverseWishart
    from pyvbmp_tpu.utils import rng

    out = {}

    def timeit(mkfit, iters):
        """Fused-iteration fit; report the best of 2 post-warm reps.

        update() already ends with a host fetch of the full ELBO trajectory
        (np.asarray inside each model's _update_reshaped), which forces
        completion on axon — an extra fetch here would add a redundant
        ~30 ms tunnel round-trip per rep (the round-4 sync-protocol fix,
        same as bench.py)."""
        mkfit()  # compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            mkfit()
            best = min(best, time.perf_counter() - t0)
        return iters / best

    # 3x the reference's iteration count per device dispatch: amortizes the
    # remote-tunnel dispatch latency the way the reference's python loop
    # does (same protocol as bench.py)
    rng.seed(0)
    X = jnp.asarray(gmm_data(GMM_CFG))
    m = GaussianMixtureModel(GMM_CFG["nc"], GMM_CFG["d"])
    fused = GMM_CFG["iters"] * 3
    out["gmm"] = timeit(lambda: m.update(X, iters=fused), fused)

    rng.seed(0)
    Y = jnp.asarray(hmm_data(HMM_CFG))
    obs = NormalInverseWishart.create((HMM_CFG["d"],), (HMM_CFG["K"],))
    m = HMM(obs, parallel_scan=True)
    fused = HMM_CFG["iters"] * 3
    out["hmm"] = timeit(lambda: m.update(Y, iters=fused), fused)

    rng.seed(0)
    y = jnp.asarray(lds_data(LDS_CFG))
    m = LinearDynamicalSystems((LDS_CFG["obs"],), LDS_CFG["hidden"], 0, 0,
                               parallel_scan=True)
    fused = LDS_CFG["iters"] * 3
    out["lds"] = timeit(lambda: m.update(y, iters=fused), fused)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ours"
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "reference_times.json"
    )
    rec = json.load(open(out_path)) if os.path.exists(out_path) else {}
    if which == "ref":
        res = bench_ref()
        for k, v in res.items():
            rec["core_" + k] = {
                "iters_per_sec": v,
                "config": {"gmm": GMM_CFG, "hmm": HMM_CFG, "lds": LDS_CFG}[k],
                "hardware": "torch-CPU (this machine)",
            }
        json.dump(rec, open(out_path, "w"), indent=1)
        print(json.dumps(res))
    else:
        res = bench_ours()
        report = {}
        for k, v in res.items():
            base = rec.get("core_" + k, {}).get("iters_per_sec")
            report[k] = {
                "iters_per_sec": round(v, 2),
                "vs_baseline": round(v / base, 1) if base else None,
            }
        print(json.dumps(report))


if __name__ == "__main__":
    main()
