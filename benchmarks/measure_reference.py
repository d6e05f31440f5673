"""Measure the torch-CPU reference's VB-EM iteration time for the bench
configs (BASELINE.md protocol step 1) and record it to reference_times.json.

Run on the benchmarking machine:  python benchmarks/measure_reference.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")  # data gen only; don't grab the TPU

from bench import CFG, make_data


def main():
    from models.DynamicMarkovBlanketDiscovery import DynamicMarkovBlanketDiscovery

    data = make_data(CFG)
    y = torch.tensor(np.asarray(data), dtype=torch.get_default_dtype())
    torch.manual_seed(0)
    model = DynamicMarkovBlanketDiscovery(
        obs_shape=(CFG["n_obs"], CFG["obs_dim"]),
        role_dims=list(CFG["role_dims"]),
        hidden_dims=list(CFG["hidden_dims"]),
    )
    model.update(y, None, None, iters=1, latent_iters=1, lr=1.0)  # warmup
    iters = max(2, CFG["iters"] // 2)
    t0 = time.perf_counter()
    model.update(y, None, None, iters=iters, latent_iters=1, lr=1.0)
    dt = time.perf_counter() - t0
    ips = iters / dt
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "reference_times.json")
    rec = {}
    if os.path.exists(out_path):
        rec = json.load(open(out_path))
    key = "dmbd_T%d_b%d" % (CFG["T"], CFG["batch"])
    rec[key] = {
        "iters_per_sec": ips,
        "seconds_per_iter": dt / iters,
        "config": CFG,
        "hardware": "torch-CPU (this machine)",
    }
    json.dump(rec, open(out_path, "w"), indent=1)
    print(json.dumps(rec[key]))


if __name__ == "__main__":
    main()
