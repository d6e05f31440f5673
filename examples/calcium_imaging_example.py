"""DMBD on calcium-imaging traces
(reference examples/Calcium_Imaging_example.py:9-25).

The reference loads data/calciumForJeff.npy (3600 frames x 41 ROIs). If the
file exists it's used with the reference's exact reshape pipeline; otherwise
synthetic calcium traces (poisson-spiking cell assemblies convolved with an
exponential indicator kernel) stand in so the example runs end to end.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
from pyvbmp_tpu.utils import rng


def load_calcium(data_dir="./data", n_cells=41, n_chunks=12, chunk_len=300):
    T_total = n_chunks * chunk_len
    f = os.path.join(data_dir, "calciumForJeff.npy")
    if os.path.exists(f):
        data = np.load(f)[..., None].astype(np.float64)
    else:
        print("calciumForJeff.npy not found; simulating calcium traces")
        rs = np.random.RandomState(0)
        T_total = T_total + 1  # diff below drops one frame; keep the full T after
        n_assemblies = 5
        membership = rs.randint(0, n_assemblies, n_cells)
        drive = (rs.rand(T_total, n_assemblies) < 0.03).astype(float)
        spikes = drive[:, membership] * (rs.rand(T_total, n_cells) < 0.8)
        kernel = np.exp(-np.arange(30) / 8.0)
        traces = np.stack(
            [np.convolve(spikes[:, c], kernel)[:T_total] for c in range(n_cells)], -1
        )
        data = (traces + 0.05 * rs.randn(T_total, n_cells))[..., None]
    data = data / data.std()
    v = np.diff(data, axis=0)
    v = v / v.std()
    data = np.concatenate((data[1:], v), -1)[:T_total]
    # reference reshape: 12 chunks of 300 frames -> batch of 12
    data = data.reshape(n_chunks, chunk_len, -1, 2).swapaxes(0, 1)
    return jnp.asarray(data, jnp.float32)  # (chunk_len, n_chunks, n_cells, 2)


def main(iters=50):
    smoke = bool(int(os.environ.get("PYVBMP_EXAMPLE_SMOKE", "0")))
    rng.seed(0)
    if smoke:
        iters = 2
        data = load_calcium(n_cells=8, n_chunks=2, chunk_len=40)
    else:
        data = load_calcium()
    model = DynamicMarkovBlanketDiscovery(
        obs_shape=data.shape[-2:],
        role_dims=(1, 1, 0),
        hidden_dims=(4, 2, 0),
        regression_dim=-1,
        control_dim=0,
        number_of_objects=2 if smoke else 5,
    )
    model.update(data, iters=iters, lr=0.5, verbose=True)
    pa = np.asarray(model.particular_assignment())
    print(
        "cell-to-object assignment (batch 0, last frame):",
        pa[-1, 0].tolist(),
    )
    return model


if __name__ == "__main__":
    main()
