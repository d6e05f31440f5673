"""DMBD on the "life as we know it" particle dataset
(reference examples/Life_as_we_know_it_test.py:12-44).

The reference loads ./data/l{x,y}.txt (128 particles). If present they're
used with the reference's exact pipeline (drop first 847 frames, reshape to 6
batches of 200); otherwise a synthetic soup of interacting particle clusters
stands in so the example runs end to end.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
from pyvbmp_tpu.utils import rng


def load_life(data_dir="./data", T=770, n=64, k=6):
    yf = os.path.join(data_dir, "ly.txt")
    xf = os.path.join(data_dir, "lx.txt")
    if os.path.exists(yf) and os.path.exists(xf):
        y = np.genfromtxt(yf).T[..., None]
        x = np.genfromtxt(xf).T[..., None]
        data = np.concatenate((x, y), -1)
        data = data / data.std()
        data = data[847:]
    else:
        print("life data not found; simulating clustered particle soup")
        rs = np.random.RandomState(0)
        # default T/n smaller than the real dataset so CPU runs finish
        member = rs.randint(0, k, n)
        centers = np.cumsum(0.02 * rs.randn(T, k, 2), axis=0)
        jitter = 0.15 * rs.randn(T, n, 2)
        # particles follow their cluster center with OU-style jitter
        for t in range(1, T):
            jitter[t] = 0.95 * jitter[t - 1] + 0.05 * rs.randn(n, 2)
        data = centers[:, member] + jitter
        data = data / data.std()
    v = np.diff(data, axis=0)
    v = v / v.std()
    data = data[1:]
    data = np.concatenate((data, v), -1)
    T6 = (data.shape[0] // 6) * 6
    data = data[:T6].reshape(6, T6 // 6, data.shape[-2], 4).swapaxes(0, 1)
    return jnp.asarray(data, jnp.float32)  # (T/6, 6, 128, 4)


def main(iters=40):
    smoke = bool(int(os.environ.get("PYVBMP_EXAMPLE_SMOKE", "0")))
    rng.seed(0)
    if smoke:
        iters = 2
        data = load_life(T=80, n=12, k=2)
    else:
        data = load_life()
    model = DynamicMarkovBlanketDiscovery(
        obs_shape=data.shape[-2:],
        role_dims=(0, 1, 1),
        hidden_dims=(4, 2, 2) if smoke else (12, 4, 4),
        regression_dim=0,
        control_dim=0,
        number_of_objects=2 if smoke else 6,
    )
    model.update(data, iters=iters, lr=0.5, verbose=True)
    pa = np.asarray(model.particular_assignment())
    print(
        "object usage (batch 0, last frame):",
        np.bincount(pa[-1, 0], minlength=model.number_of_objects + 1).tolist(),
    )
    try:
        from animate_results import animate_results

        gif = "/tmp/wil.gif" if smoke else "./wil.gif"
        animate_results("particular", gif).make_movie(model, data, (0,))
        print("wrote", gif)
    except Exception as e:
        print("movie skipped:", e)
    return model


if __name__ == "__main__":
    main()
