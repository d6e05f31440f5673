"""Recurrent switching LDS on synthetic regime-switching rotations
(working counterpart of the reference's inert models/wip_NLDS.py sketch)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from pyvbmp_tpu.models import NLDS
from pyvbmp_tpu.utils import rng


def make_data(T=200, B=8, seed=0):
    def rot(th):
        return np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])

    rs = np.random.RandomState(seed)
    As = [0.98 * rot(0.08), 0.98 * rot(0.5)]  # slow vs fast rotation regimes
    C = rs.randn(3, 2)
    x = rs.randn(B, 2)
    ys, zs = [], []
    z = np.zeros(B, int)
    for t in range(T):
        if t % 50 == 0 and t > 0:
            z = 1 - z
        A = np.stack([As[zi] for zi in z])
        x = np.einsum("bij,bj->bi", A, x) + 0.05 * rs.randn(B, 2)
        ys.append(x @ C.T + 0.1 * rs.randn(B, 3))
        zs.append(z.copy())
    return jnp.asarray(np.stack(ys), jnp.float32), np.stack(zs)


def main(iters=30, restarts=6):
    smoke = bool(int(os.environ.get("PYVBMP_EXAMPLE_SMOKE", "0")))
    if smoke:
        iters, restarts = 2, 1
    rng.seed(0)
    y, ztrue = make_data(T=60, B=4) if smoke else make_data()
    model = NLDS((3,), hidden_dim=2, mixture_dim=2)
    model.fit(y, iters=iters, restarts=restarts, verbose=True)
    hard = np.asarray(model.assignment())
    acc = max((hard == ztrue).mean(), (hard == 1 - ztrue).mean())
    print(f"segmentation accuracy vs true regimes: {acc:.3f}")
    print("per-state dynamics norms:", np.round(np.linalg.norm(
        np.asarray(model.A.mu)[:, :, :-1], axis=(1, 2)), 3))
    return model


if __name__ == "__main__":
    main()
