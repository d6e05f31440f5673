"""DMBD on Newton's-cradle data (reference examples/NewtonsCradle_example.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
from pyvbmp_tpu.simulations import NewtonsCradle
from pyvbmp_tpu.utils import rng


def main(iters=20):
    smoke = bool(int(os.environ.get("PYVBMP_EXAMPLE_SMOKE", "0")))
    Tmax, batch_size = (30, 2) if smoke else (200, 10)
    if smoke:
        iters = 2
    rng.seed(0)
    sim = NewtonsCradle(n_balls=5, ball_size=0.2, Tmax=Tmax, batch_size=batch_size,
                        g=1, leak=0.01, dt=0.05)
    data, theta = sim.generate_data("1 ball object", key=jax.random.key(3))
    model = DynamicMarkovBlanketDiscovery(
        obs_shape=(5, 2), role_dims=(2, 2, 2), hidden_dims=(2, 2, 2)
    )
    model.update(data, iters=iters, latent_iters=1, lr=0.5, verbose=True)
    a = np.asarray(model.particular_assignment())
    print("per-ball object assignment frequencies:")
    for ball in range(5):
        vals, counts = np.unique(a[..., ball], return_counts=True)
        print(" ball", ball, dict(zip(vals.tolist(), counts.tolist())))
    return model


if __name__ == "__main__":
    main()
