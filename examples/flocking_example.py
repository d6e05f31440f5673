"""DMBD with multiple objects on flocking data
(reference examples/Flocking_example.py:33-41; the reference loads a
pre-baked flocking.pt — here the boids simulator generates the tracks)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
from pyvbmp_tpu.simulations import Flocking
from pyvbmp_tpu.utils import rng


def main(iters=20, number_of_objects=3):
    smoke = bool(int(os.environ.get("PYVBMP_EXAMPLE_SMOKE", "0")))
    if smoke:
        iters, number_of_objects = 2, 2
    rng.seed(0)
    if smoke:
        sim = Flocking(n_birds=6, Tmax=30, batch_size=2)
    else:
        sim = Flocking(n_birds=12, Tmax=200, batch_size=10)
    data = sim.simulate(jax.random.key(0))  # (T, batch, birds, 4)
    model = DynamicMarkovBlanketDiscovery(
        obs_shape=data.shape[-2:],
        role_dims=(2, 2, 2),
        hidden_dims=(2, 2, 2),
        number_of_objects=number_of_objects,
        parallel_scan=True,
    )
    model.update(data, iters=iters, latent_iters=1, lr=0.5, verbose=True)
    pa = np.asarray(model.particular_assignment())
    print("ELBO trace:", ["%.0f" % e for e in model.ELBO_save])
    print("per-bird object frequencies (last frame):")
    for b in range(data.shape[-2]):
        vals, counts = np.unique(pa[-1, :, b], return_counts=True)
        print("  bird", b, dict(zip(vals.tolist(), counts.tolist())))
    return model


if __name__ == "__main__":
    main()
