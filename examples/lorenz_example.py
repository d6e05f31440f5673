"""DMBD on batched Lorenz-63 trajectories
(reference examples/Lorenz_example.py:20-34)."""
import jax


import numpy as np
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
from pyvbmp_tpu.simulations import Lorenz
from pyvbmp_tpu.utils import rng


def main(batch_num=20, iters=20):
    rng.seed(0)
    sim = Lorenz()
    data = sim.simulate(batch_num)  # (T, batch, 3, 2) position+velocity
    print("data:", data.shape)

    model = DynamicMarkovBlanketDiscovery(
        obs_shape=(3, 2),
        role_dims=(1, 2, 1),
        hidden_dims=(2, 2, 2),
    )
    model.update(data, iters=iters, latent_iters=1, lr=0.5, verbose=True)
    p = model.assignment_pr()
    print("ELBO trace:", ["%.0f" % e for e in model.ELBO_save])
    print("assignment fractions (s,b,z):", np.asarray(p.mean((0, 1, 2))))
    return model


if __name__ == "__main__":
    main()
