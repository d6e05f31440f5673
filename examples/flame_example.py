"""DMBD on flame-front data (reference examples/Flame_example.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
from pyvbmp_tpu.simulations import FlameSimulator
from pyvbmp_tpu.utils import rng


def main(iters=10):
    smoke = bool(int(os.environ.get("PYVBMP_EXAMPLE_SMOKE", "0")))
    num_steps = 120 if smoke else 500
    if smoke:
        iters = 2
    rng.seed(0)
    sim = FlameSimulator(num_steps=num_steps, delta_t=0.02, thermal_diffusivity=0.5,
                         temperature_threshold=0.45, num_sources=12)
    temperature, ignition_times, heat = sim.simulate()
    data = temperature[::5][..., None]  # (T, n_sources, 1)
    data = jnp.asarray(data)[:, None]  # add batch dim
    model = DynamicMarkovBlanketDiscovery(
        obs_shape=(12, 1), role_dims=(1, 1, 1), hidden_dims=(2, 1, 1)
    )
    model.update(data, iters=iters, latent_iters=1, lr=0.5, verbose=True)
    print("assignments:", np.unique(np.asarray(model.assignment())))
    return model


if __name__ == "__main__":
    main()
