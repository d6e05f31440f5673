"""DMBD on artificial-life ("rotor story") particle tracks
(reference examples/Artificial_Life_example.py:12-57).

The reference loads ./data/rotor_story_{x,y}.txt; those data files are not
shipped. If present they're used verbatim (same decimation/normalization
pipeline); otherwise a synthetic rotor system — particles orbiting drifting
centers — stands in so the example runs end to end.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
from pyvbmp_tpu.utils import rng


def load_rotor_story(data_dir="./data", T_synth=400, n_particles=16):
    yf = os.path.join(data_dir, "rotor_story_y.txt")
    xf = os.path.join(data_dir, "rotor_story_x.txt")
    if os.path.exists(yf) and os.path.exists(xf):
        y = np.genfromtxt(yf)[..., None]
        x = np.genfromtxt(xf)[..., None]
        data = np.concatenate((y, x), -1)[::10]
    else:
        print("rotor_story data not found; simulating a synthetic rotor system")
        rs = np.random.RandomState(0)
        t = np.arange(T_synth)[:, None]
        centers = 0.5 * np.stack(
            [np.cos(2 * np.pi * t / 300.0), np.sin(2 * np.pi * t / 300.0)], -1
        )  # (T,1,2) slow drift shared by all rotors
        phase = rs.rand(n_particles) * 2 * np.pi
        omega = 2 * np.pi / (20.0 + 10.0 * rs.rand(n_particles))
        radius = 0.3 + 0.4 * rs.rand(n_particles)
        ang = phase[None, :] + omega[None, :] * t
        data = centers + radius[None, :, None] * np.stack(
            [np.cos(ang), np.sin(ang)], -1
        )
        data = data + 0.02 * rs.randn(*data.shape)
    data = data / data.std()
    v = np.diff(data, axis=0)
    v = v / v.std()
    data = np.concatenate((data[1:], v), -1)
    data = data[: data.shape[0] // 2]
    return jnp.asarray(data[:, None], jnp.float32)  # (T, 1, N, 4)


def main(iters_warm=10, iters=20):
    smoke = bool(int(os.environ.get("PYVBMP_EXAMPLE_SMOKE", "0")))
    rng.seed(0)
    if smoke:
        iters_warm, iters = 1, 1
        data = load_rotor_story(T_synth=80, n_particles=6)
    else:
        data = load_rotor_story()
    model = DynamicMarkovBlanketDiscovery(
        obs_shape=data.shape[-2:],
        role_dims=(0, 1, 0),
        hidden_dims=(4, 2, 1) if smoke else (8, 4, 2),
        regression_dim=-1,
        control_dim=0,
        number_of_objects=2 if smoke else 10,
    )
    # reference anneals the assignment temperature: ptemp 5 -> 1
    model.obs_model.ptemp = 5.0
    model.update(data, iters=iters_warm, latent_iters=1, lr=0.5, verbose=True)
    model.obs_model.ptemp = 1.0
    model.update(data, iters=iters, latent_iters=1, lr=0.5, verbose=True)

    pa = np.asarray(model.particular_assignment())
    print("object usage:", np.bincount(pa[-1, 0], minlength=model.number_of_objects + 1))
    try:
        from animate_results import animate_results

        gif = "/tmp/rotator_movie.gif" if smoke else "./rotator_movie.gif"
        animate_results("particular", gif).make_movie(model, data, (0,))
        print("wrote", gif)
    except Exception as e:  # matplotlib backends vary headless
        print("movie skipped:", e)
    return model


if __name__ == "__main__":
    main()
