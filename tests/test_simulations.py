"""Simulators produce finite, correctly-shaped trajectories."""
import numpy as np
import jax
import jax.numpy as jnp

from pyvbmp_tpu.simulations import (
    Flocking,
    FlameSimulator,
    Forager,
    Lorenz,
    NewtonsCradle,
    cartthingy,
)


def test_lorenz():
    sim = Lorenz()
    sim.num_steps = 200
    d = sim.simulate(4, key=jax.random.key(0))
    assert d.shape[1:] == (4, 3, 2)
    assert np.isfinite(np.asarray(d)).all()
    # normalized to unit std
    np.testing.assert_allclose(np.asarray(d).std((0, 1, 2)), 1.0, rtol=1e-3)


def test_newtons_cradle():
    sim = NewtonsCradle(n_balls=5, ball_size=0.2, Tmax=50, batch_size=3,
                        g=1, leak=0.01, dt=0.05)
    data, theta = sim.generate_data("1 ball object", key=jax.random.key(1))
    assert data.shape == (50, 3, 5, 2)
    assert np.isfinite(np.asarray(data)).all()
    # balls stay on the unit circle around their pivots
    assert float(jnp.abs(data[..., 1]).max()) <= 1.0 + 1e-5


def test_flame():
    sim = FlameSimulator(num_steps=100, delta_t=0.02, thermal_diffusivity=0.5,
                         temperature_threshold=0.45, num_sources=8)
    temp, ign, heat = sim.simulate()
    assert temp.shape == (100, 8)
    assert np.isfinite(np.asarray(temp)).all()
    # the flame front propagates: several sources ignite
    assert int(np.isfinite(np.asarray(ign)).sum()) >= 2


def test_forager():
    sim = Forager()
    sim.num_steps = 100
    fp, foodp, foodm = sim.simulate(seed=0)
    assert fp.shape == (101, 2) and foodp.shape == (101, 10, 2)


def test_cartthingy():
    traj = cartthingy.simulate(3, key=jax.random.key(2))
    assert traj.shape[1:] == (3, 6)
    assert np.isfinite(np.asarray(traj)).all()


def test_flocking():
    sim = Flocking(n_birds=6, Tmax=40, batch_size=2)
    d = sim.simulate(jax.random.key(3))
    assert d.shape == (40, 2, 6, 4)
    assert np.isfinite(np.asarray(d)).all()
    # cohesion: flock stays bounded
    assert float(jnp.abs(d[..., :2]).max()) < 50.0
