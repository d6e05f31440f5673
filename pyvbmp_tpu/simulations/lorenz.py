"""Batched Lorenz-63 simulator with per-trajectory parameter jitter, velocity
channels, smoothing + decimation, and std-normalization
(reference simulations/Lorenz.py:16-58), integrated with ``lax.scan``."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.rng import key_or_next


class Lorenz:
    def __init__(self):
        self.sigma = 10.0
        self.rho = 28.0
        self.beta = 8.0 / 3.0
        self.dt = 0.01
        self.num_steps = 2000

    def simulate(self, batch_num, key=None):
        key = key_or_next(key)
        ks = jax.random.split(key, 4)
        jitter = 0.02
        sigma = self.sigma * (1 + 2 * (jax.random.uniform(ks[0], (batch_num,)) - 0.5) * jitter)
        rho = self.rho * (1 + 2 * (jax.random.uniform(ks[1], (batch_num,)) - 0.5) * jitter)
        beta = self.beta * (1 + 2 * (jax.random.uniform(ks[2], (batch_num,)) - 0.5) * jitter)
        xyz0 = jax.random.normal(ks[3], (3, batch_num))

        def step(xyz, _):
            x, y, z = xyz
            dx = sigma * (y - x)
            dy = x * (rho - z) - y
            dz = x * y - beta * z
            nxt = jnp.stack([x + dx * self.dt, y + dy * self.dt, z + dz * self.dt])
            return nxt, nxt

        _, traj = jax.lax.scan(step, xyz0, None, length=self.num_steps)
        data = jnp.moveaxis(traj, 1, -1)  # (T, batch, 3)

        n_smoothe = 5
        v_data = (data[1:] - data[:-1]) / self.dt
        data = data[1:]
        data = jnp.concatenate([data[..., None], v_data[..., None]], -1)
        data = self._smoothe(data, n_smoothe)[::n_smoothe]
        data = data / data.std(axis=(0, 1, 2), keepdims=True)
        return data

    @staticmethod
    def _smoothe(data, n):
        out = 0.0
        for i in range(n):
            out = out + data[i : data.shape[0] - n + i]
        return out / n
