"""Cart + double pendulum simulator (reference simulations/cartthingy.py)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.rng import key_or_next


class cartthingy:
    @staticmethod
    def simulate(batch_num=1, key=None):
        key = key_or_next(key)
        m_c, m_p1, m_p2 = 1.0, 0.5, 0.5
        l1 = l2 = 1.0
        g = 1.0
        attractor = 0.1
        dt = 0.02
        T = 50.0
        N = int(T / dt)

        k1, k2, k3 = jax.random.split(key, 3)
        x0 = jax.random.normal(k1, (batch_num,))
        theta1_0 = np.pi / 2 - np.pi * jax.random.uniform(k2, (batch_num,))
        theta2_0 = np.pi / 2 - np.pi * jax.random.uniform(k3, (batch_num,))
        state0 = jnp.stack(
            [x0, theta1_0, theta2_0, jnp.zeros_like(x0), jnp.zeros_like(x0), jnp.zeros_like(x0)],
            -1,
        )

        def step(state, _):
            x, th1, th2, xd, th1d, th2d = [state[:, i] for i in range(6)]
            control = -attractor * x
            denom = m_c + m_p1 * jnp.sin(th1) ** 2 + m_p2 * jnp.sin(th2) ** 2
            xdd = (
                control
                + jnp.sin(th1) * (m_p1 * l1 * th1d**2)
                + jnp.sin(th2) * (m_p2 * l2 * th2d**2)
                + m_p1 * g * jnp.sin(th1) * jnp.cos(th1)
                + m_p2 * g * jnp.sin(th2) * jnp.cos(th2)
            ) / denom
            th1dd = -g * l1 * jnp.sin(th1) - jnp.cos(th1) * xdd / l1
            th2dd = -g * l2 * jnp.sin(th2) - jnp.cos(th2) * xdd / l2
            new = jnp.stack(
                [
                    x + xd * dt,
                    th1 + th1d * dt,
                    th2 + th2d * dt,
                    xd + xdd * dt,
                    th1d + th1dd * dt,
                    th2d + th2dd * dt,
                ],
                -1,
            )
            return new, new

        _, traj = jax.lax.scan(step, state0, None, length=N - 1)
        traj = jnp.concatenate([state0[None], traj], 0)
        return traj[::5]
