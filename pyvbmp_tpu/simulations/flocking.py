"""Boids-style flocking simulator (stand-in generator for the reference's
examples/Flocking_example.py, which loads a pre-baked ./data/flocking.pt that
does not ship with the repo).  Produces (T, batch, n_birds, 4) position +
velocity trajectories with separation/alignment/cohesion dynamics, integrated
with ``lax.scan``."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.rng import key_or_next


class Flocking:
    def __init__(self, n_birds=12, Tmax=200, batch_size=10, dt=0.05,
                 sep_radius=0.5, align_radius=1.5, coh_radius=2.5,
                 sep_w=1.0, align_w=0.4, coh_w=0.3, noise=0.05, speed=1.0):
        self.n_birds = n_birds
        self.Tmax = Tmax
        self.batch_size = batch_size
        self.dt = dt
        self.sep_radius = sep_radius
        self.align_radius = align_radius
        self.coh_radius = coh_radius
        self.sep_w = sep_w
        self.align_w = align_w
        self.coh_w = coh_w
        self.noise = noise
        self.speed = speed

    def simulate(self, key=None):
        key = key_or_next(key)
        k1, k2, k3 = jax.random.split(key, 3)
        B, N = self.batch_size, self.n_birds
        pos0 = jax.random.normal(k1, (B, N, 2)) * 2.0
        vel0 = jax.random.normal(k2, (B, N, 2)) * 0.5

        def rules(pos, vel):
            d = pos[:, :, None, :] - pos[:, None, :, :]  # (B, N, N, 2) i - j
            dist = jnp.sqrt((d**2).sum(-1) + 1e-6)
            eye = jnp.eye(N, dtype=bool)

            def nbr(radius):
                m = (dist < radius) & ~eye
                return m.astype(pos.dtype)

            m_sep = nbr(self.sep_radius)
            m_align = nbr(self.align_radius)
            m_coh = nbr(self.coh_radius)
            # separation: push away from close neighbors
            sep = (d / dist[..., None] ** 2 * m_sep[..., None]).sum(2)
            # alignment: match neighbor velocity
            cnt_a = m_align.sum(-1, keepdims=True) + 1e-6
            align = (vel[:, None, :, :] * m_align[..., None]).sum(2) / cnt_a - vel
            # cohesion: move toward neighbor center of mass
            cnt_c = m_coh.sum(-1, keepdims=True) + 1e-6
            coh = (pos[:, None, :, :] * m_coh[..., None]).sum(2) / cnt_c - pos
            # mild attraction to the origin keeps the flock bounded
            home = -0.05 * pos
            return self.sep_w * sep + self.align_w * align + self.coh_w * coh + home

        def step(carry, k):
            pos, vel = carry
            acc = rules(pos, vel) + self.noise * jax.random.normal(k, vel.shape)
            vel = vel + self.dt * acc
            sp = jnp.sqrt((vel**2).sum(-1, keepdims=True) + 1e-8)
            vel = vel * jnp.minimum(1.0, self.speed / sp)  # speed limit
            pos = pos + self.dt * vel
            return (pos, vel), jnp.concatenate([pos, vel], -1)

        keys = jax.random.split(k3, self.Tmax)
        _, traj = jax.lax.scan(step, (pos0, vel0), keys)
        data = traj  # (T, B, N, 4)
        return data / data.std((0, 1, 2), keepdims=True)
