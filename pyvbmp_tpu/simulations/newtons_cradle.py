"""Pendulum-chain (Newton's cradle) simulator with collision handling
(reference simulations/NewtonsCradle.py), stepped with ``lax.scan``."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.rng import key_or_next


class NewtonsCradle:
    def __init__(self, n_balls, ball_size, Tmax, batch_size, g, leak, dt, include_string=False):
        self.n_balls = n_balls
        self.Tmax = Tmax
        self.batch_size = batch_size
        self.dt = dt
        self.ball_size = ball_size
        self.x_loc = (jnp.arange(n_balls) - (n_balls - 1) / 2) * ball_size
        self.g = g
        self.leak = leak
        self.include_string = include_string

    def initialize(self, init_type="random", key=None):
        key = key_or_next(key)
        B, n = self.batch_size, self.n_balls
        k1, k2, k3 = jax.random.split(key, 3)

        def u(k, shape):
            return jax.random.uniform(k, shape)

        pi = np.pi
        if init_type == "random":
            theta_0 = jnp.sort(u(k1, (B, n)) * 2 * pi - pi, -1) / 20.0
            return theta_0

        def side(k, m, sign, kk):
            return (
                2 * pi * (u(k, (B, m)) - 0.5) / 100
                + sign * pi / 2 * (u(kk, (B, 1)) + 2) / 3
            )

        if init_type.endswith("ball object") and "+" not in init_type:
            m = int(init_type.split(" ")[0])
            theta = jnp.sort(side(k1, m, -1, k3), -1)
            other = jnp.sort(2 * pi * (u(k2, (B, n - m)) - 0.5), -1) / 100.0
            return jnp.concatenate([theta, other], -1)
        if "+" in init_type:
            parts = init_type.split(" ")
            ml, mr = int(parts[0]), int(parts[2])
            kL, kR, kO, kSL, kSR = jax.random.split(k1, 5)
            thetaL = jnp.sort(side(kL, ml, -1, kSL), -1)
            thetaR = jnp.sort(side(kR, mr, +1, kSR), -1)
            rest = n - ml - mr
            if rest > 0:
                other = jnp.sort(2 * pi * (u(kO, (B, rest)) - 0.5), -1) / 1000.0
                return jnp.concatenate([thetaL, other, thetaR], -1)
            return jnp.concatenate([thetaL, thetaR], -1)
        raise ValueError(f"unknown init_type {init_type}")

    def generate_data(self, init_type="random", key=None):
        theta0 = self.initialize(init_type, key=key)
        v0 = jnp.zeros_like(theta0)
        dt, g, leak, bs = self.dt, self.g, self.leak, self.ball_size
        x_loc = self.x_loc
        n = self.n_balls

        def step(carry, _):
            theta_prev, v_prev = carry
            v = v_prev - dt * g * jnp.sin(theta_prev) - leak * dt * v_prev
            theta = theta_prev + dt * v
            X = jnp.sin(theta) + x_loc
            Y = -jnp.cos(theta)

            # sequential pairwise collision sweep (reference :97-112)
            def coll(k, tv):
                theta, v = tv
                dist = (X[:, k] - X[:, k - 1]) ** 2 + (Y[:, k] - Y[:, k - 1]) ** 2
                hit = (dist < bs**2).astype(theta.dtype)
                v_km1 = v[:, k - 1]
                v_k = v[:, k]
                new_v_km1 = v_k * hit + v_km1 * (1 - hit)
                new_v_k = v_km1 * hit + v_k * (1 - hit)
                v = v.at[:, k - 1].set(new_v_km1).at[:, k].set(new_v_k)
                theta = theta.at[:, k - 1].set(theta_prev[:, k - 1] + dt * v[:, k - 1])
                theta = theta.at[:, k].set(theta_prev[:, k] + dt * v[:, k])
                return theta, v

            theta, v = jax.lax.fori_loop(1, n, coll, (theta, v))
            theta = jnp.sort(theta, -1)
            return (theta, v), theta

        (_, _), thetas = jax.lax.scan(step, (theta0, v0), None, length=self.Tmax - 1)
        theta = jnp.concatenate([theta0[None], thetas], 0)

        X = jnp.sin(theta) + x_loc
        Y = -jnp.cos(theta)
        if isinstance(self.include_string, int) and not isinstance(self.include_string, bool):
            for k in range(1, self.include_string):
                R = 1 - k / self.include_string
                X = jnp.concatenate([X, jnp.sin(theta) * R + x_loc], -1)
                Y = jnp.concatenate([Y, -jnp.cos(theta) * R], -1)
        return jnp.concatenate([X[..., None], Y[..., None]], -1), theta
