"""1-D heat-diffusion / ignition simulator via Green's functions
(reference simulations/flame.py)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.rng import key_or_next


class FlameSimulator:
    def __init__(self, num_steps, delta_t, thermal_diffusivity,
                 temperature_threshold, num_sources, key=None):
        key = key_or_next(key)
        self.num_steps = num_steps
        self.delta_t = delta_t
        self.thermal_diffusivity = thermal_diffusivity
        self.temperature_threshold = temperature_threshold
        self.num_sources = num_sources
        self.beta = 10
        self.source_locations = jnp.linspace(0, num_sources, num_sources)
        heat = jnp.sin(jnp.arange(num_sources) * 2 * np.pi / num_sources * 5) * 0.4 * \
            jax.random.uniform(key, (1,)) + 1.0
        self.heat = heat.at[0].set(5.0)
        self.source_locations = self.source_locations.at[0].set(-1.0)
        self.ignition_times = jnp.full((num_sources,), -jnp.inf).at[0].set(-1.0)

    def greens_function(self, x, x0, t, t0, amp):
        dt = t - t0
        temp = (
            amp
            * jnp.exp(-((x - x0) ** 2) / (4 * self.thermal_diffusivity * dt))
            / jnp.sqrt(4 * np.pi * self.thermal_diffusivity * dt)
        )
        return jnp.where(dt <= 0, 0.0, temp)

    def sum_greens_functions(self, x, x0, t, t0, amp):
        t = t.reshape(t.size, 1, 1)
        x = x.reshape(1, x.size, 1)
        x0 = x0.reshape(1, 1, x0.size)
        t0 = t0.reshape(1, 1, t0.size)
        amp = amp.reshape(1, 1, amp.size)
        return self.greens_function(x, x0, t, t0, amp).sum(-1).squeeze()

    def simulate(self):
        """Sequential ignition dynamics as a ``lax.scan`` over time steps
        (reference flame.simulate:84-99)."""
        locs = self.source_locations

        def step(carry, step_idx):
            ignition_times, heat = carry
            t = step_idx * self.delta_t
            temp = self.greens_function(
                locs[:, None], locs[None, :], t, ignition_times[None, :], heat[None, :]
            ).sum(-1)
            idx = (temp > self.temperature_threshold) & jnp.isneginf(ignition_times)
            ignition_times = jnp.where(idx, t, ignition_times)
            heat = jnp.where(
                idx, heat + jnp.sin(t * 2 * np.pi) * 0.2, heat
            )
            return (ignition_times, heat), jnp.minimum(temp, 2.0)

        (ignition_times, heat), temperature = jax.lax.scan(
            step, (self.ignition_times, self.heat), jnp.arange(self.num_steps)
        )
        self.ignition_times = ignition_times
        self.heat = heat
        return temperature, ignition_times, heat

    def fine_grain(self, num_x=1000, ignition_times=None, heat=None):
        if ignition_times is None:
            ignition_times = self.ignition_times
        if heat is None:
            heat = self.heat
        delta_x = self.num_sources / num_x
        x = jnp.linspace(0, self.num_sources, num_x)
        t = jnp.arange(self.num_steps) * self.delta_t
        fine_temp = self.sum_greens_functions(
            x, self.source_locations, t, ignition_times, heat
        )
        fine_temp = jnp.minimum(fine_temp, 2.0)
        fuel, ox = self.fuel_ox_blobs(x, self.source_locations, t, ignition_times, heat)
        src_idx = jnp.trunc(self.source_locations[1:] / delta_x).astype(int)
        return fine_temp, fuel, ox, src_idx

    def fuel_ox_blobs(self, x, x0, t, t0, amp):
        x = x[..., None, None]
        t = t[..., None]
        x0 = x0[1:][None, :]
        t0 = t0[1:][None, :]
        fuel = jnp.exp(-((x - x0) ** 2) / 0.1) * jax.nn.sigmoid((t0 - t) / 0.1)
        ox = 0.5 * jnp.exp(-((x - x0) ** 2) / 0.2) * jnp.exp(-((t0 - t) ** 2) / 0.2)
        return jnp.swapaxes(fuel.sum(-1), -2, -1), 1 - jnp.swapaxes(ox.sum(-1), -2, -1)
