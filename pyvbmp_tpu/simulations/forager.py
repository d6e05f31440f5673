"""Foraging-agent simulator (reference simulations/Forager.py).  Host-side
python/numpy by design — it is a data generator with list-based agent logic,
not a compute path."""
from __future__ import annotations

import math
import random

import numpy as np


class Forager:
    def __init__(self):
        self.num_foods = 10
        self.food_range = 100
        self.forager_speed = 1
        self.vision_range = 20
        self.max_food_items = 3
        self.d_max = 75
        self.num_steps = 2000
        self.noise = 0.5

    def simulate(self, seed=None):
        if seed is not None:
            random.seed(seed)
        foods = [
            (
                random.uniform(-self.food_range, self.food_range),
                random.uniform(-self.food_range, self.food_range),
            )
            for _ in range(self.num_foods)
        ]
        loc = (0.0, 0.0)
        memory = []
        food_collected = 0
        food_in_memory = [0] * self.num_foods
        forager_positions = [loc]
        food_positions = [foods[:]]
        food_memory = [food_in_memory[:]]
        rand_direction = 2 * math.pi * random.uniform(0, 1)

        def move(loc, angle):
            return (
                loc[0] + self.forager_speed * math.cos(angle) + random.normalvariate(0, self.noise),
                loc[1] + self.forager_speed * math.sin(angle) + random.normalvariate(0, self.noise),
            )

        for _ in range(self.num_steps):
            new_items = [
                f
                for f in foods
                if f not in memory
                and math.hypot(loc[0] - f[0], loc[1] - f[1]) <= self.vision_range
            ]
            if new_items:
                memory.extend(new_items)
                for f in new_items:
                    food_in_memory[foods.index(f)] = 1

            if food_collected == self.max_food_items:
                angle = math.atan2(-loc[1], -loc[0])
                loc = move(loc, angle)
                if math.hypot(loc[0], loc[1]) <= self.forager_speed:
                    food_collected = 0
                    rand_direction = 2 * math.pi * random.uniform(0, 1)

            if food_collected < self.max_food_items:
                if memory:
                    nearest = min(
                        memory, key=lambda f: math.hypot(loc[0] - f[0], loc[1] - f[1])
                    )
                    angle = math.atan2(nearest[1] - loc[1], nearest[0] - loc[0])
                    loc = move(loc, angle)
                    if math.hypot(loc[0] - nearest[0], loc[1] - nearest[1]) <= self.forager_speed:
                        food_in_memory[foods.index(nearest)] = 0
                        foods[foods.index(nearest)] = (
                            random.uniform(-self.food_range, self.food_range),
                            random.uniform(-self.food_range, self.food_range),
                        )
                        memory.remove(nearest)
                        food_collected += 1
                else:
                    if math.hypot(loc[0], loc[1]) <= self.d_max:
                        loc = move(loc, rand_direction)
                    else:
                        angle = math.atan2(loc[1], loc[0]) + math.pi / 2
                        loc = move(loc, angle)

            forager_positions.append(loc)
            food_positions.append(foods[:])
            food_memory.append(food_in_memory[:])

        return (
            np.asarray(forager_positions, np.float32),
            np.asarray(food_positions, np.float32),
            np.asarray(food_memory, np.float32),
        )

    def simulate_batches(self, batch_num, seed=0):
        fp = np.zeros((self.num_steps + 1, batch_num, 2), np.float32)
        foodp = np.zeros((self.num_steps + 1, batch_num, self.num_foods, 2), np.float32)
        foodm = np.zeros((self.num_steps + 1, batch_num, self.num_foods), np.float32)
        for i in range(batch_num):
            fp[:, i], foodp[:, i], foodm[:, i] = self.simulate(seed=seed + i)
        data = np.concatenate([fp[:, :, None, :], foodp], -2)
        return data, foodm
