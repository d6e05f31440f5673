"""Gaussian / Poisson mixture models (reference models/GaussianMixtureModel.py,
models/PoissonMixtureModel.py)."""
from __future__ import annotations

import jax.random as jr

from ..dists import Gamma, Mixture, NormalGamma, NormalInverseWishart
from ..utils.jaxutils import replace
from ..utils.rng import key_or_next


class GaussianMixtureModel(Mixture):
    def __init__(self, nc, dim, isotropic=False, key=None):
        key = key_or_next(key)
        if not isotropic:
            dist = NormalInverseWishart.create(
                event_shape=(dim,),
                batch_shape=(nc,),
                scale=1.0 / nc ** (1.0 / dim),
                key=key,
            )
        else:
            dist = NormalGamma.create(
                event_shape=(dim,),
                batch_shape=(nc,),
                scale=1.0 / nc ** (1.0 / dim),
                key=key,
            )
        super().__init__(dist, event_shape=(nc,), key=jr.fold_in(key, 1))

    def initialize(self, data, key=None):
        """Seed component means with random data points
        (reference models/GaussianMixtureModel.py:14-16)."""
        key = key_or_next(key)
        idx = jr.randint(key, self.event_shape, 0, data.shape[0])
        self.dist = replace(self.dist, mu=data[idx, :])


class PoissonMixtureModel(Mixture):
    def __init__(self, nc, dim, key=None):
        key = key_or_next(key)
        dist = Gamma.create(event_shape=(dim,), batch_shape=(nc,), key=key)
        super().__init__(dist, event_shape=(nc,), key=jr.fold_in(key, 1))
