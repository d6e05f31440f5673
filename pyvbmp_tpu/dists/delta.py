"""Point-mass pseudo-distribution wrapping observed tensors so they can be
used as messages (reference dists/Delta.py)."""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.jaxutils import pytree_dataclass
from ..utils.linalg import mT


@pytree_dataclass
class Delta:
    X: jnp.ndarray

    def unsqueeze(self, dim):
        return Delta(jnp.expand_dims(self.X, dim))

    def squeeze(self, dim):
        return Delta(jnp.squeeze(self.X, dim))

    def sum(self, dim, keepdim=False):
        return self.X.sum(dim, keepdims=keepdim)

    def cumsum(self, dim):
        return self.X.cumsum(dim)

    @property
    def shape(self):
        return self.X.shape

    @property
    def dim(self):
        return self.X.shape[-2]

    def mean(self):
        return self.X

    def EX(self):
        return self.X

    def EXXT(self):
        return self.X @ mT(self.X)

    def EXTX(self):
        return mT(self.X) @ self.X

    def EXTAX(self, A):
        return mT(self.X) @ A @ self.X

    def EXX(self):
        return self.X**2

    def ElogX(self):
        return jnp.log(self.X)

    def E(self, f):
        return f(self.X)
