"""Diagonal Wishart = vector of Gammas (reference dists/DiagonalWishart.py,
DiagonalWishart_UnitTrace.py)."""
from __future__ import annotations

import jax.numpy as jnp

from .gamma import Gamma
from ..utils.jaxutils import pytree_dataclass, replace


@pytree_dataclass(meta_fields=("event_shape", "batch_shape"))
class DiagonalWishart:
    gamma: Gamma
    event_shape: tuple
    batch_shape: tuple

    @classmethod
    def create(cls, event_shape, batch_shape=(), prior_parms=None, scale=1.0, key=None):
        pp = {"nu": 2.0, "U": 0.5}
        if prior_parms is not None:
            pp.update(prior_parms)
        gamma = Gamma.create(
            event_shape,
            batch_shape,
            prior_parms={
                "alpha": jnp.asarray(pp["nu"], float),
                "beta": jnp.asarray(scale, float) ** 2 / jnp.asarray(pp["U"], float),
            },
            key=key,
        )
        return cls(gamma=gamma, event_shape=tuple(event_shape), batch_shape=tuple(batch_shape))

    @property
    def dim(self):
        return self.event_shape[-1]

    @property
    def event_dim(self):
        return len(self.event_shape)

    @property
    def batch_dim(self):
        return len(self.batch_shape)

    def to_event(self, n):
        if n == 0:
            return self
        return replace(
            self,
            event_shape=self.batch_shape[-n:] + self.event_shape,
            batch_shape=self.batch_shape[:-n],
            gamma=self.gamma.to_event(n),
        )

    def ss_update(self, SExx, N, lr=1.0, beta=None):
        """SExx is the diagonal of a scatter matrix (reference
        DiagonalWishart.py:31-36)."""
        return replace(self, gamma=self.gamma.ss_update(N / 2.0, SExx / 2.0, lr, beta))

    def KLqprior(self):
        return self.gamma.KLqprior()

    def logZ(self):
        return self.gamma.logZ()

    def tensor_diag(self, A):
        return A[..., None] * jnp.eye(A.shape[-1], dtype=A.dtype)

    def ESigma(self):
        return self.tensor_diag(self.gamma.meaninv())

    def EinvSigma(self):
        return self.tensor_diag(self.gamma.mean())

    def ElogdetinvSigma(self):
        return self.gamma.loggeomean().sum(-1)

    def logdetEinvSigma(self):
        return jnp.log(self.gamma.mean()).sum(-1)

    def mean(self):
        return self.tensor_diag(self.gamma.mean())

    def invEinvSigma(self):
        return self.tensor_diag(1.0 / self.gamma.mean())


class DiagonalWishartUnitTrace(DiagonalWishart):
    """Trace-constrained diagonal Wishart: Tr(<Sigma^-1>) = dim via Newton on a
    shared shift of the Gamma rate (reference dists/DiagonalWishart_UnitTrace.py)."""

    def ss_update(self, SExx, N, lr=1.0, beta=None, iters=10):
        new = DiagonalWishart.ss_update(self, SExx, N, lr=lr, beta=beta)
        g = new.gamma
        x = jnp.zeros(g.beta.shape[:-1] + (1,), g.beta.dtype)
        bmin = g.beta.min(-1, keepdims=True)
        for _ in range(iters):
            f = (g.alpha / (g.beta + x)).sum(-1, keepdims=True)
            fprime = -(g.alpha / (g.beta + x) ** 2).sum(-1, keepdims=True)
            x = x + (new.dim - f) / fprime
            x = jnp.where(x < -bmin, -bmin + 1e-4, x)
        return replace(new, gamma=replace(g, beta=g.beta + x))
