"""Gamma conjugate node — Poisson rates & precisions (reference dists/Gamma.py)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.random as jr
from jax.scipy.special import digamma, gammaln

from ..utils.jaxutils import pytree_dataclass, replace
from ..utils.rng import key_or_next


@pytree_dataclass(meta_fields=("event_shape", "batch_shape"))
class Gamma:
    alpha_0: jnp.ndarray
    beta_0: jnp.ndarray
    alpha: jnp.ndarray
    beta: jnp.ndarray
    SEx: jnp.ndarray
    SElogx: jnp.ndarray
    event_shape: tuple
    batch_shape: tuple

    @classmethod
    def create(cls, event_shape=(), batch_shape=(), prior_parms=None, key=None):
        pp = {"alpha": 1.0, "beta": 1.0}
        if prior_parms is not None:
            pp.update(prior_parms)
        shape = tuple(batch_shape) + tuple(event_shape)
        alpha_0 = jnp.broadcast_to(jnp.asarray(pp["alpha"], dtype=float), shape)
        beta_0 = jnp.broadcast_to(jnp.asarray(pp["beta"], dtype=float), shape)
        key = key_or_next(key)
        k1, k2 = jr.split(key)
        return cls(
            alpha_0=alpha_0,
            beta_0=beta_0,
            alpha=alpha_0 + jr.uniform(k1, shape, dtype=alpha_0.dtype),
            beta=beta_0 + jr.uniform(k2, shape, dtype=beta_0.dtype),
            SEx=jnp.zeros(shape, dtype=alpha_0.dtype),
            SElogx=jnp.zeros(shape, dtype=alpha_0.dtype),
            event_shape=tuple(event_shape),
            batch_shape=tuple(batch_shape),
        )

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
        )

    def ss_update(self, SElogx, SEx, lr=1.0, beta=None):
        """alpha <- alpha_0 + SElogx ; beta <- beta_0 + SEx (with lr damping).

        Argument order matches reference dists/Gamma.py:34-46 (the first
        stat feeds alpha, the second feeds beta).
        """
        store_SEx, store_SElogx = self.SEx, self.SElogx
        if beta is not None:
            store_SEx = beta * self.SEx + SEx
            store_SElogx = beta * self.SElogx + SElogx
            SEx, SElogx = store_SEx, store_SElogx
        alpha = (self.alpha_0 + SElogx) * lr + self.alpha * (1 - lr)
        beta_p = (self.beta_0 + SEx) * lr + self.beta * (1 - lr)
        return replace(self, alpha=alpha, beta=beta_p, SEx=store_SEx, SElogx=store_SElogx)

    def raw_update(self, X, p=None, lr=1.0, beta=None):
        nd = self.event_dim + self.batch_dim
        sample_shape = X.shape[: X.ndim - nd]
        sdims = tuple(range(len(sample_shape)))
        if p is None:
            N = jnp.broadcast_to(
                jnp.asarray(float(np.prod(sample_shape, dtype=np.float64))),
                self.batch_shape + self.event_shape,
            ).astype(X.dtype)
            SEx = X.sum(sdims)
        else:
            pv = p.reshape(p.shape + (1,) * self.event_dim)
            SEx = (X * pv).sum(sdims)
            N = jnp.broadcast_to(pv.sum(sdims), self.batch_shape + self.event_shape)
        return self.ss_update(SEx, N, lr=lr, beta=beta)

    def Elog_like(self, X):
        """Poisson observation model (reference dists/Gamma.py:76-77)."""
        out = X * self.loggeomean() - gammaln(X + 1) - self.mean()
        return out.sum(tuple(range(-self.event_dim, 0))) if self.event_dim else out

    def mean(self):
        return self.alpha / self.beta

    def var(self):
        return self.alpha / self.beta**2

    def meaninv(self):
        return self.beta / (self.alpha - 1)

    def ElogX(self):
        return digamma(self.alpha) - jnp.log(self.beta)

    def loggeomean(self):
        return jnp.log(self.alpha) - jnp.log(self.beta)

    def entropy(self):
        return (
            jnp.log(self.alpha)
            - jnp.log(self.beta)
            + gammaln(self.alpha)
            + (1 - self.alpha) * digamma(self.alpha)
        )

    def logZ(self):
        return -self.alpha * jnp.log(self.beta) + gammaln(self.alpha)

    def logZprior(self):
        return -self.alpha_0 * jnp.log(self.beta_0) + gammaln(self.alpha_0)

    def KLqprior(self):
        KL = (
            (self.alpha - self.alpha_0) * digamma(self.alpha)
            - gammaln(self.alpha)
            + gammaln(self.alpha_0)
            + self.alpha_0 * (jnp.log(self.beta) - jnp.log(self.beta_0))
            + self.alpha * (self.beta_0 / self.beta - 1)
        )
        return KL.sum(tuple(range(-self.event_dim, 0))) if self.event_dim else KL
