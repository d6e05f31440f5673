"""Dirichlet conjugate node (reference dists/Dirichlet.py:1-87)."""
from __future__ import annotations

import jax.numpy as jnp
import jax.random as jr
from jax.scipy.special import digamma, gammaln

from ..utils import math as um
from ..utils.jaxutils import pytree_dataclass, replace, sum_leading
from ..utils.rng import key_or_next


@pytree_dataclass(meta_fields=("event_shape", "batch_shape"))
class Dirichlet:
    alpha_0: jnp.ndarray
    alpha: jnp.ndarray
    NA: jnp.ndarray  # accumulated sufficient statistics (minibatch beta decay)
    event_shape: tuple
    batch_shape: tuple

    # -- construction --------------------------------------------------------
    @classmethod
    def create(cls, event_shape, batch_shape=(), prior_parms=None, key=None):
        alpha_0 = jnp.asarray(
            0.5 if prior_parms is None else prior_parms["alpha"], dtype=float
        )
        alpha_0 = jnp.broadcast_to(alpha_0, batch_shape + event_shape)
        key = key_or_next(key)
        alpha = alpha_0 * (1.0 + jr.uniform(key, alpha_0.shape, dtype=alpha_0.dtype))
        return cls(
            alpha_0=alpha_0,
            alpha=alpha,
            NA=jnp.zeros_like(alpha_0),
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

    # -- updates --------------------------------------------------------------
    def ss_update(self, NA, lr=1.0, beta=None):
        if beta is not None:
            NA = beta * self.NA + NA
        alpha = lr * (NA + self.alpha_0) + (1 - lr) * self.alpha
        return replace(self, alpha=alpha, NA=NA)

    def raw_update(self, X, p=None, lr=1.0, beta=None):
        if p is None:
            NA = sum_leading(X, self.batch_dim + self.event_dim)
        else:
            pv = p.reshape(p.shape + (1,) * self.event_dim)
            NA = sum_leading(X * pv, self.batch_dim + self.event_dim)
        return self.ss_update(NA, lr, beta)

    update = raw_update

    # -- expectations ----------------------------------------------------------
    def _edims(self):
        return tuple(range(-self.event_dim, 0))

    def mean(self):
        return self.alpha / self.alpha.sum(self._edims(), keepdims=True)

    def loggeomean(self):
        # jax digamma(0) is NaN where torch gives -inf; masked transitions rely
        # on -inf logits, so emit it explicitly for zero alpha.
        dg = jnp.where(self.alpha > 0, digamma(self.alpha), -jnp.inf)
        return dg - digamma(self.alpha.sum(self._edims(), keepdims=True))

    ElogX = loggeomean

    def var(self):
        alpha_sum = self.alpha.sum(self._edims(), keepdims=True)
        mean = self.mean()
        return mean * (1 - mean) / (alpha_sum + 1)

    def Elog_like(self, X):
        ed = self._edims()
        return (
            (X * self.loggeomean()).sum(ed)
            + gammaln(1 + X.sum(ed))
            - gammaln(1 + X).sum(ed)
        )

    def KLqprior(self):
        ed = self._edims()
        alpha_sum = self.alpha.sum(ed)
        alpha_0_sum = self.alpha_0.sum(ed)
        KL = gammaln(alpha_sum) - um.lgamma_masked(self.alpha).sum(ed)
        KL = KL - gammaln(alpha_0_sum) + um.lgamma_masked(self.alpha_0).sum(ed)
        KL = KL + (
            (self.alpha - self.alpha_0)
            * (
                um.digamma_masked(self.alpha)
                - digamma(alpha_sum).reshape(
                    alpha_sum.shape + (1,) * self.event_dim
                )
            )
        ).sum(ed)
        while KL.ndim > self.batch_dim:
            KL = KL.sum(-1)
        return KL

    def logZ(self):
        ed = self._edims()
        return gammaln(self.alpha).sum(ed) - gammaln(self.alpha.sum(ed))
