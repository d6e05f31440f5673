"""Directed mixture of arbitrary dists with an MNLR gate
(reference transforms/dMixture.py; reference flags itself 'Untested')."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.jaxutils import sum_leading
from .mnlr import MultiNomialLogisticRegression


class dMixture:
    def __init__(self, dist, p, key=None):
        from ..utils.rng import key_or_next

        self.event_dim = 1
        self.batch_dim = dist.batch_dim - 1
        self.event_shape = tuple(dist.batch_shape[-1:])
        self.batch_shape = tuple(dist.batch_shape[:-1])
        self.pi = MultiNomialLogisticRegression(
            self.event_shape[-1], p, batch_shape=self.batch_shape, pad_X=True,
            key=key_or_next(key),
        )
        self.dist = dist
        self.logZ = jnp.asarray(-jnp.inf)
        self.ELBO_save = []

    def update_assignments(self, X, Y):
        log_p = self.dist.Elog_like(
            jnp.expand_dims(Y, -self.dist.event_dim - 1)
        ) + self.pi.log_predict(X)
        shift = jax.lax.stop_gradient(log_p.max(-1, keepdims=True))
        p = jnp.exp(log_p - shift)
        logZ = p.sum(-1, keepdims=True)
        p = p / logZ
        logZ = jnp.log(logZ[..., 0]) + shift[..., 0]
        self.p = p
        keep = self.event_dim + self.batch_dim
        self.NA = sum_leading(p, keep)
        self.logZ = sum_leading(logZ, self.batch_dim)

    def update_parms(self, X, Y, lr=1.0):
        self.pi.raw_update(X, self.p, lr=lr)
        self.dist = self.dist.raw_update(
            jnp.expand_dims(Y, -self.dist.event_dim - 1), self.p, lr
        )

    def raw_update(self, X, Y, iters=1, lr=1.0, verbose=False):
        ELBO = -jnp.inf
        for _ in range(iters):
            ELBO_last = ELBO
            self.update_assignments(X, Y)
            ELBO = self.ELBO()
            self.update_parms(X, Y, lr)
            if verbose:
                print(
                    "Percent Change in ELBO:   ",
                    (ELBO - ELBO_last) / jnp.abs(ELBO_last) * 100.0,
                )
            self.ELBO_save.append(float(jnp.sum(ELBO)))

    def Elog_like(self, X, Y):
        log_p = self.dist.Elog_like(
            jnp.expand_dims(Y, -self.dist.event_dim - 1)
        ) + self.pi.log_predict(X)
        return jax.scipy.special.logsumexp(log_p, -1)

    def KLqprior(self):
        KL = self.pi.KLqprior() + self.dist.KLqprior().sum(-1)
        for _ in range(self.event_dim - 1):
            KL = KL.sum(-1)
        return KL

    def ELBO(self):
        return self.logZ - self.KLqprior()

    def assignment_pr(self):
        return self.p

    def assignment(self):
        return self.p.argmax(-1)

    def means(self):
        return self.dist.mean()

    def average(self, A, keepdim=False):
        return (A * self.p).sum(-1, keepdims=keepdim)

    def event_average(self, A, keepdim=False):
        de = self.dist.event_dim
        out = (A * self.p.reshape(self.p.shape + (1,) * de)).sum(-1 - de, keepdims=keepdim)
        for _ in range(self.event_dim - 1):
            out = out.sum(-de - 1, keepdims=keepdim)
        return out
