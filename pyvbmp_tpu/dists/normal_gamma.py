"""Diagonal-precision Normal-Gamma node — no matrix inversions
(reference dists/NormalGamma.py)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.random as jr

from .gamma import Gamma
from ..utils import math as um
from ..utils.jaxutils import pytree_dataclass, replace
from ..utils.rng import key_or_next


@pytree_dataclass(meta_fields=("event_shape", "batch_shape"))
class NormalGamma:
    lambda_mu_0: jnp.ndarray
    lambda_mu: jnp.ndarray
    mu_0: jnp.ndarray
    mu: jnp.ndarray
    gamma: Gamma
    SExx: jnp.ndarray
    SEx: jnp.ndarray
    N: jnp.ndarray
    event_shape: tuple
    batch_shape: tuple

    @classmethod
    def create(cls, event_shape, batch_shape=(), scale=1.0, prior_parms=None, key=None):
        pp = {"lambda_mu": 1.0, "mu": 0.0, "alpha": 2.0, "beta": 2.0}
        if prior_parms is not None:
            pp.update(prior_parms)
        key = key_or_next(key)
        k1, k2, k3 = jr.split(key, 3)
        lambda_mu_0 = jnp.broadcast_to(
            jnp.asarray(pp["lambda_mu"], float), tuple(batch_shape) + tuple(event_shape[:-1])
        )
        lambda_mu = lambda_mu_0 + jr.uniform(k1, lambda_mu_0.shape, dtype=lambda_mu_0.dtype)
        mu_0 = jnp.broadcast_to(
            jnp.asarray(pp["mu"], float), tuple(batch_shape) + tuple(event_shape)
        )
        gamma = Gamma.create(
            event_shape,
            batch_shape,
            prior_parms={
                "alpha": jnp.asarray(pp["alpha"], float),
                "beta": jnp.asarray(pp["beta"], float) * jnp.asarray(scale, float) ** 2,
            },
            key=k2,
        )
        mu = mu_0 + jr.normal(k3, mu_0.shape, dtype=mu_0.dtype) / jnp.sqrt(gamma.mean())
        shape = tuple(batch_shape) + tuple(event_shape)
        return cls(
            lambda_mu_0=lambda_mu_0,
            lambda_mu=lambda_mu,
            mu_0=mu_0,
            mu=mu,
            gamma=gamma,
            SExx=jnp.zeros(shape, mu_0.dtype),
            SEx=jnp.zeros(shape, mu_0.dtype),
            N=jnp.zeros(lambda_mu_0.shape, mu_0.dtype),
            event_shape=tuple(event_shape),
            batch_shape=tuple(batch_shape),
        )

    @property
    def dim(self):
        return self.event_shape[-1]

    @property
    def event_dim(self):
        # reference hard-codes event_dim=1 then adjusts via to_event
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

    def ss_update(self, SExx, SEx, N, lr=1.0, beta=None):
        store = (self.SExx, self.SEx, self.N)
        if beta is not None:
            store = (SExx + beta * self.SExx, SEx + beta * self.SEx, N + beta * self.N)
            SExx, SEx, N = store
        lambda_mu = self.lambda_mu_0 + N
        mu = (self.lambda_mu_0[..., None] * self.mu_0 + SEx) / lambda_mu[..., None]
        SExx_c = (
            SExx
            + self.lambda_mu_0[..., None] * self.mu_0**2
            - lambda_mu[..., None] * mu**2
        )
        new = replace(
            self,
            lambda_mu=lr * lambda_mu + (1 - lr) * self.lambda_mu,
            mu=lr * mu + (1 - lr) * self.mu,
            gamma=self.gamma.ss_update(0.5 * N[..., None], 0.5 * SExx_c, lr, beta),
            SExx=store[0],
            SEx=store[1],
            N=store[2],
        )
        return new

    def raw_update(self, X, p=None, lr=1.0, beta=None):
        nd = self.event_dim + self.batch_dim
        sample_shape = X.shape[: X.ndim - nd]
        sdims = tuple(range(len(sample_shape)))
        if p is None:
            SEx = X.sum(sdims)
            SExx = (X**2).sum(sdims)
            N = jnp.asarray(float(np.prod(sample_shape, dtype=np.float64)), X.dtype)
            N = jnp.broadcast_to(N, self.batch_shape + self.event_shape[:-1])
        else:
            N = p.sum(sdims)
            pv = p.reshape(p.shape + (1,) * self.event_dim)
            SEx = (X * pv).sum(sdims)
            SExx = (X**2 * pv).sum(sdims)
            N = jnp.broadcast_to(
                N.reshape(N.shape + (1,) * (self.event_dim - 1)),
                self.batch_shape + self.event_shape[:-1],
            )
        return self.ss_update(SExx, SEx, N, lr, beta)

    def Elog_like(self, X):
        out = -0.5 * ((X - self.mu) ** 2 * self.gamma.mean()).sum(-1) + 0.5 * (
            self.gamma.loggeomean().sum(-1)
        )
        # reference NormalGamma.Elog_like drops the -d/2 log 2pi term
        # (overwritten expression, dists/NormalGamma.py:75-85); kept for parity.
        for _ in range(self.event_dim - 1):
            out = out.sum(-1)
        return out

    def KLqprior(self):
        out = self.lambda_mu_0 / 2.0 * ((self.mu - self.mu_0) ** 2 * self.gamma.mean()).sum(-1)
        out = out + self.dim / 2.0 * (
            self.lambda_mu_0 / self.lambda_mu
            - jnp.log(self.lambda_mu_0 / self.lambda_mu)
            - 1
        )
        for _ in range(self.event_dim - 1):
            out = out.sum(-1)
        # NOTE: the reference sums the gamma KL over its *batch* dim here
        # (dists/NormalGamma.py:93), adding the total gamma KL to every batch
        # entry; reproduced verbatim for ELBO parity.
        gkl = self.gamma.KLqprior()
        if gkl.ndim > 0:
            gkl = gkl.sum(-1)
        return out + gkl

    def mean(self):
        return self.mu

    def Emumu(self):
        return (
            self.mu[..., None, :] * self.mu[..., :, None]
            + self.ESigma() / self.lambda_mu[..., None, None]
        )

    def ElogdetinvSigma(self):
        return self.gamma.loggeomean().sum(-1)

    def EmuTinvSigmamu(self):
        return (self.mu**2 * self.gamma.mean()).sum(-1) + self.dim / self.lambda_mu

    def EXTinvUX(self):
        return self.EmuTinvSigmamu()

    def EinvSigma(self):
        return self.gamma.mean()[..., None] * jnp.eye(self.dim)

    def ESigma(self):
        return self.gamma.meaninv()[..., None] * jnp.eye(self.dim)

    def Res(self):
        return (
            -0.5 * self.EXTinvUX()
            + 0.5 * self.ElogdetinvSigma()
            - 0.5 * self.dim * um.LOG2PI
        )

    def EinvSigmamu(self):
        return self.gamma.mean() * self.mu
