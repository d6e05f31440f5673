"""MVN with per-dimension ARD Gamma precision prior — the MNLR weight prior
(reference dists/MVN_ard.py)."""
from __future__ import annotations

import jax.numpy as jnp
import jax.random as jr

from .gamma import Gamma
from ..utils import math as um
from ..utils.jaxutils import pytree_dataclass, replace
from ..utils.linalg import psd_inv, psd_logdet, mT
from ..utils.rng import key_or_next


@pytree_dataclass(meta_fields=("event_shape", "batch_shape"))
class MVN_ard:
    mu: jnp.ndarray
    invSigma: jnp.ndarray
    Sigma: jnp.ndarray
    logdetinvSigma: jnp.ndarray
    invSigmamu: jnp.ndarray
    alpha: Gamma
    SEx: jnp.ndarray
    SExx: jnp.ndarray
    event_shape: tuple
    batch_shape: tuple

    @classmethod
    def create(cls, event_shape, batch_shape=(), scale=1.0, key=None):
        assert event_shape[-1] == 1
        dim = event_shape[-2]
        key = key_or_next(key)
        k1, k2 = jr.split(key)
        mu = jr.normal(k1, tuple(batch_shape) + tuple(event_shape)) * scale
        invSigma = jnp.broadcast_to(
            jnp.eye(dim) / scale**2,
            tuple(batch_shape) + tuple(event_shape[:-1]) + (dim,),
        )
        alpha = Gamma.create(
            event_shape,
            batch_shape,
            prior_parms={"alpha": 0.5, "beta": 0.5 * float(scale) ** 2},
            key=k2,
        )
        return cls(
            mu=mu,
            invSigma=invSigma,
            Sigma=invSigma,  # reference inits Sigma = invSigma (MVN_ard.py:35)
            logdetinvSigma=psd_logdet(invSigma),
            invSigmamu=invSigma @ mu,
            alpha=alpha,
            SEx=jnp.zeros_like(mu),
            SExx=jnp.zeros_like(invSigma),
            event_shape=tuple(event_shape),
            batch_shape=tuple(batch_shape),
        )

    @property
    def dim(self):
        return self.event_shape[-2]

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

    def ss_update(self, SExx, SEx, iters=2, lr=1.0, beta=None):
        """Inner ARD fixed point (reference dists/MVN_ard.py:50-73)."""
        store = (self.SExx, self.SEx)
        if beta is not None:
            store = (self.SExx * beta + SExx, self.SEx * beta + SEx)
            SExx, SEx = store
        eye = jnp.eye(self.dim)
        invSigmamu = SEx
        invSigma = SExx + self.alpha.mean() * eye + 1e-6 * eye
        Sigma = psd_inv(invSigma)
        # NOTE: reference's first fixed-point step uses the *stale*
        # self.invSigmamu (MVN_ard.py:59); reproduced for parity.
        mu = Sigma @ self.invSigmamu
        alpha = self.alpha
        for _ in range(iters):
            EXXT = jnp.diagonal(Sigma, axis1=-1, axis2=-2)[..., None] + mu**2
            half = jnp.broadcast_to(
                jnp.asarray(0.5, EXXT.dtype), alpha.batch_shape + alpha.event_shape
            )
            alpha = alpha.ss_update(half, 0.5 * EXXT, lr=lr, beta=beta)
            invSigma = SExx + alpha.mean() * eye
            Sigma = psd_inv(invSigma)
            mu = Sigma @ invSigmamu

        new_invSigma = (1 - lr) * self.invSigma + lr * invSigma
        new_invSigmamu = (1 - lr) * self.invSigmamu + lr * invSigmamu
        new_Sigma = psd_inv(new_invSigma)
        return replace(
            self,
            invSigma=new_invSigma,
            invSigmamu=new_invSigmamu,
            Sigma=new_Sigma,
            mu=new_Sigma @ new_invSigmamu,
            logdetinvSigma=psd_logdet(new_invSigma),
            alpha=alpha,
            SExx=store[0],
            SEx=store[1],
        )

    def KLqprior(self):
        from ..utils.jaxutils import tsum

        ed = tuple(range(-self.event_dim, 0))
        KL = 0.5 * (self.mu**2 * self.alpha.mean()).sum(ed)
        KL = KL - 0.5 * self.alpha.loggeomean().sum(ed) + 0.5 * tsum(
            self.ElogdetinvSigma(), range(2 - self.event_dim, 0)
        )
        KL = KL + tsum(
            jnp.diagonal(self.Sigma, axis1=-1, axis2=-2) * self.alpha.mean()[..., 0],
            range(1 - self.event_dim, 0),
        )
        KL = KL + self.alpha.KLqprior()
        return KL

    def mean(self):
        return self.mu

    def ESigma(self):
        return self.Sigma

    def EinvSigma(self):
        return self.invSigma

    def EinvSigmamu(self):
        return self.invSigmamu

    def ElogdetinvSigma(self):
        return self.logdetinvSigma

    def EX(self):
        return self.mu

    def EXXT(self):
        return self.Sigma + self.mu @ mT(self.mu)

    def EXTX(self):
        return self.Sigma.sum((-1, -2)) + (self.mu**2).sum(-2)[..., 0]

    def EXTinvUX(self):
        return (mT(self.mu) @ self.invSigma @ self.mu)[..., 0, 0]

    def Res(self):
        return (
            -0.5 * (self.mu * self.invSigmamu).sum((-1, -2))
            + 0.5 * self.logdetinvSigma
            - 0.5 * self.dim * um.LOG2PI
        )
