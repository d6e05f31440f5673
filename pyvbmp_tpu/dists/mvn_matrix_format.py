"""Known-covariance-form MVN over (dim,) events — "matrix layout"
(reference dists/MultivariateNormal.py)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import math as um
from ..utils.jaxutils import pytree_dataclass, replace, sum_leading
from ..utils.linalg import psd_inv, psd_logdet


@pytree_dataclass(meta_fields=("event_dim",))
class MultivariateNormal:
    mu: jnp.ndarray = None
    Sigma: jnp.ndarray = None
    invSigmamu: jnp.ndarray = None
    invSigma: jnp.ndarray = None
    event_dim: int = 1

    def _ref(self):
        for x in (self.mu, self.invSigmamu):
            if x is not None:
                return x
        raise ValueError("MultivariateNormal: mu and invSigmamu are both None")

    @property
    def dim(self):
        return self._ref().shape[-1]

    @property
    def shape(self):
        return self._ref().shape

    @property
    def event_shape(self):
        return self.shape[-self.event_dim:]

    @property
    def batch_shape(self):
        return self.shape[: len(self.shape) - self.event_dim]

    @property
    def batch_dim(self):
        return len(self.batch_shape)

    def to_event(self, n):
        if n == 0:
            return self
        return replace(self, event_dim=self.event_dim + n)

    def mean(self):
        if self.mu is None:
            self.mu = (psd_inv(self.invSigma) * self.invSigmamu[..., None, :]).sum(-1)
        return self.mu

    def ESigma(self):
        if self.Sigma is None:
            self.Sigma = psd_inv(self.invSigma)
        return self.Sigma

    def EinvSigma(self):
        if self.invSigma is None:
            self.invSigma = psd_inv(self.Sigma)
        return self.invSigma

    def EinvSigmamu(self):
        if self.invSigmamu is None:
            self.invSigmamu = (self.EinvSigma() * self.mean()[..., None, :]).sum(-1)
        return self.invSigmamu

    def ElogdetinvSigma(self):
        if self.Sigma is None:
            return psd_logdet(self.invSigma)
        return -psd_logdet(self.Sigma)

    def EX(self):
        return self.mean()

    def EXXT(self):
        return self.ESigma() + self.mean()[..., :, None] * self.mean()[..., None, :]

    def EXTX(self):
        return self.EXXT().sum((-1, -2))

    def ss_update(self, SExx, SEx, n, lr=1.0):
        mu = SEx / n[..., None]
        Sigma = SExx / n[..., None, None] - mu[..., :, None] * mu[..., None, :]
        return MultivariateNormal(mu=mu, Sigma=Sigma, event_dim=self.event_dim)

    def raw_update(self, X, p=None, lr=1.0):
        nd = self.event_dim + self.batch_dim
        if p is None:
            SEx = X
            SExx = X[..., :, None] * X[..., None, :]
            sample_shape = X.shape[: X.ndim - nd]
            n = jnp.asarray(float(np.prod(sample_shape, dtype=np.float64)), X.dtype)
            n = jnp.broadcast_to(n, self.batch_shape + self.event_shape[:-1])
            return self.ss_update(sum_leading(SExx, nd + 1), sum_leading(SEx, nd), n, lr)
        pv = p.reshape(p.shape + (1,) * self.event_dim)
        SEx = X * pv
        SExx = X[..., :, None] * X[..., None, :] * pv[..., None]
        n = sum_leading(pv, nd)[..., 0]
        return self.ss_update(sum_leading(SExx, nd + 1), sum_leading(SEx, nd), n, lr)

    def Elog_like(self, X):
        d = X - self.mean()
        out = -0.5 * (d[..., :, None] * d[..., None, :] * self.EinvSigma()).sum((-1, -2))
        out = out - 0.5 * self.dim * um.LOG2PI + 0.5 * self.ElogdetinvSigma()
        for _ in range(self.event_dim - 2):
            out = out.sum(-1)
        return out

    def KLqprior(self):
        return jnp.asarray(0.0)
