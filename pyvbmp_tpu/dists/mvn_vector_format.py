"""THE Gaussian message type: MVN over (dim,1) column vectors with dual
moment/natural parameterization and lazy conversion
(reference dists/MultivariateNormal_vector_format.py:1-177).

Any of (mu,Sigma) / (invSigmamu,invSigma) may be present; missing halves are
computed on first access and cached.  Caching mutates the node in place, which
is trace-local and jit-safe; the node is a pytree so messages flow through
``lax.scan`` carries and across jit boundaries.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import math as um
from ..utils.jaxutils import pytree_dataclass, replace, sum_leading
from ..utils.linalg import psd_inv, psd_logdet, psd_solve, mT


@pytree_dataclass(meta_fields=("event_dim",))
class MultivariateNormal_vector_format:
    mu: jnp.ndarray = None
    Sigma: jnp.ndarray = None
    invSigmamu: jnp.ndarray = None
    invSigma: jnp.ndarray = None
    logdetinvSigma: jnp.ndarray = None
    event_dim: int = 2

    # -- shape metadata -------------------------------------------------------
    def _ref(self):
        for x in (self.mu, self.invSigmamu, self.Sigma, self.invSigma):
            if x is not None:
                return x
        raise ValueError("MVN_vector_format: no parameters set")

    @property
    def dim(self):
        return self._ref().shape[-2]

    @property
    def shape(self):
        r = self._ref()
        if r is self.Sigma or r is self.invSigma:
            return r.shape[:-1] + (1,)
        return r.shape

    @property
    def event_shape(self):
        return self.shape[-self.event_dim:]

    @property
    def batch_shape(self):
        return self.shape[: len(self.shape) - self.event_dim]

    @property
    def batch_dim(self):
        return len(self.batch_shape)

    @property
    def ndim(self):
        return len(self.shape)

    def to_event(self, n):
        if n == 0:
            return self
        return replace(self, event_dim=self.event_dim + n)

    def unsqueeze(self, dim):
        """Insert a batch dim (reference :48-64)."""
        assert dim + self.event_dim < 0

        def uns(x):
            return None if x is None else jnp.expand_dims(x, dim)

        return MultivariateNormal_vector_format(
            mu=uns(self.mu),
            Sigma=uns(self.Sigma),
            invSigmamu=uns(self.invSigmamu),
            invSigma=uns(self.invSigma),
            event_dim=self.event_dim,
        )

    # -- lazy dual-parameter access --------------------------------------------
    def mean(self):
        if self.mu is None:
            self.mu = psd_solve(self.invSigma, self.invSigmamu)
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
            self.invSigmamu = self.EinvSigma() @ self.mean()
        return self.invSigmamu

    def ElogdetinvSigma(self):
        if self.logdetinvSigma is None:
            self.logdetinvSigma = psd_logdet(self.EinvSigma())
        return self.logdetinvSigma

    def EX(self):
        return self.mean()

    def EXXT(self):
        return self.ESigma() + self.mean() @ mT(self.mean())

    def EXTX(self):
        return self.ESigma().sum((-1, -2)) + (mT(self.mean()) @ self.mean())[..., 0, 0]

    def Res(self):
        """-0.5 mu' Lambda mu + 0.5 logdet Lambda - d/2 log 2pi (reference :118-119)."""
        return (
            -0.5 * (self.mean() * self.EinvSigmamu()).sum((-1, -2))
            + 0.5 * self.ElogdetinvSigma()
            - 0.5 * self.dim * um.LOG2PI
        )

    # -- message fusion ---------------------------------------------------------
    def combiner(self, other):
        """Precision-add fusion of two messages; returns a new node
        (reference :66-71)."""
        return MultivariateNormal_vector_format(
            invSigma=self.EinvSigma() + other.EinvSigma(),
            invSigmamu=self.EinvSigmamu() + other.EinvSigmamu(),
            event_dim=self.event_dim,
        )

    def nat_combiner(self, invSigma, invSigmamu):
        return MultivariateNormal_vector_format(
            invSigma=self.EinvSigma() + invSigma,
            invSigmamu=self.EinvSigmamu() + invSigmamu,
            event_dim=self.event_dim,
        )

    # -- updates ------------------------------------------------------------------
    def ss_update(self, SExx, SEx, n, lr=1.0):
        """Moment-matching update (the *reachable* second definition in the
        reference, :121-126; the natural-parameter overload at :41-46 is
        shadowed)."""
        n = n[..., None, None]
        mu = SEx / n
        Sigma = SExx / n - mu @ mT(mu)
        return MultivariateNormal_vector_format(mu=mu, Sigma=Sigma, event_dim=self.event_dim)

    def raw_update(self, X, p=None, lr=1.0):
        nd = self.event_dim + self.batch_dim
        if p is None:
            SEx = X
            SExx = X @ mT(X)
            sample_shape = X.shape[: X.ndim - nd]
            n = jnp.asarray(float(np.prod(sample_shape, dtype=np.float64)), X.dtype)
            n = jnp.broadcast_to(n, self.batch_shape + self.event_shape[:-2])
            SExx = sum_leading(SExx, nd)
            SEx = sum_leading(SEx, nd)
            return self.ss_update(SExx, SEx, n, lr)
        else:
            pv = p.reshape(p.shape + (1,) * self.event_dim)
            SExx = sum_leading(X @ mT(X) * pv, nd)
            SEx = sum_leading(X * pv, nd)
            n = sum_leading(pv, nd)[..., 0, 0]
            return self.ss_update(SExx, SEx, n, lr)

    def Elog_like(self, X):
        d = X - self.mean()
        out = -0.5 * (mT(d) @ self.EinvSigma() @ d)[..., 0, 0]
        out = out - 0.5 * self.dim * um.LOG2PI + 0.5 * self.ElogdetinvSigma()
        for _ in range(self.event_dim - 2):
            out = out.sum(-1)
        return out

    def KLqprior(self):
        return jnp.asarray(0.0)
