"""NIW in natural parameters over (dim,1) column vectors
(reference dists/NormalInverseWishart_vector_format.py and the
``_invSigma`` variant that owns a full Wishart node).

Natural parameters (see the reference's docstring table, :47-59):
  lmbda, lmbda_mu, nu_star = nu - dim, xi = invU + lmbda mu mu^T
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .mixture import Mixture
from .wishart import Wishart
from ..utils import math as um
from ..utils.jaxutils import pytree_dataclass, replace
from ..utils.linalg import mT, psd_inv_and_logdet


@pytree_dataclass(meta_fields=("event_shape", "batch_shape", "fixed_precision"))
class NormalInverseWishart_vector_format:
    lmbda_0: jnp.ndarray
    lmbda_mu_0: jnp.ndarray
    nu_star_0: jnp.ndarray
    xi_0: jnp.ndarray
    lmbda: jnp.ndarray
    lmbda_mu: jnp.ndarray
    nu_star: jnp.ndarray
    xi: jnp.ndarray
    U: jnp.ndarray
    logdet_invU: jnp.ndarray
    event_shape: tuple
    batch_shape: tuple
    fixed_precision: bool

    @classmethod
    def create(cls, event_shape, batch_shape=(), scale=1.0, fixed_precision=False,
               prior_parms=None, parms=None, key=None):
        dim = event_shape[-2]
        bshape = tuple(batch_shape) + tuple(event_shape[:-2])

        def build(pp):
            pp = pp or {}
            lmbda = jnp.broadcast_to(jnp.asarray(pp.get("lambda", 1.0), float), bshape + (1, 1))
            lmbda_mu = jnp.broadcast_to(
                jnp.asarray(pp.get("lambda_mu", 0.0), float),
                tuple(batch_shape) + tuple(event_shape),
            )
            if pp.get("nu") is None:
                nu_star = jnp.broadcast_to(jnp.asarray(1.0), bshape + (1, 1))
                xi = jnp.broadcast_to(
                    jnp.asarray(scale, float) ** 2 * jnp.eye(dim), bshape + (dim, dim)
                )
            else:
                nu_star = jnp.broadcast_to(jnp.asarray(pp["nu"], float), bshape + (1, 1)) - dim
                xi = jnp.broadcast_to(jnp.asarray(pp["invU"], float), bshape + (dim, dim))
            xi = lmbda_mu @ mT(lmbda_mu) / lmbda + xi
            return lmbda, lmbda_mu, nu_star, xi

        lmbda_0, lmbda_mu_0, nu_star_0, xi_0 = build(prior_parms)
        lmbda, lmbda_mu, nu_star, xi = build(parms if parms is not None else prior_parms)
        new = cls(
            lmbda_0=lmbda_0, lmbda_mu_0=lmbda_mu_0, nu_star_0=nu_star_0, xi_0=xi_0,
            lmbda=lmbda, lmbda_mu=lmbda_mu, nu_star=nu_star, xi=xi,
            U=None, logdet_invU=None,
            event_shape=tuple(event_shape), batch_shape=tuple(batch_shape),
            fixed_precision=fixed_precision,
        )
        return new._with_expectations()

    @property
    def dim(self):
        return self.event_shape[-2]

    @property
    def event_dim(self):
        return len(self.event_shape)

    @property
    def batch_dim(self):
        return len(self.batch_shape)

    @property
    def mu(self):
        return self.lmbda_mu / self.lmbda

    @property
    def mu_0(self):
        return self.lmbda_mu_0 / self.lmbda_0

    @property
    def invU(self):
        return (
            self.xi
            - self.lmbda_mu @ mT(self.lmbda_mu) / self.lmbda
            + self.lmbda_mu_0 @ mT(self.lmbda_mu_0) / self.lmbda_0
        )

    @property
    def invU_0(self):
        return self.xi_0 - self.lmbda_mu_0 @ mT(self.lmbda_mu_0) / self.lmbda_0

    @property
    def nu(self):
        return self.nu_star + self.dim

    @property
    def nu_0(self):
        return self.nu_star_0 + self.dim

    def to_event(self, n):
        if n == 0:
            return self
        return replace(
            self,
            event_shape=self.batch_shape[-n:] + self.event_shape,
            batch_shape=self.batch_shape[:-n],
        )

    def _with_expectations(self):
        U, logdet = psd_inv_and_logdet(self.invU)
        return replace(self, U=U, logdet_invU=logdet[..., None, None])

    def ss_update(self, SExx, SEx, N, lr=1.0, beta=0.0):
        """True natural-parameter blend (reference NIW_vf.ss_update:102-117)."""
        new = self
        xi, nu_star = self.xi, self.nu_star
        if not self.fixed_precision:
            xi = (1 - lr * (1 - beta)) * self.xi + lr * (1 - beta) * self.xi_0 + lr * SExx
            nu_star = (
                (1 - lr * (1 - beta)) * self.nu_star
                + lr * (1 - beta) * self.nu_star_0
                + lr * N
            )
        lmbda = (1 - lr * (1 - beta)) * self.lmbda + lr * (1 - beta) * self.lmbda_0 + lr * N
        lmbda_mu = (
            (1 - lr * (1 - beta)) * self.lmbda_mu
            + lr * (1 - beta) * self.lmbda_mu_0
            + lr * SEx
        )
        new = replace(self, xi=xi, nu_star=nu_star, lmbda=lmbda, lmbda_mu=lmbda_mu)
        return new._with_expectations()

    def raw_update(self, X, p=None, lr=1.0, beta=0.0):
        nd = self.event_dim + self.batch_dim
        sample_shape = X.shape[: X.ndim - nd]
        sdims = tuple(range(len(sample_shape)))
        if p is None:
            SEx = X.sum(sdims)
            SExx = (X @ mT(X)).sum(sdims)
            N = jnp.broadcast_to(
                jnp.asarray(float(np.prod(sample_shape, dtype=np.float64))),
                self.batch_shape + self.event_shape[:-2] + (1, 1),
            )
        else:
            pv = p.reshape(p.shape + (1,) * self.event_dim)
            N = pv.sum(sdims)
            SExx = (X @ mT(X) * pv).sum(sdims)
            SEx = (X * pv).sum(sdims)
        return self.ss_update(SExx, SEx, N, lr, beta)

    def update(self, pX, p=None, lr=1.0, beta=0.0):
        nd = self.event_dim + self.batch_dim
        m = pX.mean()
        sample_shape = m.shape[: m.ndim - nd]
        sdims = tuple(range(len(sample_shape)))
        if p is None:
            SEx = m.sum(sdims)
            SExx = pX.EXXT().sum(sdims)
            N = jnp.broadcast_to(
                jnp.asarray(float(np.prod(sample_shape, dtype=np.float64))),
                self.batch_shape + self.event_shape[:-2] + (1, 1),
            )
        else:
            pv = p.reshape(p.shape + (1,) * self.event_dim)
            N = pv.sum(sdims)
            SExx = (pX.EXXT() * pv).sum(sdims)
            SEx = (m * pv).sum(sdims)
        return self.ss_update(SExx, SEx, N, lr, beta)

    def Elog_like(self, X):
        out = (
            -0.5 * (mT(X) @ self.EinvSigma() @ X)
            + (X * self.EinvSigmamu()).sum(-2, keepdims=True)
            - 0.5 * self.EXTinvUX()
        )
        out = out + 0.5 * self.ElogdetinvSigma() - 0.5 * self.dim * um.LOG2PI
        return out.sum(tuple(range(-self.event_dim, 0)))

    def KLqprior_Wishart(self):
        nu = self.nu[..., 0, 0]
        nu_0 = self.nu_0[..., 0, 0]
        logdet = self.logdet_invU[..., 0, 0]
        _, logdet_0 = psd_inv_and_logdet(self.invU_0)
        KL = nu_0 / 2.0 * (logdet - logdet_0)
        KL = KL + nu / 2.0 * (self.invU_0 * self.U).sum((-2, -1))
        KL = KL - nu * self.dim / 2.0
        KL = (
            KL
            + um.mvgammaln(nu_0 / 2.0, self.dim)
            - um.mvgammaln(nu / 2.0, self.dim)
            + (nu - nu_0) / 2.0 * um.mvdigamma(nu / 2.0, self.dim)
        )
        return KL[..., None, None]

    def KLqprior(self):
        KL = 0.5 * (
            self.lmbda_0 / self.lmbda - 1 + jnp.log(self.lmbda / self.lmbda_0)
        ) * self.dim
        d = self.mu - self.mu_0
        KL = KL + 0.5 * self.lmbda_0 * (mT(d) @ self.EinvSigma() @ d)
        KL = KL + self.KLqprior_Wishart()
        return KL.sum(tuple(range(-self.event_dim, 0)))

    # -- expectations -----------------------------------------------------------
    def mean(self):
        return self.mu

    def EX(self):
        return self.mu

    def EXXT(self):
        return self.mu @ mT(self.mu) + self.ESigma() / self.lmbda

    def EinvSigma(self):
        return self.U * self.nu

    def ESigma(self):
        return self.invU / (self.nu - self.dim - 1)

    def ElogdetinvSigma(self):
        return (
            self.dim * um.LOG2
            - self.logdet_invU
            + um.mvdigamma(self.nu[..., 0, 0] / 2.0, self.dim)[..., None, None]
        )

    def logdetEinvSigma(self):
        return -self.logdet_invU + jnp.log(self.nu)

    def EinvSigmamu(self):
        return self.EinvSigma() @ self.mu

    def EinvUX(self):
        return self.EinvSigma() @ self.mu

    def EXTinvUX(self):
        return mT(self.mu) @ self.EinvSigma() @ self.mu + self.dim / self.lmbda

    def EXmMUTinvUXmMU(self):
        return self.dim / self.lmbda

    def logZ(self):
        out = -0.5 * self.dim * jnp.log(self.lmbda) + 0.5 * self.dim * um.LOG2PI
        out = out + 0.5 * self.nu * self.dim * um.LOG2 - 0.5 * self.nu * self.logdet_invU
        out = out + um.mvgammaln(self.nu[..., 0, 0] / 2.0, self.dim)[..., None, None]
        return out.sum(tuple(range(-self.event_dim, 0)))


@pytree_dataclass(meta_fields=("event_shape", "batch_shape", "fixed_precision"))
class NormalInverseWishart_vector_format_invSigma:
    """Variant owning a full Wishart node for Sigma^-1 instead of carrying xi
    (reference dists/NormalInverseWishart_vector_format_invSigma.py)."""

    lmbda_0: jnp.ndarray
    lmbda_mu_0: jnp.ndarray
    lmbda: jnp.ndarray
    lmbda_mu: jnp.ndarray
    invSigma: Wishart
    event_shape: tuple
    batch_shape: tuple
    fixed_precision: bool

    @classmethod
    def create(cls, event_shape, batch_shape=(), scale=1.0, fixed_precision=False,
               prior_parms=None, key=None):
        pp = prior_parms or {}
        dim = event_shape[-2]
        bshape = tuple(batch_shape) + tuple(event_shape[:-2])
        lmbda_0 = jnp.broadcast_to(jnp.asarray(pp.get("lambda", 1.0), float), bshape + (1, 1))
        lmbda_mu_0 = jnp.broadcast_to(
            jnp.asarray(pp.get("lambda_mu", 0.0), float),
            tuple(batch_shape) + tuple(event_shape),
        )
        invSigma = Wishart.create(tuple(event_shape[:-1]) + (dim,), batch_shape, scale=scale)
        return cls(
            lmbda_0=lmbda_0, lmbda_mu_0=lmbda_mu_0,
            lmbda=lmbda_0, lmbda_mu=lmbda_mu_0,
            invSigma=invSigma,
            event_shape=tuple(event_shape), batch_shape=tuple(batch_shape),
            fixed_precision=fixed_precision,
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

    @property
    def mu(self):
        return self.lmbda_mu / self.lmbda

    @property
    def mu_0(self):
        return self.lmbda_mu_0 / self.lmbda_0

    def to_event(self, n):
        if n == 0:
            return self
        return replace(
            self,
            event_shape=self.batch_shape[-n:] + self.event_shape,
            batch_shape=self.batch_shape[:-n],
        )

    def ss_update(self, SExx, SEx, N, lr=1.0, beta=0.0):
        if beta > 0.0:
            SEx = SEx + beta * (self.lmbda_mu - self.lmbda_mu_0)
            N = N + beta * (self.lmbda - self.lmbda_0)
            if not self.fixed_precision:
                SExx = SExx + beta * (
                    self.invSigma.invU
                    - self.invSigma.invU_0
                    + self.lmbda_mu @ mT(self.mu)
                    - self.lmbda_mu_0 @ mT(self.mu_0)
                )
        lmbda = (1 - lr) * self.lmbda + lr * (self.lmbda_0 + N)
        lmbda_mu = (1 - lr) * self.lmbda_mu + lr * (self.lmbda_mu_0 + SEx)
        new = replace(self, lmbda=lmbda, lmbda_mu=lmbda_mu)
        if not self.fixed_precision:
            SExx = SExx - lmbda_mu @ mT(new.mu) + self.lmbda_mu_0 @ mT(self.mu_0)
            new = replace(
                new, invSigma=self.invSigma.ss_update(SExx, N[..., 0, 0], lr=lr)
            )
        return new

    def raw_update(self, X, p=None, lr=1.0, beta=0.0):
        nd = self.event_dim + self.batch_dim
        sample_shape = X.shape[: X.ndim - nd]
        sdims = tuple(range(len(sample_shape)))
        if p is None:
            SEx = X.sum(sdims)
            SExx = (X @ mT(X)).sum(sdims)
            N = jnp.broadcast_to(
                jnp.asarray(float(np.prod(sample_shape, dtype=np.float64))),
                self.batch_shape + self.event_shape[:-2] + (1, 1),
            )
        else:
            pv = p.reshape(p.shape + (1,) * self.event_dim)
            N = pv.sum(sdims)
            SExx = (X @ mT(X) * pv).sum(sdims)
            SEx = (X * pv).sum(sdims)
        return self.ss_update(SExx, SEx, N, lr, beta)

    def update(self, pX, p=None, lr=1.0, beta=0.0):
        nd = self.event_dim + self.batch_dim
        m = pX.mean()
        sample_shape = m.shape[: m.ndim - nd]
        sdims = tuple(range(len(sample_shape)))
        if p is None:
            SEx = m.sum(sdims)
            SExx = pX.EXXT().sum(sdims)
            N = jnp.broadcast_to(
                jnp.asarray(float(np.prod(sample_shape, dtype=np.float64))),
                self.batch_shape + self.event_shape[:-2] + (1, 1),
            )
        else:
            pv = p.reshape(p.shape + (1,) * self.event_dim)
            N = pv.sum(sdims)
            SExx = (pX.EXXT() * pv).sum(sdims)
            SEx = (m * pv).sum(sdims)
        return self.ss_update(SExx, SEx, N, lr, beta)

    def Elog_like(self, X):
        out = (
            -0.5 * (mT(X) @ self.EinvSigma() @ X)
            + (X * self.EinvSigmamu()).sum(-2, keepdims=True)
            - 0.5 * self.EXTinvUX()
        )
        out = out + 0.5 * self.ElogdetinvSigma() - 0.5 * self.dim * um.LOG2PI
        return out.sum(tuple(range(-self.event_dim, 0)))

    def KLqprior(self):
        KL = 0.5 * (
            self.lmbda_0 / self.lmbda - 1 + jnp.log(self.lmbda / self.lmbda_0)
        ) * self.dim
        d = self.mu - self.mu_0
        KL = KL + 0.5 * self.lmbda_0 * (mT(d) @ self.EinvSigma() @ d)
        KL = KL.sum(tuple(range(-self.event_dim, 0)))
        return KL + self.invSigma.KLqprior()

    def mean(self):
        return self.mu

    def EX(self):
        return self.mu

    def EXXT(self):
        return self.mu @ mT(self.mu) + self.ESigma() / self.lmbda

    def EinvSigma(self):
        return self.invSigma.EinvSigma()

    def ESigma(self):
        return self.invSigma.ESigma()

    def ElogdetinvSigma(self):
        return self.invSigma.ElogdetinvSigma()[..., None, None]

    def EinvSigmamu(self):
        return self.EinvSigma() @ self.mu

    def EinvUX(self):
        return self.EinvSigma() @ self.mu

    def EXTinvUX(self):
        return mT(self.mu) @ self.EinvSigma() @ self.mu + self.dim / self.lmbda

    def EXmMUTinvUXmMU(self):
        return self.dim / self.lmbda


class GMM_vector(Mixture):
    """GMM over vector-format NIW components (reference
    dists/NormalInverseWishart_vector_format.py:224-236; the reference's
    version is unconstructible — it passes a parms dict where the ctor
    expects event_shape — so this is the working counterpart)."""

    def __init__(self, nc, dim, key=None):
        import jax.random as jr
        from ..utils.rng import key_or_next

        key = key_or_next(key)
        dist = NormalInverseWishart_vector_format.create(
            (dim, 1),
            batch_shape=(nc,),
            prior_parms={"lambda": 1.0, "lambda_mu": 0.0, "nu": 2.0 + dim,
                         "invU": jnp.eye(dim)},
            key=key,
        )
        super().__init__(dist, (nc,), key=jr.fold_in(key, 1))

    def initialize(self, data, key=None):
        """Seed component means at random data points (reference :232-235)."""
        import jax.random as jr
        from ..utils.jaxutils import replace
        from ..utils.rng import key_or_next

        key = key_or_next(key)
        idx = jr.randint(key, self.dist.batch_shape, 0, data.shape[0])
        lmbda_mu = data[idx] * self.dist.lmbda
        # keep invU = xi - lmbda_mu lmbda_mu^T/lmbda (+prior coupling)
        # unchanged when moving the mean (the reference's initialize skips
        # this, leaving xi inconsistent -> NaN logdets)
        xi = (
            self.dist.xi
            - self.dist.lmbda_mu @ mT(self.dist.lmbda_mu) / self.dist.lmbda
            + lmbda_mu @ mT(lmbda_mu) / self.dist.lmbda
        )
        self.dist = replace(self.dist, lmbda_mu=lmbda_mu, xi=xi)._with_expectations()
