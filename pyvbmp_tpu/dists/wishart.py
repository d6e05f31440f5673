"""Wishart precision-matrix nodes (reference dists/Wishart.py, Wishart_eigh.py,
Wishart_UnitDet.py, Wishart_UnitTrace.py)."""
from __future__ import annotations

import jax.numpy as jnp
import jax.random as jr

from ..utils import math as um
from ..utils.jaxutils import pytree_dataclass, replace
from ..utils.linalg import psd_inv_and_logdet
from ..utils.rng import key_or_next


@pytree_dataclass(meta_fields=("event_shape", "batch_shape"))
class Wishart:
    """q(Lambda) = Wishart(nu, U) stored as (invU, nu) with cached U, logdet.

    Natural-parameter update: invU <- invU_0 + SExx ; nu <- nu_0 + N
    (reference dists/Wishart.py:43-56).
    """

    invU_0: jnp.ndarray
    nu_0: jnp.ndarray
    logdet_invU_0: jnp.ndarray
    invU: jnp.ndarray
    U: jnp.ndarray
    nu: jnp.ndarray
    logdet_invU: jnp.ndarray
    SExx: jnp.ndarray
    N: jnp.ndarray
    event_shape: tuple
    batch_shape: tuple

    @classmethod
    def create(cls, event_shape, batch_shape=(), scale=1.0, invU_0=None, nu_0=None):
        assert event_shape[-1] == event_shape[-2]
        dim = event_shape[-1]
        shape = tuple(batch_shape) + tuple(event_shape)
        if invU_0 is None:
            invU_0 = jnp.broadcast_to(
                jnp.asarray(scale, float) ** 2 * jnp.eye(dim), shape
            )
        else:
            invU_0 = jnp.broadcast_to(jnp.asarray(invU_0, dtype=float), shape)
        if nu_0 is None:
            nu_0 = jnp.broadcast_to(jnp.asarray(dim + 2.0), shape[:-2])
        else:
            nu_0 = jnp.broadcast_to(jnp.asarray(nu_0, dtype=float), shape[:-2])
        U, logdet_invU = psd_inv_and_logdet(invU_0)
        return cls(
            invU_0=invU_0,
            nu_0=nu_0,
            logdet_invU_0=logdet_invU,
            invU=invU_0,
            U=U,
            nu=nu_0,
            logdet_invU=logdet_invU,
            SExx=jnp.zeros(shape, invU_0.dtype),
            N=jnp.zeros(shape[:-2], invU_0.dtype),
            event_shape=tuple(event_shape),
            batch_shape=tuple(batch_shape),
        )

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
        )

    def log_mvgamma(self, nu):
        return um.mvgammaln(nu, self.dim) - (self.dim * (self.dim - 1) / 4.0) * jnp.log(
            jnp.pi
        )  # reference Wishart.log_mvgamma omits the pi constant (Wishart.py:37-38)

    def log_mvdigamma(self, nu):
        return um.mvdigamma(nu, self.dim)

    def ss_update(self, SExx, N, lr=1.0, beta=None):
        store_SExx, store_N = self.SExx, self.N
        if beta is not None:
            store_SExx = SExx + beta * self.SExx
            store_N = N + beta * self.N
            SExx, N = store_SExx, store_N
        invU = lr * (self.invU_0 + SExx) + (1.0 - lr) * self.invU
        nu = lr * (self.nu_0 + N) + (1.0 - lr) * self.nu
        U, logdet_invU = psd_inv_and_logdet(invU)
        return replace(
            self, invU=invU, nu=nu, U=U, logdet_invU=logdet_invU,
            SExx=store_SExx, N=store_N,
        )

    # -- expectations ---------------------------------------------------------
    def _nu(self):
        return self.nu.reshape(self.nu.shape + (1, 1))

    def mean(self):
        return self.U * self._nu()

    def meaninv(self):
        return self.invU / (self._nu() - self.dim - 1)

    def ESigma(self):
        return self.meaninv()

    def EinvSigma(self):
        return self.mean()

    def invEinvSigma(self):
        return self.invU / self._nu()

    def ElogdetinvSigma(self):
        return self.dim * um.LOG2 - self.logdet_invU + self.log_mvdigamma(self.nu / 2.0)

    def logdetEinvSigma(self):
        return -self.logdet_invU + jnp.log(self.nu)

    def KLqprior(self):
        out = (
            self.nu_0 / 2.0 * (self.logdet_invU - self.logdet_invU_0)
            + self.nu / 2.0 * (self.invU_0 * self.U).sum((-1, -2))
            - self.nu * self.dim / 2.0
        )
        out = out + (
            self.log_mvgamma(self.nu_0 / 2.0)
            - self.log_mvgamma(self.nu / 2.0)
            + (self.nu - self.nu_0) / 2.0 * self.log_mvdigamma(self.nu / 2.0)
        )
        for _ in range(self.event_dim - 2):
            out = out.sum(-1)
        return out

    def logZ(self):
        return (
            self.log_mvgamma(self.nu / 2.0)
            + 0.5 * self.nu * self.dim * um.LOG2
            - 0.5 * self.nu * self.logdet_invU
        )


@pytree_dataclass(meta_fields=("event_shape", "batch_shape"))
class WishartEigh:
    """Wishart stored via eigendecomposition invU = v diag(d) v^T
    (reference dists/Wishart_eigh.py).  Base for UnitDet/UnitTrace variants."""

    invU_0: jnp.ndarray
    nu_0: jnp.ndarray
    logdet_invU_0: jnp.ndarray
    d: jnp.ndarray
    v: jnp.ndarray
    nu: jnp.ndarray
    event_shape: tuple
    batch_shape: tuple

    @classmethod
    def create(cls, event_shape, batch_shape=(), scale=1.0, key=None):
        assert event_shape[-1] == event_shape[-2]
        dim = event_shape[-1]
        shape = tuple(batch_shape) + tuple(event_shape)
        invU_0 = jnp.broadcast_to(jnp.asarray(scale, float) ** 2 * jnp.eye(dim), shape)
        d, v = jnp.linalg.eigh(invU_0)
        nu_0 = jnp.broadcast_to(jnp.asarray(dim + 2.0), shape[:-2])
        key = key_or_next(key)
        nu = nu_0 * (1.0 + jr.uniform(key, nu_0.shape, dtype=invU_0.dtype))
        return cls(
            invU_0=invU_0,
            nu_0=nu_0,
            logdet_invU_0=jnp.log(d).sum(-1),
            d=d,
            v=v,
            nu=nu,
            event_shape=tuple(event_shape),
            batch_shape=tuple(batch_shape),
        )

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
        )

    @property
    def U(self):
        return self.v @ ((1.0 / self.d)[..., None] * jnp.swapaxes(self.v, -1, -2))

    @property
    def invU(self):
        return self.v @ (self.d[..., None] * jnp.swapaxes(self.v, -1, -2))

    @property
    def logdet_invU(self):
        return jnp.log(self.d).sum(-1)

    def log_mvgamma(self, nu):
        return um.mvgammaln(nu, self.dim) - (self.dim * (self.dim - 1) / 4.0) * jnp.log(
            jnp.pi
        )

    def log_mvdigamma(self, nu):
        return um.mvdigamma(nu, self.dim)

    def log_mvdigamma_prime(self, nu):
        return um.mvpolygamma1(nu, self.dim)

    def _base_ss_update(self, SExx, N, lr=1.0, beta=None):
        if beta is None:
            beta = 1.0 - lr
        idx = N > 1
        SExx = SExx * idx[..., None, None]
        invU = (self.invU_0 + SExx) * lr + beta * self.invU
        nu = (self.nu_0 + N) * lr + beta * self.nu
        d, v = jnp.linalg.eigh(0.5 * (invU + jnp.swapaxes(invU, -1, -2)))
        return replace(self, d=d, v=v, nu=nu)

    ss_update = _base_ss_update

    def nat_update(self, nu, invU):
        d, v = jnp.linalg.eigh(0.5 * (invU + jnp.swapaxes(invU, -1, -2)))
        return replace(self, d=d, v=v, nu=nu)

    def _nu(self):
        return self.nu[..., None, None]

    def mean(self):
        return self.U * self._nu()

    def meaninv(self):
        return self.invU / (self._nu() - self.dim - 1)

    def ESigma(self):
        return self.meaninv()

    def EinvSigma(self):
        return self.mean()

    def invEinvSigma(self):
        return self.invU / self._nu()

    def logdetEinvSigma(self):
        return -self.logdet_invU + jnp.log(self.nu)

    def ElogdetinvSigma(self):
        return self.dim * um.LOG2 - self.logdet_invU + self.log_mvdigamma(self.nu / 2.0)

    def ETraceinvSigma(self):
        return self.nu * (1.0 / self.d).sum(-1)

    def ETraceSigma(self):
        return self.d.sum(-1) / (self.nu - self.dim - 1)

    def KLqprior(self):
        out = (
            self.nu_0 / 2.0 * (self.logdet_invU - self.logdet_invU_0)
            + self.nu / 2.0 * (self.invU_0 * self.U).sum((-1, -2))
            - self.nu * self.dim / 2.0
        )
        out = out + (
            self.log_mvgamma(self.nu_0 / 2.0)
            - self.log_mvgamma(self.nu / 2.0)
            + (self.nu - self.nu_0) / 2.0 * self.log_mvdigamma(self.nu / 2.0)
        )
        for _ in range(self.event_dim - 2):
            out = out.sum(-1)
        return out

    def logZ(self):
        return (
            self.log_mvgamma(self.nu / 2.0)
            + 0.5 * self.nu * self.dim * um.LOG2
            - 0.5 * self.nu * self.logdet_invU
        )


class WishartUnitDet(WishartEigh):
    """Wishart constrained so <logdet Sigma^-1> = 0 via a Newton solve for nu
    after each natural-parameter update (reference dists/Wishart_UnitDet.py)."""

    def ss_update(self, SExx, N, lr=1.0, beta=None, iters=4):
        new = self._base_ss_update(SExx, N, lr=lr, beta=beta)
        target = -new.dim * um.LOG2 + new.logdet_invU
        lognu = target / new.dim
        for _ in range(iters):
            nu = jnp.exp(lognu)
            lognu = lognu + (target - new.log_mvdigamma(nu)) / (
                new.log_mvdigamma_prime(nu) * nu
            )
        return replace(new, nu=2.0 * jnp.exp(lognu))


class WishartUnitTrace(WishartEigh):
    """Wishart with Tr(<Sigma^-1>) = dim via Newton on a shared eigenvalue
    shift (reference dists/Wishart_UnitTrace.py)."""

    def ss_update(self, SExx, N, lr=1.0, beta=None, iters=8):
        new = self._base_ss_update(SExx, N, lr=lr, beta=beta)
        d, nu, dim = new.d, new.nu, new.dim

        def f(x):
            return nu * (1.0 / (d + x[..., None])).sum(-1)

        def fprime(x):
            return -nu * (1.0 / (d + x[..., None]) ** 2).sum(-1)

        x = d.mean(-1)
        dmin = d.min()  # reference uses the global min (Wishart_UnitTrace.py:17)
        for _ in range(iters):
            x = x + (dim - f(x)) / fprime(x)
            x = jnp.where(x < -dmin, -dmin + 1e-6, x)
        return replace(new, d=d + x[..., None])
