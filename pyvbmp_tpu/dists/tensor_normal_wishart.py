"""Kronecker-factored tensor normal with per-mode unit-det Wisharts and a
global Gamma scale (reference dists/TensorNormalWishart.py)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.random as jr

from .gamma import Gamma
from .wishart import WishartUnitDet
from ..utils import math as um
from ..utils.jaxutils import pytree_dataclass, replace
from ..utils.rng import key_or_next


@pytree_dataclass(meta_fields=("event_shape", "batch_shape"))
class TensorNormalWishart:
    mu_0: jnp.ndarray
    mu: jnp.ndarray
    lambda_mu_0: jnp.ndarray
    lambda_mu: jnp.ndarray
    invU: list
    alpha: Gamma
    event_shape: tuple
    batch_shape: tuple

    @classmethod
    def create(cls, event_shape, batch_shape=(), key=None):
        key = key_or_next(key)
        k1, k2 = jr.split(key)
        dims = tuple(event_shape)
        mu_0 = jnp.zeros(tuple(batch_shape) + dims)
        mu = jr.normal(k1, mu_0.shape) / jnp.sqrt(float(np.prod(dims)))
        invU = [
            WishartUnitDet.create((d, d), batch_shape, key=jr.fold_in(k2, i))
            for i, d in enumerate(dims)
        ]
        alpha = Gamma.create((), batch_shape, key=jr.fold_in(k2, len(dims)))
        ones = jnp.ones(tuple(batch_shape))
        return cls(
            mu_0=mu_0,
            mu=mu,
            lambda_mu_0=ones,
            lambda_mu=ones,
            invU=invU,
            alpha=alpha,
            event_shape=dims,
            batch_shape=tuple(batch_shape),
        )

    @property
    def dims(self):
        return self.event_shape

    @property
    def event_dim(self):
        return len(self.event_shape)

    @property
    def batch_dim(self):
        return len(self.batch_shape)

    def _K(self):
        return len(self.event_shape)

    def EinvSigma(self, dims=None):
        """Kronecker-structured precision as a broadcastable batch+event+event
        tensor restricted to the given modes (reference :120-126)."""
        K = self._K()
        if dims is None:
            dims = list(range(K))

        def view(i, M):
            shape = self.batch_shape + 2 * (
                i * (1,) + (self.event_shape[i],) + (K - i - 1) * (1,)
            )
            return M.reshape(shape)

        out = view(dims[0], self.invU[dims[0]].EinvSigma()) * self.alpha.mean().reshape(
            self.batch_shape + 2 * K * (1,)
        )
        for i in dims[1:]:
            out = out * view(i, self.invU[i].EinvSigma())
        return out

    def ESigma(self, dims=None):
        K = self._K()
        if dims is None:
            dims = list(range(K))

        def view(i, M):
            shape = self.batch_shape + 2 * (
                i * (1,) + (self.event_shape[i],) + (K - i - 1) * (1,)
            )
            return M.reshape(shape)

        out = view(dims[0], self.invU[dims[0]].ESigma()) * self.alpha.meaninv().reshape(
            self.batch_shape + 2 * K * (1,)
        )
        for i in dims[1:]:
            out = out * view(i, self.invU[i].ESigma())
        return out

    def raw_update(self, X, iters=1, lr=1.0, beta=None):
        new = self
        for _ in range(iters):
            new = new._raw_update(X, lr=lr, beta=beta)
        return new

    def _raw_update(self, X, lr=1.0, beta=None):
        if beta is None:
            beta = 1.0 - lr
        K = self._K()
        nd = self.event_dim + self.batch_dim
        sample_shape = X.shape[: X.ndim - nd]
        sdims = tuple(range(len(sample_shape)))
        N = float(np.prod(sample_shape, dtype=np.float64)) * jnp.ones(self.batch_shape)
        lambda_mu = self.lambda_mu_0 + N
        lam_view = self.lambda_mu_0.reshape(self.batch_shape + K * (1,))
        mu = (X.sum(sdims) + self.mu_0 * lam_view) / lambda_mu.reshape(
            self.batch_shape + K * (1,)
        )
        Xc = X - mu

        # Gauss-Seidel, matching the reference's in-place mutation
        # (TensorNormalWishart.py:75-89): mode i's scatter uses the
        # ALREADY-UPDATED invU[j<i] (and the final alpha quad sees all
        # updated modes) — a Jacobi sweep from the old state converges to
        # the same fixed point but breaks trajectory parity.
        cur = self
        for i in range(K):
            idx = [j for j in range(K) if j != i]
            sidx1 = [x for x in range(-2 * K, -K) if x != -2 * K + i]
            sidx2 = [x for x in range(-K, 0) if x != -K + i]
            temp = cur.EinvSigma(idx) * Xc.reshape(Xc.shape + K * (1,))
            temp = (temp.sum(tuple(sidx1)) * jnp.expand_dims(Xc, -K - 1)).sum(
                tuple(sidx2)
            )
            temp = temp.sum(sdims)
            invU = list(cur.invU)
            invU[i] = invU[i].ss_update(temp, N, lr=lr, beta=beta)
            cur = replace(cur, invU=invU)
        invU = list(cur.invU)

        new_lambda_mu = lr * lambda_mu + beta * self.lambda_mu
        new_mu = lr * mu + beta * self.mu

        quad = (
            cur.EinvSigma()
            * Xc.reshape(sample_shape + self.batch_shape + self.event_shape + K * (1,))
            * Xc.reshape(sample_shape + self.batch_shape + K * (1,) + self.event_shape)
        ).sum(sdims)
        quad = quad.sum(
            tuple(range(self.batch_dim, self.batch_dim + 2 * self.event_dim))
        ) / self.alpha.mean()
        n_half = (
            float(np.prod(self.event_shape))
            * float(np.prod(sample_shape, dtype=np.float64))
            / 2.0
        ) * jnp.ones(self.batch_shape)
        alpha = self.alpha.ss_update(n_half, quad / 2.0, lr=lr, beta=beta)
        return replace(
            self, mu=new_mu, lambda_mu=new_lambda_mu, invU=invU, alpha=alpha
        )

    def KLqprior(self):
        K = self._K()
        d = self.mu - self.mu_0
        KL = (
            d.reshape(self.batch_shape + self.event_shape + K * (1,))
            * self.EinvSigma()
            * d.reshape(self.batch_shape + K * (1,) + self.event_shape)
        ).sum(tuple(range(-2 * K, 0)))
        KL = 0.5 * self.lambda_mu_0 * KL + 0.5 * (
            self.lambda_mu_0 / self.lambda_mu
            - 1
            + jnp.log(self.lambda_mu / self.lambda_mu_0)
        ) * float(np.prod(self.event_shape))
        for w in self.invU:
            KL = KL + w.KLqprior()
        return KL + self.alpha.KLqprior()

    def Elog_like(self, X):
        K = self._K()
        Xc = X - self.mu
        ELL = -0.5 * (
            self.EinvSigma()
            * Xc.reshape(Xc.shape + K * (1,))
            * Xc.reshape(Xc.shape[:-K] + K * (1,) + Xc.shape[-K:])
        ).sum(tuple(range(-2 * K, 0)))
        ELL = (
            ELL
            - 0.5 * float(np.prod(self.event_shape)) * um.LOG2PI
            + 0.5 * self.ElogdetinvSigma()
        )
        return ELL

    def mean(self):
        return self.mu

    def ElogdetinvSigmas(self):
        return jnp.stack([w.ElogdetinvSigma() for w in self.invU], -1)

    def ElogdetinvSigma(self):
        res = float(np.prod(self.event_shape)) * self.alpha.loggeomean()
        for w in self.invU:
            res = res + w.ElogdetinvSigma()
        return res
