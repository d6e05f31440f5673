"""Multinomial logistic regression with the Bouchard bound: a global
per-sample alpha plus lambda(xi) quadratic weights
(reference transforms/MultiNomialLogisticRegression_Bouchard.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .mnlr import highest_precision

from ..dists.mvn_ard import MVN_ard
from ..utils.jaxutils import replace
from ..utils.linalg import mT
from ..utils.rng import key_or_next


def lmbda(xi):
    return 0.25 / xi * jnp.tanh(0.5 * xi)


def log_sigmoid(xi):
    return -jnp.log1p(jnp.exp(-xi))


class MultiNomialLogisticRegression_Bouchard:
    def __init__(self, n, p, batch_shape=(), pad_X=True, key=None):
        import jax.random as jr

        if pad_X:
            p = p + 1
        self.n = n
        self.p = p
        key = key_or_next(key)
        self.beta = MVN_ard.create(
            event_shape=(n, p, 1), batch_shape=tuple(batch_shape), key=key
        )
        self.beta = replace(
            self.beta,
            mu=jr.normal(jr.fold_in(key, 1), self.beta.mu.shape)
            / jnp.sqrt(float(self.p)),
        )
        self.pad_X = pad_X
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.event_shape = (n, p)
        self.event_dim = 2
        self.ELBO_last = -jnp.inf

    def _padded(self, X):
        if self.pad_X:
            return jnp.concatenate([X, jnp.ones(X.shape[:-1] + (1,), X.dtype)], -1)
        return X

    def raw_update(self, X, Y, iters=4, p=None, lr=1.0, beta=None, verbose=False):
        """Jitted via a per-instance memo: the body is one big traced
        region (alpha/xi fixed point over a (S, n, p, p) tensor) that was
        paying eager per-op dispatch on every call."""
        cache = self.__dict__.setdefault("_jit_cache", {})
        key = ("raw", int(iters), p is None, beta is None)
        if key not in cache:
            it = int(iters)

            def core(beta_node, X, Y, p, lr, beta_decay):
                return self.raw_update_beta(
                    beta_node, X, Y, iters=it, p=p, lr=lr, beta=beta_decay
                )

            cache[key] = jax.jit(core)
        self.beta = cache[key](self.beta, X, Y, p, lr, beta)

    @highest_precision
    def raw_update_beta(self, beta_node, X, Y, iters=4, p=None, lr=1.0,
                        beta=None):
        sdims = tuple(range(X.ndim - 1 - self.batch_dim))
        EX = self._padded(X)
        EX = EX[..., None, :, None]
        EXXT = EX * mT(EX)
        N = Y.sum(-1, keepdims=True)[..., None, None]
        Yv = Y[..., None, None]

        if p is None:
            SEyx = ((Yv - 0.5 * N) * EX).sum(sdims)
        else:
            SEyx = ((Yv - 0.5 * N) * EX * p[..., None, None, None]).sum(sdims)

        alpha = jnp.full((1, 1, 1), (self.n - 2) / 4.0)
        xi = (
            (beta_node.EXXT() * EXXT).sum((-2, -1), keepdims=True)
            - 2.0 * alpha * (beta_node.EX() * EX).sum((-2, -1), keepdims=True)
            + alpha**2
        )
        xi = jnp.sqrt(xi)
        new_beta = beta_node
        for _ in range(iters):
            alpha = (
                (self.n - 2) / 4.0
                + (lmbda(xi) * (new_beta.EX() * EX).sum((-2, -1), keepdims=True)).sum(
                    -3, keepdims=True
                )
            ) / lmbda(xi).sum(-3, keepdims=True)
            xi = (
                (new_beta.EXXT() * EXXT).sum((-2, -1), keepdims=True)
                - 2.0 * alpha * (new_beta.EX() * EX).sum((-2, -1), keepdims=True)
                + alpha**2
            )
            xi = jnp.sqrt(xi)
            if p is None:
                SExx = 2 * (N * lmbda(xi) * EXXT).sum(sdims)
                SEyx_star = 2 * (alpha * N * lmbda(xi) * EX).sum(sdims)
            else:
                SExx = 2 * (lmbda(xi) * EXXT * p[..., None, None, None]).sum(sdims)
                SEyx_star = 2 * (
                    alpha * N * lmbda(xi) * EX * p[..., None, None, None]
                ).sum(sdims)
            new_beta = new_beta.ss_update(SExx, SEyx + SEyx_star, lr=lr, beta=beta)
        return new_beta

    @highest_precision
    def update(self, pX, Y, iters=1, p=None, lr=1.0, beta=None, verbose=False):
        """Message-valued X (reference Bouchard.update:100-140)."""
        sdims = tuple(range(len(pX.shape) - 2 - self.batch_dim))
        EXXT = pX.EXXT()[..., None, :, :]
        EX = pX.mean()[..., None, :, :]
        N = Y.sum(-1, keepdims=True)[..., None, None]
        Yv = Y[..., None, None]
        if self.pad_X:
            EXXT = jnp.concatenate([EXXT, EX], -1)
            EX = jnp.concatenate([EX, jnp.ones(EX.shape[:-2] + (1, 1), EX.dtype)], -2)
            EXXT = jnp.concatenate([EXXT, mT(EX)], -2)
        if p is None:
            SEyx = ((Yv - 0.5 * N) * EX).sum(sdims)
        else:
            SEyx = ((Yv - 0.5 * N) * EX * p[..., None, None, None]).sum(sdims)

        alpha = jnp.full((1, 1, 1), (self.n - 2) / 4.0)
        xi = (
            (self.beta.EXXT() * EXXT).sum((-2, -1), keepdims=True)
            - 2.0 * alpha * (self.beta.EX() * EX).sum((-2, -1), keepdims=True)
            + alpha**2
        )
        xi = jnp.sqrt(xi)
        new_beta = self.beta
        for _ in range(iters):
            alpha = (
                (self.n - 2) / 4.0
                + (lmbda(xi) * (new_beta.EX() * EX).sum((-2, -1), keepdims=True)).sum(
                    -3, keepdims=True
                )
            ) / lmbda(xi).sum(-3, keepdims=True)
            xi = (
                (new_beta.EXXT() * EXXT).sum((-2, -1), keepdims=True)
                - 2.0 * alpha * (new_beta.EX() * EX).sum((-2, -1), keepdims=True)
                + alpha**2
            )
            xi = jnp.sqrt(xi)
            if p is None:
                SExx = 2 * (N * lmbda(xi) * EXXT).sum(sdims)
                SEyx_star = 2 * (alpha * N * lmbda(xi) * EX).sum(sdims)
            else:
                SExx = 2 * (lmbda(xi) * EXXT * p[..., None, None, None]).sum(sdims)
                SEyx_star = 2 * (
                    alpha * N * lmbda(xi) * EX * p[..., None, None, None]
                ).sum(sdims)
            # reference passes beta=0 on this path (Bouchard.py:140)
            new_beta = new_beta.ss_update(SExx, SEyx + SEyx_star, lr=lr, beta=0.0)
        self.beta = new_beta

    @highest_precision
    def Elog_like_given_pX_pY(self, pX, Y, iters=2):
        """Bouchard ELL bound (reference Bouchard.py:178-218)."""
        if not self.pad_X:
            Ephiphi = (self.beta.EXXT() * pX.EXXT()[..., None, :, :]).sum((-2, -1))
            Ephi = (self.beta.EX() * pX.mean()[..., None, :, :]).sum((-2, -1))
        else:
            Ephiphi = (
                self.beta.EXXT()[..., :-1, :-1] * pX.EXXT()[..., None, :, :]
            ).sum((-2, -1))
            Ephiphi = Ephiphi + 2 * (
                self.beta.EX()[..., :-1, :] * pX.mean()[..., None, :, :]
            ).sum((-2, -1))
            Ephiphi = Ephiphi + self.beta.EX()[..., -1, -1]
            Ephi = (self.beta.EX()[..., :-1, :] * pX.mean()[..., None, :, :]).sum(
                (-2, -1)
            ) + self.beta.EX()[..., -1, -1]

        N = Y.sum(-1, keepdims=True)
        alpha = jnp.asarray([(self.n - 2) / 4.0])
        xi = jnp.sqrt(Ephiphi - 2.0 * alpha * Ephi + alpha**2)
        for _ in range(iters - 1):
            alpha = (
                (self.n - 2) / 4.0 + (lmbda(xi) * Ephi).sum(-1, keepdims=True)
            ) / lmbda(xi).sum(-1, keepdims=True)
            xi = jnp.sqrt(Ephiphi - 2.0 * alpha * Ephi + alpha**2)

        ELL = ((Y - 0.5 * N) * Ephi).sum(-1) - (alpha * N)[..., 0]
        ELL = ELL + 0.5 * (N * (xi + alpha)).sum(-1)
        ELL = ELL + (N * log_sigmoid(-xi)).sum(-1)
        return ELL

    @highest_precision
    def forward(self, pX):
        sample_shape = pX.shape[:-2]
        Yt = jnp.eye(self.n)
        Yt = Yt.reshape((self.n,) + (1,) * len(sample_shape) + (self.n,))
        log_p = jnp.moveaxis(self.Elog_like_given_pX_pY(pX, Yt), 0, -1)
        Res = jnp.log(jnp.exp(log_p - log_p.max(-1, keepdims=True)).sum(-1, keepdims=True)) + log_p.max(-1, keepdims=True)
        return log_p - Res, Res[..., 0]

    @highest_precision
    def Elog_like(self, X, Y, iters=2):
        X = self._padded(X)
        Xr = X[..., None, :]
        psi = (Xr * self.beta.mean()[..., 0]).sum(-1)
        Xc = Xr[..., None]
        psi2 = (Xc * (self.beta.EXXT() @ Xc)).sum(-2)[..., 0]
        N = Y.sum(-1, keepdims=True)
        alpha = jnp.asarray([(self.n - 2) / 4.0])
        xi = jnp.sqrt(psi2 - 2.0 * alpha * psi + alpha**2)
        for _ in range(iters - 1):
            alpha = ((self.n - 2) / 4.0 + (lmbda(xi) * psi).sum(-1, keepdims=True)) / lmbda(
                xi
            ).sum(-1, keepdims=True)
            xi = jnp.sqrt(psi2 - 2.0 * alpha * psi + alpha**2)
        ELL = ((Y - 0.5 * N) * psi).sum(-1) - (alpha * N)[..., 0]
        ELL = ELL + 0.5 * (N * (xi + alpha)).sum(-1)
        ELL = ELL + (N * log_sigmoid(-xi)).sum(-1)
        return ELL

    @highest_precision
    def log_predict(self, X):
        sample_shape = X.shape[:-1]
        Yt = jnp.eye(self.n)
        Yt = Yt.reshape((self.n,) + (1,) * len(sample_shape) + (self.n,))
        log_p = jnp.moveaxis(self.Elog_like(X, Yt), 0, -1)
        return log_p

    @highest_precision
    def predict(self, X):
        lnp = self.log_predict(X)
        p = jnp.exp(lnp - lnp.max(-1, keepdims=True))
        return p / p.sum(-1, keepdims=True)

    def KLqprior(self):
        KL = self.beta.KLqprior()
        for _ in range(self.event_dim - 2):
            KL = KL.sum(-1)
        return KL

    def weights(self):
        if self.pad_X:
            return self.beta.mean()[..., :-1, 0]
        return self.beta.mean()[..., 0]

    def bias(self):
        if self.pad_X:
            return self.beta.mean()[..., -1:, 0]
        return jnp.zeros(1)
