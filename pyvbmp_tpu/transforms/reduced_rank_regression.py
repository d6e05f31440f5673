"""Bayesian CCA / reduced-rank regression: y = A u, x = B u, u ~ N(0,I)
(reference transforms/ReducedRankRegression.py)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..dists.delta import Delta
from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..dists.normal_gamma import NormalGamma
from ..utils import math as um
from ..utils.linalg import psd_inv, psd_logdet
from .matrix_normal_gamma import MatrixNormalGamma
from .matrix_normal_wishart import MatrixNormalWishart


class ReducedRankRegression:
    def __init__(self, n, p, dim, batch_shape=(), pad_X=False, independent=False, key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.n, self.p, self.dim = n, p, dim
        self.event_dim = 2
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.event_shape = (dim, 1)
        cls = MatrixNormalGamma if independent else MatrixNormalWishart
        self.A = cls.create((n, dim), tuple(batch_shape), pad_X=pad_X, key=key)
        self.B = cls.create((p, dim), tuple(batch_shape), pad_X=pad_X, key=jr.fold_in(key, 1))
        self.U = NormalGamma.create((dim,), tuple(batch_shape), key=jr.fold_in(key, 2))
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []
        self.pu = None
        self.logZ = None

    def _joint_u_posterior(self, X, Y, nodes=None):
        A, B, U = nodes if nodes is not None else (self.A, self.B, self.U)
        invSigma, invSigmamu, Residual = B.Elog_like_X(X)
        invSigma_bw, invSigmamu_bw, Residual_bw = A.Elog_like_X(Y)
        invSigma = invSigma_bw + invSigma + U.EinvSigma()
        invSigmamu = invSigmamu_bw + invSigmamu + U.EinvSigmamu()[..., None]
        Residual = (
            Residual
            + Residual_bw
            + 0.5 * U.ElogdetinvSigma()
            - 0.5 * self.dim * um.LOG2PI
        )
        Sigma = psd_inv(invSigma)
        mu = Sigma @ invSigmamu
        Residual_u = (
            -0.5 * (mu * invSigmamu).sum((-1, -2))
            + 0.5 * psd_logdet(invSigma)
            - 0.5 * self.dim * um.LOG2PI
        )
        Residual = Residual - Residual_u
        pu = MVN_vf(mu=mu, Sigma=Sigma, invSigma=invSigma, invSigmamu=invSigmamu)
        return pu, Residual

    def _vb_step(self, nodes, X, Y, lr):
        """One VB sweep as a pure function of (A, B, U) (reference
        ReducedRankRegression.raw_update:43-81 body)."""
        A, B, U = nodes
        pu, Residual = self._joint_u_posterior(X, Y, nodes=nodes)
        logZ = Residual.sum(0)
        KL = A.KLqprior() + B.KLqprior() + U.KLqprior()
        ELBO = jnp.sum(logZ.sum() - KL.sum())
        A = A.update(pu, Delta(Y), lr=lr)
        B = B.update(pu, Delta(X), lr=lr)
        SExx = pu.EXXT()
        SEx = pu.EX()
        while SExx.ndim > self.event_dim + self.batch_dim:
            SExx = SExx.sum(0)
            SEx = SEx.sum(0)
        N = jnp.broadcast_to(
            jnp.asarray(float(np.prod(X.shape[: X.ndim - 2 - self.batch_dim], dtype=np.float64))),
            self.U.batch_shape,
        )
        U = U.ss_update(
            jnp.diagonal(SExx, axis1=-1, axis2=-2), SEx[..., 0], N, lr=lr
        )
        return (A, B, U), (ELBO, logZ, pu)

    def raw_update(self, X, Y, iters=1, lr=1.0, verbose=False):
        from ._fused import fused_fit

        X = X[..., None]
        Y = Y[..., None]
        (self.A, self.B, self.U), (self.logZ, pu), ELBOs = fused_fit(
            self, self._vb_step, (self.A, self.B, self.U), int(iters), X, Y,
            lr=lr,
        )
        self.pu = pu
        import numpy as np_

        for e in np_.asarray(ELBOs, np_.float64):
            if verbose:
                print(
                    "Percent change in ELBO = ",
                    (e - self.ELBO_last) / abs(self.ELBO_last) * 100,
                )
                self.ELBO_last = float(e)
                self.ELBO_save.append(float(e))

    def Elog_like(self, X, Y):
        X = X[..., None]
        Y = Y[..., None]
        pu, Residual = self._joint_u_posterior(X, Y)
        self.pu = pu
        self.logZ = Residual.sum(0)
        return Residual

    def KLqprior(self):
        return self.A.KLqprior() + self.B.KLqprior() + self.U.KLqprior()

    def EW(self):
        """Effective regression coefficients <A> @ <B>^+ (the reference's
        expression at ReducedRankRegression.py:122-123 does not type-check —
        (n,d) @ (p,d) — so the documented intent is implemented instead)."""
        return self.A.mean() @ jnp.linalg.pinv(self.B.mean())

    def predict(self, X):
        X = X[..., None] if X.shape[-1] != 1 else X
        invSigma, invSigmamu, Residual = self.B.Elog_like_X(X)
        invSigma = invSigma + self.U.EinvSigma()
        invSigmamu = invSigmamu + self.U.EinvSigmamu()[..., None]
        return self.A.predict_given_pX(
            MVN_vf(invSigma=invSigma, invSigmamu=invSigmamu)
        )

    def forward(self, pX):
        raise NotImplementedError

    def backward(self, pY):
        raise NotImplementedError
