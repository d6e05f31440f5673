"""Bayesian linear map Y = A X + U^{-1/2} eps with MatrixNormal-Wishart prior
(reference transforms/MatrixNormalWishart.py).

Supports ``mask`` (zero pattern on A, enforced via a constrained least-squares
solve), ``X_mask`` (input selection), ``pad_X`` (bias column), and the full
message-passing suite: Elog_like / Elog_like_given_pX_pY / Elog_like_X /
Elog_like_X_given_pY / forward / backward / predict / postdict plus the
expectation suite consumed by LDS/DMBD.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.random as jr

from ..dists.wishart import Wishart
from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..utils import math as um
from ..utils.jaxutils import bcontract_pp, pytree_dataclass, replace
from ..utils.linalg import (
    block_precision_marginalizer,
    mT,
    psd_inv,
    psd_inv_and_logdet,
    psd_logdet,
    psd_solve,
)
from ..utils.rng import key_or_next


@pytree_dataclass(
    meta_fields=(
        "event_shape",
        "batch_shape",
        "mask",
        "X_mask_static",
        "pad_X",
        "fixed_precision",
    )
)
class MatrixNormalWishart:
    mu_0: jnp.ndarray
    mu: jnp.ndarray
    invV_0: jnp.ndarray
    invV: jnp.ndarray
    V: jnp.ndarray
    logdetinvV: jnp.ndarray
    logdetinvV_0: jnp.ndarray
    invU: Wishart
    X_mask: jnp.ndarray  # float/bool array or None (may be batched)
    SExx: jnp.ndarray
    SEyx: jnp.ndarray
    SEyy: jnp.ndarray
    N: jnp.ndarray
    event_shape: tuple
    batch_shape: tuple
    mask: object  # static 2D numpy bool (n,p) or None
    X_mask_static: bool  # whether X_mask is present
    pad_X: bool
    fixed_precision: bool

    # -- construction ----------------------------------------------------------
    @classmethod
    def create(
        cls,
        event_shape,
        batch_shape=(),
        prior_parms=None,
        scale=1.0,
        mask=None,
        X_mask=None,
        pad_X=False,
        fixed_precision=False,
        key=None,
    ):
        n = event_shape[-2]
        p = event_shape[-1]
        mu_0 = jnp.asarray(
            0.0 if prior_parms is None else prior_parms["mu"], dtype=float
        )
        if pad_X:
            p = p + 1
            event_shape = tuple(event_shape[:-1]) + (p,)
            if mu_0.ndim != 0:
                mu_0 = jnp.concatenate(
                    [mu_0, jnp.zeros(mu_0.shape[:-1] + (1,))], -1
                )
        event_shape = tuple(event_shape)
        mu_0 = jnp.broadcast_to(mu_0, tuple(batch_shape) + event_shape)

        key = key_or_next(key)
        mu = jr.normal(key, mu_0.shape, dtype=mu_0.dtype) / np.sqrt(p) + mu_0

        invV_0 = jnp.broadcast_to(
            jnp.eye(p), tuple(batch_shape) + event_shape[:-2] + (p, p)
        )
        V = invV_0  # inverse of identity
        logdetinvV = jnp.zeros(invV_0.shape[:-2])
        invU = Wishart.create(
            event_shape[:-2] + (n, n), batch_shape, scale=scale
        )

        if X_mask is not None:
            X_mask = jnp.asarray(X_mask)
            if pad_X:
                X_mask = jnp.concatenate(
                    [X_mask, jnp.ones(X_mask.shape[:-1] + (1,), bool)], -1
                )
        if mask is not None:
            mask = np.asarray(mask)
            from ..utils.jaxutils import HashableArray
            if pad_X:
                mask = np.concatenate(
                    [mask, np.ones(mask.shape[:-1] + (1,), bool)], -1
                )
            mask = HashableArray(mask > 0)

        new = cls(
            mu_0=mu_0,
            mu=mu,
            invV_0=invV_0,
            invV=invV_0,
            V=V,
            logdetinvV=logdetinvV,
            logdetinvV_0=logdetinvV,
            invU=invU,
            X_mask=X_mask,
            SExx=jnp.zeros_like(invV_0),
            SEyx=jnp.zeros_like(mu_0),
            SEyy=jnp.zeros(tuple(batch_shape) + event_shape[:-2] + (n, n)),
            N=jnp.zeros(tuple(batch_shape) + event_shape[:-2]),
            event_shape=event_shape,
            batch_shape=tuple(batch_shape),
            mask=mask,
            X_mask_static=X_mask is not None,
            pad_X=pad_X,
            fixed_precision=fixed_precision,
        )
        if X_mask is not None:
            Xm = X_mask
            new = replace(
                new,
                mu_0=new.mu_0 * Xm,
                mu=new.mu * Xm,
                V=new.V * Xm * mT(Xm),
                invV=new.invV * Xm * mT(Xm),
            )
        if mask is not None:
            m = jnp.asarray(mask)
            new = replace(new, mu_0=new.mu_0 * m, mu=new.mu * m)
        return new

    @property
    def n(self):
        return self.event_shape[-2]

    @property
    def p(self):
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
            invU=self.invU.to_event(n),
        )

    # -- natural parameter update ------------------------------------------------
    def ss_update(self, SExx, SEyx, SEyy, N, lr=1.0, beta=None):
        store = (self.SExx, self.SEyx, self.SEyy, self.N)
        if beta is not None:
            store = (
                beta * self.SExx + SExx,
                beta * self.SEyx + SEyx,
                beta * self.SEyy + SEyy,
                beta * self.N + N,
            )
            SExx, SEyx, SEyy, N = store

        if self.X_mask is not None:
            Xm = self.X_mask
            SExx = SExx * Xm * mT(Xm)
            SEyx = SEyx * Xm
            invV = self.invV_0 + SExx
            muinvV = self.mu_0 @ self.invV_0 + SEyx
            mu = muinvV @ psd_inv(invV)
            mu = mu * Xm
        else:
            invV = self.invV_0 + SExx
            muinvV = self.mu_0 @ self.invV_0 + SEyx
            mu = mT(psd_solve(invV, mT(muinvV)))

        if self.mask is not None:
            # Constrained least squares scattering zeros into ~mask entries
            # (reference MatrixNormalWishart.py:111-120).  The mask is static,
            # so the gather/scatter indices are compile-time constants.
            V_full = psd_inv(invV)
            U_full = psd_inv(self.invU.EinvSigma())
            n_, p_ = self.mask.shape[-2:]
            idx = np.where(~self.mask.reshape(-1))[0]
            # Astar[i,j,k,l] = U[i,k] * V[j,l]
            Astar = (
                V_full[..., None, :, None, :] * U_full[..., :, None, :, None]
            ).reshape(V_full.shape[:-2] + (n_ * p_, n_ * p_))
            A_sub = Astar[..., idx[:, None], idx[None, :]]
            b = mu.reshape(mu.shape[:-2] + (n_ * p_,))[..., idx]
            g = psd_solve(A_sub, b[..., None])[..., 0]
            gamma_flat = jnp.zeros(mu.shape[:-2] + (n_ * p_,), mu.dtype)
            gamma = gamma_flat.at[..., idx].set(g).reshape(mu.shape)
            mu = mu - U_full @ gamma @ V_full
            mu = mu * jnp.asarray(self.mask)

        invU = self.invU
        if not self.fixed_precision:
            SEyy_c = (
                SEyy
                - mu @ invV @ mT(mu)
                + self.mu_0 @ self.invV_0 @ mT(self.mu_0)
            )
            invU = invU.ss_update(SEyy_c, N, lr=lr, beta=None)
        new_invV = lr * invV + (1.0 - lr) * self.invV
        new_invV = 0.5 * (new_invV + mT(new_invV))
        new_mu = lr * mu + (1.0 - lr) * self.mu
        if self.mask is not None:
            new_mu = new_mu * jnp.asarray(self.mask)
        V, logdetinvV = psd_inv_and_logdet(new_invV)
        if self.X_mask is not None:
            new_mu = new_mu * self.X_mask
        return replace(
            self,
            mu=new_mu,
            invV=new_invV,
            V=V,
            logdetinvV=logdetinvV,
            invU=invU,
            SExx=store[0],
            SEyx=store[1],
            SEyy=store[2],
            N=store[3],
        )

    # -- sufficient statistics from data / messages -------------------------------
    def _pad_stats(self, SExx, SEyx, SEx, SEy, N):
        SExx = jnp.concatenate([SExx, SEx], -1)
        SEx1 = jnp.concatenate([SEx, N.reshape(N.shape + (1, 1))], -2)
        SExx = jnp.concatenate([SExx, mT(SEx1)], -2)
        SEyx = jnp.concatenate(
            [SEyx, jnp.broadcast_to(SEy, SEyx.shape[:-1] + (1,))], -1
        )
        return SExx, SEyx

    def raw_update(self, X, Y, p=None, lr=1.0, beta=None):
        nd = self.event_dim + self.batch_dim
        sample_shape = X.shape[: X.ndim - nd]
        sdims = tuple(range(len(sample_shape)))
        if p is None:
            SExx = (X * mT(X)).sum(sdims)
            SEyy = (Y * mT(Y)).sum(sdims)
            SEyx = (Y * mT(X)).sum(sdims)
            N = jnp.asarray(float(np.prod(sample_shape, dtype=np.float64)), X.dtype)
            N = jnp.broadcast_to(N, self.batch_shape + self.event_shape[:-2])
        else:
            pv = p.reshape(p.shape + self.event_dim * (1,))
            N = p.sum(sdims)
            SExx = (X * mT(X) * pv).sum(sdims)
            SEyy = (Y * mT(Y) * pv).sum(sdims)
            SEyx = (Y * mT(X) * pv).sum(sdims)
        if self.pad_X:
            if p is None:
                SEx = X.sum(sdims)
                SEy = Y.sum(sdims)
            else:
                SEx = (X * pv).sum(sdims)
                SEy = (Y * pv).sum(sdims)
            SExx, SEyx = self._pad_stats(SExx, SEyx, SEx, SEy, N)
        return self.ss_update(SExx, SEyx, SEyy, N, lr=lr, beta=beta)

    def update(self, pX, pY, p=None, lr=1.0, beta=None):
        """Message-valued update: pX, pY provide EXXT()/EX()
        (reference MatrixNormalWishart.py:143-172)."""
        nd = self.event_dim + self.batch_dim
        sample_shape = pX.shape[: len(pX.shape) - nd]
        sdims = tuple(range(len(sample_shape)))
        if p is None:
            SExx = pX.EXXT().sum(sdims)
            SEyy = pY.EXXT().sum(sdims)
            SEyx = (pY.EX() @ mT(pX.EX())).sum(sdims)
            N = jnp.asarray(
                float(np.prod(sample_shape, dtype=np.float64)), SExx.dtype
            )
            N = jnp.broadcast_to(N, self.batch_shape + self.event_shape[:-2])
        else:
            pv = p.reshape(p.shape + self.event_dim * (1,))
            N = p.sum(sdims)
            # NOTE: a dot_general form of these p-weighted sums was measured
            # SLOWER on the chip (DMBD role M-step 0.52 -> 3.0 ms): the
            # matmul forces materializing the per-sample EXXT that the
            # broadcast-reduce fuses away, and the (roles, samples) operand
            # is too skinny (M=14) to pay for the MXU pass.
            SExx = (pX.EXXT() * pv).sum(sdims)
            SEyy = (pY.EXXT() * pv).sum(sdims)
            SEyx = ((pY.EX() @ mT(pX.EX())) * pv).sum(sdims)
        if self.pad_X:
            if p is None:
                SEx = pX.EX().sum(sdims)
                SEy = pY.EX().sum(sdims)
            else:
                SEx = (pX.EX() * pv).sum(sdims)
                SEy = (pY.EX() * pv).sum(sdims)
            SExx, SEyx = self._pad_stats(SExx, SEyx, SEx, SEy, N)
        return self.ss_update(SExx, SEyx, SEyy, N, lr=lr, beta=beta)

    # -- KL ------------------------------------------------------------------------
    def KLqprior(self):
        n = self.n
        KL = (
            n / 2.0 * self.logdetinvV
            - n / 2.0 * self.logdetinvV_0
            - n * self.p / 2.0
        )
        # NOTE: the reference adds n/2*logdetinvV_0*X_mask.sum() when X_mask is
        # set (MatrixNormalWishart.py:209-210); invV_0 is always identity here
        # so logdetinvV_0 == 0 and the term vanishes exactly.
        KL = KL + 0.5 * n * (self.invV_0 * self.V).sum((-1, -2))
        temp = mT(self.mu - self.mu_0) @ self.invU.EinvSigma() @ (self.mu - self.mu_0)
        KL = KL + 0.5 * (self.invV_0 * temp).sum((-1, -2))
        for _ in range(self.event_dim - 2):
            KL = KL.sum(-1)
        return KL + self.invU.KLqprior()

    # -- likelihoods -----------------------------------------------------------------
    def Elog_like(self, X, Y):
        ELL = -0.5 * (mT(Y) @ self.EinvSigma() @ Y)[..., 0, 0]
        if self.pad_X:
            EinvUX = self.EinvUX()
            EXTinvUX = self.EXTinvUX()
            ELL = ELL + (mT(Y) @ (EinvUX[..., :, :-1] @ X + EinvUX[..., :, -1:]))[
                ..., 0, 0
            ]
            ELL = ELL - 0.5 * (
                mT(X) @ EXTinvUX[..., :-1, :-1] @ X
                + 2 * EXTinvUX[..., -1:, :-1] @ X
                + EXTinvUX[..., -1:, -1:]
            )[..., 0, 0]
        else:
            ELL = ELL + (mT(Y) @ self.EinvUX() @ X)[..., 0, 0]
            ELL = ELL - 0.5 * (mT(X) @ self.EXTinvUX() @ X)[..., 0, 0]
        ELL = ELL + 0.5 * self.ElogdetinvSigma() - 0.5 * self.n * um.LOG2PI
        for _ in range(self.event_dim - 2):
            ELL = ELL.sum(-1)
        return ELL

    def Elog_like_given_pX_pY(self, pX, pY):
        # the two trace terms are per-component channel contractions — one
        # MXU dot_general each over the flattened event matrix (bcontract_pp)
        # instead of a (roles, p, p)-broadcast VPU reduce; this is the DMBD
        # obs-logits hot path (roles x obs x T likelihood assembly)
        ELL = -0.5 * bcontract_pp(pY.EXXT(), self.EinvSigma())
        if self.pad_X:
            EinvUX = self.EinvUX()
            EXTinvUX = self.EXTinvUX()
            ELL = ELL + (
                mT(pY.mean()) @ (EinvUX[..., :, :-1] @ pX.mean() + EinvUX[..., :, -1:])
            )[..., 0, 0]
            ELL = ELL - 0.5 * bcontract_pp(pX.EXXT(), EXTinvUX[..., :-1, :-1])
            ELL = ELL - (EXTinvUX[..., -1:, :-1] @ pX.mean())[..., 0, 0]
            ELL = ELL - 0.5 * EXTinvUX[..., -1, -1]
        else:
            ELL = ELL + (mT(pY.mean()) @ self.EinvUX() @ pX.mean())[..., 0, 0]
            ELL = ELL - 0.5 * bcontract_pp(pX.EXXT(), self.EXTinvUX())
        ELL = ELL + 0.5 * self.invU.ElogdetinvSigma() - 0.5 * self.n * um.LOG2PI
        for _ in range(self.event_dim - 2):
            ELL = ELL.sum(-1)
        return ELL

    def Elog_like_X(self, Y):
        """Likelihood contribution to latent X in natural parameters
        (reference MatrixNormalWishart.py:251-261)."""
        if self.pad_X:
            EXTinvUX = self.EXTinvUX()
            invSigma_x_x = EXTinvUX[..., :-1, :-1]
            invSigmamu_x = self.EXTinvU()[..., :-1, :] @ Y - EXTinvUX[..., :-1, -1:]
            Residual = (
                -0.5 * (mT(Y) @ self.EinvSigma() @ Y)[..., 0, 0]
                - 0.5 * self.n * um.LOG2PI
                + 0.5 * self.ElogdetinvSigma()
            )
            Residual = Residual - 0.5 * EXTinvUX[..., -1, -1]
        else:
            invSigma_x_x = self.EXTinvUX()
            invSigmamu_x = self.EXTinvU() @ Y
            Residual = (
                -0.5 * (mT(Y) @ self.EinvSigma() @ Y)[..., 0, 0]
                - 0.5 * self.n * um.LOG2PI
                + 0.5 * self.ElogdetinvSigma()
            )
        return invSigma_x_x, invSigmamu_x, Residual

    def Elog_like_X_given_pY(self, pY):
        if self.pad_X:
            EinvUX = self.EinvUX()
            EXTinvUX = self.EXTinvUX()
            PJ_y_y = pY.EinvSigma() + self.EinvSigma()
            PJ_y_x = -EinvUX[..., :, :-1]
            PJ_x_x = EXTinvUX[..., :-1, :-1]
            PmuJ_y = pY.EinvSigmamu() - EinvUX[..., :, -1:]
            PmuJ_x = -EXTinvUX[..., :-1, -1:]
            PJ_1_1 = EXTinvUX[..., -1, -1]
        else:
            PJ_y_y = pY.EinvSigma() + self.EinvSigma()
            PJ_y_x = -self.EinvUX()
            PJ_x_x = self.EXTinvUX()
            PmuJ_y = pY.EinvSigmamu()
            PmuJ_x = jnp.zeros(PJ_x_x.shape[:-1] + (1,))
            PJ_1_1 = jnp.asarray(0.0)

        invSigma_y_y, negBinvD, negCinvA, invSigma_x_x = block_precision_marginalizer(
            PJ_y_y, PJ_y_x, mT(PJ_y_x), PJ_x_x
        )
        invSigmamu_y = PmuJ_y + negBinvD @ PmuJ_x
        invSigmamu_x = PmuJ_x + negCinvA @ PmuJ_y

        Sigma_x_x = psd_inv(invSigma_x_x)
        mu_x = Sigma_x_x @ invSigmamu_x

        Res = pY.Res() + 0.5 * (mT(invSigmamu_y) @ psd_solve(invSigma_y_y, invSigmamu_y))[
            ..., 0, 0
        ]
        Res = (
            Res
            - 0.5 * psd_logdet(invSigma_y_y)
            + 0.5 * pY.dim * um.LOG2PI
            + 0.5 * self.ElogdetinvSigma()
            - 0.5 * PJ_1_1
        )
        px = MVN_vf(
            invSigma=invSigma_x_x, invSigmamu=invSigmamu_x, mu=mu_x, Sigma=Sigma_x_x
        )
        return px, Res - px.Res()

    # -- message passing -----------------------------------------------------------
    def Eforward(self, pX):
        if self.pad_X:
            invSigmamu = self.EinvUX()[..., :, :-1] @ pX.mean() + self.EinvUX()[..., :, -1:]
        else:
            invSigmamu = self.EinvUX() @ pX.mean()
        return MVN_vf(invSigma=self.EinvSigma(), invSigmamu=invSigmamu)

    def forward(self, pX):
        """Collapsed-VB forward with exact Res (reference :303-328)."""
        if not self.pad_X:
            Sigma_star = psd_inv(self.n * self.V + pX.EinvSigma())
            invSigmamu_star = pX.EinvSigmamu()
            mu_star = Sigma_star @ invSigmamu_star
            mu_y = self.mean() @ mu_star
            Sigma_yy = self.mean() @ Sigma_star @ mT(self.mean()) + self.invEinvSigma()
            Res = -0.5 * (mT(pX.mean()) @ pX.EinvSigma() @ pX.mean())[..., 0, 0]
            Res = Res + 0.5 * (mT(invSigmamu_star) @ Sigma_star @ invSigmamu_star)[
                ..., 0, 0
            ]
            Res = Res - 0.5 * psd_logdet(
                self.n * self.V @ pX.ESigma() + jnp.eye(self.p)
            )
        else:
            Sigma_star = psd_inv(pX.EinvSigma() + self.n * self.V[..., :-1, :-1])
            invSigmamu_star = pX.EinvSigmamu() - self.n * self.V[..., :-1, -1:]
            mu_star = Sigma_star @ invSigmamu_star
            mu_y = self.mean()[..., :-1] @ mu_star + self.mean()[..., -1:]
            Sigma_yy = (
                self.mean()[..., :-1] @ Sigma_star @ mT(self.mean()[..., :-1])
                + self.invEinvSigma()
            )
            Res = -0.5 * (mT(pX.mean()) @ pX.EinvSigma() @ pX.mean())[..., 0, 0]
            Res = Res + 0.5 * (mT(invSigmamu_star) @ Sigma_star @ invSigmamu_star)[
                ..., 0, 0
            ]
            Res = Res - 0.5 * self.n * self.V[..., -1, -1]
            Res = Res - 0.5 * psd_logdet(
                self.n * self.V[..., :-1, :-1] @ pX.ESigma() + jnp.eye(self.p - 1)
            )
        return MVN_vf(mu=mu_y, Sigma=Sigma_yy), Res

    def backward(self, pY, Res=0.0):
        if self.pad_X:
            EinvUX = self.EinvUX()
            EXTinvUX = self.EXTinvUX()
            PJ_y_y = pY.EinvSigma() + self.EinvSigma()
            PJ_y_x = -EinvUX[..., :, :-1]
            PJ_x_x = EXTinvUX[..., :-1, :-1]
            PmuJ_y = pY.EinvSigmamu() + EinvUX[..., :, -1:]
            PmuJ_x = -EXTinvUX[..., :-1, -1:]
            PJ11 = EXTinvUX[..., -1, -1]
        else:
            PJ_y_y = pY.EinvSigma() + self.EinvSigma()
            PJ_y_x = -self.EinvUX()
            PJ_x_x = self.EXTinvUX()
            PmuJ_y = pY.EinvSigmamu()
            PmuJ_x = jnp.zeros(PJ_x_x.shape[:-1] + (1,))
            PJ11 = jnp.asarray(0.0)

        invSigma_y_y, negBinvD, negCinvA, invSigma_x_x = block_precision_marginalizer(
            PJ_y_y, PJ_y_x, mT(PJ_y_x), PJ_x_x
        )
        invSigmamu_y = PmuJ_y + negBinvD @ PmuJ_x
        invSigmamu_x = PmuJ_x + negCinvA @ PmuJ_y

        pX = MVN_vf(invSigma=invSigma_x_x, invSigmamu=invSigmamu_x)
        Res = (
            Res
            + pY.Res()
            + 0.5 * (mT(invSigmamu_y) @ psd_solve(invSigma_y_y, invSigmamu_y))[..., 0, 0]
            - 0.5 * psd_logdet(invSigma_y_y)
            + 0.5 * pY.dim * um.LOG2PI
            + 0.5 * self.ElogdetinvSigma()
            - 0.5 * PJ11
        )
        return pX, Res - pX.Res()

    def predict(self, X):
        if self.pad_X:
            EinvUX = self.EinvUX()
            EXTinvUX = self.EXTinvUX()
            invSigmamu_y = EinvUX[..., :, :-1] @ X + EinvUX[..., :, -1:]
            Res = (
                -0.5 * mT(X) @ EXTinvUX[..., :-1, :-1] @ X
                - EXTinvUX[..., -1:, :-1] @ X
                - 0.5 * EXTinvUX[..., -1:, -1:]
            )
        else:
            invSigmamu_y = self.EinvUX() @ X
            Res = -0.5 * mT(X) @ self.EXTinvUX() @ X
        Res = Res[..., 0, 0] + 0.5 * self.ElogdetinvSigma() - 0.5 * self.n * um.LOG2PI
        pY = MVN_vf(invSigma=self.EinvSigma(), invSigmamu=invSigmamu_y)
        return pY, Res - pY.Res()

    def postdict(self, Y):
        invSigma_x_x, invSigmamu_x, Residual = self.Elog_like_X(Y)
        pX = MVN_vf(invSigma=invSigma_x_x, invSigmamu=invSigmamu_x)
        return pX, Residual - pX.Res()

    def predict_given_pX(self, pX):
        return self.forward(pX)

    # -- point estimates ---------------------------------------------------------
    def mean(self):
        return self.mu

    def bias(self):
        return self.mu[..., -1:] if self.pad_X else jnp.asarray(0.0)

    def weights(self):
        return self.mu[..., :-1] if self.pad_X else self.mu

    def var(self):
        return jnp.diagonal(self.ESigma(), axis1=-1, axis2=-2)[..., None] * jnp.diagonal(
            self.V, axis1=-1, axis2=-2
        )[..., None, :]

    # -- expectation suite (reference :418-471) ------------------------------------
    def EinvUX(self):
        return self.invU.EinvSigma() @ self.mu

    def EXTinvU(self):
        return mT(self.mu) @ self.invU.EinvSigma()

    def EXTAX(self, A):
        return self.V * (self.invU.ESigma() * A).sum((-1, -2))[..., None, None] + mT(
            self.mu
        ) @ A @ self.mu

    def EXmMUTAXmMU(self, A):
        return self.V * (self.invU.ESigma() * A).sum((-1, -2))[..., None, None]

    def EXAXT(self, A):
        return self.ESigma() * (self.V * A).sum((-1, -2))[..., None, None] + (
            self.mu @ A @ mT(self.mu)
        )

    def EXmMUAXmMUT(self, A):
        return self.ESigma() * (self.V * A).sum((-1, -2))[..., None, None]

    def EXTinvUX(self):
        return self.n * self.V + mT(self.mu) @ self.invU.EinvSigma() @ self.mu

    def EXinvVXT(self):
        return self.p * self.invU.ESigma() + self.mu @ self.invV @ mT(self.mu)

    def EXmMUTinvUXmMU(self):
        return self.n * self.V

    def EXmMUinvVXmMUT(self):
        return self.p * self.invU.ESigma()

    def EXTX(self):
        return self.V * jnp.trace(self.invU.ESigma(), axis1=-2, axis2=-1)[
            ..., None, None
        ] + mT(self.mu) @ self.mu

    def EXXT(self):
        return jnp.trace(self.V, axis1=-2, axis2=-1)[..., None, None] * self.invU.ESigma() + (
            self.mu @ mT(self.mu)
        )

    def ElogdetinvU(self):
        return self.invU.ElogdetinvSigma()

    def logdetEinvSigma(self):
        return self.invU.logdetEinvSigma()

    def ElogdetinvSigma(self):
        return self.invU.ElogdetinvSigma()

    def EinvSigma(self):
        return self.invU.EinvSigma()

    def invEinvSigma(self):
        return self.invU.invEinvSigma()

    def ESigma(self):
        return self.invU.ESigma()
