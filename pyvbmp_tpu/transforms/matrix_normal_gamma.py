"""MatrixNormal with diagonal row-noise via DiagonalWishart
(reference transforms/MatrixNormalGamma.py) — method-for-method mirror of
MatrixNormalWishart with Gamma-distributed per-row precisions."""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..dists.diagonal_wishart import DiagonalWishart, DiagonalWishartUnitTrace
from ..utils.jaxutils import pytree_dataclass, replace
from ..utils.linalg import mT, psd_inv, psd_inv_and_logdet, psd_solve
from .matrix_normal_wishart import MatrixNormalWishart


@pytree_dataclass(
    meta_fields=(
        "event_shape",
        "batch_shape",
        "mask",
        "X_mask_static",
        "pad_X",
        "fixed_precision",
        "uniform_precision",
    )
)
class MatrixNormalGamma(MatrixNormalWishart):
    uniform_precision: bool = False

    @classmethod
    def create(
        cls,
        event_shape,
        batch_shape=(),
        prior_parms=None,
        scale=1.0,
        uniform_precision=False,
        mask=None,
        X_mask=None,
        pad_X=False,
        fixed_precision=False,
        key=None,
        _unit_trace=False,
    ):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)  # resolve ONCE so an explicit key fully
        # determines the build (a keyless DiagonalWishart.create would draw
        # from the global sequence and break same-key reproducibility)
        base = MatrixNormalWishart.create(
            event_shape,
            batch_shape,
            prior_parms=prior_parms,
            scale=scale,
            mask=mask,
            X_mask=X_mask,
            pad_X=pad_X,
            fixed_precision=fixed_precision,
            key=key,
        )
        n = base.event_shape[-2]
        dw_cls = DiagonalWishartUnitTrace if _unit_trace else DiagonalWishart
        invU = dw_cls.create(
            base.event_shape[:-1], batch_shape, scale=scale,
            key=jr.fold_in(key, 17),
        )
        kw = {f.name: getattr(base, f.name) for f in dataclasses.fields(base)}
        kw["invU"] = invU
        kw["uniform_precision"] = uniform_precision
        return cls(**kw)

    # -- invU plumbing differences ------------------------------------------------
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
            V_full = psd_inv(invV)
            U_full = psd_inv(self.invU.EinvSigma())
            n_, p_ = self.mask.shape[-2:]
            idx = np.where(~self.mask.reshape(-1))[0]
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
            invU = invU.ss_update(
                jnp.diagonal(SEyy_c, axis1=-2, axis2=-1), N[..., None], lr=lr
            )
            if self.uniform_precision:
                # reference "HACK" summing gamma alphas (MatrixNormalGamma.py:130-131)
                g = invU.gamma
                invU = replace(
                    invU, gamma=replace(g, alpha=g.alpha.sum(-1, keepdims=True))
                )
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

    def KLqprior(self):
        n = self.n
        KL = (
            n / 2.0 * self.logdetinvV
            - n / 2.0 * self.logdetinvV_0
            - n * self.p / 2.0
        )
        KL = KL + 0.5 * n * (self.invV_0 * self.V).sum((-1, -2))
        temp = mT(self.mu - self.mu_0) @ (
            self.invU.gamma.mean()[..., None] * (self.mu - self.mu_0)
        )
        KL = KL + 0.5 * (self.invV_0 * temp).sum((-1, -2))
        for _ in range(self.event_dim - 2):
            KL = KL.sum(-1)
        if self.uniform_precision:
            KL = KL + self.invU.KLqprior() / n
        else:
            KL = KL + self.invU.KLqprior()
        for _ in range(self.event_dim - 2):
            if KL.ndim > 0:  # torch sum(-1) on 0-dim is a no-op
                KL = KL.sum(-1)
        return KL

    def forward(self, pX):
        """Natural-parameter forward (reference MatrixNormalGamma.py:316-334);
        returns (pY, None) — the reference returns no Res on this path."""
        from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
        from ..utils.linalg import block_precision_marginalizer

        if self.pad_X:
            EinvUX = self.EinvUX()
            EXTinvUX = self.EXTinvUX()
            PJ_y_y = self.EinvSigma()
            PJ_y_x = -EinvUX[..., :, :-1]
            PJ_x_x = EXTinvUX[..., :-1, :-1] + pX.EinvSigma()
            PmuJ_y = EinvUX[..., :, -1:]
            PmuJ_x = pX.EinvSigmamu() - EXTinvUX[..., :-1, -1:]
        else:
            PJ_y_y = self.EinvSigma()
            PJ_y_x = -self.EinvUX()
            PJ_x_x = self.EXTinvUX() + pX.EinvSigma()
            PmuJ_y = jnp.zeros(PJ_y_y.shape[:-1] + (1,))
            PmuJ_x = pX.EinvSigmamu()

        invSigma_y_y, negBinvD = block_precision_marginalizer(
            PJ_y_y, PJ_y_x, mT(PJ_y_x), PJ_x_x
        )[0:2]
        invSigmamu_y = PmuJ_y + negBinvD @ PmuJ_x
        return MVN_vf(invSigma=invSigma_y_y, invSigmamu=invSigmamu_y), None

    # -- expectations that differ from MNW ---------------------------------------
    def EinvUX(self):
        return self.invU.gamma.mean()[..., None] * self.mu

    def EXTAX(self, A):
        return self.V * (
            self.invU.gamma.meaninv() * jnp.diagonal(A, axis1=-2, axis2=-1)
        ).sum(-1)[..., None, None] + mT(self.mu) @ A @ self.mu

    def EXmMUTAXmMU(self, A):
        return self.V * (
            self.invU.gamma.meaninv() * jnp.diagonal(A, axis1=-2, axis2=-1)
        ).sum(-1)[..., None, None]

    def EXTinvUX(self):
        return self.n * self.V + mT(self.mu) @ (
            self.invU.gamma.mean()[..., None] * self.mu
        )

    def EXTX(self):
        return self.V * self.invU.gamma.meaninv().sum(-1)[..., None, None] + mT(
            self.mu
        ) @ self.mu

    def EXXT(self):
        return jnp.trace(self.V, axis1=-2, axis2=-1)[
            ..., None, None
        ] * self.invU.ESigma() + self.mu @ mT(self.mu)

    def ElogdetinvU(self):
        return self.invU.gamma.loggeomean().sum(-1)

    def ElogdetinvSigma(self):
        return self.invU.gamma.loggeomean().sum(-1)

    def EinvSigma(self):
        return self.invU.mean()

    def ESigma(self):
        return self.invU.ESigma()

    def invEinvSigma(self):
        return self.invU.invEinvSigma()


@pytree_dataclass(
    meta_fields=(
        "event_shape",
        "batch_shape",
        "mask",
        "X_mask_static",
        "pad_X",
        "fixed_precision",
        "uniform_precision",
    )
)
class MatrixNormalGamma_UnitTrace(MatrixNormalGamma):
    """MNG with trace-constrained diagonal noise
    (reference MatrixNormalGamma.py:443-449)."""

    @classmethod
    def create(cls, event_shape, batch_shape=(), **kw):
        kw["_unit_trace"] = True
        return super().create(event_shape, batch_shape, **kw)
