"""Multinomial logistic regression via the Pólya-Gamma / Jaakkola-Jordan bound
with stick-breaking over K-1 logits (reference
transforms/MultiNomialLogisticRegression.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dists.mvn_ard import MVN_ard
from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..utils import math as um
from ..utils.jaxutils import replace
from ..utils.linalg import mT, psd_inv
from ..utils.rng import key_or_next


def highest_precision(fn):
    """Pin float32-accurate matmuls for a method.

    TPU's default matmul precision feeds bf16 into the MXU; the Polya-Gamma
    fixed point (quadratic forms x'E[bb']x inside tanh) is cancellation-
    sensitive enough that the default silently collapses the posterior to
    chance-level predictions (observed on the classification bake-off:
    0.109 accuracy at default vs 0.868 at highest). Logistic-regression
    updates are seconds of work, so the ~3x matmul cost is irrelevant here;
    throughput-critical paths (smoothers) keep the default.
    """
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return wrapped


def _stick_breaking_stats(Y):
    """pgb (PG counts) and YmN = Y - N/2 over the first K-1 logits
    (reference MNLR.raw_update:50-52)."""
    N = Y.sum(-1, keepdims=True) - (jnp.cumsum(Y, -1) - Y)
    YmN = Y - N / 2.0
    return N[..., :-1], YmN[..., :-1]


class MultiNomialLogisticRegression:
    def __init__(self, n, p, batch_shape=(), pad_X=True, key=None):
        import jax.random as jr

        if pad_X:
            p = p + 1
        n = n - 1
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

    # -- helpers -----------------------------------------------------------------
    def _padded(self, X):
        if self.pad_X:
            return jnp.concatenate([X, jnp.ones(X.shape[:-1] + (1,), X.dtype)], -1)
        return X

    def _padded_moments(self, pX):
        """EX (p,1) and EXXT (p,p) with the bias row appended
        (reference MNLR.update:96-103)."""
        EXXT = pX.EXXT()[..., None, :, :]
        EX = pX.mean()[..., None, :, :]
        if self.pad_X:
            EXXT = jnp.concatenate([EXXT, EX], -1)
            EX = jnp.concatenate([EX, jnp.ones(EX.shape[:-2] + (1, 1), EX.dtype)], -2)
            EXXT = jnp.concatenate([EXXT, mT(EX)], -2)
        return EX, EXXT

    # -- updates (natural parameter, PG inner loop) --------------------------------
    def _raw_stats(self, X, Y, p):
        pgb, YmN = _stick_breaking_stats(Y)
        YmN = YmN[..., None, None]
        EX = self._padded(X)
        EX = EX[..., None, :, None]  # sample x batch x 1 x p x 1
        EXXT = EX * mT(EX)
        sdims = tuple(range(X.ndim - 1 - self.batch_dim))
        if p is None:
            SEyx = (YmN * EX).sum(sdims)
        else:
            SEyx = (YmN * EX * p[..., None, None, None]).sum(sdims)
        return pgb, YmN, EX, EXXT, SEyx, sdims

    def with_beta(self, beta_node):
        """Shallow copy carrying a different beta posterior — lets fused
        multi-sweep fits thread the MNLR state through a lax.scan while
        reusing every (config-static) method."""
        import copy

        c = copy.copy(self)
        c.beta = beta_node
        return c

    @highest_precision
    def raw_update_beta(self, beta_node, X, Y, iters=2, p=None, lr=1.0,
                        beta=None):
        """Pure PG-bound update of a beta node (functional core of
        raw_update; used directly by fused multi-sweep fits that carry the
        MNLR state through a lax.scan)."""
        pgb, YmN, EX, EXXT, SEyx, sdims = self._raw_stats(X, Y, p)
        new_beta = beta_node
        for _ in range(iters):
            pgc = jnp.sqrt((new_beta.EXXT() * EXXT).sum((-1, -2)))
            Ew = (pgb / 2.0 / pgc * jnp.tanh(pgc / 2.0))[..., None, None]
            if p is None:
                SExx = (Ew * EXXT).sum(sdims)
            else:
                SExx = (Ew * EXXT * p[..., None, None, None]).sum(sdims)
            new_beta = new_beta.ss_update(SExx, SEyx, lr=lr, beta=beta)
        return new_beta

    def raw_update(self, X, Y, iters=2, p=None, lr=1.0, beta=None, verbose=False):
        if p is None and self.batch_dim == 0 and X.ndim == 2:
            return self._raw_update_fast(X, Y, iters=iters, lr=lr, beta=beta)
        self.beta = self.raw_update_beta(
            self.beta, X, Y, iters=iters, p=p, lr=lr, beta=beta
        )

    @highest_precision
    def _raw_update_fast(self, X, Y, iters=2, lr=1.0, beta=None):
        """MXU-formulated stats for the unbatched bulk-data case: never
        materializes the (S, n, p, p) outer-product tensor (the reference's
        pattern at MNLR.raw_update:54-73 needs ~16 GB on the MNIST bake-off).
        The per-class scatter Sum_s Ew[s,k] x_s x_s^T runs through the fused
        Pallas kernel on TPU (ops/weighted_scatter.py)."""
        from ..ops.weighted_scatter import weighted_outer

        pgb, YmN = _stick_breaking_stats(Y)  # (S, n)
        EX = self._padded(X)  # (S, p)
        S, pdim = EX.shape
        SEyx = (YmN[..., None] * EX[:, None, :]).reshape(S, -1).sum(0)
        SEyx = SEyx.reshape(self.n, pdim, 1)
        new_beta = self.beta
        for _ in range(iters):
            BBT = new_beta.EXXT()  # (n, p, p)
            # pgc^2 = einsum('sp,kpq,sq->sk') via one MXU matmul
            XB = (EX @ BBT.transpose(1, 0, 2).reshape(pdim, -1)).reshape(
                S, self.n, pdim
            )
            pgc = jnp.sqrt((XB * EX[:, None, :]).sum(-1))
            Ew = pgb / 2.0 / pgc * jnp.tanh(pgc / 2.0)  # (S, n)
            SExx = weighted_outer(EX, Ew)  # (n, p, p)
            new_beta = new_beta.ss_update(SExx, SEyx, lr=lr, beta=beta)
        self.beta = new_beta

    @highest_precision
    def update_beta(self, beta_node, pX, pY, iters=2, p=None, lr=1.0,
                    beta=None):
        """Pure message-valued update of a beta node (functional core of
        update; used by fused multi-sweep fits)."""
        pgb, YmN = _stick_breaking_stats(pY)
        YmN = YmN[..., None, None]
        EX, EXXT = self._padded_moments(pX)
        sdims = tuple(range(len(pX.shape) - 2 - self.batch_dim))
        if p is None:
            SEyx = (YmN * EX).sum(0)
        else:
            SEyx = (YmN * EX * p[..., None, None, None]).sum(sdims)
        new_beta = beta_node
        for _ in range(iters):
            pgc = jnp.sqrt((new_beta.EXXT() * EXXT).sum((-1, -2)))
            Ew = (pgb / 2.0 / pgc * jnp.tanh(pgc / 2.0))[..., None, None]
            if p is None:
                SExx = (Ew * EXXT).sum(sdims)
            else:
                SExx = (Ew * EXXT * p[..., None, None, None]).sum(sdims)
            new_beta = new_beta.ss_update(SExx, SEyx, lr=lr, beta=beta)
        return new_beta

    def update(self, pX, pY, iters=2, p=None, lr=1.0, beta=None, verbose=False):
        """Message-valued X update (reference MNLR.update:82-118)."""
        self.beta = self.update_beta(
            self.beta, pX, pY, iters=iters, p=p, lr=lr, beta=beta
        )

    # -- likelihoods ---------------------------------------------------------------
    @highest_precision
    def Elog_like(self, X, Y):
        X = self._padded(X)
        N = Y.sum(-1, keepdims=True) - (jnp.cumsum(Y, -1) - Y)
        YmN = Y - N / 2.0
        pgb = N[..., :-1]
        YmN = YmN[..., :-1]
        Xr = X[..., None, :]  # sample x batch x 1 x p
        SEyxb = (YmN[..., None] * Xr * self.beta.mean()[..., 0]).sum(-1)
        Xc = Xr[..., None]
        pgc = jnp.sqrt((Xc * (self.beta.EXXT() @ Xc)).sum(-2)[..., 0])
        return (
            SEyxb.sum(-1)
            - (pgb * jnp.log(jnp.cosh(0.5 * pgc))).sum(-1)
            - pgb.sum(-1) * um.LOG2
        )

    @highest_precision
    def Elog_like_given_pX_pY(self, pX, Y):
        EX = pX.mean()
        EXXT = pX.EXXT()
        if self.pad_X:
            EXXT = jnp.concatenate([EXXT, EX], -1)
            EX = jnp.concatenate([EX, jnp.ones(EX.shape[:-2] + (1, 1), EX.dtype)], -2)
            EXXT = jnp.concatenate([EXXT, mT(EX)], -2)
        N = Y.sum(-1, keepdims=True) - (jnp.cumsum(Y, -1) - Y)
        YmN = Y - N / 2.0
        pgb = N[..., :-1]
        YmN = YmN[..., :-1]
        EX = EX[..., None, :, :]
        EXXT = EXXT[..., None, :, :]
        SEyxb = (YmN[..., None] * EX[..., 0] * self.beta.mean()[..., 0]).sum(-1)
        pgc = jnp.sqrt((EXXT * self.beta.EXXT()).sum((-1, -2)))
        return (
            SEyxb.sum(-1)
            - (pgb * jnp.log(jnp.cosh(0.5 * pgc))).sum(-1)
            - pgb.sum(-1) * um.LOG2
        )

    # -- latent-X message (reference MNLR.Elog_like_X :208-242) --------------------
    @highest_precision
    def Elog_like_X(self, like_X, pY, iters=2):
        N = pY.sum(-1, keepdims=True) - (jnp.cumsum(pY, -1) - pY)
        YmN = pY - N / 2.0
        pgb = N[..., :-1]
        YmN = YmN[..., :-1]

        BBT = self.beta.EXXT()
        pgc = jnp.sqrt(BBT.sum((-1, -2)))
        Ew = pgb / 2.0 / pgc * jnp.tanh(pgc / 2.0)
        bmean = self.beta.mean()

        invSigma = invSigmamu = Sigma = mu = None
        for _ in range(iters):
            if self.pad_X:
                invSigmamu = (
                    YmN[..., None, None] * bmean[..., :-1, -1:]
                    - Ew[..., None, None] * BBT[..., :-1, -1:]
                ).sum(-3)
                invSigmamu = like_X.EinvSigmamu() + invSigmamu
                invSigma = (Ew[..., None, None] * BBT[..., :-1, :-1]).sum(-3)
                invSigma = like_X.EinvSigma() + invSigma
                Sigma = psd_inv(invSigma)
                mu = Sigma @ invSigmamu
                pgc = jnp.sqrt(
                    (
                        BBT[..., :-1, :-1] * (Sigma + mu @ mT(mu))[..., None, :, :]
                    ).sum((-1, -2))
                    + 2 * (BBT[..., -1:, :-1] @ mu[..., None, :, :])[..., 0, 0]
                    + BBT[..., -1, -1]
                )
            else:
                invSigmamu = (YmN[..., None, None] * bmean).sum(-3)
                invSigmamu = like_X.EinvSigmamu() + invSigmamu
                invSigma = (Ew[..., None, None] * BBT).sum(-3)
                invSigma = like_X.EinvSigma() + invSigma
                Sigma = psd_inv(invSigma)
                mu = Sigma @ invSigmamu
                pgc = jnp.sqrt(
                    (BBT * (Sigma + mu @ mT(mu))[..., None, :, :]).sum((-1, -2))
                )
            Ew = pgb / 2.0 / pgc * jnp.tanh(pgc / 2.0)

        if self.pad_X:
            # NOTE: the reference's term ``beta.mean()[...,-1:,:-1]*mu`` indexes
            # an empty slice (MNLR.py:245) so only the bias survives; reproduced
            # verbatim for parity.
            Res = -pgb.sum(-1) * um.LOG2 + (YmN * bmean[..., -1, -1]).sum(-1)
        else:
            Res = -pgb.sum(-1) * um.LOG2 + (
                YmN * (bmean * mu[..., None, :, :]).sum((-1, -2))
            ).sum(-1)
        Res = Res - (pgb * jnp.log(jnp.cosh(0.5 * pgc))).sum(-1) + like_X.Res()
        return invSigma, invSigmamu, Sigma, mu, Res

    @highest_precision
    def backward(self, pY, like_X=None):
        if like_X is None:
            p = self.p - int(self.pad_X)
            like_X = MVN_vf(
                invSigmamu=jnp.zeros((pY.ndim - 1) * (1,) + (p, 1)),
                invSigma=jnp.broadcast_to(
                    jnp.eye(p), (pY.ndim - 1) * (1,) + (p, p)
                ),
            )
        invSigma, invSigmamu, Sigma, mu, Res = self.Elog_like_X(like_X, pY)
        return MVN_vf(invSigma=invSigma, invSigmamu=invSigmamu, Sigma=Sigma, mu=mu), Res

    # -- prediction -----------------------------------------------------------------
    @highest_precision
    def log_predict(self, X):
        """Per-class log-probability lower bound: Elog_like at each one-hot
        class, vectorized over a leading class axis (reference
        MNLR.log_predict:244-249; broadcasts against batched MNLRs)."""
        sample_shape = X.shape[:-1]
        Yt = jnp.eye(self.n + 1)
        Yt = Yt.reshape((self.n + 1,) + (1,) * len(sample_shape) + (self.n + 1,))
        return jnp.moveaxis(self.Elog_like(X, Yt), 0, -1)

    @highest_precision
    def log_predict_1(self, X):
        """Equivalent cumsum form (reference MNLR.log_predict_1:285-304);
        cheaper for unbatched MNLRs."""
        X = self._padded(X)
        lnpsb = X @ mT(self.beta.mean()[..., 0])
        Xc = X[..., None, :, None]
        pgc = jnp.sqrt((Xc * (self.beta.EXXT() @ Xc)).sum(-2)[..., 0])
        lnpsb_N = -jnp.log(jnp.cosh(0.5 * pgc)) - um.LOG2
        lnpsb_0 = -0.5 * lnpsb.sum(-1, keepdims=True) + lnpsb_N.sum(-1, keepdims=True)
        lnpsb = lnpsb - 0.5 * jnp.cumsum(lnpsb, -1) + jnp.cumsum(lnpsb_N, -1)
        return jnp.concatenate([lnpsb, lnpsb_0], -1)

    @highest_precision
    def log_predict_2(self, X):
        """Third prediction bound (reference MNLR.log_predict_2:261-290):
        exactly marginalizes the betas per stick while using <w> from the PG
        fixed point for the quadratic term."""
        X = self._padded(X)
        Xr = X[..., None, :]
        psi_bar = (Xr * self.beta.mean()[..., 0]).sum(-1)
        Xc = X[..., None, :, None]
        pgc = jnp.sqrt((Xc * (self.beta.EXXT() @ Xc)).sum(-2)[..., 0])
        Ew = 0.5 / pgc * jnp.tanh(0.5 * pgc)
        psi_var = (Xc * (self.beta.ESigma() @ Xc)).sum((-2, -1))
        nat1_plus = 0.5 + psi_bar / psi_var
        nat1_minus = nat1_plus - 1.0
        nat2 = Ew + 1.0 / psi_var
        Res = jnp.log(jnp.cosh(0.5 * pgc))
        lnpsb = (
            0.5 * nat1_plus**2 / nat2
            - 0.5 * jnp.log(nat2)
            - 0.5 * psi_bar**2 / psi_var
            - 0.5 * jnp.log(psi_var)
            - um.LOG2
            + Res
        )
        lnpsb_minus = lnpsb + 0.5 * (nat1_minus**2 - nat1_plus**2) / nat2
        lnp = jnp.concatenate(
            [jnp.zeros_like(lnpsb[..., :1]), jnp.cumsum(lnpsb_minus, -1)], -1
        )
        return lnp.at[..., :-1].add(lnpsb)

    @highest_precision
    def predict_2(self, X):
        lnpsb = self.log_predict_2(X)
        psb = jnp.exp(lnpsb - lnpsb.max(-1, keepdims=True))
        return psb / psb.sum(-1, keepdims=True)

    @highest_precision
    def log_forward(self, pX):
        """log p(z|pX) via Elog_like_given_pX_pY at each one-hot class
        (reference MNLR.log_forward:253-258)."""
        sample_shape = pX.shape[:-2]
        Yt = jnp.eye(self.n + 1)
        Yt = Yt.reshape((self.n + 1,) + (1,) * len(sample_shape) + (self.n + 1,))
        out = self.Elog_like_given_pX_pY(pX, Yt)
        return jnp.moveaxis(out, 0, -1)

    def loggeomean(self, X):
        return self.log_predict(X)

    @highest_precision
    def predict(self, X):
        lnpsb = self.log_predict(X)
        psb = jnp.exp(lnpsb - lnpsb.max(-1, keepdims=True))
        return psb / psb.sum(-1, keepdims=True)

    @highest_precision
    def forward(self, pX):
        lnpsb = self.log_forward(pX)
        psb = jnp.exp(lnpsb - lnpsb.max(-1, keepdims=True))
        return psb / psb.sum(-1, keepdims=True)

    # -- bookkeeping -----------------------------------------------------------------
    def KLqprior(self):
        KL = self.beta.KLqprior()
        for _ in range(self.event_dim - 2):
            KL = KL.sum(-1)
        return KL

    def ELBO(self, X=None, Y=None):
        if X is not None:
            return self.Elog_like(X, Y).sum() - self.KLqprior()
        return self.ELBO_last

    def weights(self):
        mu = self.beta.mean()[..., :-1, 0] if self.pad_X else self.beta.mean()[..., 0]
        return 2 * mu - jnp.cumsum(mu, -2)
