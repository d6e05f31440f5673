"""Nonlinear regression family (reference transforms/NLRegression_full_rank.py,
NLRegression_low_rank.py, NLRegression_Multinomial.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ._fused import fused_fit as _fused_fit, record_elbos as _record_elbos
from ..dists import Dirichlet, NormalGamma, NormalInverseWishart
from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..utils.linalg import mT, psd_inv, psd_logdet
from .matrix_normal_gamma import MatrixNormalGamma
from .matrix_normal_wishart import MatrixNormalWishart
from .mnlr import MultiNomialLogisticRegression


class NLRegression_full_rank:
    """z ~ Cat(pi); x|z ~ NIW; y|x,z ~ MNW (reference NLRegression_full_rank)."""

    def __init__(self, n, p, mixture_dim, batch_shape=(), independent=False, key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.independent = independent
        self.A = MatrixNormalWishart.create(
            (n, p),
            tuple(batch_shape) + (mixture_dim,),
            scale=mixture_dim ** (-1.0 / n),
            pad_X=True,
            key=key,
        )
        if independent:
            self.X = NormalGamma.create((p,), tuple(batch_shape) + (mixture_dim,), key=jr.fold_in(key, 1))
        else:
            self.X = NormalInverseWishart.create((p,), tuple(batch_shape) + (mixture_dim,), key=jr.fold_in(key, 1))
        self.pi = Dirichlet.create((mixture_dim,), tuple(batch_shape), key=jr.fold_in(key, 2))
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []

    def _vb_step(self, nodes, X, Xv, Yv, lr):
        """One VB sweep as a pure function of the node pytree (reference
        NLRegression_full_rank.raw_update:30-52 body)."""
        A, Xn, pi = nodes
        log_p = A.Elog_like(Xv, Yv) + Xn.Elog_like(X) + pi.loggeomean()
        logZ = jax.scipy.special.logsumexp(log_p, -1, keepdims=True)
        log_p = log_p - log_p.max(-1, keepdims=True)
        p = jnp.exp(log_p)
        p = p / p.sum(-1, keepdims=True)
        NA = p.sum(0)
        KL = A.KLqprior().sum(-1) + Xn.KLqprior().sum(-1) + pi.KLqprior()
        ELBO = jnp.sum(logZ.sum(0) - KL)
        pi = pi.ss_update(NA, lr)
        A = A.raw_update(Xv, Yv, p=p, lr=lr)
        Xn = Xn.raw_update(X, p=p, lr=lr)
        return (A, Xn, pi), (ELBO, logZ, p, NA)

    def raw_update(self, X, Y, iters=1, lr=1.0, verbose=False):
        for _ in range(self.batch_dim + 1):
            X = X[..., None, :]
            Y = Y[..., None, :]
        Xv = X[..., None]
        Yv = Y[..., None]
        (self.A, self.X, self.pi), (self.logZ, self.p, self.NA), ELBOs = (
            _fused_fit(self, self._vb_step, (self.A, self.X, self.pi),
                       int(iters), X, Xv, Yv, lr=lr)
        )
        _record_elbos(self, ELBOs, verbose)

    def predict(self, X):
        log_p = self.X.Elog_like(X[..., None, :]) + self.pi.loggeomean()
        log_p = log_p - log_p.max(-1, keepdims=True)
        p = jnp.exp(log_p)
        p = p / p.sum(-1, keepdims=True)
        EinvUX = self.A.EinvUX()
        if self.A.pad_X:
            invSigmamu_y = EinvUX[..., :-1] @ X[..., None, :, None] + EinvUX[..., -1:]
        else:
            invSigmamu_y = EinvUX @ X[..., None, :, None]
        pv = p[..., None, None]
        invSigma_y = (self.A.EinvSigma() * pv).sum(-3)
        invSigmamu_y = (invSigmamu_y * pv).sum(-3)
        Sigma_y = psd_inv(invSigma_y)
        mu_y = Sigma_y @ invSigmamu_y
        return MVN_vf(mu=mu_y, Sigma=Sigma_y), p

    forward = predict

    def ELBO(self):
        return self.logZ.sum(0) - self.KLqprior()

    def KLqprior(self):
        return (
            self.A.KLqprior().sum(-1)
            + self.X.KLqprior().sum(-1)
            + self.pi.KLqprior()
        )


class NLRegression_low_rank:
    """Low-rank NL regression with shared W: u|z ~ NG, x|u ~ MNW(W), y|u,z ~ MNW(A)
    (reference NLRegression_low_rank)."""

    def __init__(self, n, p, hidden_dim, mixture_dim, batch_shape=(), independent=False, key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.hidden_dim = hidden_dim
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.mixture_dim = mixture_dim
        self.independent = independent
        cls = MatrixNormalGamma if independent else MatrixNormalWishart
        self.W = cls.create((p, hidden_dim), tuple(batch_shape) + (1,), key=key)
        self.A = MatrixNormalWishart.create(
            (n, hidden_dim + 1),
            tuple(batch_shape) + (mixture_dim,),
            scale=mixture_dim ** (-1.0 / n),
            key=jr.fold_in(key, 1),
        )
        self.U = NormalGamma.create((hidden_dim,), tuple(batch_shape) + (mixture_dim,), key=jr.fold_in(key, 2))
        self.pi = Dirichlet.create((mixture_dim,), tuple(batch_shape), key=jr.fold_in(key, 3))
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []

    def _vb_step(self, nodes, Xv, Yv, SExx, lr):
        """One VB sweep as a pure function of the node pytree (reference
        NLRegression_low_rank.raw_update:41-103 body)."""
        A, W, U, pi = nodes
        AXT = A.EXTinvUX()
        AXU = A.EXTinvU()
        invSigma_u_u = U.EinvSigma() + AXT[..., :-1, :-1] + W.EXTinvUX()
        invSigmamu_u = (
            U.EinvSigmamu()[..., None]
            + AXU[..., :-1, :] @ Yv
            - AXT[..., :-1, -1:]
            + W.EXTinvU() @ Xv
        )
        Sigma_u_u = psd_inv(invSigma_u_u)
        mu_u = Sigma_u_u @ invSigmamu_u

        logZ = (
            -0.5 * mT(Yv) @ A.EinvSigma() @ Yv
            - 0.5 * mT(Xv) @ W.EinvSigma() @ Xv
            - 0.5 * AXT[..., -1:, -1:]
            + AXU[..., -1:, :] @ Yv
            + 0.5 * mT(mu_u) @ invSigma_u_u @ mu_u
        )
        logZ = (
            logZ[..., 0, 0]
            + 0.5 * A.ElogdetinvSigma()
            + 0.5 * U.ElogdetinvSigma()
            + 0.5 * W.ElogdetinvSigma()
            - 0.5 * psd_logdet(invSigma_u_u)
            - 0.5 * U.EXTinvUX()
        )
        log_p = logZ + pi.loggeomean()
        shift = log_p.max(-1, keepdims=True)
        logZt = (
            jax.scipy.special.logsumexp(log_p - shift, -1, keepdims=True) + shift
        )[..., 0]
        p = jnp.exp(log_p - shift)
        p = p / p.sum(-1, keepdims=True)

        SEuu = Sigma_u_u + mu_u @ mT(mu_u)
        SEux = mu_u @ mT(Xv)
        SEu1u1 = jnp.concatenate([SEuu, mu_u], -1)
        mu_u1 = jnp.concatenate(
            [mu_u, jnp.ones(mu_u.shape[:-2] + (1, 1), mu_u.dtype)], -2
        )
        SEu1u1 = jnp.concatenate([SEu1u1, mT(mu_u1)], -2)
        SEyy = Yv @ mT(Yv)
        SEyu1 = Yv @ mT(mu_u1)

        NA = p.sum(0)
        pv = p[..., None, None]
        SEu = (mu_u * pv).sum(0)
        SEuu = (SEuu * pv).sum(0)
        SEux = (SEux * pv).sum(0)
        SEu1u1 = (SEu1u1 * pv).sum(0)
        SEyy = (SEyy * pv).sum(0)
        SEyu1 = (SEyu1 * pv).sum(0)

        KL = (
            A.KLqprior().sum(-1)
            + W.KLqprior().sum(-1)
            + U.KLqprior().sum(-1)
            + pi.KLqprior()
        )
        ELBO = jnp.sum(logZt.sum(0) - KL)
        pi = pi.ss_update(NA, lr)
        A = A.ss_update(SEu1u1, SEyu1, SEyy, NA, lr)
        W = W.ss_update(
            SEuu.sum(-3, keepdims=True),
            mT(SEux.sum(-3, keepdims=True)),
            SExx,
            NA.sum(-1, keepdims=True),
            lr,
        )
        U = U.ss_update(
            jnp.diagonal(SEuu, axis1=-1, axis2=-2), SEu[..., 0], NA, lr
        )
        return (A, W, U, pi), (ELBO, logZt, p, NA)

    def raw_update(self, X, Y, iters=1, lr=1.0, verbose=False):
        for _ in range(self.batch_dim + 1):
            X = X[..., None, :]
            Y = Y[..., None, :]
        Xv = X[..., None]
        Yv = Y[..., None]
        if self.independent:
            SExx = (Xv**2).sum(0)[..., 0]
        else:
            SExx = (Xv @ mT(Xv)).sum(0)
        (self.A, self.W, self.U, self.pi), (self.logZ, self.p, self.NA), ELBOs = (
            _fused_fit(self, self._vb_step, (self.A, self.W, self.U, self.pi),
                       int(iters), Xv, Yv, SExx, lr=lr)
        )
        _record_elbos(self, ELBOs, verbose)

    def predict(self, X):
        for _ in range(self.batch_dim + 1):
            X = X[..., None, :]
        Xv = X[..., None]
        invSigma_u_u = self.U.EinvSigma() + self.W.EXTinvUX()
        invSigmamu_u = self.U.EinvSigmamu()[..., None] + self.W.EXTinvU() @ Xv
        Sigma_u_u = psd_inv(invSigma_u_u)
        mu_u = Sigma_u_u @ invSigmamu_u

        logZ = -0.5 * mT(Xv) @ self.W.EinvSigma() @ Xv + 0.5 * mT(mu_u) @ invSigma_u_u @ mu_u
        logZ = (
            logZ[..., 0, 0]
            + 0.5 * self.U.ElogdetinvSigma()
            + 0.5 * self.W.ElogdetinvSigma()
            - 0.5 * psd_logdet(invSigma_u_u)
            - 0.5 * self.U.EXTinvUX()
        )
        log_p = logZ + self.pi.loggeomean()
        shift = log_p.max(-1, keepdims=True)
        logZt = jax.scipy.special.logsumexp(log_p - shift, -1, keepdims=True) + shift
        p = jnp.exp(log_p - logZt)
        mu_u1 = jnp.concatenate(
            [mu_u, jnp.ones(mu_u.shape[:-2] + (1, 1), mu_u.dtype)], -2
        )
        mu_y = self.A.mu @ mu_u1
        Sigma_y = (
            self.A.mu[..., :, :-1] @ Sigma_u_u @ mT(self.A.mu[..., :, :-1])
            + self.A.ESigma()
        )
        pv = p[..., None, None]
        Sigma_y = ((Sigma_y + mu_y @ mT(mu_y)) * pv).sum(-3)
        mu_y = (mu_y * pv).sum(-3)
        Sigma_y = Sigma_y - mu_y @ mT(mu_y)
        return MVN_vf(mu=mu_y, Sigma=Sigma_y), p, mu_u[..., 0]

    forward = predict

    def ELBO(self):
        return self.logZ.sum(0) - self.KLqprior()

    def KLqprior(self):
        return (
            self.A.KLqprior().sum(-1)
            + self.W.KLqprior().sum(-1)
            + self.U.KLqprior().sum(-1)
            + self.pi.KLqprior()
        )


class NLRegression_Multinomial:
    """z ~ MNLR(x); y|z,x ~ MNW (reference NLRegression_Multinomial;
    self-describes as superseded by dMixtureofLinearTransforms)."""

    def __init__(self, n, p, mixture_dim, batch_shape=(), key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.event_dim = 2
        self.n, self.p, self.mixture_dim = n, p, mixture_dim
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []
        self.A = MatrixNormalWishart.create(
            (n, p),
            tuple(batch_shape) + (mixture_dim,),
            scale=1.0 / mixture_dim ** (1.0 / n),
            pad_X=True,
            key=key,
        )
        self.Z = MultiNomialLogisticRegression(
            mixture_dim, p, batch_shape=tuple(batch_shape), pad_X=True, key=jr.fold_in(key, 1)
        )

    def _vb_step(self, nodes, X, AX, AY, lr):
        """One VB sweep as a pure function of (A, Z.beta) (reference
        NLRegression_Multinomial.raw_update:25-45 body)."""
        A, zbeta = nodes
        Z = self.Z.with_beta(zbeta)
        log_p = A.Elog_like(AX, AY) + Z.log_predict(X)
        shift = log_p.max(-1, keepdims=True)
        logZ = shift[..., 0] + jax.scipy.special.logsumexp(log_p - shift, -1)
        p = jnp.exp(log_p - shift)
        p = p / p.sum(-1, keepdims=True)
        NA = p.sum(0)
        ELBO = logZ.sum() - (A.KLqprior().sum(-1) + Z.KLqprior())
        ELBO = jnp.sum(ELBO)
        A = A.raw_update(AX, AY, p=p, lr=lr)
        zbeta = Z.raw_update_beta(zbeta, X, p, lr=lr)
        return (A, zbeta), (ELBO, logZ, p, NA)

    def raw_update(self, X, Y, iters=1, lr=1.0, verbose=False):
        AX = X[..., None]
        AY = Y[..., None]
        AX = AX.reshape(AX.shape[:-2] + (self.batch_dim + 1) * (1,) + AX.shape[-2:])
        AY = AY.reshape(AY.shape[:-2] + (self.batch_dim + 1) * (1,) + AY.shape[-2:])
        (self.A, zbeta), (self.logZ, self.p, self.NA), ELBOs = _fused_fit(
            self, self._vb_step, (self.A, self.Z.beta), int(iters), X, AX, AY,
            lr=lr,
        )
        self.Z.beta = zbeta
        _record_elbos(self, ELBOs, verbose)

    def predict(self, X):
        p = self.Z.predict(X)
        pv = p[..., None, None]
        pY = self.A.predict(X[..., None, :, None])[0]
        mu = (pY.mean() * pv).sum(-3)
        Sigma = (pY.EXXT() * pv).sum(-3) - mu @ mT(mu)
        return MVN_vf(mu=mu, Sigma=Sigma), p

    def ELBO(self):
        return self.logZ - self.KLqprior()

    def KLqprior(self):
        return self.A.KLqprior().sum(-1) + self.Z.KLqprior()


class NLRegression_orig:
    """Legacy low-rank NL regression with the row-noise Wishart SHARED between
    the latent prior q(u|z)=NIW and the encoder W (reference
    transforms/NLRegression_orig.py:10-145; not exported by the reference's
    __init__ but listed in its source inventory).

    Generative model: u|x,z ~ N(mu_z + W x, Sigma_uu), y|u,z ~ N(A_z [u;1],
    Sigma_z). q(Sigma_uu) is shared between mu_z and W, so U is created with
    fixed_precision and its invU node is re-attached to W's after every W
    update (the reference aliases the objects; here the functional update
    re-binds).
    """

    def __init__(self, n, p, hidden_dim, mixture_dim, batch_shape=(), key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.hidden_dim = hidden_dim
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.n, self.p, self.mixture_dim = n, p, mixture_dim
        self.W = MatrixNormalWishart.create(
            (hidden_dim, p), tuple(batch_shape) + (1,), key=key
        )
        self.A = MatrixNormalWishart.create(
            (n, hidden_dim + 1),
            tuple(batch_shape) + (mixture_dim,),
            key=jr.fold_in(key, 1),
        )
        self.U = NormalInverseWishart.create(
            (hidden_dim,),
            tuple(batch_shape) + (mixture_dim,),
            fixed_precision=True,
            key=jr.fold_in(key, 2),
        )
        self.U = jax.tree_util.tree_map(lambda x: x, self.U)
        self._share_invU()
        self.pi = Dirichlet.create(
            (mixture_dim,), tuple(batch_shape), key=jr.fold_in(key, 3)
        )
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []

    def _share_invU(self):
        """q(Sigma_uu) is shared: U's precision node IS W's
        (reference NLRegression_orig.py:33)."""
        from ..utils.jaxutils import replace

        self.U = replace(self.U, invU=self.W.invU)

    def _vb_step(self, nodes, Xv, Yv, SExx, lr):
        """One VB sweep as a pure function of (W, A, U, pi) (reference
        NLRegression_orig.py:21-106 body; the shared q(Sigma_uu) re-bind
        happens inside the step)."""
        from ..utils.jaxutils import replace

        W, A, U, pi = nodes
        U = replace(U, invU=W.invU)  # the reference aliases the objects
        AXT = A.EXTinvUX()
        AXU = A.EXTinvU()
        invSigma_u_u = W.EinvSigma() + AXT[..., :-1, :-1]
        invSigmamu_u = (
            U.EinvSigmamu()[..., None]
            + W.EinvUX() @ Xv
            + AXU[..., :-1, :] @ Yv
            - AXT[..., :-1, -1:]
        )
        Sigma_u_u = psd_inv(invSigma_u_u)
        mu_u = Sigma_u_u @ invSigmamu_u

        Res = (
            -0.5 * mT(Yv) @ A.EinvSigma() @ Yv
            - 0.5 * AXT[..., -1:, -1:]
            + AXU[..., -1:, :] @ Yv
        )
        Res = (
            Res
            - 0.5 * mT(Xv) @ W.EXTinvUX() @ Xv
            - U.mean()[..., None, :] @ W.EinvUX() @ Xv
            + 0.5 * mT(mu_u) @ invSigmamu_u
        )
        Res = (
            Res[..., 0, 0]
            + 0.5 * A.ElogdetinvSigma()
            + 0.5 * W.ElogdetinvSigma()
            - 0.5 * psd_logdet(invSigma_u_u)
            - 0.5 * U.EXTinvUX()
            - 0.5 * self.n * jnp.log(2 * jnp.pi)
        )
        log_p = Res + pi.loggeomean()
        shift = log_p.max(-1, keepdims=True)
        logZk = (
            jax.scipy.special.logsumexp(log_p - shift, -1, keepdims=True) + shift
        )
        log_p = log_p - logZk
        pr = jnp.exp(log_p)
        logZ = logZk[..., 0].sum(0)
        NA = pr.sum(0)

        # U.KLqprior includes the shared invU KL (broadcast over mixture);
        # the reference subtracts it once "because invU is shared with W"
        # (NLRegression_orig.py:139-141)
        KL = (
            A.KLqprior().sum(-1)
            + W.KLqprior().sum(-1)
            + U.KLqprior().sum(-1)
            + pi.KLqprior()
            - U.invU.KLqprior().sum(-1)
        )
        ELBO = jnp.sum(logZ.sum() - KL)

        pi = pi.ss_update(NA, lr)

        pv = pr[..., None, None]
        NAv = NA[..., None, None]
        SEuu = ((Sigma_u_u + mu_u @ mT(mu_u)) * pv).sum(0)
        SEu = (mu_u * pv).sum(0)
        SEu1u1 = jnp.concatenate([SEuu, SEu], -1)
        SEu1 = jnp.concatenate([SEu, NAv], -2)
        SEu1u1 = jnp.concatenate([SEu1u1, mT(SEu1)], -2)
        SEyy = ((Yv @ mT(Yv)) * pv).sum(0)
        SEyu1 = jnp.concatenate(
            [((Yv @ mT(mu_u)) * pv).sum(0), (Yv * pv).sum(0)], -1
        )
        A = A.ss_update(SEu1u1, SEyu1, SEyy, NA, lr)

        # U's mean updates manually; its covariance rides along with W
        # (reference NLRegression_orig.py:90-101)
        SEx = (Xv * pv).sum(0)
        ubar = U.mean()[..., None]
        SEdux = (((mu_u - ubar) @ mT(Xv)) * pv).sum(0).sum(-3, keepdims=True)
        SEdudu = (
            SEuu
            - SEu @ mT(ubar)
            - ubar @ mT(SEu)
            + ubar @ mT(ubar) * NAv
        ).sum(-3, keepdims=True)
        mu = (
            SEu[..., 0]
            - (W.mean() @ SEx)[..., 0]
            + U.mu_0 * U.lambda_mu_0[..., None]
        ) / (U.lambda_mu_0[..., None] + NA[..., None])
        W = W.ss_update(SExx, SEdux, SEdudu, NA.sum(-1, keepdims=True), lr)
        U = replace(
            U,
            lambda_mu=U.lambda_mu + lr * (NA + U.lambda_mu_0 - U.lambda_mu),
            mu=U.mu + lr * (mu - U.mu),
            invU=W.invU,
        )
        return (W, A, U, pi), (ELBO, logZ, pr, NA)

    def raw_update(self, X, Y, iters=1, lr=1.0, verbose=False):
        for _ in range(self.batch_dim + 1):
            X = X[..., None, :]
            Y = Y[..., None, :]
        Xv = X[..., None]
        Yv = Y[..., None]
        SExx = (Xv @ mT(Xv)).sum(0)
        (self.W, self.A, self.U, self.pi), (self.logZ, self.p, self.NA), ELBOs = (
            _fused_fit(self, self._vb_step, (self.W, self.A, self.U, self.pi),
                       int(iters), Xv, Yv, SExx, lr=lr)
        )
        _record_elbos(self, ELBOs, verbose)

    def predict(self, X):
        # single mixture-axis unsqueeze (reference NLRegression_orig.py:108
        # assumes X is already batch-consistent)
        X = X[..., None, :]
        Xv = X[..., None]
        invSigma_u_u = self.W.EinvSigma()
        invSigmamu_u = (
            self.W.EinvSigma() @ self.U.mean()[..., None] + self.W.EinvUX() @ Xv
        )
        Sigma_u_u = psd_inv(invSigma_u_u)
        mu_u = Sigma_u_u @ invSigmamu_u

        Res = (
            -0.5 * mT(Xv) @ self.W.EXTinvUX() @ Xv
            - self.U.mean()[..., None, :] @ self.W.EinvUX() @ Xv
            + 0.5 * mT(mu_u) @ invSigmamu_u
        )
        Res = (
            Res[..., 0, 0]
            + 0.5 * self.W.ElogdetinvSigma()
            - 0.5 * psd_logdet(invSigma_u_u)
            - 0.5 * self.U.EXTinvUX()
        )
        log_p = Res + self.pi.loggeomean()
        log_p = log_p - log_p.max(-1, keepdims=True)
        p = jnp.exp(log_p)
        p = p / p.sum(-1, keepdims=True)

        mu_u1 = jnp.concatenate(
            [mu_u, jnp.ones(mu_u.shape[:-2] + (1, 1), mu_u.dtype)], -2
        )
        mu_y = self.A.mean() @ mu_u1
        Sigma_y = self.A.ESigma() + self.A.mean()[..., :-1] @ Sigma_u_u @ mT(
            self.A.mean()[..., :-1]
        )
        pv = p[..., None, None]
        Sigma_y = ((Sigma_y + mu_y @ mT(mu_y)) * pv).sum(-3)
        mu_y = (mu_y * pv).sum(-3)
        Sigma_y = Sigma_y - mu_y @ mT(mu_y)
        return MVN_vf(mu=mu_y, Sigma=Sigma_y), p

    forward = predict

    def ELBO(self):
        return self.logZ.sum() - self.KLqprior()

    def KLqprior(self):
        # U.KLqprior includes the shared invU KL (broadcast over mixture);
        # the reference subtracts it once "because invU is shared with W"
        # (NLRegression_orig.py:139-141)
        KL = (
            self.A.KLqprior().sum(-1)
            + self.W.KLqprior().sum(-1)
            + self.U.KLqprior().sum(-1)
        )
        return KL + self.pi.KLqprior() - self.U.invU.KLqprior().sum(-1)
