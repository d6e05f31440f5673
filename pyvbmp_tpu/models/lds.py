"""Variational Bayesian linear dynamical systems: information-form Kalman
filter + RTS smoother with exact logZ residual bookkeeping
(reference models/LinearDynamicalSystems.py).

  y_t = B [x_t; r_t] + eps_t        (obs_model: MatrixNormalWishart)
  x_t = A [x_{t-1}; u_t] + eta_t    (A: MNW 'shared' noise or MNG 'independent')

TPU-native redesign: the reference's sequential python loops over T
(LinearDynamicalSystems.py:358-377) become two ``lax.scan``s whose bodies are
batched hidden_dim x hidden_dim Cholesky solves; the whole VB-EM iteration is
one jitted pure function.

Compat note: the reference's smoother cross-covariance line
(LinearDynamicalSystems.py:371,379) contains ``QA @ Sigma * QA.T`` — an
*elementwise* product where the math calls for ``@``.  ``cross_cov_compat=True``
(default) reproduces it bit-for-bit for ELBO-trajectory parity;
``cross_cov_compat=False`` uses the correct matrix product.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..dists import NormalInverseWishart
from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..transforms import MatrixNormalGamma, MatrixNormalWishart
from ..utils import math as um
from ..utils.jaxutils import sum_leading
from ..utils.linalg import (
    mT,
    psd_inv,
    psd_inv_and_logdet,
    psd_logdet,
    psd_solve,
    sym_inv,
    sym_inv_and_logdet,
)
from ..utils.rng import key_or_next


class LinearDynamicalSystems:
    def __init__(
        self,
        obs_shape,
        hidden_dim,
        control_dim=0,
        regression_dim=0,
        obs_model=None,
        latent_noise="independent",
        batch_shape=(),
        A_mask=None,
        B_mask=None,
        cross_cov_compat=True,
        parallel_scan=False,
        time_mesh=None,
        key=None,
    ):
        import jax.random as jr

        control_dim = control_dim + 1
        regression_dim = regression_dim + 1
        self.obs_shape = tuple(obs_shape)
        self.obs_dim = obs_shape[-1]
        self.hidden_dim = hidden_dim
        self.latent_noise = latent_noise
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.control_dim = control_dim
        self.regression_dim = regression_dim
        self.event_dim = len(obs_shape)
        self.cross_cov_compat = cross_cov_compat
        self.parallel_scan = parallel_scan
        # sequence parallelism: a Mesh with a "seq" axis shards the TIME
        # axis of the smoother scans (parallel/seq_parallel.py); implies the
        # corrected cross-covariance math like parallel_scan
        self.time_mesh = time_mesh
        self.logZ = jnp.asarray(0.0)
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []
        self._jit_cache = {}

        if A_mask is not None:
            A_mask = np.concatenate(
                [np.asarray(A_mask), np.ones(np.asarray(A_mask).shape[:-1] + (1,))], -1
            ) > 0
        if B_mask is not None:
            B_mask = jnp.concatenate(
                [jnp.asarray(B_mask), jnp.ones(jnp.asarray(B_mask).shape[:-1] + (1,), bool)],
                -1,
            )

        offset = (1,) * (len(obs_shape) - 1)
        self.offset = offset
        self.expand_to_batch = False

        key = key_or_next(key)
        self.x0 = NormalInverseWishart.create(
            offset + (hidden_dim,), batch_shape, key=key
        )
        if latent_noise == "shared":
            self.A = MatrixNormalWishart.create(
                offset + (hidden_dim, hidden_dim + control_dim),
                batch_shape,
                pad_X=False,
                mask=A_mask,
                key=jr.fold_in(key, 1),
            )
        else:
            self.A = MatrixNormalGamma.create(
                offset + (hidden_dim, hidden_dim + control_dim),
                batch_shape,
                pad_X=False,
                mask=A_mask,
                key=jr.fold_in(key, 1),
            )
        if obs_model is None:
            self.obs_model = MatrixNormalWishart.create(
                self.obs_shape + (hidden_dim + regression_dim,),
                batch_shape,
                mask=B_mask,
                pad_X=False,
                key=jr.fold_in(key, 2),
            )
        else:
            self.obs_model = obs_model
        self.px = None

    # ------------------------------------------------------------------ inputs
    def reshape_inputs(self, y, u=None, r=None):
        """Vectorize and pad controls/regressors with ones
        (reference LinearDynamicalSystems.py:56-83)."""
        sample_shape = y.shape[: y.ndim - len(self.obs_shape)]
        y = y[..., None]
        if u is None:
            u = jnp.ones(sample_shape + (self.control_dim, 1), y.dtype)
        else:
            u = jnp.concatenate([u, jnp.ones(u.shape[:-1] + (1,), u.dtype)], -1)[
                ..., None
            ]
        if r is None:
            r = jnp.ones(
                sample_shape + self.obs_shape[:-1] + (self.regression_dim, 1), y.dtype
            )
        else:
            r = jnp.concatenate([r, jnp.ones(r.shape[:-1] + (1,), r.dtype)], -1)[
                ..., None
            ]
        if self.expand_to_batch:
            ns = len(sample_shape)
            for _ in range(len(self.batch_shape)):
                y = jnp.expand_dims(y, ns)
                u = jnp.expand_dims(u, ns)
                r = jnp.expand_dims(r, ns)
            y = jnp.broadcast_to(
                y, sample_shape + self.batch_shape + self.obs_shape + (1,)
            )
            u = jnp.broadcast_to(
                u, sample_shape + self.batch_shape + (self.control_dim, 1)
            )
            r = jnp.broadcast_to(
                r,
                sample_shape
                + self.batch_shape
                + self.obs_shape[:-1]
                + (self.regression_dim, 1),
            )
        for _ in range(len(self.offset)):
            u = jnp.expand_dims(u, -3)
        return y, u, r

    # ------------------------------------------------------ latent-param blocks
    def _latent_parms(self, A):
        invQ = A.EinvSigma()
        ATQA = A.EXTinvUX()
        h = self.hidden_dim
        QA = A.EinvUX()
        return dict(
            invQ=invQ,
            ATQA_x_x=ATQA[..., :h, :h],
            ATQA_x_u=ATQA[..., :h, h:],
            ATQA_u_u=ATQA[..., h:, h:],
            QA_xp_x=QA[..., :, :h],
            QA_xp_u=QA[..., :, h:],
            ElogdetinvQ=A.ElogdetinvSigma(),
        )

    def set_latent_parms(self):
        # retained for reference-API compatibility; parameters are recomputed
        # functionally inside the jitted step.
        pass

    # --------------------------------------------------------------- likelihoods
    def log_likelihood_function(self, obs_model, Y, R):
        """Per-time information-form observation messages
        (reference LinearDynamicalSystems.py:244-266)."""
        h = self.hidden_dim
        invR = obs_model.EinvSigma()
        BTRB = obs_model.EXTinvUX()
        BTRB_xp_xp = BTRB[..., :h, :h]
        BTRB_xp_r = BTRB[..., :h, h:]
        BTRB_r_r = BTRB[..., h:, h:]
        BTR = obs_model.EXTinvU()
        BTR_xp_y = BTR[..., :h, :]
        BTR_r_y = BTR[..., h:, :]

        invSigma_t_t = BTRB_xp_xp
        invSigmamu_t = BTR_xp_y @ Y - BTRB_xp_r @ R
        Residual = (
            -0.5 * mT(Y) @ invR @ Y - 0.5 * mT(R) @ BTRB_r_r @ R + mT(R) @ BTR_r_y @ Y
        )
        Residual = (
            Residual[..., 0, 0]
            + 0.5 * obs_model.ElogdetinvSigma()
            - 0.5 * self.obs_dim * um.LOG2PI
        )
        for i in range(len(self.obs_shape) - 1):
            invSigma_t_t = invSigma_t_t.sum(-3 - i, keepdims=True)
            invSigmamu_t = invSigmamu_t.sum(-3 - i, keepdims=True)
            Residual = Residual.sum(-1 - i, keepdims=True)
        sample_shape = invSigmamu_t.shape[:-2]
        invSigma_t_t = jnp.broadcast_to(invSigma_t_t, sample_shape + (h, h))
        return invSigma_t_t, invSigmamu_t, Residual

    # ------------------------------------------------------------ forward/backward
    def forward_backward_loop(self, parms, x0, like, u):
        """Two lax.scans implementing the reference python loops (:332-383).

        like = (invSigma_like, invSigmamu_like, Residual_like), each (T,)+...
        Returns px (smoothed), Sigma_cross[t]=Sigma_{t,t+1} for t=0..T-2,
        Sigma_x0_cross = Sigma_{x0,x0+1}-analogue (ref Sigma_t_tp1[-1]),
        Sigma_x0_x0, mu_x0, logZ (T,)+...
        """
        invSigma_like, invSigmamu_like, Residual_like = like
        h = self.hidden_dim
        invQ = parms["invQ"]
        ATQA_x_x = parms["ATQA_x_x"]
        ATQA_x_u = parms["ATQA_x_u"]
        ATQA_u_u = parms["ATQA_u_u"]
        QA_xp_x = parms["QA_xp_x"]
        QA_xp_u = parms["QA_xp_u"]

        invSigma0 = x0.EinvSigma()
        invSigmamu0 = x0.EinvSigmamu()[..., None]
        Residual0 = (
            -0.5 * x0.EXTinvUX()
            + 0.5 * x0.ElogdetinvSigma()
            - 0.5 * h * um.LOG2PI
        )

        def fwd_step(carry, inputs):
            invSigma, invSigmamu, Residual = carry
            iS_like, iSm_like, Res_like, U = inputs
            # straight-line symmetric inverse: looped Cholesky per scan step
            # is latency-bound on TPU (this swap makes the sequential smoother
            # competitive with -- and at small batch faster than -- the
            # parallel associative scan)
            SigmaStar, logdet_invSigmaStar = sym_inv_and_logdet(invSigma + ATQA_x_x)
            logdetSigmaStar = -logdet_invSigmaStar
            invSigmamu_t = iSm_like + QA_xp_u @ U
            invSigmamu_tm1 = invSigmamu - ATQA_x_u @ U
            invSigma_new = (
                iS_like + invQ - QA_xp_x @ SigmaStar @ mT(QA_xp_x)
            )
            invSigmamu_new = invSigmamu_t + QA_xp_x @ SigmaStar @ invSigmamu_tm1
            Residual = (
                Residual
                + Res_like
                - 0.5 * (mT(U) @ ATQA_u_u @ U)[..., 0, 0]
                + 0.5 * parms["ElogdetinvQ"]
            )
            Residual = (
                Residual
                + 0.5 * (mT(invSigmamu_tm1) @ SigmaStar @ invSigmamu_tm1)[..., 0, 0]
                + 0.5 * logdetSigmaStar
            )
            Sigma_new, logdet_new = sym_inv_and_logdet(invSigma_new)
            mu = Sigma_new @ invSigmamu_new
            post_Residual = (
                -0.5 * (mu * invSigmamu_new)[..., 0].sum(-1)
                + 0.5 * logdet_new
                - 0.5 * h * um.LOG2PI
            )
            logZ_t = Residual - post_Residual
            return (invSigma_new, invSigmamu_new, post_Residual), (
                invSigma_new,
                invSigmamu_new,
                logZ_t,
                SigmaStar,
            )

        bshape = jnp.broadcast_shapes(
            invSigma0.shape, invSigma_like.shape[1:]
        )
        carry0 = (
            jnp.broadcast_to(invSigma0, bshape),
            jnp.broadcast_to(invSigmamu0, bshape[:-1] + (1,)),
            jnp.broadcast_to(Residual0, bshape[:-2]),
        )
        _, (fw_invSigma, fw_invSigmamu, logZ, SigmaStar) = jax.lax.scan(
            fwd_step, carry0, (invSigma_like, invSigmamu_like, Residual_like, u)
        )

        # backward smoothing pass (reference :362-383)
        Sigma_T, mu_T = psd_inv(fw_invSigma[-1]), None
        mu_T = Sigma_T @ fw_invSigmamu[-1]

        cross_compat = self.cross_cov_compat

        def bwd_step(carry, inputs):
            invGamma, invGammamu = carry
            (iS_like_tp1, iSm_like_tp1, U_tp1, fw_iS_t, fw_iSm_t, SigmaStar_tp1) = inputs
            if cross_compat:
                corr = (QA_xp_x @ SigmaStar_tp1) * mT(QA_xp_x)
            else:
                corr = QA_xp_x @ SigmaStar_tp1 @ mT(QA_xp_x)
            # general inverse: the compat-path matrix is non-symmetric
            Sigma_cross_t = (
                SigmaStar_tp1
                @ mT(QA_xp_x)
                @ jnp.linalg.inv(invGamma + iS_like_tp1 + invQ - corr)
            )
            # backward_step (reference :296-303)
            Sigma_tp1_tp1 = sym_inv(invQ + iS_like_tp1 + invGamma)
            invGamma_new = ATQA_x_x - mT(QA_xp_x) @ Sigma_tp1_tp1 @ QA_xp_x
            invGammamu_new = -ATQA_x_u @ U_tp1 + mT(QA_xp_x) @ Sigma_tp1_tp1 @ (
                QA_xp_u @ U_tp1 + iSm_like_tp1 + invGammamu
            )
            invSigma_sm = fw_iS_t + invGamma_new
            invSigmamu_sm = fw_iSm_t + invGammamu_new
            Sigma_sm = sym_inv(invSigma_sm)
            mu_sm = Sigma_sm @ invSigmamu_sm
            return (invGamma_new, invGammamu_new), (
                Sigma_sm,
                mu_sm,
                invSigma_sm,
                invSigmamu_sm,
                Sigma_cross_t,
            )

        zeroG = jnp.zeros_like(fw_invSigma[-1])
        zeroGm = jnp.zeros_like(fw_invSigmamu[-1])
        (invGamma, invGammamu), (
            Sigma_sm,
            mu_sm,
            invSigma_sm,
            invSigmamu_sm,
            Sigma_cross,
        ) = jax.lax.scan(
            bwd_step,
            (zeroG, zeroGm),
            (
                invSigma_like[1:],
                invSigmamu_like[1:],
                u[1:],
                fw_invSigma[:-1],
                fw_invSigmamu[:-1],
                SigmaStar[1:],
            ),
            reverse=True,
        )

        # final x0 cross-covariance + posterior (reference :379-383)
        if cross_compat:
            corr0 = (QA_xp_x @ SigmaStar[0]) * mT(QA_xp_x)
        else:
            corr0 = QA_xp_x @ SigmaStar[0] @ mT(QA_xp_x)
        Sigma_x0_cross = (
            SigmaStar[0]
            @ mT(QA_xp_x)
            @ jnp.linalg.inv(invGamma + invSigma_like[0] + invQ - corr0)
        )
        Sigma_tp1_tp1 = psd_inv(invQ + invSigma_like[0] + invGamma)
        invGamma0 = ATQA_x_x - mT(QA_xp_x) @ Sigma_tp1_tp1 @ QA_xp_x
        invGammamu0 = -ATQA_x_u @ u[0] + mT(QA_xp_x) @ Sigma_tp1_tp1 @ (
            QA_xp_u @ u[0] + invSigmamu_like[0] + invGammamu
        )
        Sigma_x0_x0 = psd_inv(invGamma0 + x0.EinvSigma())
        mu_x0 = Sigma_x0_x0 @ (invGammamu0 + x0.EinvSigmamu()[..., None])

        px = MVN_vf(
            mu=jnp.concatenate([mu_sm, mu_T[None]], 0),
            Sigma=jnp.concatenate([Sigma_sm, Sigma_T[None]], 0),
            invSigmamu=jnp.concatenate([invSigmamu_sm, fw_invSigmamu[-1:]], 0),
            invSigma=jnp.concatenate([invSigma_sm, fw_invSigma[-1:]], 0),
        )
        return px, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, logZ

    # ----------------------------------------------------------- suff statistics
    def _latent_suffstats(self, px, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, SE_x0, y, u, r, logZ):
        """Time-integrated sufficient statistics
        (reference LinearDynamicalSystems.py:156-216)."""
        mu = px.mu
        Sigma = px.Sigma
        SE_x0_x0 = Sigma_x0_x0 + SE_x0 @ mT(SE_x0)

        def tsum_outer(a, b):
            """sum_t a_t b_t^T for (T,)+batch+(m,1) column stacks as ONE
            dot_general contracting T (MXU-sized contraction) instead of
            materializing the (T,)+batch+(m,n) outer products in HBM.

            precision=HIGHEST: TPU default feeds bf16 into the MXU; these are
            M-step statistics whose covariance updates cancel E[yy'] against
            ybar ybar' — the same class of silent collapse PARITY.md records
            for the MNLR fixed point."""
            shape = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
            a = jnp.broadcast_to(a, shape + a.shape[-2:])
            b = jnp.broadcast_to(b, shape + b.shape[-2:])
            return jnp.einsum(
                "t...io,t...jo->...ij", a, b, precision=jax.lax.Precision.HIGHEST
            )

        SE_x_x = tsum_outer(mu, mu) + Sigma.sum(0)
        SE_xp_xp = SE_x_x - (mu[-1] @ mT(mu[-1]) + Sigma[-1]) + SE_x0_x0
        SE_x_u = tsum_outer(mu, u)
        SE_xp_u = tsum_outer(mu[:-1], u[1:]) + SE_x0 @ mT(u[0])
        SE_xp_x = tsum_outer(mu[:-1], mu[1:]) + Sigma_cross.sum(0)
        SE_xp_x = SE_xp_x + SE_x0 @ mT(mu[0]) + Sigma_x0_cross
        SE_x_r = tsum_outer(mu, r)
        SE_x_y = tsum_outer(mu, y)
        SE_u_u = tsum_outer(u, u)
        SE_r_r = tsum_outer(r, r)
        SE_y_y = tsum_outer(y, y)
        SE_y_r = tsum_outer(y, r)

        sample_shape = y.shape[1 : y.ndim - self.event_dim - self.batch_dim - 1]
        SE_y_r = jnp.broadcast_to(
            SE_y_r,
            sample_shape + self.batch_shape + self.obs_shape + (self.regression_dim,),
        )
        SE_u_u = jnp.broadcast_to(
            SE_u_u,
            sample_shape
            + self.batch_shape
            + self.offset
            + (self.control_dim, self.control_dim),
        )
        SE_r_r = jnp.broadcast_to(
            SE_r_r,
            sample_shape
            + self.batch_shape
            + self.obs_shape[:-1]
            + (self.regression_dim, self.regression_dim),
        )

        T = y.shape[0] * jnp.ones(
            sample_shape + self.batch_shape + self.offset, y.dtype
        )
        N = jnp.ones(sample_shape + self.batch_shape + self.offset, y.dtype)
        SE_y_xr = jnp.concatenate([mT(SE_x_y), SE_y_r], -1)
        SE_xpu_xpu = jnp.concatenate(
            [
                jnp.concatenate([SE_xp_xp, SE_xp_u], -1),
                jnp.concatenate([mT(SE_xp_u), SE_u_u], -1),
            ],
            -2,
        )
        SE_x_xpu = jnp.concatenate([mT(SE_xp_x), SE_x_u], -1)
        SE_x_x_b = jnp.broadcast_to(SE_x_x, SE_x_r.shape[:-2] + SE_x_x.shape[-2:])
        SE_xr_xr = jnp.concatenate(
            [
                jnp.concatenate([SE_x_x_b, SE_x_r], -1),
                jnp.concatenate([mT(SE_x_r), SE_r_r], -1),
            ],
            -2,
        )
        logZ_out = logZ
        for _ in range(len(self.offset)):
            logZ_out = logZ_out[..., 0]
        logZ_out = logZ_out.sum(0)
        return dict(
            T=T,
            N=N,
            SE_x_x=SE_x_x,
            SE_x0_x0=SE_x0_x0,
            SE_x0=SE_x0,
            SE_y_xr=SE_y_xr,
            SE_y_y=SE_y_y,
            SE_xpu_xpu=SE_xpu_xpu,
            SE_x_xpu=SE_x_xpu,
            SE_xr_xr=SE_xr_xr,
            logZ=logZ_out,
        )

    def _smoother(self, parms, x0, like, u):
        """Dispatch: sequential scans (bit-parity with the reference), the
        log-depth associative-scan smoother (TPU fast path; implies
        cross_cov_compat=False semantics for the cross-covariances), or the
        time-sharded sequence-parallel smoother when ``time_mesh`` is set."""
        # getattr: subclasses (DMBD, NLDS) build their state without running
        # LDS.__init__ and predate this attribute
        if getattr(self, "time_mesh", None) is not None:
            from ..parallel.seq_parallel import time_sharded_kalman_smoother

            (Sigma, mu, Js, hs), Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, logZ_total = (
                time_sharded_kalman_smoother(parms, x0, like, u, self.time_mesh)
            )
            px = MVN_vf(mu=mu, Sigma=Sigma, invSigmamu=hs, invSigma=Js)
            return px, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, logZ_total[None]
        if self.parallel_scan:
            from ..ops.parallel_kalman import parallel_kalman_smoother

            (Sigma, mu, Js, hs), Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, logZ_total = (
                parallel_kalman_smoother(parms, x0, like, u)
            )
            px = MVN_vf(mu=mu, Sigma=Sigma, invSigmamu=hs, invSigma=Js)
            return px, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, logZ_total[None]
        return self.forward_backward_loop(parms, x0, like, u)

    # -------------------------------------------------------------------- E-step
    def _update_latents(self, x0, A, obs_model, y, u, r):
        parms = self._latent_parms(A)
        like = self.log_likelihood_function(obs_model, y, r)
        px, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, logZ = (
            self._smoother(parms, x0, like, u)
        )
        ss = self._latent_suffstats(
            px, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, y, u, r, logZ
        )
        return px, ss

    # -------------------------------------------------------------------- M-step
    def _ss_update(self, x0, A, ss, p=None, lr=1.0):
        """Sum sufficient statistics over samples (p-weighted for mixtures)
        and push to x0 / A (reference :104-154)."""
        T, N = ss["T"], ss["N"]
        stats = {k: ss[k] for k in ss if k not in ("logZ",)}
        if p is not None:
            pe = p
            for _ in range(len(self.offset)):
                pe = pe[..., None]
            stats["T"] = stats["T"] * pe
            stats["N"] = stats["N"] * pe
            pm = pe[..., None, None]
            for k in (
                "SE_x0_x0",
                "SE_x0",
                "SE_xpu_xpu",
                "SE_x_xpu",
                "SE_x_x",
                "SE_xr_xr",
                "SE_y_xr",
                "SE_y_y",
            ):
                stats[k] = stats[k] * pm
        keep = self.batch_dim + len(self.offset)
        for k in ("T", "N"):
            stats[k] = sum_leading(stats[k], keep)
        for k in (
            "SE_x0_x0",
            "SE_x0",
            "SE_xpu_xpu",
            "SE_x_xpu",
            "SE_x_x",
            "SE_xr_xr",
            "SE_y_xr",
            "SE_y_y",
        ):
            stats[k] = sum_leading(stats[k], keep + 2)
        for k in ("SE_x0_x0", "SE_xpu_xpu", "SE_x_x", "SE_xr_xr"):
            stats[k] = 0.5 * (stats[k] + mT(stats[k]))
        x0 = x0.ss_update(stats["SE_x0_x0"], stats["SE_x0"][..., 0], stats["N"], lr)
        A = A.ss_update(
            stats["SE_xpu_xpu"], stats["SE_x_xpu"], stats["SE_x_x"], stats["T"], lr
        )
        return x0, A, stats

    def _vb_step(self, x0, A, obs_model, y, u, r, lr, p=None):
        px, ss = self._update_latents(x0, A, obs_model, y, u, r)
        logZ = ss["logZ"]
        KL = self._KL(x0, A, obs_model)
        ELBO = sum_leading(logZ, self.batch_dim).sum() - KL.sum()
        x0, A, stats = self._ss_update(x0, A, ss, p=p, lr=lr)
        obs_model = obs_model.ss_update(
            stats["SE_xr_xr"], stats["SE_y_xr"], stats["SE_y_y"], stats["T"], lr
        )
        return x0, A, obs_model, px, logZ, ELBO

    def _KL(self, x0, A, obs_model):
        KL = x0.KLqprior() + A.KLqprior()
        for _ in range(len(self.offset)):
            if KL.ndim > 0:  # torch squeeze(-1) no-ops on scalars
                KL = KL[..., 0] if KL.shape[-1] == 1 else KL
        return KL + obs_model.KLqprior()

    def _jitted(self, name, fn, _prejitted=False, **kw):
        # cross_cov_compat / parallel_scan / time_mesh are baked into the
        # trace via ``self`` — key on them so toggling retraces.
        from ..ops.parallel_kalman import _dispatch_state

        key = (
            name,
            self.cross_cov_compat,
            self.parallel_scan,
            getattr(self, "time_mesh", None),
            _dispatch_state(),
        )
        if key not in self._jit_cache:
            self._jit_cache[key] = fn if _prejitted else jax.jit(fn, **kw)
        return self._jit_cache[key]

    def _vb_multi(self, x0, A, obs_model, y, u, r, lr, iters, p=None):
        """``iters`` VB-EM sweeps fused into one lax.scan (single device call)."""

        def body(carry, _):
            x0, A, obs_model = carry
            x0, A, obs_model, px, logZ, L = self._vb_step(
                x0, A, obs_model, y, u, r, lr, p
            )
            return (x0, A, obs_model), (L, logZ)

        (x0, A, obs_model), (Ls, logZs) = jax.lax.scan(
            body, (x0, A, obs_model), None, length=iters
        )
        # recompute the final smoothed posterior for downstream consumers
        px, ss = self._update_latents(x0, A, obs_model, y, u, r)
        return x0, A, obs_model, px, logZs[-1], Ls

    # ---------------------------------------------------------- reference API
    def update(self, y, u=None, r=None, p=None, iters=1, lr=1.0, verbose=False):
        y, u, r = self.reshape_inputs(y, u, r)
        self._update_reshaped(y, u, r, p=p, iters=iters, lr=lr, verbose=verbose)

    def _update_reshaped(self, y, u, r, p=None, iters=1, lr=1.0, verbose=False):
        """VB sweeps on already-reshaped (possibly mesh-sharded) inputs — the
        single step dispatcher shared by update() and parallel.api.

        ``p`` (sample x batch assignment weights) weights the M-step
        sufficient statistics exactly like the reference's p-weighted
        ss_update (LinearDynamicalSystems.py:86-104)."""
        if iters == 1:
            step = self._jitted("vb_step", self._vb_step)
            self.x0, self.A, self.obs_model, self.px, self.logZ, L = step(
                self.x0, self.A, self.obs_model, y, u, r, lr, p
            )
            Ls = [L]
        else:
            fn = self._jitted(
                ("vb_multi", iters),
                jax.jit(self._vb_multi, static_argnames=("iters",)),
                _prejitted=True,
            )
            self.x0, self.A, self.obs_model, self.px, self.logZ, Ls = fn(
                self.x0, self.A, self.obs_model, y, u, r, lr, iters, p
            )
            Ls = np.asarray(Ls)
        L_last = self.ELBO_last
        for L in Ls:
            if verbose:
                print(
                    "Percent Change in ELBO %f"
                    % float((L - L_last) / abs(float(L)) * 100)
                )
            L_last = float(L)
            self.ELBO_save.append(float(L))
        self.ELBO_last = L_last

    def update_latents(self, y, u, r, p=None, lr=1.0):
        fn = self._jitted("update_latents", self._update_latents)
        self.px, ss = fn(self.x0, self.A, self.obs_model, y, u, r)
        self._ss = ss
        self.logZ = ss["logZ"]
        # expose stats with reference attribute names
        for k, v in ss.items():
            if k != "logZ":
                setattr(self, k, v)

    def ss_update(self, p=None, lr=1.0):
        self.x0, self.A, stats = self._ss_update(self.x0, self.A, self._ss, p=p, lr=lr)
        for k, v in stats.items():
            setattr(self, k, v)
        self._ss.update(stats)

    def KLqprior(self):
        return self._KL(self.x0, self.A, self.obs_model)

    def ELBO(self):
        logZ = self.logZ
        logZ = sum_leading(logZ, self.batch_dim)
        return logZ - self.KLqprior()
