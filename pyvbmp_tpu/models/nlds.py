"""Recurrent switching linear dynamical system (working counterpart of the
reference's inert models/wip_NLDS.py:1-12 sketch — upstream the class cannot
run: update() references undefined variables and ss_update raises
NotImplementedError).

Generative model (the reference sketch's "Mix Linear Model" option):

    s_0 ~ Cat(pi0)
    s_t | s_{t-1}, x_{t-1} ~ softmax(W_{s_{t-1}} x_{t-1} + b_{s_{t-1}})   (MNLR)
    x_t | x_{t-1}, s_t     ~ N(A_{s_t} x_{t-1} + a_{s_t}, Q_{s_t})
    y_t | x_t, s_t         ~ N(B_{s_t} x_t + b_{s_t}, R_{s_t})

Structured mean-field VB: q(s) is a Markov chain updated by the driven
forward-backward (per-time transition logits from the MNLR at E[x_t]), and
q(x) is a Gaussian chain updated by the parallel (associative-scan) Kalman
smoother with per-time parameters mixed under q(s_t) — the O(log T) smoother
accepts time-varying potentials natively, so the switching E-step costs the
same as a vanilla LDS sweep. The ELBO is the s-chain normalizer minus
parameter KLs (approximate in the same spirit as the reference's DMBD ELBO).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..dists import Dirichlet, NormalInverseWishart
from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..transforms import MatrixNormalWishart, MultiNomialLogisticRegression
from ..utils import math as um
from ..utils.linalg import mT
from ..utils.jaxutils import sum_leading


class NonLinearDynamicalSystems:
    def __init__(self, obs_shape, hidden_dim, mixture_dim, batch_shape=(), key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        assert batch_shape == (), "NLDS v1 supports batch_shape=() (vmap for more)"
        key = key_or_next(key)
        self.obs_shape = tuple(obs_shape)
        self.obs_dim = obs_shape[-1]
        self.hidden_dim = hidden_dim
        self.mixture_dim = mixture_dim
        self.batch_shape = ()
        self.batch_dim = 0

        h, K, n = hidden_dim, mixture_dim, self.obs_dim
        self.x0 = NormalInverseWishart.create((h,), key=key)
        self.A = MatrixNormalWishart.create((h, h + 1), (K,), key=jr.fold_in(key, 1))
        self.B = MatrixNormalWishart.create((n, h + 1), (K,), key=jr.fold_in(key, 2))
        self.T = MultiNomialLogisticRegression(
            K, h, batch_shape=(K,), pad_X=True, key=jr.fold_in(key, 3)
        )
        self.pi0 = Dirichlet.create((K,), key=jr.fold_in(key, 4))
        self.p = None
        self.px = None
        self.ELBO_last = -jnp.inf
        self.ELBO_save = []
        self._jit_cache = {}

    # ------------------------------------------------------------- potentials
    def _dyn_parms(self, A):
        """Per-state quadratic dynamics potentials (cf. lds._latent_parms)."""
        h = self.hidden_dim
        invQ = A.EinvSigma()
        ATQA = A.EXTinvUX()
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

    def _obs_parms(self, B):
        """Per-state observation message pieces for a single y_t."""
        h = self.hidden_dim
        BTRB = B.EXTinvUX()
        BTR = B.EXTinvU()
        return dict(
            invS=BTRB[..., :h, :h],            # (K,h,h)
            BTR_x_y=BTR[..., :h, :],           # (K,h,n)
            BTRB_x_b=BTRB[..., :h, h:],        # (K,h,1)
            BTRB_b_b=BTRB[..., h:, h:],        # (K,1,1)
            BTR_b_y=BTR[..., h:, :],           # (K,1,n)
            invR=B.EinvSigma(),                # (K,n,n)
            ElogdetinvR=B.ElogdetinvSigma(),   # (K,)
        )

    def _obs_like_per_s(self, op, y):
        """Per-time, per-state information-form obs messages from y (T,b,n,1)."""
        invSigma = op["invS"]                                     # (K,h,h)
        invSigmamu = op["BTR_x_y"] @ y[..., None, :, :] - op["BTRB_x_b"]
        Res = (
            -0.5 * mT(y[..., None, :, :]) @ op["invR"] @ y[..., None, :, :]
            - 0.5 * op["BTRB_b_b"]
            + op["BTR_b_y"] @ y[..., None, :, :]
        )[..., 0, 0] + 0.5 * op["ElogdetinvR"] - 0.5 * self.obs_dim * um.LOG2PI
        return invSigma, invSigmamu, Res                           # (..,K,..)

    # ------------------------------------------------------------------ E: q(x)
    def _x_step(self, x0, dp, op, p, y):
        """Kalman sweep with q(s_t)-mixed per-time potentials."""
        from ..ops.parallel_kalman import parallel_kalman_smoother

        def mix(a):
            # (K,) + mat dims mixed under p (T,b,K) -> (T,b) + mat dims
            return jnp.einsum("tbk,k...->tb...", p, a)

        parms = dict(
            invQ=mix(dp["invQ"]),
            ATQA_x_x=mix(dp["ATQA_x_x"]),
            ATQA_x_u=mix(dp["ATQA_x_u"]),
            ATQA_u_u=mix(dp["ATQA_u_u"]),
            QA_xp_x=mix(dp["QA_xp_x"]),
            QA_xp_u=mix(dp["QA_xp_u"]),
            ElogdetinvQ=mix(dp["ElogdetinvQ"]),
        )
        iS_s, iSm_s, Res_s = self._obs_like_per_s(op, y)
        like = (
            jnp.einsum("tbk,tbk...->tb...", p, jnp.broadcast_to(
                iS_s, y.shape[:2] + iS_s.shape[-3:])),
            jnp.einsum("tbk,tbk...->tb...", p, iSm_s),
            jnp.einsum("tbk,tbk->tb", p, Res_s),
        )
        u = jnp.ones(y.shape[:2] + (1, 1), y.dtype)
        (Sigma, mu, Js, hs), Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, logZ = (
            parallel_kalman_smoother(parms, x0, like, u)
        )
        px = MVN_vf(mu=mu, Sigma=Sigma, invSigmamu=hs, invSigma=Js)
        return px, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, logZ

    # ------------------------------------------------------------------ E: q(s)
    def _s_logits(self, dp, op, moments, y):
        """Per-time per-state logits: dynamics + observation terms."""
        Exx, Ex, C, Exx_prev, Ex_prev = moments
        # observation term: E_qx[log p(y_t | x_t, s_t=j)]
        iS_s, iSm_s, Res_s = self._obs_like_per_s(op, y)
        O = (
            Res_s
            + jnp.einsum("tbho,tbkho->tbk", Ex, iSm_s)
            - 0.5 * jnp.einsum("kij,tbji->tbk", op["invS"], Exx)
        )
        # dynamics term: E_qx[log p(x_t | x_{t-1}, s_t=i)]
        D = (
            0.5 * dp["ElogdetinvQ"]
            - 0.5 * self.hidden_dim * um.LOG2PI
            - 0.5 * jnp.einsum("kij,tbji->tbk", dp["invQ"], Exx)
            + jnp.einsum("kij,tbji->tbk", dp["QA_xp_x"], C)
            + jnp.einsum("kio,tbio->tbk", dp["QA_xp_u"], Ex)
            - 0.5 * jnp.einsum("kij,tbji->tbk", dp["ATQA_x_x"], Exx_prev)
            - jnp.einsum("kio,tbio->tbk", dp["ATQA_x_u"], Ex_prev)
            - 0.5 * dp["ATQA_u_u"][..., 0, 0]
        )
        return O + D

    def _moments(self, px, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0):
        mu, Sigma = px.mu, px.Sigma
        Exx = Sigma + mu @ mT(mu)                       # (T,b,h,h)
        E0 = (Sigma_x0_x0 + mu_x0 @ mT(mu_x0))[None]
        Exx_prev = jnp.concatenate([jnp.broadcast_to(E0, Exx[:1].shape), Exx[:-1]], 0)
        mu_prev = jnp.concatenate(
            [jnp.broadcast_to(mu_x0[None], mu[:1].shape), mu[:-1]], 0
        )
        # C_t = E[x_{t-1} x_t'] (cross-covariance + mean product)
        cross0 = jnp.broadcast_to(Sigma_x0_cross[None], Sigma_cross[:1].shape)
        cross = jnp.concatenate([cross0, Sigma_cross], 0)
        C = cross + mu_prev @ mT(mu)
        return Exx, mu, C, Exx_prev, mu_prev

    # ---------------------------------------------------------------- one sweep
    def _vb_step(self, nodes, y, lr):
        from ..models.dhmm import driven_forward_backward

        x0, A, B, Tbeta, pi0, p = nodes
        tr = self.T
        saved = tr.beta
        try:
            tr.beta = Tbeta
            dp = self._dyn_parms(A)
            op = self._obs_parms(B)

            # ---- q(x) given q(s)
            px, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, logZx = self._x_step(
                x0, dp, op, p, y
            )
            moments = self._moments(px, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0)
            Exx, Ex, C, Exx_prev, Ex_prev = moments

            # ---- M-steps FIRST (weighted by the input q(s); the pair
            # (q(s)=p, q(x)) is coherent since q(x) was just smoothed under p)
            # so the s-update below sees the freshly fitted parameters —
            # computing q(s) before the M-step feeds the next sweep weights
            # derived from the stale parameters and no state ever
            # differentiates.
            K = self.mixture_dim
            N0 = jnp.asarray(float(np.prod(y.shape[1:2])), y.dtype)
            x0 = x0.ss_update(
                sum_leading(Sigma_x0_x0 + mu_x0 @ mT(mu_x0), 2),
                sum_leading(mu_x0[..., 0], 1),
                N0,
                lr,
            )
            # dynamics A_s: regress x_t on [x_{t-1}; 1]
            Ex1x1 = jnp.concatenate(
                [
                    jnp.concatenate([Exx_prev, Ex_prev], -1),
                    jnp.concatenate([mT(Ex_prev), jnp.ones_like(Ex_prev[..., :1, :1])], -1),
                ],
                -2,
            )                                                       # (T,b,h+1,h+1)
            Ex_x1 = jnp.concatenate([mT(C), Ex], -1)                # (T,b,h,h+1)
            w = p                                                   # (T,b,K)
            SE_xpu_xpu = jnp.einsum("tbk,tbij->kij", w, Ex1x1)
            SE_x_xpu = jnp.einsum("tbk,tbij->kij", w, Ex_x1)
            SE_x_x = jnp.einsum("tbk,tbij->kij", w, Exx)
            Nk = w.sum((0, 1))
            A = A.ss_update(SE_xpu_xpu, SE_x_xpu, SE_x_x, Nk, lr)
            # emissions B_s: regress y_t on [x_t; 1]
            Exy1 = jnp.concatenate(
                [
                    jnp.concatenate([Exx, Ex], -1),
                    jnp.concatenate([mT(Ex), jnp.ones_like(Ex[..., :1, :1])], -1),
                ],
                -2,
            )
            SE_y_x1 = jnp.concatenate(
                [y @ mT(Ex), y @ jnp.ones_like(Ex[..., :1, :1])], -1
            )
            SE_y_y = y @ mT(y)
            B = B.ss_update(
                jnp.einsum("tbk,tbij->kij", w, Exy1),
                jnp.einsum("tbk,tbij->kij", w, SE_y_x1),
                jnp.einsum("tbk,tbij->kij", w, SE_y_y),
                Nk,
                lr,
            )

            # ---- q(s) given q(x) and the UPDATED parameters
            dp = self._dyn_parms(A)
            op = self._obs_parms(B)
            obs_logits = self._s_logits(dp, op, moments, y)       # (T,b,K)
            # transition logits at E[x_{t-1}] per source state; t=0 row carries
            # the initial distribution (uniform pseudo-state convention)
            feats = Ex_prev[..., 0]                                # (T,b,h)
            trans = tr.log_predict(feats[..., None, :])            # (T,b,K,K)
            init_row = jnp.broadcast_to(
                pi0.loggeomean(), trans.shape[1:-2] + (K,)
            )[..., None, :] + jnp.zeros_like(trans[0])
            trans = jnp.concatenate([init_row[None], trans[1:]], 0)
            init_logits = jnp.full((K,), -jnp.log(float(K)))
            ps, SEzz, SEz0, logZs = driven_forward_backward(
                trans, init_logits, obs_logits, 1.0
            )

            # recurrent transition MNLR: features x_{t-1}, soft labels xi_t
            tr.raw_update(feats[1:][..., None, :], SEzz[1:], iters=2, lr=lr)
            new_Tbeta = tr.beta
            KL_T = tr.KLqprior()
            # initial state: q(s_0) is the first smoothed marginal (the
            # uniform pseudo-state z_{-1} integrates out exactly since the
            # t=0 "transition" row IS pi0's loggeomean)
            pi0 = pi0.ss_update(sum_leading(ps[0], 1), lr)

            KL = (
                x0.KLqprior()
                + A.KLqprior().sum(-1)
                + B.KLqprior().sum(-1)
                + KL_T.sum()
                + pi0.KLqprior()
            )
            ELBO = logZs.sum() - KL
        finally:
            tr.beta = saved
        return (x0, A, B, new_Tbeta, pi0, ps), (px.mu, px.Sigma), logZs, ELBO

    def _vb_multi(self, nodes, y, lr, iters):
        # stack only ELBOs across sweeps; the last sweep runs outside the
        # scan so the (T, b, h) smoothed posterior isn't written into an
        # iters-stacked HBM buffer only whose last slice is read
        def body(carry, _):
            carry, _pxp, _logZ, ELBO = self._vb_step(carry, y, lr)
            return carry, ELBO

        carry, ELBOs = jax.lax.scan(body, nodes, None, length=iters - 1)
        carry, pxp, logZ, ELBO = self._vb_step(carry, y, lr)
        ELBOs = jnp.concatenate([ELBOs, ELBO[None]], 0)
        return carry, pxp, logZ, ELBOs

    # ------------------------------------------------------------- reference API
    def update(self, y, iters=1, lr=1.0, verbose=False):
        """y: (T, batch, obs_dim) or (T, batch, obs_dim, 1)."""
        if iters < 1:
            raise ValueError(f"iters must be >= 1, got {iters}")
        if y.ndim == 3:
            y = y[..., None]
        T, b = y.shape[:2]
        if self.p is None:
            # symmetry breaking: an exactly-uniform (or iid-noisy) q(s) gives
            # every state near-identical first-M-step statistics, locking the
            # per-state dynamics together. Blocky random assignments (random
            # state per length-(T//8) segment) perturb the *dynamics*
            # statistics coherently so the states can differentiate.
            from ..utils.rng import next_key
            import jax.random as jr

            seg = max(T // 8, 2)
            n_seg = (T + seg - 1) // seg
            states = jr.randint(next_key(), (n_seg, b), 0, self.mixture_dim)
            states = jnp.repeat(states, seg, axis=0)[:T]
            hard = jax.nn.one_hot(states, self.mixture_dim, dtype=y.dtype)
            p0 = 0.5 * hard + 0.5 / self.mixture_dim
        else:
            p0 = self.p
        from ..ops.parallel_kalman import _dispatch_state

        key = ("vb_multi", iters, _dispatch_state())
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._vb_multi, static_argnames=("iters",))
        nodes = (self.x0, self.A, self.B, self.T.beta, self.pi0, p0)
        (self.x0, self.A, self.B, beta, self.pi0, self.p), pxp, self.logZ, ELBOs = (
            self._jit_cache[key](nodes, y, lr, iters)
        )
        self.T.beta = beta
        self.px = MVN_vf(mu=pxp[0], Sigma=pxp[1])
        ELBOs = np.asarray(ELBOs)  # one host fetch
        for e in ELBOs:
            if verbose:
                print(
                    "Percent Change in ELBO = ",
                    (e - self.ELBO_last) / np.abs(self.ELBO_last) * 100,
                )
            self.ELBO_last = float(e)
            self.ELBO_save.append(float(e))

    raw_update = update

    def fit(self, y, iters=30, restarts=5, lr=1.0, verbose=False, key=None):
        """Multi-restart fit with ELBO selection — the standard protocol for
        recurrent switching LDS models, whose mean-field objective has strong
        local optima (roughly 1 in 5 random inits finds the true regimes on
        easy synthetic data; the winning basin's ELBO clearly dominates)."""
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        best = None
        for rstart in range(restarts):
            fresh = NonLinearDynamicalSystems(
                self.obs_shape,
                self.hidden_dim,
                self.mixture_dim,
                key=jr.fold_in(key, rstart),
            )
            fresh.update(y, iters=iters, lr=lr, verbose=False)
            if verbose:
                print(f"restart {rstart}: ELBO {fresh.ELBO_save[-1]:.1f}")
            if best is None or fresh.ELBO_save[-1] > best.ELBO_save[-1]:
                best = fresh
        for attr in ("x0", "A", "B", "T", "pi0", "p", "px",
                     "ELBO_last", "ELBO_save", "logZ", "_jit_cache"):
            setattr(self, attr, getattr(best, attr))
        return self

    def assignment_pr(self):
        return self.p

    def assignment(self):
        return self.p.argmax(-1)

    def ELBO(self):
        return self.ELBO_last


NLDS = NonLinearDynamicalSystems
