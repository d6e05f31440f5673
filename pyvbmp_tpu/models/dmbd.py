"""Dynamic Markov Blanket Discovery — the flagship model
(reference models/DynamicMarkovBlanketDiscovery.py).

An LDS whose observation model is an ARHMM over "roles"; the latent x is
partitioned into (environment s, boundary b, internal z) blocks per object,
enforced by structural masks on the dynamics (A_mask), the emission (B_mask)
and the role transitions (role_mask).  Coordinate ascent interleaves the
discrete role smoother (HMM scan) and the continuous Kalman smoother
(LDS scans); one full sweep is a single jitted function.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..dists import NormalInverseWishart
from ..dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf
from ..transforms import MatrixNormalGamma
from ..utils.jaxutils import brole_avg, replace, sum_leading
from ..utils.linalg import psd_inv_and_logdet
from .arhmm import ARHMM_prXRY
from .lds import LinearDynamicalSystems


def _agg_if_no_backend(
):
    """Select the Agg backend for headless figure saves WITHOUT clobbering an
    interactive backend the user already has loaded (a global
    ``matplotlib.use('Agg')`` would kill their GUI for all later plots)."""
    import sys

    if "matplotlib.pyplot" in sys.modules:
        return  # a backend is already live; fig.savefig works on any backend
    import matplotlib

    try:
        matplotlib.use("Agg", force=False)
    except Exception:
        pass


def _shard_like_batch(a, y):
    """Give ``a`` the same batch-axis placement as the (possibly
    mesh-sharded) data ``y``.

    Both are laid out (T, batch, ...); when y carries a multi-device
    NamedSharding (parallel/api.data_parallel_update), placing the
    per-sample state with the leading portion of y's spec keeps it
    device-resident — otherwise the compiled sweep all-gathers O(T*batch)
    state while the suff-stat reductions are only O(params)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    sh = getattr(y, "sharding", None)
    if not isinstance(sh, NamedSharding) or sh.mesh.size <= 1:
        return a
    spec = tuple(sh.spec)[: a.ndim]
    spec = spec + (None,) * (a.ndim - len(spec))
    # only the leading (T, batch) axes are shared layout; replicate the rest
    spec = spec[:2] + (None,) * (a.ndim - 2)
    return jax.device_put(a, NamedSharding(sh.mesh, PartitionSpec(*spec)))


def _block(A, B, C, D):
    return np.block([[A, B], [C, D]])


def one_object_mask(hidden_dims, role_dims, control_dim, obs_dim, regression_dim):
    """Standard masks for a single object (reference DMBD.one_object_mask:277-342)."""
    hd, rd = hidden_dims, role_dims
    As = np.concatenate(
        [np.ones((hd[0], hd[0] + hd[1])), np.zeros((hd[0], hd[2]))], -1
    )
    Ab = np.ones((hd[1], hd[0] + hd[1] + hd[2]))
    Az = np.concatenate(
        [np.zeros((hd[2], hd[0])), np.ones((hd[2], hd[1] + hd[2]))], -1
    )
    if len(hd) == 4:
        As = np.concatenate([As, np.zeros((hd[0], hd[3]))], -1)
        Ab = np.concatenate([Ab, np.zeros((hd[1], hd[3]))], -1)
        Az = np.concatenate([Az, np.zeros((hd[2], hd[3]))], -1)
        Ag = np.concatenate(
            [np.zeros((hd[3], sum(hd[:-1]))), np.ones((hd[3], hd[3]))], -1
        )
        A_mask = np.concatenate([As, Ab, Az, Ag], -2)
    else:
        A_mask = np.concatenate([As, Ab, Az], -2)
    A_mask = np.concatenate(
        [A_mask, np.ones(A_mask.shape[:-1] + (control_dim,))], -1
    ) > 0

    def emission_rows(role_n, active):
        out = []
        for j, h in enumerate(hd[:3]):
            out.append(
                np.ones((role_n, obs_dim, h))
                if j in active
                else np.zeros((role_n, obs_dim, h))
            )
        return np.concatenate(out, -1)

    Bs = emission_rows(rd[0], {0})
    Bb = emission_rows(rd[1], {1})
    Bz = emission_rows(rd[2], {2})
    if len(hd) == 4:
        Bs = np.concatenate([Bs, np.ones((rd[0], obs_dim, hd[3]))], -1)
        Bb = np.concatenate([Bb, np.ones((rd[1], obs_dim, hd[3]))], -1)
        Bz = np.concatenate([Bz, np.ones((rd[2], obs_dim, hd[3]))], -1)
    B_mask = np.concatenate([Bs, Bb, Bz], -3)
    B_mask = np.concatenate(
        [B_mask, np.ones(B_mask.shape[:-1] + (regression_dim,))], -1
    ) > 0

    role_dim = sum(rd[:3])
    rs = np.concatenate(
        [np.ones((rd[0], rd[0] + rd[1])), np.zeros((rd[0], rd[2]))], -1
    )
    rb = np.ones((rd[1], role_dim))
    rz = np.concatenate(
        [np.zeros((rd[2], rd[0])), np.ones((rd[2], rd[1] + rd[2]))], -1
    )
    role_mask = np.concatenate([rs, rb, rz], -2)
    return A_mask, B_mask, role_mask


def n_object_mask(n, hidden_dims, role_dims, control_dim, obs_dim, regression_dim):
    """Masks for n objects sharing one environment
    (reference DMBD.n_object_mask:223-275)."""
    hd, rd = hidden_dims, role_dims
    bz = np.ones((hd[1] + hd[2], hd[1] + hd[2]))
    notbz = np.zeros_like(bz)
    bz_mask = _block(bz, notbz, notbz, bz)
    sb = np.ones((hd[0], hd[1]))
    sz = np.zeros((hd[0], hd[2]))
    sbz_mask = np.concatenate([sb, sz], -1)
    for _ in range(n - 2):
        bz_mask = _block(
            bz_mask,
            np.zeros((bz_mask.shape[0], bz.shape[0])),
            np.zeros((bz.shape[0], bz_mask.shape[0])),
            bz,
        )
    for _ in range(n - 1):
        sbz_mask = np.concatenate([sbz_mask, sb, sz], -1)
    A_mask = _block(
        np.ones((hd[0], hd[0])), sbz_mask, sbz_mask.T, bz_mask
    )
    A_mask = np.concatenate([A_mask, np.ones(A_mask.shape[:-1] + (control_dim,))], -1)

    Bb = np.concatenate([np.ones((rd[1], hd[1])), np.zeros((rd[1], hd[2]))], -1)
    Bz = np.concatenate([np.zeros((rd[2], hd[1])), np.ones((rd[2], hd[2]))], -1)
    Bbz = np.concatenate([Bb, Bz], -2)
    B_mask = np.ones((rd[0], hd[0]))
    for _ in range(n):
        B_mask = _block(
            B_mask,
            np.zeros((B_mask.shape[0], Bbz.shape[1])),
            np.zeros((Bbz.shape[0], B_mask.shape[1])),
            Bbz,
        )
    B_mask = np.broadcast_to(
        B_mask[:, None, :], (B_mask.shape[0], obs_dim, B_mask.shape[1])
    )
    B_mask = np.concatenate(
        [B_mask, np.ones(B_mask.shape[:-1] + (regression_dim,))], -1
    )

    bz = np.ones((rd[1] + rd[2], rd[1] + rd[2]))
    notbz = np.zeros_like(bz)
    bz_mask = _block(bz, notbz, notbz, bz)
    sb = np.ones((rd[0], rd[1]))
    sz = np.zeros((rd[0], rd[2]))
    sbz_mask = np.concatenate([sb, sz], -1)
    for _ in range(n - 2):
        bz_mask = _block(
            bz_mask,
            np.zeros((bz_mask.shape[0], bz.shape[0])),
            np.zeros((bz.shape[0], bz_mask.shape[0])),
            bz,
        )
    for _ in range(n - 1):
        sbz_mask = np.concatenate([sbz_mask, sb, sz], -1)
    role_mask = _block(
        np.ones((rd[0], rd[0])), sbz_mask, sbz_mask.T, bz_mask
    )
    return A_mask > 0, B_mask > 0, role_mask > 0


class DynamicMarkovBlanketDiscovery(LinearDynamicalSystems):
    def __init__(
        self,
        obs_shape,
        role_dims,
        hidden_dims,
        control_dim=0,
        regression_dim=0,
        batch_shape=(),
        number_of_objects=1,
        unique_obs=False,
        parallel_scan=False,
        time_mesh=None,
        key=None,
    ):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        control_dim = control_dim + 1
        regression_dim = regression_dim + 1
        obs_dim = obs_shape[-1]
        n_obs = obs_shape[0]

        if number_of_objects > 1:
            hidden_dim = hidden_dims[0] + number_of_objects * (
                hidden_dims[1] + hidden_dims[2]
            )
            role_dim = role_dims[0] + number_of_objects * (role_dims[1] + role_dims[2])
            A_mask, B_mask, role_mask = n_object_mask(
                number_of_objects, hidden_dims, role_dims, control_dim, obs_dim,
                regression_dim,
            )
        else:
            hidden_dim = sum(hidden_dims)
            role_dim = sum(role_dims)
            A_mask, B_mask, role_mask = one_object_mask(
                hidden_dims, role_dims, control_dim, obs_dim, regression_dim
            )

        self.number_of_objects = number_of_objects
        self.unique_obs = unique_obs
        self.obs_shape = tuple(obs_shape)
        self.obs_dim = obs_dim
        self.event_dim = len(obs_shape)
        self.n_obs = n_obs
        self.role_dims = role_dims
        self.role_dim = role_dim
        self.hidden_dims = hidden_dims
        self.hidden_dim = hidden_dim
        self.control_dim = control_dim
        self.regression_dim = regression_dim
        self.batch_shape = tuple(batch_shape)
        self.batch_dim = len(batch_shape)
        self.expand_to_batch = True
        self.offset = (1,) * (len(obs_shape) - 1)
        self.logZ = jnp.asarray(-jnp.inf)
        self.ELBO_save = []
        self.iters = 0
        self.px = None
        self.ELBO_last = -jnp.inf
        self.cross_cov_compat = not (parallel_scan or time_mesh is not None)
        self.parallel_scan = parallel_scan
        # sequence parallelism: shards the TIME axis of BOTH the role HMM scan
        # and the Kalman smoother over the mesh's "seq" axis
        # (parallel/seq_parallel.py); implies corrected cross-cov math
        self.time_mesh = time_mesh
        self.latent_noise = "independent"
        self._jit_cache = {}

        self.x0 = NormalInverseWishart.create(
            self.offset + (hidden_dim,), tuple(batch_shape), key=key
        )
        self.x0 = replace(self.x0, mu=jnp.zeros_like(self.x0.mu))

        self.A = MatrixNormalGamma.create(
            self.offset + (hidden_dim, hidden_dim + control_dim),
            tuple(batch_shape),
            mask=A_mask,
            pad_X=False,
            uniform_precision=False,
            key=jr.fold_in(key, 1),
        )

        if unique_obs:
            self.obs_model = ARHMM_prXRY(
                role_dim,
                obs_dim,
                hidden_dim,
                regression_dim,
                batch_shape=tuple(batch_shape) + (n_obs,),
                X_mask=jnp.asarray(B_mask)[None].sum(-2, keepdims=True) > 0,
                pad_X=False,
                key=jr.fold_in(key, 2),
            )
        else:
            self.obs_model = ARHMM_prXRY(
                role_dim,
                obs_dim,
                hidden_dim,
                regression_dim,
                batch_shape=tuple(batch_shape),
                X_mask=jnp.asarray(B_mask).sum(-2, keepdims=True) > 0,
                transition_mask=jnp.asarray(role_mask),
                pad_X=False,
                key=jr.fold_in(key, 2),
            )

        # B-prior tweak: scale invU_0 down by role_dim^2 (reference DMBD:81-84)
        B = self.obs_model.obs_dist
        invU_0 = B.invU.invU_0 / float(role_dim**2)
        U, logdet = psd_inv_and_logdet(invU_0)
        self.obs_model.obs_dist = replace(
            B,
            invU=replace(
                B.invU,
                invU_0=invU_0,
                invU=invU_0,
                U=U,
                logdet_invU_0=logdet,
                logdet_invU=logdet,
            ),
        )
        # NOTE: the reference also sets ``B.ptemp = 20.0`` (DMBD:85), but the
        # HMM smoother reads the temperature from the obs_model (=1.0), so the
        # attribute is dead; documented rather than reproduced.

    # -------------------------------------------------------- role E/M pieces
    def _px4r(self, px, r):
        target_shape = r.shape[:-2]
        h = self.hidden_dim
        return MVN_vf(
            mu=jnp.broadcast_to(px.mu, target_shape + (h, 1)),
            Sigma=jnp.broadcast_to(px.Sigma, target_shape + (h, h)),
            invSigmamu=jnp.broadcast_to(px.invSigmamu, target_shape + (h, 1)),
            invSigma=jnp.broadcast_to(px.invSigma, target_shape + (h, h)),
        ).unsqueeze(-self.obs_model.event_dim - 2)

    def _init_px(self, r):
        h = self.hidden_dim
        eye = jnp.broadcast_to(jnp.eye(h), r.shape[:-3] + (1, h, h))
        zer = jnp.zeros(r.shape[:-3] + (1, h, 1))
        return MVN_vf(mu=zer, Sigma=eye, invSigmamu=zer, invSigma=eye)

    def _role_estep(self, transition, initial, B, px, y, r):
        """obs_model.update_states on (px4r, r, y) (reference DMBD:113-132)."""
        om = self.obs_model
        unsdim = om.event_dim + 2
        px4r = self._px4r(px, r)
        XRY = (px4r, jnp.expand_dims(r, -unsdim), jnp.expand_dims(y, -unsdim))
        logits = om._obs_logits(B, XRY)
        from .hmm import smoother_dispatch

        fb = smoother_dispatch(self)
        p, SEzz, SEz0, logZ = fb(
            transition.loggeomean(), initial.loggeomean(), logits, om.ptemp
        )
        keep = om.batch_dim + om.event_dim
        NA = sum_leading(p.sum(0), keep)
        SEzz = sum_leading(SEzz, keep + 1)
        SEz0 = sum_leading(SEz0, keep)
        return p, SEzz, SEz0, NA

    def log_likelihood_function_role(self, B, p, Y, R):
        """Role-averaged observation messages for the Kalman E-step
        (reference DMBD.log_likelihood_function:98-104)."""
        om = self.obs_model
        unsdim = om.event_dim + 2
        invSigma, invSigmamu, Residual = _arhmm_elog_like_X(
            om, B, (jnp.expand_dims(Y, -unsdim), jnp.expand_dims(R, -unsdim)), p
        )
        return (
            invSigma.sum(-unsdim, keepdims=True),
            invSigmamu.sum(-unsdim, keepdims=True),
            Residual.sum(-unsdim + 2, keepdims=True),
        )

    # ------------------------------------------------------------- full sweep
    def _dmbd_step(
        self, x0, A, transition, initial, B, px_tuple, y, u, r, lr, latent_iters
    ):
        om = self.obs_model
        px = MVN_vf(*px_tuple) if px_tuple is not None else None

        def latents_given_p(x0, A, B, p, y, u, r):
            parms = self._latent_parms(A)
            like = self.log_likelihood_function_role(B, p, y, r)
            px, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, logZ = (
                self._smoother(parms, x0, like, u)
            )
            ss = self._latent_suffstats(
                px, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, y, u, r, logZ
            )
            return px, ss

        # warm-up sweeps (latent_iters - 1), reference DMBD.update:191-194
        for _ in range(latent_iters - 1):
            px_w = self._init_px(r)
            p, SEzz, SEz0, NA = self._role_estep(transition, initial, B, px_w, y, r)
            px, _ = latents_given_p(x0, A, B, p, y, u, r)

        if latent_iters <= 1 and px is None:
            px = self._init_px(r)

        # role E-step
        p, SEzz, SEz0, NA = self._role_estep(transition, initial, B, px, y, r)
        # role M-step (reference update_obs_parms:134-142)
        transition = transition.ss_update(SEzz, lr=lr)
        initial = initial.ss_update(SEz0, lr=lr)
        unsdim = om.event_dim + 2
        px4r = self._px4r(px, r)
        XRY = (px4r, jnp.expand_dims(r, -unsdim), jnp.expand_dims(y, -unsdim))
        B = om._obs_update(B, XRY, p, lr, None)
        # latent E-step with updated roles
        px, ss = latents_given_p(x0, A, B, p, y, u, r)
        logZ = ss["logZ"]
        # ELBO (reference DMBD.ELBO:213-219)
        KL = x0.KLqprior() + A.KLqprior()
        for _ in range(len(self.offset)):
            if KL.ndim > 0:  # torch squeeze(-1) no-ops on scalars
                KL = KL[..., 0] if KL.shape[-1] == 1 else KL
        KL = KL + (
            B.KLqprior().sum(-1)
            + transition.KLqprior().sum(-1)
            + initial.KLqprior()
        )
        lgm = transition.loggeomean()
        contrib = jnp.where(jnp.isfinite(lgm), lgm * SEzz, 0.0).sum()
        contrib = contrib + (initial.loggeomean() * SEz0).sum()
        contrib = contrib - jnp.where(p > 1e-8, p * jnp.log(jnp.where(p > 1e-8, p, 1.0)), 0.0).sum()
        ELBO = sum_leading(logZ, self.batch_dim).sum() - KL.sum() + contrib
        # latent M-step
        x0, A, stats = self._ss_update(x0, A, ss, p=None, lr=lr)
        return (
            x0,
            A,
            transition,
            initial,
            B,
            (px.mu, px.Sigma, px.invSigmamu, px.invSigma),
            p,
            logZ,
            ELBO,
        )

    def _dmbd_multi(self, x0, A, transition, initial, B, px_tuple, p0, y, u, r,
                    lr, latent_iters, iters):
        """``iters`` coordinate-ascent sweeps fused into one lax.scan so a fit
        is a single device call (the per-call tunnel latency on pod frontends
        otherwise dominates at reference-sized workloads)."""

        def body(carry, _):
            x0, A, transition, initial, B, px_tuple, p, logZ = carry
            out = self._dmbd_step(
                x0, A, transition, initial, B, px_tuple, y, u, r, lr, latent_iters
            )
            carry = out[:6] + (out[6], out[7])
            return carry, out[8]

        carry0 = (x0, A, transition, initial, B, px_tuple, p0,
                  jnp.zeros(self._logZ_shape(y), y.dtype))
        carry, ELBOs = jax.lax.scan(body, carry0, None, length=iters)
        return carry, ELBOs

    def _logZ_shape(self, y):
        # logZ after time-sum: sample' + batch (see _latent_suffstats)
        return y.shape[1: y.ndim - self.event_dim - 1]

    def update(self, y, u=None, r=None, iters=1, latent_iters=1, lr=1.0, verbose=False):
        y, u, r = self.reshape_inputs(y, u, r)
        self._update_reshaped(
            y, u, r, iters=iters, latent_iters=latent_iters, lr=lr, verbose=verbose
        )

    def _update_reshaped(self, y, u, r, iters=1, latent_iters=1, lr=1.0, verbose=False):
        """VB sweeps on already-reshaped (possibly mesh-sharded) inputs — the
        single step dispatcher shared by update() and parallel.api."""
        # obs_model.ptemp is read through ``self`` at trace time (baked into
        # the compiled sweep) — key on it so ptemp annealing between update
        # calls (reference Artificial_Life_example.py:54-57) retraces.
        from ..ops.parallel_kalman import _dispatch_state

        key = (
            "multi",
            latent_iters,
            iters,
            self.obs_model.ptemp,
            self.parallel_scan,
            getattr(self, "time_mesh", None),
            _dispatch_state(),
        )
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                self._dmbd_multi, static_argnames=("latent_iters", "iters")
            )
        fn = self._jit_cache[key]
        if self.px is None:
            px0 = self._init_px(r)
            px_tuple = (px0.mu, px0.Sigma, px0.invSigmamu, px0.invSigma)
        else:
            px_tuple = (self.px.mu, self.px.Sigma, self.px.invSigmamu, self.px.invSigma)
        if self.obs_model.p is None:
            p0 = jnp.ones(y.shape[:-2] + (self.role_dim,), y.dtype) / self.role_dim
        else:
            p0 = self.obs_model.p
        # data-parallel path: the per-sample VB state (px, role posteriors)
        # must carry y's batch sharding, or XLA all-gathers it every sweep —
        # measured: one O(T*B) all-gather per compiled step vs the O(params)
        # suff-stat all-reduces (tests/test_mesh_parallel.py asserts the
        # collective footprint)
        px_tuple = tuple(_shard_like_batch(a, y) for a in px_tuple)
        p0 = _shard_like_batch(p0, y)
        carry, ELBOs = fn(
            self.x0,
            self.A,
            self.obs_model.transition,
            self.obs_model.initial,
            self.obs_model.obs_dist,
            px_tuple,
            p0,
            y,
            u,
            r,
            lr,
            latent_iters,
            iters,
        )
        (
            self.x0,
            self.A,
            self.obs_model.transition,
            self.obs_model.initial,
            self.obs_model.obs_dist,
            px_tuple,
            self.obs_model.p,
            self.logZ,
        ) = carry
        self.px = MVN_vf(*px_tuple)
        ELBOs = np.asarray(ELBOs)
        self.iters += iters
        for e in ELBOs:
            if verbose:
                print(
                    "Percent Change in ELBO = ",
                    (e - self.ELBO_last) / abs(self.ELBO_last) * 100,
                )
            self.ELBO_last = float(e)
            self.ELBO_save.append(float(e))

    def Elog_like(self, y, u=None, r=None, latent_iters=1, lr=1.0):
        """Data likelihood bound: role+latent E-steps from scratch, returning
        logZ minus the role-assignment entropy (reference DMBD.Elog_like:176-183)."""
        y, u, r = self.reshape_inputs(y, u, r)
        px = self._init_px(r)
        om = self.obs_model
        transition, initial, B = om.transition, om.initial, om.obs_dist
        p = None
        for _ in range(latent_iters):
            p, SEzz, SEz0, NA = self._role_estep(transition, initial, B, px, y, r)
            parms = self._latent_parms(self.A)
            like = self.log_likelihood_function_role(B, p, y, r)
            px_s, Sc, Sx0c, Sx0, mu0, logZ = self._smoother(parms, self.x0, like, u)
            ss = self._latent_suffstats(px_s, Sc, Sx0c, Sx0, mu0, y, u, r, logZ)
            px = px_s
        ent = jnp.where(p > 1e-8, p * jnp.log(jnp.where(p > 1e-8, p, 1.0)), 0.0)
        return ss["logZ"] - ent.sum(0).sum((-1, -2))

    # ------------------------------------------------------------ assignments
    def assignment_pr(self):
        p_role = self.obs_model.assignment_pr()
        p = p_role[..., : self.role_dims[0]].sum(-1, keepdims=True)
        out = [p]
        for n in range(self.number_of_objects):
            start = self.role_dims[0] + n * (self.role_dims[1] + self.role_dims[2])
            pb = p_role[..., start : start + self.role_dims[1]].sum(-1, keepdims=True)
            pz = p_role[
                ..., start + self.role_dims[1] : start + self.role_dims[1] + self.role_dims[2]
            ].sum(-1, keepdims=True)
            out += [pb, pz]
        return jnp.concatenate(out, -1)

    def particular_assignment_pr(self):
        p_sbz = self.assignment_pr()
        out = [p_sbz[..., :1]]
        for n in range(self.number_of_objects):
            out.append(p_sbz[..., 2 * n + 1 : 2 * n + 3].sum(-1, keepdims=True))
        return jnp.concatenate(out, -1)

    def particular_assignment(self):
        return self.particular_assignment_pr().argmax(-1)

    def assignment(self):
        return self.assignment_pr().argmax(-1)

    # ---------------------------------------------------------- introspection
    def _sbz_labels(self):
        labels = ["S "] + ["B ", "Z "] * self.number_of_objects
        if self.number_of_objects > 1:
            labels = [
                lab if i == 0 else lab + str((i + 1) // 2)
                for i, lab in enumerate(labels)
            ]
        return labels

    def _annotate_sbz(self, ax, dims, axis="x"):
        """Colored S/B/Z block labels at block centers (reference
        DynamicMarkovBlanketDiscovery.py:350-373 label layout)."""
        for i, label in enumerate(self._sbz_labels()):
            c = "red" if i == 0 else ("green" if i % 2 == 1 else "blue")
            pos = dims[0] / 2.0 + i * (dims[1] + dims[2]) / 2.0
            if i > 0:
                pos = pos - 0.5
            if axis == "x":
                ax.text(pos, -1.5, label, color=c, ha="center", va="center",
                        fontsize=10, weight="bold")
            else:
                ax.text(-1.5, pos, label, color=c, ha="center", va="center",
                        fontsize=10, weight="bold", rotation=90)

    def plot_observation(self, path=None):
        """Labeled |<B>| heatmap (roles x latent blocks), summed over
        observables — the role/emission structure sanity check (reference
        DynamicMarkovBlanketDiscovery.py:344-375). Headless-safe; saves to
        ``path`` if given and returns the figure."""
        if path is not None:
            _agg_if_no_backend()
        from matplotlib import pyplot as plt

        B = np.abs(np.asarray(self.obs_model.obs_dist.mean())).sum(-2)
        B = B.reshape(-1, B.shape[-1])
        fig, ax = plt.subplots()
        ax.imshow(B)
        self._annotate_sbz(ax, self.hidden_dims, "x")
        self._annotate_sbz(ax, self.role_dims, "y")
        ax.axis("off")
        if path is not None:
            fig.savefig(path, bbox_inches="tight")
            plt.close(fig)
        return fig

    def plot_transition(self, type="obs", use_mask=False, path=None):
        """Labeled heatmap of the role transition posterior (``type='obs'``)
        or the latent dynamics |<A>| (``type='latent'``); ``use_mask`` shows
        the structural mask instead (reference
        DynamicMarkovBlanketDiscovery.py:377-415). Headless-safe; saves to
        ``path`` if given and returns the figure."""
        if path is not None:
            _agg_if_no_backend()
        from matplotlib import pyplot as plt

        if type == "obs":
            M = (
                self.obs_model.transition_mask
                if use_mask
                else self.obs_model.transition.mean()
            )
            dims = self.role_dims
        else:
            M = self.A.mask if use_mask else jnp.abs(self.A.mean())
            dims = self.hidden_dims
        M = np.squeeze(np.asarray(M))
        if M.ndim != 2:
            raise ValueError(
                "plot_transition needs a single matrix; got shape "
                f"{M.shape} after squeezing — select one batch entry first"
            )
        if type != "obs":
            # drop the control/bias columns so the S/B/Z x-axis labels line up
            M = M[:, : M.shape[0]]
        fig, ax = plt.subplots()
        ax.imshow(M)
        self._annotate_sbz(ax, dims, "x")
        self._annotate_sbz(ax, dims, "y")
        ax.axis("off")
        if path is not None:
            fig.savefig(path, bbox_inches="tight")
            plt.close(fig)
        return fig

    def KLqprior(self):
        KL = self.x0.KLqprior() + self.A.KLqprior()
        for _ in range(len(self.offset)):
            if KL.ndim > 0:
                KL = KL[..., 0] if KL.shape[-1] == 1 else KL
        return KL + self.obs_model.KLqprior()

    def ELBO(self):
        return self.ELBO_last


def _arhmm_elog_like_X(om, B, YR, p):
    """ARHMM_prXRY.Elog_like_X with explicit obs_dist B and assignments p
    (pure; reference models/ARHMM.py:79-91)."""
    from ..utils.linalg import mT

    Y, R = YR
    invSigma_xr_xr, invSigmamu_xr, Residual = B.Elog_like_X(Y)
    p1 = om.p1
    invSigma_x_x = invSigma_xr_xr[..., :p1, :p1]
    invSigmamu_x = invSigmamu_xr[..., :p1, :] - invSigma_xr_xr[..., :p1, p1:] @ R
    Residual = Residual - 0.5 * (
        invSigma_xr_xr[..., p1:, p1:] * (R * mT(R))
    ).sum((-1, -2))
    Residual = Residual + (invSigmamu_xr[..., p1:, :] * R).sum((-1, -2))
    # role averages on the MXU: invSigma_x_x is param-only ((roles, p1, p1)),
    # so its average is one (samples, roles) @ (roles, p1^2) matmul
    invSigma_x_x = brole_avg(invSigma_x_x, p)
    invSigmamu_x = brole_avg(invSigmamu_x, p)
    Residual = (Residual * p).sum(-1)
    return invSigma_x_x, invSigmamu_x, Residual
