"""Mixture of linear dynamical systems (reference
models/MixtureofLinearDynamicalSystems.py): K LDSs batched over a system axis
+ Dirichlet responsibilities from per-system logZ."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dists import Dirichlet
from ..utils.jaxutils import sum_leading
from .lds import LinearDynamicalSystems


class MixtureofLinearDynamicalSystems:
    def __init__(self, num_systems, obs_shape, hidden_dim, control_dim, regression_dim,
                 parallel_scan=False, time_mesh=None, key=None):
        from ..utils.rng import key_or_next
        import jax.random as jr

        key = key_or_next(key)
        self.num_systems = num_systems
        # parallel_scan uses the O(log T) associative-scan smoother; it
        # implies the corrected cross-covariance math (cross_cov_compat=False,
        # same trade as DMBD's parallel path).  time_mesh shards the TIME axis
        # of the smoother over the mesh's "seq" axis (sequence parallelism,
        # parallel/seq_parallel.py) and likewise implies corrected cross-covs.
        self.lds = LinearDynamicalSystems(
            obs_shape,
            hidden_dim,
            control_dim,
            regression_dim,
            latent_noise="independent",
            batch_shape=(num_systems,),
            cross_cov_compat=not (parallel_scan or time_mesh is not None),
            parallel_scan=parallel_scan,
            time_mesh=time_mesh,
            key=key,
        )
        self.lds.expand_to_batch = True
        self.pi = Dirichlet.create((num_systems,), key=jr.fold_in(key, 1))
        self.ELBO_save = []
        self._jit = None

    def _vb_step(self, x0, A, obs_model, pi, y, u, r, lr):
        lds = self.lds
        px, ss = lds._update_latents(x0, A, obs_model, y, u, r)
        log_p = ss["logZ"] + pi.loggeomean()
        shift = jax.lax.stop_gradient(log_p.max(-1, keepdims=True))
        log_p = log_p - shift
        logZ = (jax.scipy.special.logsumexp(log_p, -1, keepdims=True) + shift)[..., 0]
        p = jnp.exp(log_p)
        p = p / p.sum(-1, keepdims=True)
        NA = sum_leading(p, 1)
        KL = pi.KLqprior() + lds._KL(x0, A, obs_model).sum(-1)
        ELBO = logZ.sum() - KL
        pi = pi.ss_update(NA, lr=lr)
        x0, A, stats = lds._ss_update(x0, A, ss, p=p, lr=lr)
        obs_model = obs_model.ss_update(
            stats["SE_xr_xr"], stats["SE_y_xr"], stats["SE_y_y"], stats["T"], lr
        )
        return x0, A, obs_model, pi, p, logZ, ELBO

    def _vb_multi(self, x0, A, obs_model, pi, y, u, r, lr, iters):
        def body(carry, _):
            x0, A, obs_model, pi = carry
            x0, A, obs_model, pi, _p, _logZ, ELBO = self._vb_step(
                x0, A, obs_model, pi, y, u, r, lr
            )
            return (x0, A, obs_model, pi), ELBO

        # stack only ELBOs; the last sweep runs outside the scan so the
        # (b, K) responsibilities aren't written to an iters-stacked buffer
        carry, ELBOs = jax.lax.scan(
            body, (x0, A, obs_model, pi), None, length=iters - 1
        )
        x0, A, obs_model, pi, p, logZ, ELBO = self._vb_step(*carry, y, u, r, lr)
        ELBOs = jnp.concatenate([ELBOs, ELBO[None]], 0)
        return x0, A, obs_model, pi, p, logZ, ELBOs

    def update(self, y, u=None, r=None, iters=1, lr=1.0, verbose=False):
        if iters < 1:
            raise ValueError(f"iters must be >= 1, got {iters}")
        y, u, r = self.lds.reshape_inputs(y, u, r)
        # key on smoother flags: they're baked into the trace (see lds._jitted)
        from ..ops.parallel_kalman import _dispatch_state

        jkey = (
            self.lds.parallel_scan,
            self.lds.cross_cov_compat,
            getattr(self.lds, "time_mesh", None),
            _dispatch_state(),
        )
        if not isinstance(self._jit, dict):
            self._jit = {}
        if jkey not in self._jit:
            self._jit[jkey] = jax.jit(self._vb_multi, static_argnames=("iters",))
        _jit = self._jit[jkey]
        ELBO_last = -jnp.inf
        (
            self.lds.x0,
            self.lds.A,
            self.lds.obs_model,
            self.pi,
            self.p,
            self.logZ,
            ELBOs,
        ) = _jit(
            self.lds.x0, self.lds.A, self.lds.obs_model, self.pi, y, u, r, lr, iters
        )
        # one host fetch for the whole trajectory of ELBOs — iterating the
        # device array would round-trip per element (expensive on
        # remote-attached TPUs)
        import numpy as np

        ELBOs = np.asarray(ELBOs)
        for ELBO in ELBOs:
            if verbose:
                print(
                    "Percent Change in ELBO = %f"
                    % float((ELBO - ELBO_last) / jnp.abs(ELBO_last) * 100)
                )
            ELBO_last = ELBO
            self.ELBO_save.append(float(ELBO))
        self.NA = sum_leading(self.p, 1)

    def KLqprior(self):
        return self.pi.KLqprior() + self.lds.KLqprior().sum(-1)

    def assignment_pr(self):
        return self.p

    def assignment(self):
        return self.p.argmax(-1)
