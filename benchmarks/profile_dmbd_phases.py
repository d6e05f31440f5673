"""Device-side phase profile of one DMBD coordinate-ascent sweep.

Each phase is timed as a rep-scan (lax.scan with a data-dependency threaded
through the carry so XLA cannot hoist or CSE the body) at two rep counts;
the slope isolates device compute from the fixed per-call tunnel round-trip
(~30-45 ms on axon-attached chips).

Usage: python benchmarks/profile_dmbd_phases.py [lorenz|flocking]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _first_float(leaves):
    for i, l in enumerate(leaves):
        if (
            hasattr(l, "dtype")
            and np.issubdtype(np.dtype(l.dtype), np.floating)
            and np.prod(l.shape) > 0
        ):
            return i
    raise ValueError("no float leaf")


def make_timer():
    import jax
    import jax.numpy as jnp

    def time_phase(name, fn, args, reps=(20, 120)):
        leaves, treedef = jax.tree_util.tree_flatten(args)

        def body(c, _):
            # Perturb EVERY float input leaf: if the carry-dependent leaf
            # doesn't feed the phase's output, the body is loop-invariant
            # and XLA hoists it out of the rep scan (slope then reads ~0).
            pert = [
                l + jnp.asarray(c, l.dtype)
                if np.issubdtype(np.dtype(l.dtype), np.floating)
                else l
                for l in leaves
            ]
            out = fn(*jax.tree_util.tree_unflatten(treedef, pert))
            # The carry must depend on EVERY output leaf: depending on a
            # single element lets XLA dead-code-eliminate all computation
            # not feeding that element (elementwise phases then measure ~0).
            # The full-leaf reductions add one read pass per output — a
            # small, uniform bias.
            s = jnp.float32(0.0)
            for l in jax.tree_util.tree_leaves(out):
                if np.issubdtype(np.dtype(l.dtype), np.floating):
                    s = s + jnp.asarray(l, jnp.float32).sum()
            return s * 1e-38, None

        times = {}
        for n in reps:
            f = jax.jit(
                lambda: jax.lax.scan(body, jnp.float32(0.0), None, length=n)[0]
            )
            r = f()
            np.asarray(r)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f())
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        n1, n2 = reps
        slope = (times[n2] - times[n1]) / (n2 - n1)
        print(f"{name:34s} {slope*1e3:8.3f} ms/rep   "
              f"(fixed ~{(times[n1]-slope*n1)*1e3:5.1f} ms)")
        return slope

    return time_phase


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "lorenz"
    import jax
    import jax.numpy as jnp

    from pyvbmp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache("/tmp/jax_comp_cache", min_compile_secs=1.0)

    from pyvbmp_tpu.models import DynamicMarkovBlanketDiscovery
    from pyvbmp_tpu.models.dmbd import _arhmm_elog_like_X
    from pyvbmp_tpu.dists.mvn_vector_format import MultivariateNormal_vector_format as MVN_vf

    if which == "lorenz":
        from pyvbmp_tpu.simulations import Lorenz

        sim = Lorenz()
        T, b = 399, int(sys.argv[2]) if len(sys.argv) > 2 else 100
        sim.num_steps = T * 5 + 6
        data = np.asarray(sim.simulate(b, key=jax.random.key(0))[:T], np.float32)
        m = DynamicMarkovBlanketDiscovery(
            obs_shape=(3, 2), role_dims=(1, 2, 1), hidden_dims=(2, 2, 2),
            regression_dim=-1, control_dim=-1, parallel_scan=True,
        )
    else:
        # same config as benchmarks/flocking_bench.py (the north star)
        from pyvbmp_tpu.simulations import Flocking

        T, b = 150, 20
        sim = Flocking(n_birds=12, Tmax=T, batch_size=b)
        data = np.asarray(sim.simulate(jax.random.key(0)), np.float32)
        m = DynamicMarkovBlanketDiscovery(
            obs_shape=data.shape[-2:], role_dims=(2, 2, 2), hidden_dims=(2, 2, 2),
            number_of_objects=3, parallel_scan=True,
        )

    y, u, r = m.reshape_inputs(data)
    m.update(data, iters=1)  # initialize posteriors realistically

    om = m.obs_model
    x0, A, B = m.x0, m.A, om.obs_dist
    transition, initial = om.transition, om.initial
    px = m.px if m.px is not None else m._init_px(r)
    unsdim = om.event_dim + 2

    time_phase = make_timer()

    # phase 1: obs logits (roles x obs x T likelihood assembly)
    def obs_logits(B, px_mu, px_Sigma, px_ism, px_is, y, r):
        pxl = MVN_vf(mu=px_mu, Sigma=px_Sigma, invSigmamu=px_ism, invSigma=px_is)
        px4r = m._px4r(pxl, r)
        XRY = (px4r, jnp.expand_dims(r, -unsdim), jnp.expand_dims(y, -unsdim))
        return om._obs_logits(B, XRY)

    logits = jax.jit(obs_logits)(B, px.mu, px.Sigma, px.invSigmamu, px.invSigma, y, r)
    sl_logits = time_phase("obs_logits (role likelihoods)", obs_logits,
                           (B, px.mu, px.Sigma, px.invSigmamu, px.invSigma, y, r))

    # phase 2: role forward-backward
    from pyvbmp_tpu.models.hmm import smoother_dispatch

    fb = smoother_dispatch(m)

    def role_fb(lg, ig, logits):
        return fb(lg, ig, logits, om.ptemp)

    lg, ig = transition.loggeomean(), initial.loggeomean()
    p_fb = jax.jit(role_fb)(lg, ig, logits)[0]
    sl_fb = time_phase("role forward-backward", role_fb, (lg, ig, logits))

    # phase 3: role-averaged obs message assembly
    def like_fn(B, p, y, r):
        return m.log_likelihood_function_role(B, p, y, r)

    like = jax.jit(like_fn)(B, p_fb, y, r)
    sl_like = time_phase("role-avg obs messages", like_fn, (B, p_fb, y, r))

    # phase 4: Kalman smoother
    parms = jax.jit(m._latent_parms)(A)

    def smoother(parms, x0, like, u):
        return m._smoother(parms, x0, like, u)

    sm = jax.jit(smoother)(parms, x0, like, u)
    sl_sm = time_phase("Kalman smoother", smoother, (parms, x0, like, u))

    # phase 5: latent suff stats
    pxs, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, logZ = sm

    def suffstats(pxt, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0, y, u, r, logZ):
        return m._latent_suffstats(
            MVN_vf(*pxt), Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0,
            y, u, r, logZ,
        )

    pxt = (pxs.mu, pxs.Sigma, pxs.invSigmamu, pxs.invSigma)
    ss = jax.jit(suffstats)(pxt, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0,
                            mu_x0, y, u, r, logZ)
    sl_ss = time_phase("latent suff stats", suffstats,
                       (pxt, Sigma_cross, Sigma_x0_cross, Sigma_x0_x0, mu_x0,
                        y, u, r, logZ))

    # phase 6: all M-steps (role + latent + transition). Return FULL pytrees
    # so XLA cannot dead-code-eliminate the natural-parameter updates.
    def msteps(B, p, SEzz, SEz0, x0, A, ss, pxt, y, r):
        transition2 = transition.ss_update(SEzz, lr=1.0)
        initial2 = initial.ss_update(SEz0, lr=1.0)
        pxl = MVN_vf(*pxt)
        px4r = m._px4r(pxl, r)
        XRY = (px4r, jnp.expand_dims(r, -unsdim), jnp.expand_dims(y, -unsdim))
        B2 = om._obs_update(B, XRY, p, 1.0, None)
        x02, A2, stats = m._ss_update(x0, A, ss, p=None, lr=1.0)
        return transition2, initial2, B2, x02, A2

    keep = om.batch_dim + om.event_dim
    from pyvbmp_tpu.utils.jaxutils import sum_leading

    # reconstruct SEzz/SEz0 the way _role_estep does
    p_full, SEzz, SEz0, logZ_fb = jax.jit(role_fb)(lg, ig, logits)
    SEzz = sum_leading(SEzz, keep + 1)
    SEz0 = sum_leading(SEz0, keep)
    sl_ms = time_phase("all M-steps", msteps,
                       (B, p_full, SEzz, SEz0, x0, A, ss, pxt, y, r))

    # phase 7: ELBO bookkeeping (KL chains + entropy/transition contribs)
    from pyvbmp_tpu.utils.jaxutils import sum_leading as _sl

    def elbo_tail(B, p, SEzz, SEz0, x0, A, logZ):
        KL = x0.KLqprior() + A.KLqprior()
        for _ in range(len(m.offset)):
            if KL.ndim > 0:
                KL = KL[..., 0] if KL.shape[-1] == 1 else KL
        KL = KL + (
            B.KLqprior().sum(-1)
            + transition.KLqprior().sum(-1)
            + initial.KLqprior()
        )
        lgm = transition.loggeomean()
        contrib = jnp.where(jnp.isfinite(lgm), lgm * SEzz, 0.0).sum()
        contrib = contrib + (initial.loggeomean() * SEz0).sum()
        contrib = contrib - jnp.where(
            p > 1e-8, p * jnp.log(jnp.where(p > 1e-8, p, 1.0)), 0.0
        ).sum()
        return _sl(logZ, m.batch_dim).sum() - KL.sum() + contrib

    logZ_ss = ss["logZ"]
    sl_elbo = time_phase("ELBO bookkeeping", elbo_tail,
                         (B, p_full, SEzz, SEz0, x0, A, logZ_ss))

    total = sl_logits + sl_fb + sl_like + sl_sm + sl_ss + sl_ms + sl_elbo
    print(f"{'sum of phases':34s} {total*1e3:8.3f} ms")

    # full fused sweep slope for comparison
    def full_sweep_slope(iters_pair=(30, 130)):
        times = {}
        for n in iters_pair:
            m.update(data, iters=n)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                m.update(data, iters=n)
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        n1, n2 = iters_pair
        return (times[n2] - times[n1]) / (n2 - n1)

    fs = full_sweep_slope()
    print(f"{'full fused sweep (measured)':34s} {fs*1e3:8.3f} ms/iter")


if __name__ == "__main__":
    main()
