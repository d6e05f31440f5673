"""Sequence (time-axis) parallelism: the context-parallel analogue for
chain-structured smoothers (SURVEY.md §2.8 SP/CP row, §5.7).

The associative-scan smoothers compose per-time elements with an associative
operator, so the time axis can shard over a mesh axis: each device runs the
scan on its local chunk, the D per-chunk totals are all_gathered (tiny — one
element each), every device folds the totals of its predecessors into an
"external prefix", and applies it to its local results. Total cross-device
traffic per scan: one all_gather of D elements + the halo shifts — O(D)
elements, independent of T.

None of our combines has an identity element (the Gaussian-potential combine
solves against the middle precision), so the external prefix is built by a
masked fold over valid predecessors instead of an identity-seeded reduce.

Works inside ``jax.shard_map`` over the mesh axis that shards time. The
user-facing wrapper ``time_sharded_forward_backward`` reproduces
ops.parallel_hmm.forward_backward_parallel with time sharded; equivalence is
checked in tests/test_seq_parallel.py on the 8-virtual-device CPU mesh.
"""
from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp

from ..utils import math as um
from ..ops.chunked_scan import swapped_combine


def _tree_at(tree, i):
    return jax.tree.map(lambda a: a[i], tree)


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def _lift_rank(v, x):
    """Broadcast a (time,)-shaped (or scalar) mask against a (time,)+batch
    leaf by appending singleton dims."""
    return v.reshape(v.shape + (1,) * (x.ndim - v.ndim))


@functools.lru_cache(maxsize=None)
def _masked_combine(fn):
    """Adjoin an identity to an arbitrary semigroup via validity flags (the
    standard monoid completion): elements become (value, valid) and invalid
    elements act as the identity.  Associative whenever ``fn`` is.  This is
    what lets an indivisible T be padded with duplicate-last elements that
    are *exactly* inert in both scan directions."""

    def g(a, b):
        e1, v1 = a
        e2, v2 = b
        fe = fn(e1, e2)
        both = v1 & v2
        out = jax.tree.map(
            lambda x, y, f: jnp.where(
                _lift_rank(both, f), f, jnp.where(_lift_rank(v1, f), x, y)
            ),
            e1,
            e2,
            fe,
        )
        return out, v1 | v2

    return g


def sharded_associative_scan(fn, elems, axis_name, reverse=False, valid=None):
    """``jax.lax.associative_scan(fn, elems, axis=0)`` with axis 0 sharded
    over ``axis_name``. Call inside shard_map; ``elems`` hold the LOCAL time
    chunk. Returns the local chunk of the global inclusive scan.

    ``fn`` must be associative; no identity element is required.

    ``valid`` (optional): a (T_local,) bool array marking real rows; rows
    with ``valid=False`` behave as the identity element (monoid completion)
    — used to pad an indivisible global T up to the mesh axis size.
    """
    if valid is not None:
        tree, mfn = (elems, valid), _masked_combine(fn)
        if reverse:
            flipped = jax.tree.map(lambda a: jnp.flip(a, 0), tree)
            out = _sharded_prefix(
                swapped_combine(mfn), flipped, axis_name, flip_axis=True
            )
            return jax.tree.map(lambda a: jnp.flip(a, 0), out)[0]
        return _sharded_prefix(mfn, tree, axis_name, flip_axis=False)[0]
    if reverse:
        # suffix scan = prefix scan on the time-reversed chain with flipped
        # operands; recurse through the forward implementation.
        flipped = jax.tree.map(lambda a: jnp.flip(a, 0), elems)
        # device order along the time axis also reverses
        out = _sharded_prefix(
            swapped_combine(fn), flipped, axis_name, flip_axis=True
        )
        return jax.tree.map(lambda a: jnp.flip(a, 0), out)
    return _sharded_prefix(fn, elems, axis_name, flip_axis=False)


def _sharded_prefix(fn, elems, axis_name, flip_axis):
    from ..ops.chunked_scan import auto_scan

    local = auto_scan(fn, elems)
    D = jax.lax.axis_size(axis_name)
    if D == 1:  # single-device mesh: no cross-chunk prefix, skip the collective
        return local
    total = _tree_at(local, -1)
    # (D,) + element_shape per leaf
    alls = jax.lax.all_gather(total, axis_name)
    idx = jax.lax.axis_index(axis_name)
    if flip_axis:
        # chunk d holds times [T - (d+1)*C, T - d*C): device order reversed
        idx = D - 1 - idx
        alls = jax.tree.map(lambda a: jnp.flip(a, 0), alls)

    # external prefix = fold of chunk totals 0..idx-1 (valid only for idx>0)
    ext = _tree_at(alls, 0)
    for j in range(1, D - 1):
        cand = fn(ext, _tree_at(alls, j))
        ext = _tree_where(j < idx, cand, ext)
    # combines that mix leaves (e.g. concatenate) don't rank-broadcast:
    # lift ext to the local chunk's leading time dim explicitly
    ext_b = jax.tree.map(
        lambda e, l: jnp.broadcast_to(e[None], l.shape), ext, local
    )
    out = fn(ext_b, local)
    return _tree_where(idx > 0, out, local)


def shift_up(x, axis_name, fill=0.0):
    """x[t] <- x[t+1] across the sharded time axis (zero-fill at the global
    end): local roll + halo exchange of each device's first row with its
    left neighbour via ppermute."""
    D = jax.lax.axis_size(axis_name)

    def one(a):
        nxt = jnp.concatenate(
            [a[1:], jnp.full_like(a[:1], fill)], 0
        )
        if D == 1:
            return nxt
        # send my first row to my left neighbour (device d -> d-1 in time order)
        perm = [(d, (d - 1) % D) for d in range(D)]
        halo = jax.lax.ppermute(a[:1], axis_name, perm)
        idx = jax.lax.axis_index(axis_name)
        tail = jnp.where(idx == D - 1, jnp.full_like(halo, fill), halo)
        return nxt.at[-1:].set(tail)

    return jax.tree.map(one, x)


def shift_down(x, axis_name, first_row):
    """x[t] <- x[t-1] across the sharded time axis; the global row 0 becomes
    ``first_row`` (shape = one time row)."""
    D = jax.lax.axis_size(axis_name)

    def one(a, fr):
        frow = fr[None] if fr.ndim == a.ndim - 1 else fr[:1]
        prev = jnp.concatenate([frow, a[:-1]], 0)
        if D == 1:
            return prev
        # send my last row to my right neighbour (device d -> d+1 in time order)
        perm = [(d, (d + 1) % D) for d in range(D)]
        halo = jax.lax.ppermute(a[-1:], axis_name, perm)
        idx = jax.lax.axis_index(axis_name)
        head = jnp.where(idx == 0, frow, halo)
        return prev.at[:1].set(head)

    return jax.tree.map(one, x, first_row)


def _batch_axis_of(mesh, time_axis, batch_axis):
    """Resolve the optional data-parallel axis of a 2D (seq x data) mesh:
    "auto" picks the first non-time axis if one exists."""
    if batch_axis == "auto":
        others = [a for a in mesh.axis_names if a != time_axis]
        return others[0] if others else None
    return batch_axis


def _resolve_axes(mesh, time_axis, batch_axis, T, batch_size):
    """Resolve the padding of T against the time mesh axis and the optional
    batch axis.  Returns ``(batch_axis_or_None, pad)`` where ``pad`` rows of
    inert (masked-identity) duplicate-last padding bring T up to a multiple
    of the axis size — any T works, including the north-star shapes
    (Flocking T=150, Lorenz T=399) on an 8-way mesh.

    ``batch_axis="auto"`` shards the batch dim over the first non-time axis
    when one exists AND the batch divides evenly — otherwise it falls back
    to seq-only sharding (with a warning) instead of crashing. An explicitly
    named batch_axis still raises on indivisibility."""
    D = mesh.shape[time_axis]
    pad = (-T) % D
    requested = batch_axis
    batch_axis = _batch_axis_of(mesh, time_axis, batch_axis)
    if batch_axis is None or batch_size is None:
        return None, pad
    Db = mesh.shape[batch_axis]
    if batch_size % Db != 0:
        if requested == "auto":
            # a silent loss of data parallelism is a large perf cliff on a
            # 2D mesh — tell the user once per (axis, batch) combination
            warnings.warn(
                f"time_mesh: batch={batch_size} does not divide the "
                f"'{batch_axis}' mesh axis size {Db}; falling back to "
                f"seq-only sharding (no data parallelism). Pad the batch "
                f"or pass batch_axis explicitly to silence this.",
                stacklevel=3,
            )
            return None, pad
        raise ValueError(
            f"batch={batch_size} must be divisible by the '{batch_axis}' "
            f"mesh axis size {Db}"
        )
    return batch_axis, pad


def _pad_time(tree, pad):
    """Append ``pad`` duplicate-last rows along axis 0 of every leaf (the
    duplicates keep every combine numerically well-conditioned; the masked
    scan makes them exactly inert)."""
    if pad == 0:
        return tree
    return jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], 0
        ),
        tree,
    )


def time_sharded_forward_backward(trans_logits, init_logits, obs_logits, mesh,
                                  ptemp=1.0, time_axis="seq",
                                  batch_axis="auto"):
    """forward_backward_parallel with the TIME axis sharded over
    ``mesh[time_axis]`` (sequence parallelism). Same returns:
    (p, SEzz, SEz0, logZ); p comes back sharded over time, the reductions
    replicated over time.

    trans_logits: (K, K), init_logits: (K,), obs_logits: (T,)+batch+(K,).
    Any T works: an indivisible T is padded with masked-identity rows (dropped from outputs and reductions).

    On a 2D (seq x data) mesh, ``batch_axis`` (default "auto": the first
    non-time axis) additionally shards the batch dim (axis 1 of obs_logits) —
    combined sequence + data parallelism. The body is batch-elementwise, so
    no extra collectives are needed; per-sequence reductions stay sharded
    over data.
    """
    batch_axis, pad = _resolve_axes(
        mesh, time_axis, batch_axis, obs_logits.shape[0],
        obs_logits.shape[1] if obs_logits.ndim > 2 else None,
    )

    from ..ops.chunked_scan import scan_dispatch_state

    # ptemp rides as a runtime operand (replicated): traced values work —
    # same contract as forward_backward_parallel's inline fallback
    return _jit_fb(mesh, time_axis, batch_axis, scan_dispatch_state(),
                   pad=pad)(
        trans_logits, init_logits, obs_logits,
        jnp.asarray(ptemp, obs_logits.dtype),
    )


@functools.lru_cache(maxsize=None)
def _jit_fb(mesh, time_axis, batch_axis, _state=None, per_time_xi=False,
            pad=0):
    """Jitted shard_map program for the time-sharded forward-backward,
    memoized on the static arguments. An un-jitted shard_map call dispatches
    the body eagerly (order-of-magnitude slower than the compiled program
    and re-traced every call); the cache makes eager wrapper use pay trace +
    compile once per (mesh, statics, shapes).

    ``per_time_xi=True`` is the driven (per-time-transition) variant: trans
    is (T,)-leading and sharded over time, and the pairwise marginals come
    back per-time instead of time-summed (models/dhmm.py semantics).

    ``pad`` > 0: the entry pads the time axis with ``pad`` duplicate-last
    rows so any T works on the mesh; the masked scans make the pad rows
    exactly inert and the entry slices them back off."""
    from jax.sharding import PartitionSpec as P

    def body(trans, init, obs, ptemp):
        M = trans + obs[:, ..., None, :]

        valid = None
        if pad:
            # global row index of each local row; rows >= T_real are inert
            L = obs.shape[0]
            D = jax.lax.axis_size(time_axis)
            T_real = L * D - pad
            gidx = jax.lax.axis_index(time_axis) * L + jnp.arange(L)
            valid = gidx < T_real

        prefix = sharded_associative_scan(
            um.logmatmulexp, M, time_axis, valid=valid
        )
        suffix = sharded_associative_scan(
            um.logmatmulexp, M, time_axis, reverse=True, valid=valid
        )

        alpha = um.stable_logsumexp(init[..., :, None] + prefix, -2)
        # global last row of alpha lives on the last device (under padding
        # the masked prefix passes the last REAL total through the pad rows,
        # so the last local row still equals alpha[T_real-1]).  Masked psum
        # rather than all_gather[-1]: psum output is statically
        # known-replicated, keeping check_vma enabled.
        idx0 = jax.lax.axis_index(time_axis)
        nD = jax.lax.axis_size(time_axis)
        alpha_last = jax.lax.psum(
            jnp.where(idx0 == nD - 1, alpha[-1], jnp.zeros_like(alpha[-1])),
            time_axis,
        )
        logZ = um.stable_logsumexp(alpha_last, -1, keepdims=True)
        alpha = alpha - logZ
        logZ = logZ[..., 0]

        beta = um.stable_logsumexp(suffix, -1)
        beta_t = shift_up(beta, time_axis, fill=0.0)
        if pad:
            # the global chain now ends at T_real-1, not at the array end:
            # re-apply the end fill there (shift_up only fills the array end)
            at_end = _lift_rank(gidx == T_real - 1, beta_t)
            beta_t = jnp.where(at_end, 0.0, beta_t)

        smoothed = alpha + beta_t
        smoothed = smoothed - um.stable_logsumexp(smoothed, -1, keepdims=True)

        init_row = jnp.broadcast_to(init, alpha.shape[1:])
        alpha_prev = shift_down(alpha, time_axis, init_row)
        xi = alpha_prev[..., :, None] + M + beta_t[..., None, :]
        xi = jnp.exp(xi - um.stable_logsumexp(xi, (-1, -2), keepdims=True))
        if pad:
            # pad rows carry (finite) garbage pairwise marginals: zero them
            # out of the time-summed statistics
            xi = xi * _lift_rank(valid, xi).astype(xi.dtype)
        # SEz0 = xi[global t=0].sum(-1): device 0 owns it; psum of a masked
        # local contribution replicates it
        idx = jax.lax.axis_index(time_axis)
        SEz0_local = jnp.where(idx == 0, xi[0].sum(-1), jnp.zeros_like(xi[0].sum(-1)))
        SEz0 = jax.lax.psum(SEz0_local, time_axis)
        SEzz = xi if per_time_xi else jax.lax.psum(xi.sum(0), time_axis)

        p = jnp.exp((smoothed - smoothed.max(-1, keepdims=True)) / ptemp)
        p = p / p.sum(-1, keepdims=True)
        return p, SEzz, SEz0, logZ

    if batch_axis is not None:
        tb = P(time_axis, batch_axis)  # (T, batch, ...) arrays
        b0 = P(batch_axis)  # per-sequence reductions: batch leading
    else:
        tb, b0 = P(time_axis), P()
    shard = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(tb if per_time_xi else P(), P(), tb, P()),
        out_specs=(tb, tb if per_time_xi else b0, b0, b0),
        # the psum/all_gather outputs ARE replicated over time; static
        # inference can't see through the masked-fold/index pattern, so skip
        # the check
        check_vma=True,
    )
    if pad == 0:
        return jax.jit(shard)

    def entry(trans, init, obs, ptemp):
        T = obs.shape[0]
        obs = _pad_time(obs, pad)
        if per_time_xi:
            trans = _pad_time(trans, pad)
        p, SEzz, SEz0, logZ = shard(trans, init, obs, ptemp)
        p = p[:T]
        if per_time_xi:
            SEzz = SEzz[:T]
        return p, SEzz, SEz0, logZ

    return jax.jit(entry)


def time_sharded_driven_forward_backward(trans_logits, init_logits, obs_logits,
                                         mesh, ptemp=1.0, time_axis="seq",
                                         batch_axis="auto"):
    """driven_forward_backward_parallel (per-time transition logits,
    models/dhmm.py semantics) with the TIME axis sharded over
    ``mesh[time_axis]``. Returns (p, SEzz per-time, SEz0, logZ); p and SEzz
    come back sharded over time.

    trans_logits: (T,) + batch + (K, K), obs_logits: (T,) + batch + (K,).
    Any T works: an indivisible T is padded with masked-identity rows (dropped from outputs and reductions).
    """
    batch_axis, pad = _resolve_axes(
        mesh, time_axis, batch_axis, obs_logits.shape[0],
        obs_logits.shape[1] if obs_logits.ndim > 2 else None,
    )

    from ..ops.chunked_scan import scan_dispatch_state

    return _jit_fb(mesh, time_axis, batch_axis, scan_dispatch_state(),
                   per_time_xi=True, pad=pad)(
        trans_logits, init_logits, obs_logits,
        jnp.asarray(ptemp, obs_logits.dtype),
    )


def time_sharded_kalman_smoother(parms, x0, like, u, mesh, time_axis="seq",
                                 batch_axis="auto"):
    """ops.parallel_kalman.parallel_kalman_smoother with the TIME axis
    sharded over ``mesh[time_axis]`` (sequence parallelism for the
    continuous chain). Same return contract; any T works (masked-identity padding).

    The Gaussian-potential combine is associative but has no identity, so
    the cross-device prefix uses the masked fold in
    ``sharded_associative_scan``; the +-1-step tails (backward message
    shift, alpha_{t-1} for cross-covariances) become ppermute halo
    exchanges.

    On a 2D (seq x data) mesh, ``batch_axis`` (default "auto") additionally
    shards the leading batch dim of the potentials (axis 1 of the (T,)+bshape
    element arrays) — combined sequence + data parallelism with no extra
    collectives (the combine is batch-elementwise).
    """
    # element batch shape by pure shape math (the elements themselves are
    # built INSIDE the jitted program so eager calls don't pay per-op
    # dispatch for the ~20-op construction graph); shared with
    # _build_elements so the broadcast rule can't desynchronize
    from ..ops.parallel_kalman import element_batch_shape

    bshape, hdim = element_batch_shape(parms, like)
    batch_axis, pad = _resolve_axes(
        mesh, time_axis, batch_axis, like[0].shape[0],
        bshape[0] if len(bshape) > 2 else None,
    )

    Sigma, mu, Js, hs, Sigma_cross_all, Sigma_x0_x0, mu_x0, logZ_total = _jit_kalman(
        mesh, time_axis, batch_axis, hdim, _kalman_dispatch_state(), pad=pad
    )(parms, x0, like, u)
    return (
        (Sigma, mu, Js, hs),
        Sigma_cross_all[1:],
        Sigma_cross_all[0],
        Sigma_x0_x0,
        mu_x0,
        logZ_total,
    )


def _kalman_dispatch_state():
    """Kalman memo key: the full scan-dispatch state including the
    Kalman-only scan-element dtype (parallel_kalman._dispatch_state); the
    HMM wrappers above key on the chunked-scan state alone."""
    from ..ops.parallel_kalman import _dispatch_state

    return _dispatch_state()


@functools.lru_cache(maxsize=None)
def _jit_kalman(mesh, time_axis, batch_axis, hdim, _state=None, pad=0):
    """Jitted shard_map program for time_sharded_kalman_smoother, memoized
    on the statics (see _jit_fb for why eager shard_map must be avoided).

    ``pad`` > 0: the entry pads the element arrays with duplicate-last rows
    up to a multiple of the mesh axis; the masked scans make pad rows
    exactly inert (monoid completion — the Gaussian-potential combine has
    no representable identity) and the entry slices them back off."""
    from jax.sharding import PartitionSpec as P
    from ..ops.parallel_kalman import (
        _combine,
        _marginalize_left,
        _marginalize_right,
    )
    from ..utils.linalg import sym_inv, sym_inv_and_logdet, sym_solve_and_logdet, mT

    def body(Jaa, Jab, Jbb, ha, hb, logw):
        el = (Jaa, Jab, Jbb, ha, hb, logw)
        valid = None
        if pad:
            L = logw.shape[0]
            D = jax.lax.axis_size(time_axis)
            T_real = L * D - pad
            gidx = jax.lax.axis_index(time_axis) * L + jnp.arange(L)
            valid = gidx < T_real
        prefix = sharded_associative_scan(_combine, el, time_axis, valid=valid)
        # NOTE: unlike lax.associative_scan(reverse=True), this API flips the
        # operand order internally — pass the plain forward combine
        suffix = sharded_associative_scan(
            _combine, el, time_axis, reverse=True, valid=valid
        )

        Ja, hva, logca = jax.vmap(lambda e: _marginalize_left(*e))(prefix)
        Jb_all, hvb_all, _ = jax.vmap(lambda e: _marginalize_right(*e))(suffix)
        Jbeta = shift_up(Jb_all, time_axis)
        hbeta = shift_up(hvb_all, time_axis)
        if pad:
            # the global chain ends at T_real-1: the backward message there
            # is the empty (zero) potential, exactly shift_up's end fill
            at_end = gidx == T_real - 1
            Jbeta = jnp.where(_lift_rank(at_end, Jbeta), 0.0, Jbeta)
            hbeta = jnp.where(_lift_rank(at_end, hbeta), 0.0, hbeta)

        Js = Ja + Jbeta
        hs = hva + hbeta
        Sigma, _ld = sym_inv_and_logdet(Js)
        mu = Sigma @ hs

        idx = jax.lax.axis_index(time_axis)
        first = lambda a: jax.lax.psum(
            jnp.where(idx == 0, a[0], jnp.zeros_like(a[0])), time_axis
        )
        Sigma_x0_x0 = sym_inv(first(Jb_all))
        mu_x0 = Sigma_x0_x0 @ first(hvb_all)

        Jalpha_prev = shift_down(Ja, time_axis, jnp.zeros_like(Ja[0]))
        A = Jalpha_prev + Jaa
        B = Jab
        D = Jbb + Jbeta
        Ainv_B = sym_inv(A) @ B
        Sbb = sym_inv(D - mT(B) @ Ainv_B)
        Sigma_cross_all = -Ainv_B @ Sbb

        # global last filtered potential for logZ.  Masked psum rather than
        # all_gather[-1]: psum output is statically known-replicated, which
        # keeps shard_map's check_vma safety net enabled (all_gather output
        # is conservatively inferred time-varying even though its content is
        # identical on every device).
        nD = jax.lax.axis_size(time_axis)
        last = lambda a: jax.lax.psum(
            jnp.where(idx == nD - 1, a, jnp.zeros_like(a)), time_axis
        )
        Ja_l = last(Ja[-1])
        hva_l = last(hva[-1])
        logca_l = last(logca[-1])
        sol, logdetJ = sym_solve_and_logdet(Ja_l, hva_l)
        logZ_total = (
            logca_l
            + 0.5 * (hva_l * sol).sum((-1, -2))
            - 0.5 * logdetJ
            + 0.5 * hdim * um.LOG2PI
        )
        return Sigma, mu, Js, hs, Sigma_cross_all, Sigma_x0_x0, mu_x0, logZ_total

    if batch_axis is not None:
        sh = P(time_axis, batch_axis)
        b0 = P(batch_axis)
    else:
        sh, b0 = P(time_axis), P()
    shard = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(sh,) * 6,
        out_specs=(sh, sh, sh, sh, sh, b0, b0, b0),
        check_vma=True,
    )

    def entry(parms, x0, like, u):
        # element construction lives inside the jitted program: eager
        # callers would otherwise pay per-op dispatch for its ~20-op graph
        from ..ops.parallel_kalman import _build_elements

        elems, _bshape, T, _h = _build_elements(parms, x0, like, u)
        if pad:
            elems = _pad_time(elems, pad)
        out = shard(*elems)
        if pad:
            # slice the inert pad rows off every time-leading output
            # (Sigma, mu, Js, hs, Sigma_cross_all); the replicated tails
            # (x0 marginals, logZ) are already exact
            out = tuple(a[:T] for a in out[:5]) + out[5:]
        return out

    return jax.jit(entry)
