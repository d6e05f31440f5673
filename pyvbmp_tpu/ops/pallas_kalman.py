"""Pallas TPU kernel: sequential information-filter Kalman smoother.

Speed-of-light take on the LDS E-step (SURVEY §7 kernel priority #2): the
associative-scan smoother is throughput-optimal in XLA but does ~2*log2(T)
full passes over (T, batch) element tensors in HBM. At DMBD-like shapes the
whole per-lane state (a symmetric h x h precision + h-vector + residual)
fits in registers/VMEM, so a *sequential* scan inside one kernel — batch on
the 128 lanes, model parameters as scalars, matrices as per-lane component
vectors — touches HBM once per time step and runs the small-matrix algebra
as straight-line vector ops on the VPU.

Layout: every symmetric h x h matrix is kept as h*(h+1)/2 lane-vectors
(component index on the sublane axis), general matrices as h*h. The
recursions are metaprogrammed over index dicts, so `h` is a trace-time
constant and arbitrary (small) sizes work.

This is an opt-in prototype: `pallas_filter` covers the forward information
filter (filtered precisions/means + per-step logZ) and is validated against
models/lds.forward_backward_loop's forward pass. The full smoother (backward
RTS + cross-covariances) stays on the associative-scan path for now.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import math as um


# ---------------------------------------------------------------- index maps
def _sym_idx(h):
    """Pairs (i, j), i<=j, in row-major upper-triangle order."""
    return [(i, j) for i in range(h) for j in range(i, h)]


def _sym_get(comp, i, j):
    return comp[(i, j)] if i <= j else comp[(j, i)]


def _sym_from_rows(h, rows):
    return {(i, j): rows[k] for k, (i, j) in enumerate(_sym_idx(h))}


# --------------------------------------------------- straight-line sym solve
def _sym_inv_logdet_comp(h, A):
    """Inverse + logdet of a symmetric matrix given as a component dict of
    lane-vectors; mirrors utils.linalg.sym_inv_and_logdet's recursion."""
    if h == 1:
        det = A[(0, 0)]
        return {(0, 0): 1.0 / det}, jnp.log(det)
    if h == 2:
        a, b, d = A[(0, 0)], A[(0, 1)], A[(1, 1)]
        det = a * d - b * b
        inv = {(0, 0): d / det, (0, 1): -b / det, (1, 1): a / det}
        return inv, jnp.log(det)
    if h == 3:
        a, b, c = A[(0, 0)], A[(0, 1)], A[(0, 2)]
        e, f = A[(1, 1)], A[(1, 2)]
        i = A[(2, 2)]
        A11 = e * i - f * f
        A12 = -(b * i - c * f)
        A13 = b * f - c * e
        A22 = a * i - c * c
        A23 = -(a * f - c * b)
        A33 = a * e - b * b
        det = a * A11 + b * A12 + c * A13
        inv = {
            (0, 0): A11 / det, (0, 1): A12 / det, (0, 2): A13 / det,
            (1, 1): A22 / det, (1, 2): A23 / det, (2, 2): A33 / det,
        }
        return inv, jnp.log(det)
    k = h // 2
    A11 = {(i, j): A[(i, j)] for i in range(k) for j in range(i, k)}
    A12 = {(i, j): _sym_get(A, i, j + k) for i in range(k) for j in range(h - k)}
    A22 = {(i, j): A[(i + k, j + k)] for i in range(h - k) for j in range(i, h - k)}
    inv11, ld11 = _sym_inv_logdet_comp(k, A11)
    # W = inv11 @ A12  (k x (h-k))
    W = {
        (i, j): sum(_sym_get(inv11, i, m) * A12[(m, j)] for m in range(k))
        for i in range(k) for j in range(h - k)
    }
    # S = A22 - A12^T W (symmetric)
    S = {
        (i, j): A22[(i, j)] - sum(A12[(m, i)] * W[(m, j)] for m in range(k))
        for i in range(h - k) for j in range(i, h - k)
    }
    invS, ldS = _sym_inv_logdet_comp(h - k, S)
    # TR = -W @ invS  (k x (h-k))
    TR = {
        (i, j): -sum(W[(i, m)] * _sym_get(invS, m, j) for m in range(h - k))
        for i in range(k) for j in range(h - k)
    }
    # TL = inv11 - TR @ W^T (symmetric)
    out = {}
    for i in range(k):
        for j in range(i, k):
            out[(i, j)] = _sym_get(inv11, i, j) - sum(
                TR[(i, m)] * W[(j, m)] for m in range(h - k)
            )
    for i in range(k):
        for j in range(h - k):
            out[(i, j + k)] = TR[(i, j)]
    for i in range(h - k):
        for j in range(i, h - k):
            out[(i + k, j + k)] = _sym_get(invS, i, j)
    return out, ld11 + ldS


# ----------------------------------------------------------------- the kernel
def _filter_kernel(h, T, scal_ref, obs_ref, out_ref, *, log2pi):
    """Grid: (1,). Sequential fori_loop over T inside the kernel.

    scal_ref: SMEM (n_scal,) — packed static parms
      [ATQA_x_x (sym), invQ (sym), QA (h*h), ElogdetinvQ, init invSigma (sym),
       init invSigmamu (h), init Residual]
    obs_ref:  VMEM (T, n_obs_comp, B) — per-time [iS_like (sym), iSm+QAu (h),
       ha_shift (h), logw_t (1)]
    out_ref:  VMEM (T, n_out, B) — [invSigma (sym), invSigmamu (h), logZ (1)]
    """
    ns = h * (h + 1) // 2
    sidx = _sym_idx(h)

    def scal(base, k):
        return scal_ref[base + k]

    ATQA = {ij: scal(0, k) for k, ij in enumerate(sidx)}
    invQ = {ij: scal(ns, k) for k, ij in enumerate(sidx)}
    QA = {(i, j): scal(2 * ns, i * h + j) for i in range(h) for j in range(h)}
    ElogdetinvQ = scal(2 * ns + h * h, 0)

    B = obs_ref.shape[-1]

    def body(t, carry):
        iSg, iSmg, Res = carry  # tuples of (B,) vectors
        iS = _sym_from_rows(h, [obs_ref[t, k, :] for k in range(ns)])
        iSm = [obs_ref[t, ns + k, :] for k in range(h)]
        ha_shift = [obs_ref[t, ns + h + k, :] for k in range(h)]
        logw = obs_ref[t, ns + 2 * h, :]

        M = {ij: iSg[k] + ATQA[ij] for k, ij in enumerate(sidx)}
        Minv, ldM = _sym_inv_logdet_comp(h, M)
        # hmid = invSigmamu_prev + ha_shift
        hmid = [iSmg[i] + ha_shift[i] for i in range(h)]
        # v = Minv @ hmid
        v = [
            sum(_sym_get(Minv, i, m) * hmid[m] for m in range(h)) for i in range(h)
        ]
        # G = QA @ Minv  (h x h general)
        G = {
            (i, j): sum(QA[(i, m)] * _sym_get(Minv, m, j) for m in range(h))
            for i in range(h) for j in range(h)
        }
        # invSigma_new = iS + invQ - G @ QA^T (symmetric)
        iS_new = []
        for k, (i, j) in enumerate(sidx):
            corr = sum(G[(i, m)] * QA[(j, m)] for m in range(h))
            iS_new.append(iS[(i, j)] + invQ[(i, j)] - corr)
        # invSigmamu_new = iSm + QA @ v
        iSm_new = [
            iSm[i] + sum(QA[(i, m)] * v[m] for m in range(h)) for i in range(h)
        ]
        # Residual accumulation (matches lds.fwd_step)
        quad = sum(hmid[i] * v[i] for i in range(h))
        Res = Res + logw + 0.5 * ElogdetinvQ + 0.5 * quad - 0.5 * ldM
        # posterior residual of the new filtered potential
        iS_new_c = _sym_from_rows(h, iS_new)
        Sig_new, ld_new = _sym_inv_logdet_comp(h, iS_new_c)
        mu = [
            sum(_sym_get(Sig_new, i, m) * iSm_new[m] for m in range(h))
            for i in range(h)
        ]
        post = -0.5 * sum(mu[i] * iSm_new[i] for i in range(h)) + 0.5 * ld_new - (
            0.5 * h * log2pi
        )
        logZ_t = Res - post
        for k in range(ns):
            out_ref[t, k, :] = iS_new[k]
        for i in range(h):
            out_ref[t, ns + i, :] = iSm_new[i]
        out_ref[t, ns + h, :] = logZ_t
        return (tuple(iS_new), tuple(iSm_new), post)

    init_iS = tuple(
        jnp.full((B,), 0.0) + scal(2 * ns + h * h + 1, k) for k in range(ns)
    )
    init_iSm = tuple(
        jnp.full((B,), 0.0) + scal(3 * ns + h * h + 1, k) for k in range(h)
    )
    init_Res = jnp.full((B,), 0.0) + scal(3 * ns + h * h + 1 + h, 0)
    jax.lax.fori_loop(0, T, body, (init_iS, init_iSm, init_Res))


def pallas_filter(parms, x0, like, u, interpret=False):
    """Forward information filter on lanes; returns (fw_invSigma (T,B,h,h),
    fw_invSigmamu (T,B,h,1), logZ (T,B)). Shapes: like arrays (T,B,h,·)."""
    iS_like, iSm_like, Res_like = like
    T, B0 = iS_like.shape[0], iS_like.shape[1]
    h = iS_like.shape[-1]
    # lanes: pad batch to the 128-wide VPU vector registers
    B = max(128, ((B0 + 127) // 128) * 128)
    if B != B0:
        pad = [(0, 0), (0, B - B0)] + [(0, 0)] * (iS_like.ndim - 2)
        eye = jnp.broadcast_to(jnp.eye(h, dtype=iS_like.dtype), (T, B - B0, h, h))
        iS_like = jnp.concatenate([iS_like, eye], 1)
        iSm_like = jnp.pad(iSm_like, [(0, 0), (0, B - B0), (0, 0), (0, 0)])
        Res_like = jnp.pad(Res_like, [(0, 0), (0, B - B0)])
        u = jnp.pad(u, [(0, 0), (0, B - B0), (0, 0), (0, 0)])
    ns = h * (h + 1) // 2
    sidx = _sym_idx(h)

    QA = parms["QA_xp_x"]
    # per-time vector pieces folded host-side (cheap, elementwise)
    iSm_eff = iSm_like + parms["QA_xp_u"] @ u          # (T,B,h,1)
    ha_shift = jnp.broadcast_to(-parms["ATQA_x_u"] @ u, (T, B, h, 1))
    logw = (
        Res_like
        - 0.5 * (jnp.swapaxes(u, -1, -2) @ parms["ATQA_u_u"] @ u)[..., 0, 0]
    )
    logw = jnp.broadcast_to(logw, (T, B))

    obs = jnp.concatenate(
        [jnp.stack([iS_like[..., i, j] for (i, j) in sidx], 1)]
        + [jnp.swapaxes(iSm_eff[..., 0], 1, 2).reshape(T, h, B)[:, :, :]][0:1]
        + [jnp.swapaxes(ha_shift[..., 0], 1, 2).reshape(T, h, B)]
        + [logw[:, None, :]],
        axis=1,
    )  # (T, ns+2h+1, B)

    scal = jnp.concatenate(
        [
            jnp.stack([parms["ATQA_x_x"][i, j] for (i, j) in sidx]),
            jnp.stack([parms["invQ"][i, j] for (i, j) in sidx]),
            QA.reshape(-1),
            parms["ElogdetinvQ"].reshape(1),
            jnp.stack([x0.EinvSigma()[i, j] for (i, j) in sidx]),
            x0.EinvSigmamu().reshape(-1),
            (
                -0.5 * x0.EXTinvUX()
                + 0.5 * x0.ElogdetinvSigma()
                - 0.5 * h * um.LOG2PI
            ).reshape(1),
        ]
    ).astype(jnp.float32)

    n_out = ns + h + 1
    kern = functools.partial(_filter_kernel, h, T, log2pi=um.LOG2PI)
    out = pl.pallas_call(
        kern,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY)
            if False
            else pl.BlockSpec((T, obs.shape[1], B), lambda: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((T, n_out, B), lambda: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, n_out, B), jnp.float32),
        interpret=interpret,
    )(scal, obs)

    fw_iS = jnp.zeros((T, B, h, h), out.dtype)
    for k, (i, j) in enumerate(sidx):
        fw_iS = fw_iS.at[..., i, j].set(out[:, k, :])
        if i != j:
            fw_iS = fw_iS.at[..., j, i].set(out[:, k, :])
    fw_iSm = jnp.stack([out[:, ns + i, :] for i in range(h)], -1)[..., None]
    logZ = out[:, ns + h, :]
    return fw_iS[:, :B0], fw_iSm[:, :B0], logZ[:, :B0]
