"""Chunked (single-pass block) inclusive scan — a launch-lean alternative to
``jax.lax.associative_scan``.

``lax.associative_scan`` lowers to ~2 log2 T kernel-launch *levels* (up-sweep
+ down-sweep), each a separate fused XLA op over a shrinking slice.  At the
reference-scale shapes this framework runs (PARITY.md's scaling study), the
smoothers are latency/launch-bound, not FLOP-bound: the deep levels operate
on a handful of elements and cost dispatch, not compute.

The chunked scan is the classic three-phase block formulation:

  1. split the T axis into C chunks of length L and run an *in-chunk
     sequential* inclusive scan with ``lax.scan`` (one XLA while-loop — the
     combine body executes L times with no per-level dispatch, batched over
     the C chunks x the element batch on the lanes);
  2. scan the C chunk totals with ``lax.associative_scan`` (C is small, so
     this contributes ~log2 C tiny levels);
  3. one *batched* combine of each chunk's carry-in with its local prefixes
     (a single fused op over all T elements).

Work is O(T) combines (same constant as associative_scan's work-efficient
form), HBM traffic is ~3 element passes, and the launch count drops from
~2 log2 T levels to {1 loop + log2 C levels + 1 batched combine}.

The operator must be associative (same contract as ``associative_scan``);
float results differ from other association orders at roundoff level only.

Used by ops/parallel_kalman.py and ops/parallel_hmm.py for the smoother
prefix/suffix scans (reference time loops being replaced:
LinearDynamicalSystems.py:332-383, HMM.py:72-105); generic over pytrees.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# dispatch knob (see parallel_kalman/parallel_hmm): chunked scans replace
# associative_scan when the time axis is at least CHUNKED_SCAN_MIN_T.
# Measured on the v5e chip (lane Kalman smoother, h=2, b=128, warm):
#   T=256: level 3.3 ms vs chunked 4.1 | T=1024: 3.5 vs 3.1
#   T=2048: 3.1 vs 3.1              | T=8192: 6.5 vs 3.8 (1.7x win)
# and end-to-end DMBD T=399 prefers the level scan (200 vs 126-202 it/s
# depending on chunk/unroll). Default picks chunked only where it clearly
# wins: the long-context regime. 0 disables.
CHUNKED_SCAN_MIN_T = int(os.environ.get("PYVBMP_CHUNKED_SCAN_MIN_T", "4096"))

# Second, independent trigger: FAT element rows — OPT-IN, measured
# NEGATIVE at the h=32 target and therefore default-disabled.  The round-5
# hypothesis was that large-h dense rows are HBM-bound (level scan ~
# 2*log2(T) element passes vs chunked ~3), but the same-session chip A/B
# (benchmarks/one_arm_lds.py, h=32 o=32 T=200 b=100, warm best-of-3)
# refuted it: dense+chunked 195.6 ms/iter vs dense+level 176.5 vs the
# PLANE layout's 86.7 (still best; a plain sequential lax.scan smoother
# measured 247.0, and the Pallas kernel is hard-infeasible at h=32 —
# Mosaic scoped-VMEM OOM, 33.7M > 16M limit).  The binding cost at h=32
# is per-op small-batched-matmul floors inside each combine, which the
# chunked scan's serial in-chunk phase makes WORSE, not HBM passes.
# The machinery stays for regimes where a row-size trigger may yet win
# (very long T already covered by CHUNKED_SCAN_MIN_T); set
# PYVBMP_CHUNKED_SCAN_MIN_ROW_BYTES to a byte threshold to enable.
CHUNKED_SCAN_MIN_ROW_BYTES = int(
    os.environ.get("PYVBMP_CHUNKED_SCAN_MIN_ROW_BYTES", "0")
)


def _choose_chunk(T):
    """Chunk length ~sqrt(T) clamped to [8, 64]: balances the sequential
    in-chunk loop (L serial combine executions) against the cross-chunk
    associative levels (log2(T/L)) and the padding waste (< L elements).
    Overridable via PYVBMP_CHUNK_LEN for measurement."""
    env = int(os.environ.get("PYVBMP_CHUNK_LEN", "0"))
    if env > 0:
        return env
    L = 8
    while L * L < T and L < 64:
        L *= 2
    return L


# unroll factor for the in-chunk lax.scan: device-side while-loop iterations
# carry fixed overhead (loop state DMA + sequential dependency); unrolling
# trades compile time for fewer, fatter loop bodies
CHUNK_UNROLL = int(os.environ.get("PYVBMP_CHUNK_UNROLL", "4"))


def chunked_scan(combine, elems, reverse=False, chunk=None):
    """Inclusive scan of ``combine`` over axis 0 of the pytree ``elems``.

    Drop-in for ``jax.lax.associative_scan(combine, elems, axis=0,
    reverse=reverse)``.  ``reverse=True`` matches associative_scan's
    convention: the scan runs from the end toward the start, and the operands
    are passed as (later, earlier) — callers that need chain order already
    swap the arguments in their combine lambda.
    """
    leaves = jax.tree_util.tree_leaves(elems)
    T = leaves[0].shape[0]
    if T <= 2:
        return jax.lax.associative_scan(combine, elems, axis=0, reverse=reverse)
    if reverse:
        # associative_scan(reverse=True) == flip o forward-scan o flip with
        # the operator untouched (operand order is the caller's concern)
        flipped = jax.tree_util.tree_map(lambda a: jnp.flip(a, 0), elems)
        out = chunked_scan(combine, flipped, chunk=chunk)
        return jax.tree_util.tree_map(lambda a: jnp.flip(a, 0), out)

    L = chunk or _choose_chunk(T)
    C = -(-T // L)
    pad = C * L - T

    def pad_tail(a):
        if pad == 0:
            return a
        # duplicate the last element: combine(x, x) is always well-defined
        # for these semigroups, and padding at the tail of a *forward*
        # (causal) scan cannot affect outputs at t < T
        return jnp.concatenate([a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], 0)

    def to_chunks(a):  # (C*L, ...) -> (L, C, ...): L on the scan axis
        return a.reshape((C, L) + a.shape[1:]).swapaxes(0, 1)

    ec = jax.tree_util.tree_map(lambda a: to_chunks(pad_tail(a)), elems)

    # phase 1: in-chunk sequential inclusive scan (carry batched over C)
    e0 = jax.tree_util.tree_map(lambda a: a[0], ec)
    erest = jax.tree_util.tree_map(lambda a: a[1:], ec)

    def step(carry, e):
        nxt = combine(carry, e)
        return nxt, nxt

    last, rest = jax.lax.scan(
        step, e0, erest, unroll=min(CHUNK_UNROLL, max(L - 1, 1))
    )
    local = jax.tree_util.tree_map(
        lambda h, r: jnp.concatenate([h[None], r], 0), e0, rest
    )  # (L, C, ...) inclusive prefixes within each chunk

    # phase 2: exclusive scan of the C chunk totals (C small => few levels).
    # totals[c] = inclusive total of chunk c; carry_in[c] = totals scanned
    # exclusively. There is no identity element for these semigroups, so the
    # c == 0 row keeps a dummy (totals[0]) and is masked out in phase 3.
    totals = last  # (C, ...)
    tot_incl = jax.lax.associative_scan(combine, totals, axis=0)
    carry_in = jax.tree_util.tree_map(
        lambda a: jnp.concatenate([a[:1], a[:-1]], 0), tot_incl
    )

    # phase 3: one batched combine of carry_in[c] with every local prefix,
    # masked to passthrough for chunk 0.  Combines that mix leaves (e.g. the
    # dense Kalman combine concatenates right-hand sides) don't
    # rank-broadcast — lift the carry to the local leading dim explicitly.
    carry_b = jax.tree_util.tree_map(
        lambda c, l: jnp.broadcast_to(c[None], l.shape), carry_in, local
    )
    combined = combine(carry_b, local)
    # chunk 0 has no carry-in: keep its local prefixes verbatim
    out = jax.tree_util.tree_map(
        lambda cmb, loc: jnp.concatenate([loc[:, :1], cmb[:, 1:]], axis=1),
        combined,
        local,
    )

    def from_chunks(a):  # (L, C, ...) -> (T, ...)
        return a.swapaxes(0, 1).reshape((C * L,) + a.shape[2:])[:T]

    return jax.tree_util.tree_map(from_chunks, out)


@functools.lru_cache(maxsize=None)
def swapped_combine(combine):
    """Memoized operand-swap wrapper (suffix scans run the forward combine
    with swapped operands).  A fresh ``lambda a, b: combine(b, a)`` per
    trace would defeat the pallas_scan build memo — it is keyed on the
    combine's identity — and leak one dead kernel-cache entry per retrace."""
    return lambda a, b: combine(b, a)


def auto_scan(combine, elems, reverse=False):
    """Layered scan dispatch, fastest applicable first:

    1. the fused single-pass Pallas kernel (ops/pallas_scan.py) on TPU for
       lane/plane layouts with T >= PYVBMP_PALLAS_SCAN_MIN_T — one kernel,
       read-once/write-once HBM traffic, no per-level dispatch;
    2. ``chunked_scan`` when the time axis is long enough to amortize the
       three-phase structure;
    3. plain ``associative_scan`` otherwise.

    The module-global reads resolve at call time, so monkeypatched knobs
    are visible."""
    T = jax.tree_util.tree_leaves(elems)[0].shape[0]
    from . import pallas_scan as ps

    if (
        ps.pallas_scan_enabled()
        and T >= ps.PALLAS_SCAN_MIN_T
        and ps.eligible(elems)
    ):
        return ps.pallas_chunked_scan(combine, elems, reverse=reverse)
    if CHUNKED_SCAN_MIN_T > 0 and T >= CHUNKED_SCAN_MIN_T:
        return chunked_scan(combine, elems, reverse=reverse)
    if CHUNKED_SCAN_MIN_ROW_BYTES > 0 and T >= 32:
        row_bytes = sum(
            l[0].nbytes for l in jax.tree_util.tree_leaves(elems)
        )
        if row_bytes >= CHUNKED_SCAN_MIN_ROW_BYTES:
            return chunked_scan(combine, elems, reverse=reverse)
    return jax.lax.associative_scan(combine, elems, axis=0, reverse=reverse)


def scan_dispatch_state():
    """The knobs this module bakes into any trace that routes through
    auto_scan — every jit-memo key around the smoothers must include this
    so flipping a knob retraces instead of reusing a stale program."""
    from . import pallas_scan as ps

    return (
        CHUNKED_SCAN_MIN_T,
        CHUNKED_SCAN_MIN_ROW_BYTES,
        CHUNK_UNROLL,
        os.environ.get("PYVBMP_CHUNK_LEN", "0"),
        ps.PALLAS_SCAN,
        ps.PALLAS_SCAN_MIN_T,
        ps.PALLAS_SCAN_N_TILE,
        ps.PALLAS_SCAN_CHUNK,
        ps.LANE_FOLD_MIN_N,
        ps.TIME_FOLD,
        ps.TIME_FOLD_MAX_N,
        ps.TIME_FOLD_MIN_T,
        ps.TIME_FOLD_CP,
        ps.VMEM_BUDGET_BYTES,
    )


__all__ = [
    "chunked_scan",
    "auto_scan",
    "scan_dispatch_state",
    "CHUNKED_SCAN_MIN_T",
    "_choose_chunk",
]
