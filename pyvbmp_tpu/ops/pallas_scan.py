"""Single-pass fused chunked scan as a Pallas TPU kernel.

The smoother prefix/suffix scans are the HBM-bound inner loop of every
chain model at large batch (PARITY.md scaling study: MixLDS b=4000 at
78 GB/s, LDS h=16 at 85 GB/s — ~10% of bandwidth peak).  Both
``jax.lax.associative_scan`` (~2 log2 T levels, each a separate HBM
round-trip over a shrinking slice) and the three-phase chunked scan
(ops/chunked_scan.py, ~4 element passes) pay multiple passes over the
element arrays.  This kernel performs the whole inclusive scan with the
minimum possible traffic — read each element once, write each prefix
once — by walking time chunks sequentially inside one kernel while the
carry lives in VMEM scratch:

    grid = (N_tiles, C)           # C innermost: chunks walk in order
    block = (L,) + mid + (n_tile,)  per leaf
    carry  = VMEM scratch, one per leaf, shape mid + (n_tile,)

Within a block the combine runs L times sequentially on the VPU
(vectorized over the n_tile lanes); Mosaic double-buffers the next
chunk's HBM->VMEM DMA behind the current chunk's compute, so the kernel
streams at bandwidth.  TPU grids execute sequentially on the core, which
is exactly what makes the cross-chunk carry correct.

Layout contract: every leaf is ``(T,) + mid + (N,)`` with the SAME T and
N — time leading, a (possibly empty) small/static middle, and the
flattened batch N riding the 128-wide lanes.  Both smoother layouts
satisfy this (lane form: (T, N) components; plane form: (T, h, w, N) /
(T, h, N) / (T, N) planes — ops/smallmat.py, ops/planemat.py).

Ragged edges are handled by masking, not padding: T and N need not
divide the block sizes.  Out-of-range rows read unspecified values; a
per-row validity test keeps them out of the carry (the semigroups here
have no identity element, so the carry tracks a validity flag — the same
monoid completion as parallel/seq_parallel.py), and Pallas drops their
writes.  ``reverse=True`` matches ``lax.associative_scan`` semantics
(flip o scan o flip) and is implemented in-kernel by walking chunks and
rows backwards — no flip copies.

Reference hot loop being replaced: LinearDynamicalSystems.py:332-383
(the sequential forward/backward recursions).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# dispatch knob: 1 = use the fused kernel on TPU for eligible layouts,
# 0 = never. "auto" (default) enables it on TPU backends only.
PALLAS_SCAN = os.environ.get("PYVBMP_PALLAS_SCAN", "auto")
# minimum time length: below this the level scan is already cheap and the
# kernel's fixed cost (grid setup, scratch) isn't worth a retrace
PALLAS_SCAN_MIN_T = int(os.environ.get("PYVBMP_PALLAS_SCAN_MIN_T", "32"))
# optional hard cap on the lane-tile width (0 = uncapped).  The planner
# minimizes the number of lane tiles NT = ceil(N / n_tile) first — TPU
# grids run sequentially, so every extra tile re-walks all T rows — and a
# wider tile is pure VPU throughput; a cap only makes sense for VMEM
# experiments.
PALLAS_SCAN_N_TILE = int(os.environ.get("PYVBMP_PALLAS_SCAN_N_TILE", "0"))
# time-chunk length: larger L = fewer grid steps (less per-step overhead)
# but a bigger VMEM block; bounded by the VMEM budget below
PALLAS_SCAN_CHUNK = int(os.environ.get("PYVBMP_PALLAS_SCAN_CHUNK", "32"))
# minimum chunk length a plan must keep before the planner accepts a wider
# lane tile: fewer tiles shortens the serial walk, but only if each grid
# step still has enough rows to amortize its DMA/setup cost (measured:
# MixLDS b=4000 NT=1 forces L=2 and loses 16% vs NT=4 with L=8)
PALLAS_SCAN_MIN_L = int(os.environ.get("PYVBMP_PALLAS_SCAN_MIN_L", "8"))
# stay well under the ~16 MB/core VMEM (blocks are double-buffered)
VMEM_BUDGET_BYTES = int(
    os.environ.get("PYVBMP_PALLAS_SCAN_VMEM", str(4 * 1024 * 1024))
)
# minimum flattened batch N for folding an all-rank-2 (lane-layout) pytree
# onto the sublanes: (T, N) -> (T, 8, N/8) fills the full (8, 128) vreg
# instead of 1/8 of it.  Below this there aren't enough lanes to fold and
# the level/chunked scans measured faster on chip.
LANE_FOLD_MIN_N = int(os.environ.get("PYVBMP_PALLAS_LANE_MIN_N", "1024"))

# Time folding: at small flattened batch N the kernel is latency-bound on
# its serial walk of all T rows (~1-2 us per combine step on v5e) while the
# VPU sits mostly idle.  Folding time into Cp independent chunk lanes —
# (T,)+mid+(N,) -> (Cp, L)+mid+(N,), a pure reshape — lets the kernel walk
# only L = ceil(T/Cp) rows with Cp as a vectorized leading batch axis; the
# cross-chunk carries are then fixed up at the JAX level with one exclusive
# scan over the Cp chunk totals plus ONE batched combine over all rows (the
# classic three-phase block scan, with phase 1 inside the kernel).  Costs
# ~2 extra element passes of HBM traffic plus one extra batched evaluation
# of the (heavy) combine over every row in phase 3.
#
# MEASURED NEGATIVE on v5e (2026-08, warm best-of-3): the default fused
# kernel is already single-pass over HBM and its serial walk is not the
# binding cost at flagship shapes, so the fold's fixup work dominates —
# DMBD-Flocking (T=150, N=20 Kalman / plane HMM) 174 -> 54 it/s,
# DMBD-Lorenz (T=399, b=100) 320 -> 258 it/s.  Kept as an opt-in
# (PYVBMP_PALLAS_TIME_FOLD=auto|1) for genuinely walk-bound regimes
# (very long T with tiny rows); OFF by default.
TIME_FOLD = os.environ.get("PYVBMP_PALLAS_TIME_FOLD", "0")
TIME_FOLD_MAX_N = int(os.environ.get("PYVBMP_PALLAS_TIME_FOLD_MAX_N", "256"))
TIME_FOLD_MIN_T = int(os.environ.get("PYVBMP_PALLAS_TIME_FOLD_MIN_T", "96"))
TIME_FOLD_CP = int(os.environ.get("PYVBMP_PALLAS_TIME_FOLD_CP", "8"))


def pallas_scan_enabled():
    if PALLAS_SCAN == "0":
        return False
    if PALLAS_SCAN == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # backend not initialized yet
        return False


def _leaf_mid_elems(shape):
    n = 1
    for s in shape[1:-1]:
        n *= s
    return n


def _lane_foldable(leaves, N):
    """An all-rank-2 (lane-layout) pytree with a large, 8-divisible batch
    can be folded onto the sublanes: (T, N) -> (T, 8, N/8).  The lane
    combines are elementwise over N, so the reshape is a pure relabeling
    that lifts the kernel from 1 sublane (1/8 VPU width) to the full
    (8, 128) vreg."""
    return (
        all(l.ndim == 2 for l in leaves)
        and N % 8 == 0
        and N >= LANE_FOLD_MIN_N
    )


def eligible(elems):
    """All leaves (T,)+mid+(N,) with shared T and N, fp32, T >= 2, and
    either at least one rank >= 3 leaf (the plane-layout signature) or a
    sublane-foldable lane layout (all rank-2 with large 8-divisible N).

    Small-N all-rank-2 pytrees are excluded from the AUTO dispatch: their
    rows live on a single sublane after the Mosaic lifting, so the kernel
    runs at 1/8 VPU width and measured slower than the level/chunked scans
    (v5e: Kalman lane h=2 T=8192 b=128 0.31 ms chunked vs 1.13 ms pallas).
    Direct calls to pallas_chunked_scan still accept them (used by the
    correctness tests)."""
    leaves = jax.tree_util.tree_leaves(elems)
    if not leaves:
        return False
    T = leaves[0].shape[0]
    N = leaves[0].shape[-1]
    if T < 2:
        return False
    plane_like = False
    for l in leaves:
        if l.ndim < 2 or l.shape[0] != T or l.shape[-1] != N:
            return False
        if l.dtype != jnp.float32:
            return False
        plane_like = plane_like or l.ndim >= 3
    return plane_like or _lane_foldable(leaves, N)


def _plan(T, N, elem_rows_bytes):
    """Pick (L, n_tile) under the VMEM budget, or None if the element row
    is too fat to double-buffer even at the minimum block (the caller then
    falls back to the level/chunked scans).

    elem_rows_bytes: bytes of ONE time row across all leaves at full N.
    The in-VMEM working set is ~4 blocks (in + out, each double-buffered
    by Mosaic) plus the carry row.

    The lane-tile count NT = ceil(N / n_tile) MULTIPLIES the serial walk:
    Pallas TPU grids execute sequentially, so a split batch axis re-walks
    all T rows once per tile (measured: DMBD b=400 Kalman phase 6.5 ms at
    NT=2 vs 5.8 ms at NT=1).  But a wider tile shrinks the chunk length L
    under the fixed VMEM budget, and a too-short chunk starves each grid
    step of compute to hide its DMA/setup cost behind (measured: MixLDS
    b=4000 fold NT=1 forces L=2 and runs 16% SLOWER than NT=4 with L=8).
    So: fewest tiles subject to L >= PALLAS_SCAN_MIN_L; if no split
    achieves that, fall back to the split with the longest chunk."""

    def feasible_L(n_tile):
        per_row = elem_rows_bytes * n_tile / max(N, 1)
        L = PALLAS_SCAN_CHUNK
        # the +per_row carry term must be inside the shrink condition, or an
        # exact-budget 4*L*per_row fit escapes the loop only to fail the
        # final check (observed at N=40 plane rows: 4*16*64KiB == budget)
        while L > 2 and 4 * L * per_row + per_row > VMEM_BUDGET_BYTES:
            L //= 2
        if 4 * L * per_row + per_row > VMEM_BUDGET_BYTES:
            return None
        return L

    # for NT = 1, 2, ... the candidate tile is the smallest 128-multiple
    # covering ceil(N / NT) lanes (Mosaic requires a block's lane dim to be
    # a 128 multiple); take the fewest-tiles plan that keeps L healthy
    n128 = -(-max(N, 128) // 128)  # N in units of 128 lanes
    min_l = min(PALLAS_SCAN_MIN_L, max(2, T))
    best = None  # (L, n_tile) with the longest chunk seen, as fallback
    seen = set()
    for NT in range(1, n128 + 1):
        n_tile = -(-n128 // NT) * 128
        if n_tile in seen:  # several NT can round to the same tile
            continue
        seen.add(n_tile)
        if PALLAS_SCAN_N_TILE and n_tile > PALLAS_SCAN_N_TILE:
            continue
        L = feasible_L(n_tile)
        if L is None:
            continue
        if L >= min_l:
            return L, n_tile
        if best is None or L > best[0]:
            best = (L, n_tile)
    return best


@functools.lru_cache(maxsize=None)
def _build_call(combine_key, treedef, shapes, T, N, L, n_tile, reverse,
                interpret, lifted_idx=()):
    """Construct the pallas_call for a given element structure.

    combine_key: (fn, key-extras) tuple used only for memoization identity;
    the fn itself is element 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    combine = combine_key[0]
    n_leaves = len(shapes)
    C = pl.cdiv(T, L)
    NT = pl.cdiv(N, n_tile)

    def block_shape(shape):
        return (L,) + tuple(shape[1:-1]) + (n_tile,)

    def index_map(shape):
        mid_zeros = (0,) * (len(shape) - 2)
        if reverse:
            # walk chunks back-to-front: physical chunk = C-1-c
            return lambda nb, c: (C - 1 - c,) + mid_zeros + (nb,)
        return lambda nb, c: (c,) + mid_zeros + (nb,)

    in_specs = [
        pl.BlockSpec(block_shape(s), index_map(s), memory_space=pltpu.VMEM)
        for s in shapes
    ]
    out_specs = [
        pl.BlockSpec(block_shape(s), index_map(s), memory_space=pltpu.VMEM)
        for s in shapes
    ]
    scratch_shapes = [
        pltpu.VMEM(tuple(s[1:-1]) + (n_tile,), jnp.float32) for s in shapes
    ] + [pltpu.SMEM((1,), jnp.int32)]  # carry-valid flag

    def kernel(*refs):
        in_refs = refs[:n_leaves]
        out_refs = refs[n_leaves : 2 * n_leaves]
        carry_refs = refs[2 * n_leaves : 3 * n_leaves]
        valid_ref = refs[3 * n_leaves]
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            valid_ref[0] = 0

        # physical chunk this block came from (for row-validity math)
        c_phys = (C - 1 - c) if reverse else c

        unflatten = jax.tree_util.tree_unflatten
        lifted = set(lifted_idx)

        def read_row(t):
            # squeeze the lifted unit axis so the combine sees the
            # caller's leaf ranks
            return unflatten(
                treedef,
                [
                    r[t][0] if i in lifted else r[t]
                    for i, r in enumerate(in_refs)
                ],
            )

        def write_row(t, tree):
            for i, (r, v) in enumerate(
                zip(out_refs, jax.tree_util.tree_leaves(tree))
            ):
                r[t] = v[None] if i in lifted else v

        def read_carry():
            return unflatten(
                treedef,
                [
                    r[0] if i in lifted else r[:]
                    for i, r in enumerate(carry_refs)
                ],
            )

        def write_carry(tree):
            for i, (r, v) in enumerate(
                zip(carry_refs, jax.tree_util.tree_leaves(tree))
            ):
                r[:] = v[None] if i in lifted else v

        def step(i, carry_valid):
            t = (L - 1 - i) if reverse else i
            row_global = c_phys * L + t
            is_valid = row_global < T
            e = read_row(t)
            carry = read_carry()
            # reverse matches lax.associative_scan(reverse=True):
            # accumulate fn(later-accumulated, earlier-element)
            combined = combine(carry, e)
            use_combined = jnp.logical_and(carry_valid != 0, is_valid)
            new = jax.tree.map(
                lambda cmb, el, cr: jnp.where(
                    use_combined, cmb, jnp.where(is_valid, el, cr)
                ),
                combined,
                e,
                carry,
            )
            write_carry(new)
            write_row(t, new)
            return jnp.where(is_valid, 1, carry_valid)

        valid_ref[0] = jax.lax.fori_loop(0, L, step, valid_ref[0])

    grid = (NT, C)
    out_shape = [jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )

    def entry(*leaves):
        outs = call(*leaves)
        outs = [
            o[:, 0, :] if i in lifted_idx else o for i, o in enumerate(outs)
        ]
        return jax.tree_util.tree_unflatten(treedef, outs)

    return entry


@functools.lru_cache(maxsize=None)
def _build_folded_call(combine_key, treedef, shapes, L, N, Lb, n_tile,
                       interpret, lifted_idx=()):
    """pallas_call scanning axis 1 of (Cp, L)+mid+(N,) leaves: the Cp
    chunk axis rides as a vectorized leading batch (independent lanes of
    the semigroup), so the serial in-kernel walk is L rows, not Cp*L.

    Rows are always valid here (the folded caller pads time so Cp*L is
    exact and padding rows hold duplicate-last elements, which are
    legitimate semigroup members), so the validity machinery of
    _build_call is unnecessary — only the L % Lb ragged tail needs
    masking, and it is uniform across Cp (a scalar test)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    combine = combine_key[0]
    n_leaves = len(shapes)
    C = pl.cdiv(L, Lb)
    NT = pl.cdiv(N, n_tile)

    def block_shape(shape):
        # full Cp, a time slice of Lb, full mid, one lane tile
        return (shape[0], Lb) + tuple(shape[2:-1]) + (n_tile,)

    def index_map(shape):
        mid_zeros = (0,) * (len(shape) - 3)
        return lambda nb, c: (0, c) + mid_zeros + (nb,)

    in_specs = [
        pl.BlockSpec(block_shape(s), index_map(s), memory_space=pltpu.VMEM)
        for s in shapes
    ]
    out_specs = [
        pl.BlockSpec(block_shape(s), index_map(s), memory_space=pltpu.VMEM)
        for s in shapes
    ]
    scratch_shapes = [
        pltpu.VMEM((s[0],) + tuple(s[2:-1]) + (n_tile,), jnp.float32)
        for s in shapes
    ]

    def kernel(*refs):
        in_refs = refs[:n_leaves]
        out_refs = refs[n_leaves : 2 * n_leaves]
        carry_refs = refs[2 * n_leaves : 3 * n_leaves]
        c = pl.program_id(1)

        unflatten = jax.tree_util.tree_unflatten
        lifted = set(lifted_idx)

        def read_row(t):
            return unflatten(
                treedef,
                [
                    r[:, t, 0] if i in lifted else r[:, t]
                    for i, r in enumerate(in_refs)
                ],
            )

        def write_row(t, tree):
            for i, (r, v) in enumerate(
                zip(out_refs, jax.tree_util.tree_leaves(tree))
            ):
                r[:, t] = v[:, None] if i in lifted else v

        def read_carry():
            return unflatten(
                treedef,
                [
                    r[:, 0] if i in lifted else r[:]
                    for i, r in enumerate(carry_refs)
                ],
            )

        def write_carry(tree):
            for i, (r, v) in enumerate(
                zip(carry_refs, jax.tree_util.tree_leaves(tree))
            ):
                r[:] = v[:, None] if i in lifted else v

        def step(t, _):
            row_global = c * Lb + t
            e = read_row(t)
            carry = read_carry()
            # row 0 seeds the carry (the scratch is uninitialized there —
            # combine's result on it is discarded by the select, as in
            # _build_call); ragged tail rows (row_global >= L) preserve the
            # carry and their writes land outside the array (dropped)
            combined = combine(carry, e)
            use_comb = jnp.logical_and(row_global > 0, row_global < L)
            new = jax.tree.map(
                lambda cmb, el, cr: jnp.where(
                    use_comb, cmb, jnp.where(row_global == 0, el, cr)
                ),
                combined,
                e,
                carry,
            )
            write_carry(new)
            write_row(t, new)
            return 0

        jax.lax.fori_loop(0, Lb, step, 0)

    grid = (NT, C)
    out_shape = [jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )

    def entry(*leaves):
        outs = call(*leaves)
        outs = [
            o[:, :, 0, :] if i in lifted_idx else o
            for i, o in enumerate(outs)
        ]
        return jax.tree_util.tree_unflatten(treedef, outs)

    return entry


def _time_fold_cp(T, N):
    """Number of chunk lanes for the folded scan.  More chunks shorten the
    serial walk (L = ceil(T/Cp)) but add phase-2/3 fixup work and VMEM
    pressure; keep L >= 16 so phase 1 still dominates."""
    cp = TIME_FOLD_CP
    while cp > 2 and (T + cp - 1) // cp < 16:
        cp //= 2
    return max(cp, 1)


def _time_fold_ok(leaves, T, N):
    if TIME_FOLD == "0":
        return False
    if T < TIME_FOLD_MIN_T or N > TIME_FOLD_MAX_N:
        return TIME_FOLD == "1"
    return _time_fold_cp(T, N) >= 2


def _time_folded_scan(combine, elems, reverse=False, interpret=None):
    """Three-phase block scan with phase 1 fused in the Pallas kernel and
    time folded onto a vectorized chunk axis.  Equivalent to
    ``lax.associative_scan(combine, elems, axis=0, reverse=reverse)`` up to
    float association order."""
    if reverse:
        flip = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.flip(a, 0), t
        )
        # associative_scan(reverse=True) == flip o forward o flip with the
        # operand order the caller's concern (same as chunked_scan.py)
        return flip(_time_folded_scan(combine, flip(elems),
                                      interpret=interpret))

    leaves, treedef = jax.tree_util.tree_flatten(elems)
    T = leaves[0].shape[0]
    N = leaves[0].shape[-1]
    Cp = _time_fold_cp(T, N)
    L = -(-T // Cp)
    pad = Cp * L - T

    def pad_tail(a):
        if pad == 0:
            return a
        # duplicate-last padding: combine(x, x) is well-defined for these
        # semigroups and tail padding of a forward scan can't reach t < T
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], 0
        )

    folded = [
        pad_tail(l).reshape((Cp, L) + l.shape[1:]) for l in leaves
    ]
    row_bytes = Cp * sum(
        4 * _leaf_mid_elems(l.shape) * N for l in leaves
    )
    plan = _plan(L, N, row_bytes)
    # L < 2 also bails: a forced fold at tiny T (e.g. Cp=2, T=2 -> L=1)
    # cannot honor the grid >= 2 requirement below
    if plan is None or L < 2:
        return jax.lax.associative_scan(combine, elems, axis=0)
    Lb, n_tile = plan
    # keep the total grid size >= 2: a (1, 1) grid mis-executes the
    # carry-scratch pattern in interpret mode (observed all-NaN output on
    # jax 0.8 CPU interpret; a two-step grid costs nothing on chip)
    if Lb >= L and N <= n_tile:
        Lb = -(-L // 2)
    # lift rank-3 folded leaves (Cp, L, N) -> (Cp, L, 1, N) for the same
    # Mosaic last-two-dims reason as in pallas_chunked_scan
    lifted_idx = tuple(i for i, l in enumerate(folded) if l.ndim == 3)
    folded = [
        l[:, :, None, :] if l.ndim == 3 else l for l in folded
    ]
    shapes = tuple(tuple(l.shape) for l in folded)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    entry = _build_folded_call(
        (combine,), treedef, shapes, L, N, Lb, n_tile, bool(interpret),
        lifted_idx,
    )
    local = entry(*folded)  # (Cp, L, ...) in-chunk inclusive prefixes

    tmap = jax.tree_util.tree_map
    # phase 2: exclusive scan of the Cp chunk totals (tiny).  No identity
    # element: row 0 keeps a dummy that phase 3 masks out.
    totals = tmap(lambda a: a[:, -1], local)
    tot_incl = jax.lax.associative_scan(combine, totals, axis=0)
    carry_in = tmap(
        lambda a: jnp.concatenate([a[:1], a[:-1]], 0), tot_incl
    )
    # phase 3: one batched combine of carry_in[c] with every local prefix,
    # flattened to a single leading axis (the shape associative_scan
    # already exercises on these combines)
    flat = tmap(lambda a: a.reshape((Cp * L,) + a.shape[2:]), local)
    carry_b = tmap(
        lambda c, l: jnp.broadcast_to(
            c[:, None], (Cp, L) + c.shape[1:]
        ).reshape(l.shape),
        carry_in,
        flat,
    )
    combined = combine(carry_b, flat)
    # chunk 0 has no carry-in: keep its local prefixes verbatim
    out = tmap(
        lambda cmb, loc: jnp.concatenate(
            [loc.reshape((Cp * L,) + cmb.shape[1:])[:L], cmb[L:]], 0
        ),
        combined,
        local,
    )
    return tmap(lambda a: a[:T], out)


def pallas_chunked_scan(combine, elems, reverse=False, interpret=None):
    """Inclusive scan of ``combine`` over axis 0 of the pytree ``elems``;
    drop-in for ``jax.lax.associative_scan(combine, elems, axis=0,
    reverse=reverse)`` under the (T,)+mid+(N,) layout contract."""
    leaves, treedef = jax.tree_util.tree_flatten(elems)
    T = leaves[0].shape[0]
    N = leaves[0].shape[-1]
    # small flattened batch: the serial T-row walk is latency-bound — fold
    # time onto a vectorized chunk axis and fix carries up in three phases
    if _time_fold_ok(leaves, T, N):
        return _time_folded_scan(combine, elems, reverse=reverse,
                                 interpret=interpret)
    # lane layouts with a large 8-divisible batch: fold onto the sublanes
    # so each combine op fills the full (8, 128) vreg (elementwise over N,
    # so the reshape is a relabeling; see _lane_foldable)
    folded_N = None
    if _lane_foldable(leaves, N):
        folded_N = N
        N = N // 8
        leaves = [l.reshape(T, 8, N) for l in leaves]
    row_bytes = sum(
        4 * _leaf_mid_elems(l.shape) * N for l in leaves
    )
    plan = _plan(T, N, row_bytes)
    if plan is None:
        # VMEM-infeasible rows (e.g. plane h=32 at the 128-lane minimum
        # tile): fall back through the chunked/level dispatch rather than
        # straight to the level scan — fat rows are exactly where the
        # 3-pass chunked scan beats ~2log2(T) level passes (VERDICT r4
        # item 4)
        from .chunked_scan import CHUNKED_SCAN_MIN_ROW_BYTES, chunked_scan

        fat = (
            CHUNKED_SCAN_MIN_ROW_BYTES > 0
            and T >= 32
            and row_bytes >= CHUNKED_SCAN_MIN_ROW_BYTES
        )
        if fat:
            return chunked_scan(combine, elems, reverse=reverse)
        return jax.lax.associative_scan(combine, elems, axis=0,
                                        reverse=reverse)
    L, n_tile = plan
    # Mosaic requires a block's last two dims to be divisible by (8, 128)
    # or equal to the full array dims.  Rank-2 leaves (T, N) would put the
    # time-chunk L in the constrained second-minor slot; lift them to
    # (T, 1, N) so the constrained dims are (1 == full, n_tile % 128 == 0)
    # and L is free.  The combines are broadcasting-safe under the extra
    # unit axis; the entry squeezes it back off.
    lifted_idx = tuple(i for i, l in enumerate(leaves) if l.ndim == 2)
    leaves = [l[:, None, :] if l.ndim == 2 else l for l in leaves]
    shapes = tuple(tuple(l.shape) for l in leaves)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    entry = _build_call(
        (combine,), treedef, shapes, T, N, L, n_tile, bool(reverse),
        bool(interpret), lifted_idx,
    )
    out = entry(*leaves)
    if folded_N is not None:
        out = jax.tree_util.tree_map(
            lambda a: a.reshape(T, folded_N), out
        )
    return out


__all__ = ["pallas_chunked_scan", "pallas_scan_enabled", "eligible"]
