"""Pallas TPU kernels for exact nearest-neighbor search.

The XLA-composed path (``bruteforce.py``) materializes (Q, tile_m) distance
blocks in HBM between the matmul and the min-reduction; at 120k×120k that is
~60 GB of HBM traffic per NN pass. These kernels fuse distance computation
and the running min/top-k entirely in VMEM:

* the grid runs over (query tile, key chunk); the TPU grid executes
  sequentially, so a VMEM scratch buffer carries the running best across key
  chunks of the same query tile (canonical Pallas reduction pattern);
* each step computes cross terms on the MXU (``(TQ, 8) @ (8, TM)``) and folds
  the chunk into the running best with VPU min/argmin — no distance matrix
  ever leaves VMEM;
* results are written once, on the last key chunk.

HBM traffic drops to reading each cloud ~once. The kernel is NOT
MXU-bound: the augmented matmul's contraction depth is 8 (``_DPAD``), so
the MXU runs at a few % of peak by construction and the VPU min/top-k
folding dominates (measured 167-175 ms ungated nn1 at 120k×120k on v5e ≈
1.4 TFLOP/s ≈ 3% of f32 peak — see bench.py's roofline lines; the prune
plans, not deeper matmuls, are what buy the next factor). Replaces the
nanoflann kd-tree
(``include/cilantro/core/kd_tree.hpp:146-388``) for the ICP correspondence
hot path (``correspondence_search_kd_tree_utilities.hpp:26-43``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID_DIST = 3.0e38  # plain float: used as a literal inside Pallas kernels

_DPAD = 8  # pad point dim to one f32 sublane tile


def _pad_aug_rows(x, mult):
    n = x.shape[0]
    rows = ((n + mult - 1) // mult) * mult
    return jnp.zeros((rows, _DPAD), jnp.float32).at[:n, : x.shape[1]].set(x)


def _augment_queries(queries, tile_q):
    """``q̂ = [-2q, ‖q‖², 1]`` padded to a ``tile_q`` multiple."""
    q = queries.astype(jnp.float32)
    qq = jnp.sum(q * q, axis=1, keepdims=True)
    qhat = jnp.concatenate([-2.0 * q, qq, jnp.ones_like(qq)], axis=1)
    return _pad_aug_rows(qhat, tile_q)


def _augment_keys(keys, key_valid, tile_m):
    """``k̂ = [k, 1, ‖k‖²(+INVALID if masked)]`` padded to a ``tile_m``
    multiple; padding keys get +INVALID in the ‖k‖² slot so they never win."""
    d = keys.shape[1]
    k = keys.astype(jnp.float32)
    kk = jnp.sum(k * k, axis=1, keepdims=True)
    if key_valid is not None:
        kk = jnp.where(key_valid[:, None], kk, INVALID_DIST)
    khat = jnp.concatenate([k, jnp.ones_like(kk), kk], axis=1)
    mn = keys.shape[0]
    kp = _pad_aug_rows(khat, tile_m)
    if kp.shape[0] > mn:
        kp = kp.at[mn:, d + 1].set(INVALID_DIST)
    return kp


def _augment(queries, keys, key_valid, tile_q, tile_m):
    """Augmented coordinates so ONE matmul yields squared distances:
    ``q̂·k̂ = ‖q‖² + ‖k‖² − 2q·k``. Kills all VPU distance assembly; the
    kernel inner loop is one MXU contraction + a min/argmin."""
    return (
        _augment_queries(queries, tile_q),
        _augment_keys(keys, key_valid, tile_m),
    )


def _chunk_dist(qhat, khat):
    """(TQ, TM) squared distances via one MXU contraction of augmented coords."""
    return jax.lax.dot_general(
        qhat,
        khat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _nn1_kernel(q_ref, k_ref, out_d_ref, out_i_ref, bd, bi, *, tm: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_mt = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        bd[:] = jnp.full_like(bd[:], INVALID_DIST)
        bi[:] = jnp.zeros_like(bi[:])

    dist = _chunk_dist(q_ref[:], k_ref[:])
    chunk_best = jnp.min(dist, axis=1)
    # Equality-select argmin (cheaper lowering than argmin; ties → smallest).
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) + j * tm
    chunk_arg = jnp.min(
        jnp.where(dist <= chunk_best[:, None], col, jnp.int32(2**31 - 1)), axis=1
    )
    better = chunk_best < bd[:]
    bd[:] = jnp.where(better, chunk_best, bd[:])
    bi[:] = jnp.where(better, chunk_arg, bi[:])

    @pl.when(j == n_mt - 1)
    def _():
        out_d_ref[i, :] = bd[:]
        out_i_ref[i, :] = bi[:]


@partial(jax.jit, static_argnames=("tile_q", "tile_m", "interpret"))
def nn1_pallas(
    queries: jax.Array,
    keys: jax.Array,
    *,
    query_valid: Optional[jax.Array] = None,
    key_valid: Optional[jax.Array] = None,
    tile_q: int = 1024,
    tile_m: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact single-NN: returns ``(dist² (Q,), idx (Q,) int32)``.

    Key invalidation is folded into the augmented ‖k‖² column (invalid keys
    get +INVALID_DIST), so the kernel has no mask operand.
    """
    qn = queries.shape[0]
    qp, kp = _augment(queries, keys, key_valid, tile_q, tile_m)

    n_qt = qp.shape[0] // tile_q
    n_mt = kp.shape[0] // tile_m
    grid = (n_qt, n_mt)
    specs = dict(
        in_specs=[
            pl.BlockSpec((tile_q, _DPAD), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, _DPAD), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (n_qt, tile_q), row-indexed
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
    )
    dist, idx = pl.pallas_call(
        partial(_nn1_kernel, tm=tile_m),
        grid=grid,
        **specs,
        out_shape=[
            jax.ShapeDtypeStruct((n_qt, tile_q), jnp.float32),
            jax.ShapeDtypeStruct((n_qt, tile_q), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q,), jnp.float32),
            pltpu.VMEM((tile_q,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(qp, kp)
    dist = jnp.maximum(dist.reshape(-1)[:qn], 0.0)
    dist = jnp.where(dist >= INVALID_DIST * 0.5, INVALID_DIST, dist)
    idx = idx.reshape(-1)[:qn]
    if query_valid is not None:
        dist = jnp.where(query_valid, dist, INVALID_DIST)
    return dist, idx


def _nn1_kernel_masked(
    mask_ref, q_ref, k_ref, out_d_ref, out_i_ref, bd, bi, *, tm: int
):
    """nn1 kernel with per-(query tile, key chunk) skip mask: chunks whose
    tile AABBs are farther apart than the search radius contribute nothing
    and are skipped entirely — the kd-tree's box pruning, MXU-shaped. The
    kernel is compute-bound (DMA is ~64 KB/step), so skipping the compute
    skips essentially the whole step cost."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_mt = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        bd[:] = jnp.full_like(bd[:], INVALID_DIST)
        bi[:] = jnp.zeros_like(bi[:])

    @pl.when(mask_ref[i, j] != 0)
    def _():
        dist = _chunk_dist(q_ref[:], k_ref[:])
        chunk_best = jnp.min(dist, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) + j * tm
        chunk_arg = jnp.min(
            jnp.where(
                dist <= chunk_best[:, None], col, jnp.int32(2**31 - 1)
            ),
            axis=1,
        )
        better = chunk_best < bd[:]
        bd[:] = jnp.where(better, chunk_best, bd[:])
        bi[:] = jnp.where(better, chunk_arg, bi[:])

    @pl.when(j == n_mt - 1)
    def _():
        out_d_ref[i, :] = bd[:]
        out_i_ref[i, :] = bi[:]


@partial(
    jax.jit, static_argnames=("tile_q", "tile_m", "interpret")
)
def _nn1_pallas_masked(
    qp: jax.Array,  # (Qp, 8) augmented, tile_q-padded
    kp: jax.Array,  # (Mp, 8) augmented, tile_m-padded
    tile_mask: jax.Array,  # (n_qt, n_mt) int32
    *,
    tile_q: int = 1024,
    tile_m: int = 2048,
    interpret: bool = False,
):
    n_qt = qp.shape[0] // tile_q
    n_mt = kp.shape[0] // tile_m
    grid = (n_qt, n_mt)
    # The (n_qt, n_mt) skip mask rides as a scalar-prefetch operand (whole
    # array SMEM-resident, indexed [i, j] in the kernel).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, _DPAD), lambda i, j, m_: (i, 0)),
            pl.BlockSpec((tile_m, _DPAD), lambda i, j, m_: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q,), jnp.float32),
            pltpu.VMEM((tile_q,), jnp.int32),
        ],
    )
    dist, idx = pl.pallas_call(
        partial(_nn1_kernel_masked, tm=tile_m),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_qt, tile_q), jnp.float32),
            jax.ShapeDtypeStruct((n_qt, tile_q), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(tile_mask, qp, kp)
    return dist, idx


def _nn1_kernel_compact(
    qt_ref, kt_ref, fl_ref, q_ref, k_ref, out_d_ref, out_i_ref, bd, bi,
    *, tm: int
):
    """nn1 kernel over a COMPACTED list of surviving (query tile, key chunk)
    pairs. The masked kernel (:func:`_nn1_kernel_masked`) still *visits*
    every pruned grid step — paying the block DMA and grid sequencing for
    work it then skips — so at high prune rates the pass is step-overhead
    bound, not compute bound. Here the 1-D grid runs only over surviving
    pairs (scalar-prefetch tables ``qt/kt`` drive the block index maps), so
    a pruned pair costs nothing at all.

    ``fl`` flags per step: bit0 = first step of this query tile (reset the
    running best), bit1 = live (pad steps past the survivor count fold
    nothing), bit2 = last step of this query tile (write the output row).
    Steps are qtile-major (row-major flatten of the mask), so each output
    row is written once, after all its chunks folded."""
    s = pl.program_id(0)
    f = fl_ref[s]

    @pl.when((f & 1) != 0)
    def _():
        bd[:] = jnp.full_like(bd[:], INVALID_DIST)
        bi[:] = jnp.zeros_like(bi[:])

    @pl.when((f & 2) != 0)
    def _():
        dist = _chunk_dist(q_ref[:], k_ref[:])
        chunk_best = jnp.min(dist, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) + kt_ref[s] * tm
        chunk_arg = jnp.min(
            jnp.where(
                dist <= chunk_best[:, None], col, jnp.int32(2**31 - 1)
            ),
            axis=1,
        )
        better = chunk_best < bd[:]
        bd[:] = jnp.where(better, chunk_best, bd[:])
        bi[:] = jnp.where(better, chunk_arg, bi[:])

    @pl.when((f & 4) != 0)
    def _():
        out_d_ref[qt_ref[s], :] = bd[:]
        out_i_ref[qt_ref[s], :] = bi[:]


@partial(jax.jit, static_argnames=("budget", "tile_q", "tile_m", "interpret"))
def _nn1_pallas_compact(
    qp: jax.Array,  # (Qp, 8) augmented, tile_q-padded
    kp: jax.Array,  # (Mp, 8) augmented, tile_m-padded
    tile_mask: jax.Array,  # (n_qt, n_mt) bool — every row MUST have ≥1 True
    *,
    budget: int,
    tile_q: int = 1024,
    tile_m: int = 2048,
    interpret: bool = False,
):
    """Compacted-pair nn1. Falls back to the visit-everything masked kernel
    (one ``lax.cond``) when more than ``budget`` pairs survive, so results
    are exact at any prune rate."""
    n_qt = qp.shape[0] // tile_q
    n_mt = kp.shape[0] // tile_m

    flat = tile_mask.reshape(-1)
    count = jnp.sum(flat.astype(jnp.int32))
    # Row-major flatten → steps are qtile-major (consecutive per query tile).
    ids = jnp.nonzero(flat, size=budget, fill_value=0)[0].astype(jnp.int32)
    live = jnp.arange(budget, dtype=jnp.int32) < count
    # Pad steps repeat the LAST real pair: the query-tile id stays constant,
    # so the only remaining output write (forced at the final step) re-writes
    # that tile's row with the unchanged running best.
    ids = jnp.where(live, ids, ids[jnp.maximum(count - 1, 0)])
    qt = ids // n_mt
    kt = ids % n_mt
    first = jnp.concatenate([jnp.array([True]), qt[1:] != qt[:-1]])
    last = jnp.concatenate([qt[:-1] != qt[1:], jnp.array([True])])
    flags = (
        first.astype(jnp.int32)
        + 2 * live.astype(jnp.int32)
        + 4 * last.astype(jnp.int32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(budget,),
        in_specs=[
            pl.BlockSpec((tile_q, _DPAD), lambda s, qt_, kt_, fl_: (qt_[s], 0)),
            pl.BlockSpec((tile_m, _DPAD), lambda s, qt_, kt_, fl_: (kt_[s], 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q,), jnp.float32),
            pltpu.VMEM((tile_q,), jnp.int32),
        ],
    )

    def compact_path(args):
        qt_, kt_, fl_ = args
        return pl.pallas_call(
            partial(_nn1_kernel_compact, tm=tile_m),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_qt, tile_q), jnp.float32),
                jax.ShapeDtypeStruct((n_qt, tile_q), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(qt_, kt_, fl_, qp, kp)

    def masked_path(args):
        del args
        return _nn1_pallas_masked(
            qp, kp, tile_mask.astype(jnp.int32),
            tile_q=tile_q, tile_m=tile_m, interpret=interpret,
        )

    return jax.lax.cond(
        count <= budget, compact_path, masked_path, (qt, kt, flags)
    )


@partial(
    jax.jit, static_argnames=("tile_q", "tile_m", "interpret")
)
def nn1_pruned(
    queries: jax.Array,
    keys: jax.Array,
    radius: float,
    *,
    query_valid: Optional[jax.Array] = None,
    key_valid: Optional[jax.Array] = None,
    tile_q: int = 1024,
    tile_m: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Radius-bounded exact nn1 with Morton-sort tile pruning.

    Both clouds are sorted by Morton code so kernel tiles are spatially
    compact; (query tile, key chunk) pairs whose exact AABB distance exceeds
    ``radius`` are skipped inside the kernel. Matches within the radius are
    exact; queries with no key inside ``radius`` return ``INVALID_DIST``.
    This is the ICP correspondence search's fast path — ICP always carries a
    max-correspondence-distance gate, which is exactly the prune bound
    (``correspondence_search_kd_tree.hpp:47-51``).
    """
    qn = queries.shape[0]
    qv = jnp.ones(qn, bool) if query_valid is None else query_valid
    plan = make_nn1_prune_plan(
        keys,
        radius,
        queries,
        key_valid=key_valid,
        query_valid=qv,
        tile_q=tile_q,
        tile_m=tile_m,
    )
    return nn1_pruned_planned(queries, plan, interpret=interpret)


class NN1PrunePlan(NamedTuple):
    """Loop-invariant state for repeated radius-bounded nn1 passes against a
    FIXED key cloud and a query cloud that only moves a little per pass (the
    ICP situation: the dst cloud never moves; src moves ≤ the correspondence
    gate per iteration). Carries the Morton sorts — the only O(N log N)
    work — so each pass pays just O(N) AABB/mask recomputation, which stays
    EXACT for the actual (transformed) query positions; query motion only
    degrades tile compactness, never correctness."""

    radius: jax.Array  # scalar f32
    kperm: jax.Array  # (M,) original key index of sorted position
    kp: jax.Array  # (Mp, 8) augmented sorted keys
    kmin: jax.Array  # (n_mt, D) key-chunk AABBs
    kmax: jax.Array
    k_occ: jax.Array  # (n_mt,) chunk has ≥1 valid key
    qperm: jax.Array  # (Q,) fixed query sort (from the hint positions)
    qinv: jax.Array  # (Q,) inverse of qperm
    qvs: jax.Array  # (Q,) query validity, sorted by qperm
    tile_q: int  # static
    tile_m: int  # static


def _morton_sort(points, valid, origin, cell):
    """``(perm, points[perm], valid[perm])`` by Morton code of the
    ``cell``-sized voxel, invalid points last."""
    from .gridhash import morton_code

    code = jnp.where(
        valid, morton_code(points, origin, cell), jnp.int32(2**31 - 1)
    )
    perm = jnp.argsort(code).astype(jnp.int32)
    return perm, points[perm], valid[perm]


def _inverse_perm(perm):
    n = perm.shape[0]
    return (
        jnp.zeros((n,), jnp.int32)
        .at[perm]
        .set(jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    )


def _unpermute_key_indices(kperm, idx, mn):
    """Map sorted-key indices back to original key order."""
    return kperm[jnp.clip(idx, 0, mn - 1)]


def _drop_self_slot(dist, idx, keep_k):
    """Self-exclusion postlude shared by the kNN/radius wrappers: given
    ``keep_k + 1`` ascending slots, drop each query's first REAL self hit
    (or the overflow probe slot when none) and keep ``keep_k``. Returns
    ``(dist, idx, any_self, last_slot_hit)`` — the flags feed the radius
    search's exact overflow computation."""
    qn = dist.shape[0]
    rows = jnp.arange(qn, dtype=jnp.int32)
    hit = dist < INVALID_DIST * 0.5
    is_self = (idx == rows[:, None]) & hit
    any_self = jnp.any(is_self, axis=1)
    first_self = jnp.argmax(is_self, axis=1)
    drop = jnp.where(any_self, first_self, keep_k)
    # Slots are ascending with one position removed: output j reads slot j
    # before the drop, slot j+1 after — a shift-select, no per-row argsort.
    pos = jnp.arange(keep_k, dtype=jnp.int32)[None, :]
    sel = pos + (pos >= drop[:, None]).astype(jnp.int32)
    return (
        jnp.take_along_axis(dist, sel, axis=1),
        jnp.take_along_axis(idx, sel, axis=1),
        any_self,
        hit[:, keep_k],
    )


def _tile_aabbs(pts, val, tile):
    big = jnp.float32(3e38)
    d = pts.shape[1]
    pad = (-pts.shape[0]) % tile
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0)))
        val = jnp.pad(val, (0, pad))
    nt = pts.shape[0] // tile
    blocks = pts.reshape(nt, tile, d)
    vb = val.reshape(nt, tile)
    amin = jnp.min(jnp.where(vb[..., None], blocks, big), axis=1)
    amax = jnp.max(jnp.where(vb[..., None], blocks, -big), axis=1)
    return amin, amax, jnp.any(vb, axis=1)


def prune_eligible(
    q_shape, k_shape, max_distance, metric: str = "l2"
) -> bool:
    """ONE predicate for "should this gated NN search take the Morton-tile
    pruned kernel": L2 metric, 3-D points, problem big enough that tile
    pruning beats the plain fused kernel, TPU backend, and a distance gate
    to serve as the prune bound. Shared by the organic
    ``find_nn_correspondences`` path and the plan-hoisting ICP loops so the
    two can never diverge."""
    return (
        max_distance is not None
        and metric == "l2"
        and q_shape[1] == 3
        and q_shape[0] * k_shape[0] >= (1 << 26)
        and jax.default_backend() == "tpu"
    )


def maybe_make_nn1_prune_plan(
    keys: jax.Array,
    max_corr_dist_sq,
    query_hint: jax.Array,
    *,
    key_valid: Optional[jax.Array] = None,
    query_valid: Optional[jax.Array] = None,
) -> Optional["NN1PrunePlan"]:
    """Build a prune plan iff :func:`prune_eligible` says the pruned kernel
    would be chosen for this problem (``max_corr_dist_sq`` is the SQUARED
    gate, as ICP carries it); returns ``None`` otherwise."""
    if not prune_eligible(query_hint.shape, keys.shape, max_corr_dist_sq):
        return None
    return make_nn1_prune_plan(
        keys,
        jnp.sqrt(jnp.float32(max_corr_dist_sq)),
        query_hint,
        key_valid=key_valid,
        query_valid=query_valid,
    )


def make_nn1_prune_plan(
    keys: jax.Array,
    radius,
    query_hint: jax.Array,
    *,
    key_valid: Optional[jax.Array] = None,
    query_valid: Optional[jax.Array] = None,
    tile_q: int = 512,  # r4 sweep at 120k/5cm: 75.7 -> 55.9 ms per pass
    tile_m: int = 1024,
) -> NN1PrunePlan:
    """Build the loop-invariant half of :func:`nn1_pruned`: Morton-sort both
    clouds (queries by their ``query_hint`` positions), pre-augment the keys,
    and take the key-chunk AABBs."""
    qn = query_hint.shape[0]
    mn = keys.shape[0]
    qv = jnp.ones(qn, bool) if query_valid is None else query_valid
    kv = jnp.ones(mn, bool) if key_valid is None else key_valid
    radius = jnp.asarray(radius, jnp.float32)
    big = jnp.float32(3e38)
    origin = jnp.minimum(
        jnp.min(jnp.where(qv[:, None], query_hint, big), axis=0),
        jnp.min(jnp.where(kv[:, None], keys, big), axis=0),
    )
    qperm, _, _ = _morton_sort(query_hint, qv, origin, radius)
    kperm, ks, kvs = _morton_sort(keys, kv, origin, radius)
    kmin, kmax, k_occ = _tile_aabbs(ks, kvs, tile_m)
    kp = _augment_keys(ks, kvs, tile_m)
    qinv = _inverse_perm(qperm)
    return NN1PrunePlan(
        radius=radius,
        kperm=kperm,
        kp=kp,
        kmin=kmin,
        kmax=kmax,
        k_occ=k_occ,
        qperm=qperm,
        qinv=qinv,
        qvs=qv[qperm],
        tile_q=tile_q,
        tile_m=tile_m,
    )


def nn1_pruned_planned(
    queries: jax.Array,
    plan: NN1PrunePlan,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Per-pass half of :func:`nn1_pruned`: exact for the given ``queries``
    (current positions), reusing the plan's sorts and key-side state."""
    from .gridhash import _aabb_dist2

    qn = queries.shape[0]
    mn = plan.kperm.shape[0]
    tile_q, tile_m = plan.tile_q, plan.tile_m
    qs = queries[plan.qperm]
    qvs = plan.qvs
    qmin, qmax, q_occ = _tile_aabbs(qs, qvs, tile_q)
    r2 = plan.radius * plan.radius
    aabb_d2 = _aabb_dist2(qmin, qmax, plan.kmin, plan.kmax)
    within = (aabb_d2 <= r2) & q_occ[:, None] & plan.k_occ[None, :]
    # Every query tile keeps at least its nearest occupied key chunk, so
    # every output row is visited (results there gate to INVALID below if
    # actually beyond the radius).
    n_qt = within.shape[0]
    nearest = jnp.argmin(
        jnp.where(plan.k_occ[None, :], aabb_d2, jnp.float32(3e38)), axis=1
    )
    within = within.at[jnp.arange(n_qt), nearest].set(True)

    qp = _augment_queries(qs, tile_q)
    n_mt = plan.kp.shape[0] // tile_m
    budget = n_qt * min(max(n_mt // 4, 8), max(n_mt, 1))
    dist, idx = _nn1_pallas_compact(
        qp, plan.kp, within, budget=budget,
        tile_q=tile_q, tile_m=tile_m, interpret=interpret,
    )
    dist = jnp.maximum(dist.reshape(-1)[:qn], 0.0)
    idx = idx.reshape(-1)[:qn]
    # Radius gate + invalid queries; map indices back to original key order.
    ok = (dist <= r2) & qvs
    dist = jnp.where(ok, dist, INVALID_DIST)
    idx = jnp.where(ok, _unpermute_key_indices(plan.kperm, idx, mn), 0)
    # Un-permute to the original query order.
    return dist[plan.qinv], idx[plan.qinv]


def _fold_block_topk(dscr, bd, bi, col_offset, k: int):
    """Fold the bound-pruned distance block in scratch ``dscr (TQ, TM)``
    into the ascending running-best ``bd``/``bi (TQ, k)`` by argmin
    extraction + vectorized sorted insertion.

    Replaces the old double `_k_smallest` (k full-block scans to build a
    chunk top-k, then a (TQ, 2k) merge): each extraction is ~3 block scans
    (min, argmin, invalidate) and — the real win — passes beyond the
    block's max bound-surviving candidate count are predicated off
    entirely, so once the running k-th best is tight a chunk costs one
    survivor-count scan instead of k top-k scans. Ordering contract
    unchanged: ascending distance, ties keep the earlier (smaller) payload
    (insertion uses strict '>', argmin takes the first minimum)."""
    tq, tm = dscr.shape
    cnt = jnp.max(
        jnp.sum((dscr[:] < INVALID_DIST * 0.5).astype(jnp.int32), axis=1)
    )
    iota = jax.lax.broadcasted_iota(jnp.int32, (tq, tm), 1)
    for i in range(k):

        @pl.when(i < cnt)
        def _():
            d = dscr[:]
            m = jnp.min(d, axis=1)
            # Equality-select argmin (cheaper Mosaic lowering than argmin;
            # ties → smallest column).
            pos = jnp.min(
                jnp.where(d <= m[:, None], iota, jnp.int32(2**31 - 1)),
                axis=1,
            )
            a = pos + col_offset
            dscr[:] = jnp.where(iota == pos[:, None], INVALID_DIST, d)
            bdc, bic = bd[:], bi[:]
            # bd is ascending, so `bdc > m` is a suffix mask: derive it from
            # the insertion position instead of comparing (a bool-vector
            # concatenate for the shifted mask hits an invalid vreg bitcast
            # in Mosaic for some k).
            p_ins = jnp.sum((bdc <= m[:, None]).astype(jnp.int32), axis=1)
            iota_k = jax.lax.broadcasted_iota(jnp.int32, bdc.shape, 1)
            ge = iota_k >= p_ins[:, None]
            first = iota_k == p_ins[:, None]
            prev_d = jnp.concatenate([m[:, None], bdc[:, :-1]], axis=1)
            prev_i = jnp.concatenate([a[:, None], bic[:, :-1]], axis=1)
            bd[:] = jnp.where(ge, jnp.where(first, m[:, None], prev_d), bdc)
            bi[:] = jnp.where(ge, jnp.where(first, a[:, None], prev_i), bic)


def _diag_mask(dist, row_off, col_off):
    """Mask the global diagonal (query position == key position) of a
    distance block whose rows start at ``row_off`` and columns at
    ``col_off`` — in-kernel self-exclusion for same-cloud searches (one VPU
    compare per block, replacing the k+1 search + postlude gathers the
    wrappers used to pay)."""
    tq, tm = dist.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (tq, tm), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tm), 1)
    return jnp.where(cols == rows + (row_off - col_off), INVALID_DIST, dist)


def _knn_kernel(
    q_ref, k_ref, out_d_ref, out_i_ref, bd, bi, dscr, *, tq: int, tm: int,
    k: int, exclude_diag: bool
):
    j = pl.program_id(1)
    n_mt = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        bd[:] = jnp.full_like(bd[:], INVALID_DIST)
        bi[:] = jnp.zeros_like(bi[:])

    dist = _chunk_dist(q_ref[:], k_ref[:])
    if exclude_diag:
        dist = _diag_mask(dist, pl.program_id(0) * tq, j * tm)
    bound = bd[:, k - 1][:, None]
    dscr[:] = jnp.where(dist < bound, dist, INVALID_DIST)
    _fold_block_topk(dscr, bd, bi, j * tm, k)

    @pl.when(j == n_mt - 1)
    def _():
        out_d_ref[:] = bd[:]
        out_i_ref[:] = bi[:]


def _knn_kernel_compact(
    qt_ref, kt_ref, fl_ref, q_ref, k_ref, out_d_ref, out_i_ref, bd, bi, dscr,
    *, tq: int, tm: int, k: int, exclude_diag: bool
):
    """kNN analogue of :func:`_nn1_kernel_compact`: a 1-D grid over the
    surviving (query tile, key chunk) pairs, k-slot running best in VMEM
    scratch, flag-driven reset/fold. Outputs are BLOCKED per query tile
    (a whole-array (Qp, k) VMEM residency would lane-pad k → 128 and blow
    VMEM); the running best is copied into the output block every step so
    the pipeline flush on a query-tile change always writes current data."""
    s = pl.program_id(0)
    f = fl_ref[s]

    @pl.when((f & 1) != 0)
    def _():
        bd[:] = jnp.full_like(bd[:], INVALID_DIST)
        bi[:] = jnp.zeros_like(bi[:])

    @pl.when((f & 2) != 0)
    def _():
        dist = _chunk_dist(q_ref[:], k_ref[:])
        if exclude_diag:
            dist = _diag_mask(dist, qt_ref[s] * tq, kt_ref[s] * tm)
        bound = bd[:, k - 1][:, None]
        dscr[:] = jnp.where(dist < bound, dist, INVALID_DIST)
        _fold_block_topk(dscr, bd, bi, kt_ref[s] * tm, k)

    out_d_ref[:] = bd[:]
    out_i_ref[:] = bi[:]


@partial(
    jax.jit,
    static_argnames=(
        "k", "budget", "tile_q", "tile_m", "exclude_diag", "interpret"
    ),
)
def _knn_pallas_compact(
    qp: jax.Array,  # (Qp, 8) augmented, tile_q-padded
    kp: jax.Array,  # (Mp, 8) augmented, tile_m-padded
    tile_mask: jax.Array,  # (n_qt, n_mt) bool
    *,
    k: int,
    budget: int,
    tile_q: int,
    tile_m: int,
    exclude_diag: bool = False,
    interpret: bool = False,
):
    """Compacted-pair kNN; falls back to the full-grid kernel when more than
    ``budget`` pairs survive. Returns ``(dist (Qp, k), idx (Qp, k))``.

    Output rows of query tiles whose mask row is all-False are UNDEFINED
    (their blocked output regions are never written): callers must either
    guarantee every row has ≥1 True (``radius_search_pruned`` forces the
    nearest chunk) or mask out unvisited rows afterwards (``knn_pruned``'s
    ``visited`` gate)."""
    n_qt = qp.shape[0] // tile_q
    n_mt = kp.shape[0] // tile_m

    flat = tile_mask.reshape(-1)
    count = jnp.sum(flat.astype(jnp.int32))
    ids = jnp.nonzero(flat, size=budget, fill_value=0)[0].astype(jnp.int32)
    live = jnp.arange(budget, dtype=jnp.int32) < count
    ids = jnp.where(live, ids, ids[jnp.maximum(count - 1, 0)])
    qt = ids // n_mt
    kt = ids % n_mt
    first = jnp.concatenate([jnp.array([True]), qt[1:] != qt[:-1]])
    last = jnp.concatenate([qt[:-1] != qt[1:], jnp.array([True])])
    flags = (
        first.astype(jnp.int32)
        + 2 * live.astype(jnp.int32)
        + 4 * last.astype(jnp.int32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(budget,),
        in_specs=[
            pl.BlockSpec((tile_q, _DPAD), lambda s, qt_, kt_, fl_: (qt_[s], 0)),
            pl.BlockSpec((tile_m, _DPAD), lambda s, qt_, kt_, fl_: (kt_[s], 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda s, qt_, kt_, fl_: (qt_[s], 0)),
            pl.BlockSpec((tile_q, k), lambda s, qt_, kt_, fl_: (qt_[s], 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, k), jnp.float32),
            pltpu.VMEM((tile_q, k), jnp.int32),
            pltpu.VMEM((tile_q, tile_m), jnp.float32),
        ],
    )

    def compact_path(args):
        qt_, kt_, fl_ = args
        d, i = pl.pallas_call(
            partial(
                _knn_kernel_compact, tq=tile_q, tm=tile_m, k=k,
                exclude_diag=exclude_diag,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_qt * tile_q, k), jnp.float32),
                jax.ShapeDtypeStruct((n_qt * tile_q, k), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(qt_, kt_, fl_, qp, kp)
        return d, i

    def full_path(args):
        del args
        return _knn_pallas_full(
            qp, kp, k=k, tile_q=tile_q, tile_m=tile_m,
            exclude_diag=exclude_diag, interpret=interpret,
        )

    return jax.lax.cond(
        count <= budget, compact_path, full_path, (qt, kt, flags)
    )


@partial(
    jax.jit,
    static_argnames=("k", "tile_q", "tile_m", "exclude_diag", "interpret"),
)
def _knn_pallas_full(
    qp, kp, *, k, tile_q, tile_m, exclude_diag=False, interpret=False
):
    """Full-grid kNN over pre-augmented tiles (the `knn_pallas` inner call,
    reusable as the compact path's overflow fallback)."""
    n_qt = qp.shape[0] // tile_q
    n_mt = kp.shape[0] // tile_m
    dist, idx = pl.pallas_call(
        partial(
            _knn_kernel, tq=tile_q, tm=tile_m, k=k, exclude_diag=exclude_diag
        ),
        grid=(n_qt, n_mt),
        in_specs=[
            pl.BlockSpec(
                (tile_q, _DPAD), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_m, _DPAD), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_q, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_q, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp.shape[0], k), jnp.float32),
            jax.ShapeDtypeStruct((qp.shape[0], k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, k), jnp.float32),
            pltpu.VMEM((tile_q, k), jnp.int32),
            pltpu.VMEM((tile_q, tile_m), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(qp, kp)
    return dist, idx


@partial(
    jax.jit,
    static_argnames=(
        "k", "tile_q", "tile_m", "exclude_self", "max_rounds", "interpret"
    ),
)
def knn_pruned(
    queries: jax.Array,
    keys: jax.Array,
    k: int,
    *,
    query_valid: Optional[jax.Array] = None,
    key_valid: Optional[jax.Array] = None,
    init_radius: Optional[float] = None,
    tile_q: int = 256,
    tile_m: int = 1024,  # r4 sweep: 1024 beats 2048 by ~10% at 120k k=10
    exclude_self: bool = False,
    max_rounds: int = 6,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """EXACT kNN via Morton-tile pruning with radius doubling.

    The kd-tree answers kNN by descending to a leaf and backtracking until
    the k-th best bounds the remaining boxes; the MXU-shaped equivalent:
    run the radius-bounded compact-pair kernel at a density-derived guess
    radius, keep a query when its k-th distance ≤ radius (every key inside
    the radius was examined, so nothing closer exists outside), double the
    radius for the unresolved tiles, repeat. A tile whose surviving-pair
    row covers every occupied key chunk is exact regardless of the k-th
    distance (handles clouds with < k valid keys). Worst case (everything
    unresolved, budget overflow) degrades to the full-grid kernel — the
    cost :func:`knn_pallas` pays every time. Same contract as
    :func:`knn_pallas`.
    """
    from .gridhash import _aabb_dist2

    # exclude_self contract (same as the reference's same-cloud searches):
    # queries and keys are POSITIONALLY the same cloud. "Self" is then the
    # sorted-space diagonal — masked inside the kernel (one VPU compare per
    # block) instead of the old k+1 search + _drop_self_slot postlude, whose
    # two (Q, k) take_along_axis gathers cost ~20 ms at 120k on chip. Two
    # independently-sorted sides with different validity masks would make
    # the diagonal no longer self (ADVICE r3 #1 measured 254/300
    # self-returns there), so exclude_self always shares ONE permutation
    # for both sides below.
    qn = queries.shape[0]
    mn = keys.shape[0]
    if exclude_self and qn != mn:
        raise ValueError(
            "exclude_self requires queries and keys to be the same cloud "
            f"(got {qn} queries vs {mn} keys)"
        )
    k_eff = min(k, mn)
    qv = jnp.ones(qn, bool) if query_valid is None else query_valid
    kv = jnp.ones(mn, bool) if key_valid is None else key_valid
    big = jnp.float32(3e38)

    kext_min = jnp.min(jnp.where(kv[:, None], keys, big), axis=0)
    kext_max = jnp.max(jnp.where(kv[:, None], keys, -big), axis=0)
    diag = jnp.linalg.norm(kext_max - kext_min)
    if init_radius is None:
        # Surface-density guess: spacing ~ diag·sqrt(1/M) on a 2-manifold;
        # the doubling loop absorbs a bad guess either way.
        r0 = jnp.maximum(
            diag * jnp.sqrt(jnp.float32(max(k_eff, 1)) / jnp.float32(mn)),
            jnp.float32(1e-6),
        )
    else:
        r0 = jnp.float32(init_radius)

    origin = jnp.minimum(
        jnp.min(jnp.where(qv[:, None], queries, big), axis=0), kext_min
    )
    if exclude_self:
        # One SHARED permutation, sorted by the union validity: sorted row i
        # == sorted key i == the same original point, so the kernel's
        # diagonal mask stays exactly the self-pairs whatever validity-mask
        # OBJECTS the caller passed (exclude_self's contract says the two
        # sides are positionally one cloud, so object identity of the masks
        # must not change dispatch — ADVICE r4 #3). Costs only AABB
        # tightness (a side's invalid points no longer compact to the tail)
        # and saves the second redundant Morton sort.
        perm, _, _ = _morton_sort(queries, qv | kv, origin, r0)
        qperm = kperm = perm
        qs, ks = queries[perm], keys[perm]
        qvs, kvs = qv[perm], kv[perm]
    else:
        qperm, qs, qvs = _morton_sort(queries, qv, origin, r0)
        kperm, ks, kvs = _morton_sort(keys, kv, origin, r0)

    qmin, qmax, q_occ = _tile_aabbs(qs, qvs, tile_q)
    kmin, kmax, k_occ = _tile_aabbs(ks, kvs, tile_m)
    aabb_d2 = _aabb_dist2(qmin, qmax, kmin, kmax)
    qp = _augment_queries(qs, tile_q)
    kp = _augment_keys(ks, kvs, tile_m)
    n_qt = qp.shape[0] // tile_q
    n_mt = kp.shape[0] // tile_m
    qn_pad = qp.shape[0]
    budget = n_qt * min(max(n_mt // 4, 8), max(n_mt, 1))
    nearest = jnp.argmin(
        jnp.where(k_occ[None, :], aabb_d2, big), axis=1
    )

    qvs_pad = jnp.zeros((qn_pad,), bool).at[:qn].set(qvs)

    def body(carry):
        radius, dist, idx, resolved, it = carry
        r2 = radius * radius
        tile_unres = jnp.any(
            ~resolved.reshape(n_qt, tile_q), axis=1
        ) & q_occ
        mask = (
            (aabb_d2 <= r2)
            & tile_unres[:, None]
            & k_occ[None, :]
        )
        mask = mask.at[jnp.arange(n_qt), nearest].set(
            mask.at[jnp.arange(n_qt), nearest].get() | tile_unres
        )
        d_new, i_new = _knn_pallas_compact(
            qp, kp, mask, k=k_eff, budget=budget,
            tile_q=tile_q, tile_m=tile_m, exclude_diag=exclude_self,
            interpret=interpret,
        )
        kth = d_new[:, k_eff - 1]
        # Tiles whose surviving row covered EVERY occupied chunk are exact
        # regardless of the k-th distance (e.g. < k valid keys exist).
        covered_tile = jnp.all(mask | ~k_occ[None, :], axis=1) & tile_unres
        covered = jnp.repeat(covered_tile, tile_q, total_repeat_length=qn_pad)
        visited = jnp.repeat(
            tile_unres, tile_q, total_repeat_length=qn_pad
        )
        # Budget overflow took the full-grid fallback inside the compact
        # call: EVERY query's answer is then exact, so resolve them all —
        # otherwise rounds would repeat the expensive full pass.
        overflowed = jnp.sum(mask.astype(jnp.int32)) > budget
        newly = ~resolved & (
            overflowed | (visited & ((kth <= r2) | covered))
        )
        dist = jnp.where(newly[:, None], d_new, dist)
        idx = jnp.where(newly[:, None], i_new, idx)
        return radius * 2.0, dist, idx, resolved | newly, it + 1

    def cond(carry):
        _, _, _, resolved, it = carry
        return (~jnp.all(resolved)) & (it < max_rounds)

    init = (
        r0,
        jnp.full((qn_pad, k_eff), INVALID_DIST, jnp.float32),
        jnp.zeros((qn_pad, k_eff), jnp.int32),
        ~qvs_pad,  # invalid + padding rows are trivially resolved
        jnp.array(0, jnp.int32),
    )
    radius, dist, idx, resolved, _ = jax.lax.while_loop(cond, body, init)

    # Safety net: anything still unresolved after max_rounds gets the full
    # exact pass (rare — requires max_rounds consecutive under-guesses).
    def full_fix(args):
        dist, idx = args
        d_f, i_f = _knn_pallas_full(
            qp, kp, k=k_eff, tile_q=tile_q, tile_m=tile_m,
            exclude_diag=exclude_self, interpret=interpret,
        )
        unres = ~resolved
        return (
            jnp.where(unres[:, None], d_f, dist),
            jnp.where(unres[:, None], i_f, idx),
        )

    dist, idx = jax.lax.cond(
        jnp.all(resolved), lambda a: a, full_fix, (dist, idx)
    )

    dist = jnp.maximum(dist[:qn], 0.0)
    dist = jnp.where(dist >= INVALID_DIST * 0.5, INVALID_DIST, dist)
    idx = jnp.where(
        dist < INVALID_DIST * 0.5,
        _unpermute_key_indices(kperm, idx[:qn], mn),
        0,
    )
    dist = jnp.where(qvs[:, None], dist, INVALID_DIST)
    # Un-permute to original query order.
    qinv = _inverse_perm(qperm)
    dist = dist[qinv]
    idx = idx[qinv]
    if k_eff < k:
        dist = jnp.pad(
            dist, ((0, 0), (0, k - k_eff)), constant_values=INVALID_DIST
        )
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    return dist, idx


@partial(
    jax.jit,
    static_argnames=(
        "max_results", "tile_q", "tile_m", "exclude_self", "interpret"
    ),
)
def radius_search_pruned(
    queries: jax.Array,
    keys: jax.Array,
    radius: float,
    max_results: int,
    *,
    query_valid: Optional[jax.Array] = None,
    key_valid: Optional[jax.Array] = None,
    tile_q: int = 256,  # r4 sweep: 138 -> 99 ms at the 120k/1cm bench row
    tile_m: int = 1024,
    exclude_self: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Radius-bounded NN through the compacted-pair kernel: ONE fixed-radius
    pass of the kNN kernel with ``k = max_results``, then a radius gate.

    Same contract as :func:`..gridhash.radius_search_grid` —
    ``(dist (Q, R), idx (Q, R), overflowed (Q,))``, squared-L2 ascending,
    INVALID_DIST beyond the radius — but with an exact honesty guarantee:
    the kernel sees EVERY key within the radius (tile AABB pruning is
    conservative and the budget overflow falls back to the full grid), so
    ``overflowed`` is exactly "more than max_results keys lie within the
    radius" (the capacity truncation case; there is no tile-budget
    truncation case).
    """
    from .gridhash import _aabb_dist2

    if exclude_self:
        dist, idx, over_inner = radius_search_pruned(
            queries, keys, radius, max_results + 1,
            query_valid=query_valid, key_valid=key_valid,
            tile_q=tile_q, tile_m=tile_m, interpret=interpret,
        )
        dist, idx, any_self, hit_last = _drop_self_slot(
            dist, idx, max_results
        )
        # Exact overflow after the self drop: > max_results+1 within radius
        # (over_inner), or exactly max_results+1 found none of which was
        # the self hit.
        over = over_inner | (hit_last & ~any_self)
        return dist, idx, over

    qn = queries.shape[0]
    mn = keys.shape[0]
    # One probe slot beyond the cap makes the overflow flag exact: slot
    # max_results landing within the radius proves MORE than max_results
    # keys are inside (not merely exactly max_results).
    k_eff = min(max_results + 1, mn)
    qv = jnp.ones(qn, bool) if query_valid is None else query_valid
    kv = jnp.ones(mn, bool) if key_valid is None else key_valid
    big = jnp.float32(3e38)
    r = jnp.float32(radius)
    r2 = r * r

    origin = jnp.minimum(
        jnp.min(jnp.where(qv[:, None], queries, big), axis=0),
        jnp.min(jnp.where(kv[:, None], keys, big), axis=0),
    )
    qperm, qs, qvs = _morton_sort(queries, qv, origin, r)
    kperm, ks, kvs = _morton_sort(keys, kv, origin, r)

    qmin, qmax, q_occ = _tile_aabbs(qs, qvs, tile_q)
    kmin, kmax, k_occ = _tile_aabbs(ks, kvs, tile_m)
    aabb_d2 = _aabb_dist2(qmin, qmax, kmin, kmax)
    within = (aabb_d2 <= r2) & q_occ[:, None] & k_occ[None, :]
    n_qt = within.shape[0]
    nearest = jnp.argmin(jnp.where(k_occ[None, :], aabb_d2, big), axis=1)
    within = within.at[jnp.arange(n_qt), nearest].set(True)

    qp = _augment_queries(qs, tile_q)
    kp = _augment_keys(ks, kvs, tile_m)
    n_mt = kp.shape[0] // tile_m
    budget = n_qt * min(max(n_mt // 4, 8), max(n_mt, 1))
    dist, idx = _knn_pallas_compact(
        qp, kp, within, k=k_eff, budget=budget,
        tile_q=tile_q, tile_m=tile_m, interpret=interpret,
    )
    dist = jnp.maximum(dist[: qs.shape[0]], 0.0)
    idx = idx[: qs.shape[0]]
    ok = (dist <= r2) & qvs[:, None]
    # The probe slot (index max_results) within the radius == true overflow.
    over = ok[:, k_eff - 1] & (k_eff == max_results + 1)
    dist = jnp.where(ok, dist, INVALID_DIST)
    idx = jnp.where(ok, _unpermute_key_indices(kperm, idx, mn), 0)
    qinv = _inverse_perm(qperm)
    dist = dist[qinv][:, :max_results]
    idx = idx[qinv][:, :max_results]
    over = over[qinv]
    if dist.shape[1] < max_results:
        pad = max_results - dist.shape[1]
        dist = jnp.pad(dist, ((0, 0), (0, pad)), constant_values=INVALID_DIST)
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
    return dist, idx, over


@partial(jax.jit, static_argnames=("k", "tile_q", "tile_m", "exclude_self", "interpret"))
def knn_pallas(
    queries: jax.Array,
    keys: jax.Array,
    k: int,
    *,
    query_valid: Optional[jax.Array] = None,
    key_valid: Optional[jax.Array] = None,
    tile_q: int = 512,
    tile_m: int = 2048,
    exclude_self: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact kNN: ``(dist² (Q, k), idx (Q, k) int32)``, ascending by distance.

    Default tiles from the 120k×120k k=10 chip sweep (512/2048: 384 ms vs
    515 ms at the old 256/1024); large L2 3-D problems should instead go
    through :func:`knn_pruned` (98.6 ms on the same workload).

    ``exclude_self`` masks the diagonal inside the kernel (queries and keys
    positionally the same cloud), as the reference's same-cloud searches do.
    """
    qn = queries.shape[0]
    mn = keys.shape[0]
    k_eff = min(k, mn)
    qp, kp = _augment(queries, keys, key_valid, tile_q, tile_m)
    dist, idx = _knn_pallas_full(
        qp, kp, k=k_eff, tile_q=tile_q, tile_m=tile_m,
        exclude_diag=exclude_self, interpret=interpret,
    )
    dist = jnp.maximum(dist[:qn], 0.0)
    dist = jnp.where(dist >= INVALID_DIST * 0.5, INVALID_DIST, dist)
    idx = idx[:qn]
    if query_valid is not None:
        dist = jnp.where(query_valid[:, None], dist, INVALID_DIST)
    if k_eff < k:
        dist = jnp.pad(dist, ((0, 0), (0, k - k_eff)), constant_values=INVALID_DIST)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    return dist, idx
