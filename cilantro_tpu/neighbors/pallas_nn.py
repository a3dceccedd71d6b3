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

HBM traffic drops to reading each cloud ~once; the kernel is MXU-throughput
bound (~30 ms for 120k×120k on v5e). Replaces the nanoflann kd-tree
(``include/cilantro/core/kd_tree.hpp:146-388``) for the ICP correspondence
hot path (``correspondence_search_kd_tree_utilities.hpp:26-43``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID_DIST = 3.0e38  # plain float: used as a literal inside Pallas kernels

_DPAD = 8  # pad point dim to one f32 sublane tile


def _augment(queries, keys, key_valid, tile_q, tile_m):
    """Augmented coordinates so ONE matmul yields squared distances:
    ``q̂ = [-2q, ‖q‖², 1]``, ``k̂ = [k, 1, ‖k‖²(+INVALID if masked)]`` →
    ``q̂·k̂ = ‖q‖² + ‖k‖² − 2q·k``. Kills all VPU distance assembly; the
    kernel inner loop is one MXU contraction + a min/argmin."""

    def pad_rows(x, mult):
        n = x.shape[0]
        rows = ((n + mult - 1) // mult) * mult
        return jnp.zeros((rows, _DPAD), jnp.float32).at[:n, : x.shape[1]].set(x)

    d = queries.shape[1]
    q = queries.astype(jnp.float32)
    k = keys.astype(jnp.float32)
    qq = jnp.sum(q * q, axis=1, keepdims=True)
    kk = jnp.sum(k * k, axis=1, keepdims=True)
    if key_valid is not None:
        kk = jnp.where(key_valid[:, None], kk, INVALID_DIST)
    ones_q = jnp.ones_like(qq)
    ones_k = jnp.ones_like(kk)
    qhat = jnp.concatenate([-2.0 * q, qq, ones_q], axis=1)  # (Q, d+2)
    khat = jnp.concatenate([k, ones_k, kk], axis=1)  # (M, d+2)
    qp = pad_rows(qhat, tile_q)
    # Padding *keys* must never win: give them +INVALID in the kk slot.
    mn = keys.shape[0]
    kp = pad_rows(khat, tile_m)
    if kp.shape[0] > mn:
        kp = kp.at[mn:, d + 1].set(INVALID_DIST)
    return qp, kp


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
    from .gridhash import _aabb_dist2, morton_code

    qn, d = queries.shape
    mn = keys.shape[0]
    qv = jnp.ones(qn, bool) if query_valid is None else query_valid
    kv = jnp.ones(mn, bool) if key_valid is None else key_valid
    big = jnp.float32(3e38)
    origin = jnp.minimum(
        jnp.min(jnp.where(qv[:, None], queries, big), axis=0),
        jnp.min(jnp.where(kv[:, None], keys, big), axis=0),
    )
    qcode = jnp.where(
        qv, morton_code(queries, origin, radius), jnp.int32(2**31 - 1)
    )
    kcode = jnp.where(
        kv, morton_code(keys, origin, radius), jnp.int32(2**31 - 1)
    )
    qperm = jnp.argsort(qcode).astype(jnp.int32)
    kperm = jnp.argsort(kcode).astype(jnp.int32)
    qs = queries[qperm]
    ks = keys[kperm]
    qvs = qv[qperm]
    kvs = kv[kperm]

    def tile_aabbs(pts, val, tile):
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

    qmin, qmax, q_occ = tile_aabbs(qs, qvs, tile_q)
    kmin, kmax, k_occ = tile_aabbs(ks, kvs, tile_m)
    r2 = jnp.float32(radius) * jnp.float32(radius)
    within = (
        (_aabb_dist2(qmin, qmax, kmin, kmax) <= r2)
        & q_occ[:, None]
        & k_occ[None, :]
    ).astype(jnp.int32)

    qp, kp = _augment(qs, ks, kvs, tile_q, tile_m)
    dist, idx = _nn1_pallas_masked(
        qp, kp, within, tile_q=tile_q, tile_m=tile_m, interpret=interpret
    )
    dist = jnp.maximum(dist.reshape(-1)[:qn], 0.0)
    idx = idx.reshape(-1)[:qn]
    # Radius gate + invalid queries; map indices back to original key order.
    ok = (dist <= r2) & qvs
    dist = jnp.where(ok, dist, INVALID_DIST)
    idx = jnp.where(ok, kperm[jnp.clip(idx, 0, mn - 1)], 0)
    # Un-permute to the original query order.
    inv = jnp.argsort(qperm).astype(jnp.int32)
    return dist[inv], idx[inv]


def _k_smallest(dist, payload_idx, k):
    """k smallest per row by iterated min-extraction (``top_k`` has no Pallas
    TPU lowering; k is small so k VPU passes are fine). Returns ascending
    ``(vals (TQ, k), idx (TQ, k))`` where idx is taken from ``payload_idx``."""
    big_i = jnp.int32(2**31 - 1)
    vals, idxs = [], []
    d = dist
    for _ in range(k):
        m = jnp.min(d, axis=1)
        is_min = d == m[:, None]
        # Winner = smallest payload index among ties (deterministic, no gather).
        a = jnp.min(jnp.where(is_min, payload_idx, big_i), axis=1)
        vals.append(m)
        idxs.append(a)
        d = jnp.where(payload_idx == a[:, None], INVALID_DIST, d)
    return jnp.stack(vals, 1), jnp.stack(idxs, 1)


def _knn_kernel(q_ref, k_ref, out_d_ref, out_i_ref, bd, bi, *, tm: int, k: int):
    j = pl.program_id(1)
    n_mt = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        bd[:] = jnp.full_like(bd[:], INVALID_DIST)
        bi[:] = jnp.zeros_like(bi[:])

    dist = _chunk_dist(q_ref[:], k_ref[:])
    tq = dist.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tm), 1) + j * tm
    chunk_d, chunk_i = _k_smallest(dist, col, k)
    cand_d = jnp.concatenate([bd[:], chunk_d], axis=1)  # (TQ, 2k)
    cand_i = jnp.concatenate([bi[:], chunk_i], axis=1)
    bd[:], bi[:] = _k_smallest(cand_d, cand_i, k)

    @pl.when(j == n_mt - 1)
    def _():
        out_d_ref[:] = bd[:]
        out_i_ref[:] = bi[:]


@partial(jax.jit, static_argnames=("k", "tile_q", "tile_m", "exclude_self", "interpret"))
def knn_pallas(
    queries: jax.Array,
    keys: jax.Array,
    k: int,
    *,
    query_valid: Optional[jax.Array] = None,
    key_valid: Optional[jax.Array] = None,
    tile_q: int = 256,
    tile_m: int = 1024,
    exclude_self: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact kNN: ``(dist² (Q, k), idx (Q, k) int32)``, ascending by distance.

    ``exclude_self`` searches k+1 and drops the first self match per query
    (same-cloud queries), as the reference does.
    """
    if exclude_self:
        dist, idx = knn_pallas(
            queries,
            keys,
            k + 1,
            query_valid=query_valid,
            key_valid=key_valid,
            tile_q=tile_q,
            tile_m=tile_m,
            interpret=interpret,
        )
        qn = queries.shape[0]
        rows = jnp.arange(qn, dtype=jnp.int32)
        is_self = idx == rows[:, None]
        any_self = jnp.any(is_self, axis=1)
        first_self = jnp.argmax(is_self, axis=1)
        drop = jnp.where(any_self, first_self, k)
        keep = jnp.arange(k + 1)[None, :] != drop[:, None]
        sel = jnp.argsort(~keep, axis=1, stable=True)[:, :k]
        return (
            jnp.take_along_axis(dist, sel, axis=1),
            jnp.take_along_axis(idx, sel, axis=1),
        )

    qn = queries.shape[0]
    mn = keys.shape[0]
    k_eff = min(k, mn)
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
            pl.BlockSpec((tile_q, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    dist, idx = pl.pallas_call(
        partial(_knn_kernel, tm=tile_m, k=k_eff),
        grid=grid,
        **specs,
        out_shape=[
            jax.ShapeDtypeStruct((qp.shape[0], k_eff), jnp.float32),
            jax.ShapeDtypeStruct((qp.shape[0], k_eff), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, k_eff), jnp.float32),
            pltpu.VMEM((tile_q, k_eff), jnp.int32),
        ],
        interpret=interpret,
    )(qp, kp)
    dist = jnp.maximum(dist[:qn], 0.0)
    dist = jnp.where(dist >= INVALID_DIST * 0.5, INVALID_DIST, dist)
    idx = idx[:qn]
    if query_valid is not None:
        dist = jnp.where(query_valid[:, None], dist, INVALID_DIST)
    if k_eff < k:
        dist = jnp.pad(dist, ((0, 0), (0, k - k_eff)), constant_values=INVALID_DIST)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    return dist, idx
