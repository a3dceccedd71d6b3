"""Tiled brute-force exact nearest-neighbor search.

TPU-native replacement for the reference's nanoflann kd-tree
(``include/cilantro/core/kd_tree.hpp:146-388`` wrapping
``3rd_party/nanoflann.hpp``): pointer-chasing trees do not map to the MXU, so
NN search is recast as a *streamed distance-tile* problem, flash-attention
style — query tiles stay resident while key tiles stream through, maintaining
a running top-k. The N×M distance matrix is never materialized.

* squared-L2 distances come from one MXU matmul per tile pair
  (``‖q‖² + ‖m‖² − 2 q·mᵀ``); L1 uses a VPU broadcast (D is small).
* results are fixed-shape ``(Q, k)`` index/distance/mask arrays — the static
  analogue of the reference's ``NeighborhoodSet``
  (``core/nearest_neighbors.hpp:50-56``).
* the three search specs (kNN / radius / kNN-in-radius,
  ``core/nearest_neighbors.hpp:58-86``) become :func:`knn` plus masking in
  ``api.py``.

Exactness matches the kd-tree: both enumerate all pairs; only ordering of
ties may differ.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Plain Python float (NOT a jnp constant): materializing a device array at
# import time would initialize the XLA backend, which must not happen before
# jax.distributed.initialize() in multi-process deployments. JAX weak typing
# keeps comparisons/fills in f32.
INVALID_DIST = 3.0e38


def _pad_rows(a: jax.Array, multiple: int, fill) -> jax.Array:
    n = a.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return a
    return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1), constant_values=fill)


def _tile_dist2_l2(q: jax.Array, m: jax.Array) -> jax.Array:
    """Squared L2 distances ``(TQ, TM)`` via the MXU."""
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    mm = jnp.sum(m * m, axis=-1)[None, :]
    cross = jnp.dot(
        q,
        m.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(qq + mm - 2.0 * cross, 0.0)


def _tile_dist_l1(q: jax.Array, m: jax.Array) -> jax.Array:
    return jnp.sum(jnp.abs(q[:, None, :] - m[None, :, :]), axis=-1)


def _tile_dist_so2(q: jax.Array, m: jax.Array) -> jax.Array:
    """Squared angular distance between (N, 1) angles (reference SO2 metric
    adaptor, ``core/kd_tree.hpp:11-61``): wraps to (−π, π]."""
    diff = q[:, None, 0] - m[None, :, 0]
    wrapped = jnp.mod(diff + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return wrapped * wrapped


def _tile_dist_so3(q: jax.Array, m: jax.Array) -> jax.Array:
    """Rotation distance between (N, 4) unit quaternions (reference SO3
    metric adaptor): ``1 − (q·q')²`` — monotone in the rotation angle and
    sign-invariant, computed as one MXU matmul."""
    dots = jnp.dot(
        q, m.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(1.0 - dots * dots, 0.0)


_TILE_DISTS = {
    "l2": _tile_dist2_l2,
    "l1": _tile_dist_l1,
    "so2": _tile_dist_so2,
    "so3": _tile_dist_so3,
}


def _use_pallas(metric: str, dim: int) -> bool:
    """Dispatch to the fused Pallas kernels on TPU for L2 in ≤ 6 dims (the
    augmented-coordinate layout holds D+2 ≤ 8 columns)."""
    return metric == "l2" and dim <= 6 and jax.default_backend() == "tpu"


@partial(
    jax.jit,
    static_argnames=("k", "metric", "tile_q", "tile_m", "exclude_self"),
)
def _knn_xla(
    queries: jax.Array,
    keys: jax.Array,
    k: int,
    *,
    query_valid: Optional[jax.Array] = None,
    key_valid: Optional[jax.Array] = None,
    metric: str = "l2",
    tile_q: int = 1024,
    tile_m: int = 2048,
    exclude_self: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact k nearest keys for every query.

    Returns ``(dist (Q, k), idx (Q, k) int32)``; for ``metric='l2'`` distances
    are *squared* (as everywhere in the reference's L2 paths). Slots beyond
    the number of valid keys hold ``INVALID_DIST`` and index 0 — callers mask
    with ``dist < INVALID_DIST``.

    ``exclude_self`` drops key ``j == query i`` (self-match) for same-cloud
    queries, matching reference usages that search with ``k+1`` and skip the
    first hit.
    """
    qn, d = queries.shape
    mn = keys.shape[0]
    k = min(k, mn)

    qv = jnp.ones(qn, bool) if query_valid is None else query_valid
    kv = jnp.ones(mn, bool) if key_valid is None else key_valid

    qp = _pad_rows(queries.astype(jnp.float32), tile_q, 0.0)
    kp = _pad_rows(keys.astype(jnp.float32), tile_m, 0.0)
    kvp = _pad_rows(kv, tile_m, False)
    n_qt = qp.shape[0] // tile_q
    n_mt = kp.shape[0] // tile_m

    key_tiles = kp.reshape(n_mt, tile_m, d)
    key_valid_tiles = kvp.reshape(n_mt, tile_m)
    tile_dist = _TILE_DISTS[metric]

    def per_query_tile(args):
        q_tile, q_idx0 = args  # (tile_q, d), scalar base index

        def scan_key_tile(carry, inp):
            best_d, best_i = carry
            m_tile, m_valid, m_idx0 = inp
            dist = tile_dist(q_tile, m_tile)  # (tile_q, tile_m)
            col_idx = m_idx0 + jax.lax.broadcasted_iota(
                jnp.int32, (tile_q, tile_m), 1
            )
            dist = jnp.where(m_valid[None, :], dist, INVALID_DIST)
            if exclude_self:
                row_idx = q_idx0 + jax.lax.broadcasted_iota(
                    jnp.int32, (tile_q, tile_m), 0
                )
                dist = jnp.where(col_idx == row_idx, INVALID_DIST, dist)
            # Tile-local top-k via the TPU-optimized PartialReduce
            # (recall 1.0 → exact), then an exact 2k-candidate merge with the
            # running best. Far cheaper than sorting (k + tile_m) candidates.
            tile_d, tile_pos = jax.lax.approx_min_k(dist, k, recall_target=1.0)
            tile_i = jnp.take_along_axis(col_idx, tile_pos, axis=1)
            cand_d = jnp.concatenate([best_d, tile_d], axis=1)
            cand_i = jnp.concatenate([best_i, tile_i], axis=1)
            neg_top, pos = jax.lax.top_k(-cand_d, k)
            return (-neg_top, jnp.take_along_axis(cand_i, pos, axis=1)), None

        init = (
            jnp.full((tile_q, k), INVALID_DIST),
            jnp.zeros((tile_q, k), jnp.int32),
        )
        m_idx0s = jnp.arange(n_mt, dtype=jnp.int32) * tile_m
        (best_d, best_i), _ = jax.lax.scan(
            scan_key_tile, init, (key_tiles, key_valid_tiles, m_idx0s)
        )
        return best_d, best_i

    q_tiles = qp.reshape(n_qt, tile_q, d)
    q_idx0s = jnp.arange(n_qt, dtype=jnp.int32) * tile_q
    dist, idx = jax.lax.map(per_query_tile, (q_tiles, q_idx0s))
    dist = dist.reshape(-1, k)[:qn]
    idx = idx.reshape(-1, k)[:qn]
    # Invalidate results of invalid queries.
    dist = jnp.where(qv[:, None], dist, INVALID_DIST)
    return dist, idx


def knn(
    queries: jax.Array,
    keys: jax.Array,
    k: int,
    *,
    query_valid: Optional[jax.Array] = None,
    key_valid: Optional[jax.Array] = None,
    metric: str = "l2",
    tile_q: int = 1024,
    tile_m: int = 2048,
    exclude_self: bool = False,
    allow_pruned: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Exact kNN — fused Pallas kernel on TPU, XLA scan elsewhere.

    Large L2 3-D problems take the Morton-tile-pruned radius-doubling
    kernel (:func:`..pallas_nn.knn_pruned` — exact, kd-tree-style box
    pruning; ``allow_pruned=False`` opts out). NOTE: the pruned route
    breaks distance ties by smallest *Morton-sorted* key position, not
    smallest original index — equidistant neighbors may return a different
    (equally valid) index than the plain kernel.

    See :func:`_knn_xla` for result conventions (squared L2 distances,
    INVALID_DIST padding).
    """
    if _use_pallas(metric, queries.shape[1]):
        if (
            allow_pruned
            and queries.shape[1] == 3
            and queries.shape[0] * keys.shape[0] >= (1 << 26)
        ):
            from .pallas_nn import knn_pruned

            # NOTE: tile_q/tile_m here are the FUSED kernel's defaults; the
            # pruned kernel has its own swept-optimal tiling — forwarding
            # these cost the public path ~70% over the bare kernel
            # (BENCH_r02 168 ms vs 98.6 ms, reconciled round 3).
            return knn_pruned(
                queries,
                keys,
                k,
                query_valid=query_valid,
                key_valid=key_valid,
                exclude_self=exclude_self,
            )
        from .pallas_nn import knn_pallas

        return knn_pallas(
            queries,
            keys,
            k,
            query_valid=query_valid,
            key_valid=key_valid,
            exclude_self=exclude_self,
        )
    return _knn_xla(
        queries,
        keys,
        k,
        query_valid=query_valid,
        key_valid=key_valid,
        metric=metric,
        tile_q=tile_q,
        tile_m=tile_m,
        exclude_self=exclude_self,
    )


@partial(jax.jit, static_argnames=("metric", "tile_m"))
def _nn1_xla(
    queries: jax.Array,
    keys: jax.Array,
    *,
    query_valid: Optional[jax.Array] = None,
    key_valid: Optional[jax.Array] = None,
    metric: str = "l2",
    tile_m: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Single nearest neighbor — the ICP hot path; cheaper than ``knn(k=1)``
    because the merge is an elementwise min instead of a top-k sort."""
    qn, d = queries.shape
    mn = keys.shape[0]
    kv = jnp.ones(mn, bool) if key_valid is None else key_valid
    kp = _pad_rows(keys.astype(jnp.float32), tile_m, 0.0)
    kvp = _pad_rows(kv, tile_m, False)
    n_mt = kp.shape[0] // tile_m
    key_tiles = kp.reshape(n_mt, tile_m, d)
    key_valid_tiles = kvp.reshape(n_mt, tile_m)
    tile_dist = _TILE_DISTS[metric]
    q = queries.astype(jnp.float32)

    def scan_key_tile(carry, inp):
        best_d, best_i = carry
        m_tile, m_valid, m_idx0 = inp
        dist = tile_dist(q, m_tile)
        dist = jnp.where(m_valid[None, :], dist, INVALID_DIST)
        tile_best = jnp.min(dist, axis=1)
        tile_arg = m_idx0 + jnp.argmin(dist, axis=1).astype(jnp.int32)
        better = tile_best < best_d
        return (
            jnp.where(better, tile_best, best_d),
            jnp.where(better, tile_arg, best_i),
        ), None

    init = (jnp.full((qn,), INVALID_DIST), jnp.zeros((qn,), jnp.int32))
    m_idx0s = jnp.arange(n_mt, dtype=jnp.int32) * tile_m
    (best_d, best_i), _ = jax.lax.scan(
        scan_key_tile, init, (key_tiles, key_valid_tiles, m_idx0s)
    )
    if query_valid is not None:
        best_d = jnp.where(query_valid, best_d, INVALID_DIST)
    return best_d, best_i


def nn1(
    queries: jax.Array,
    keys: jax.Array,
    *,
    query_valid: Optional[jax.Array] = None,
    key_valid: Optional[jax.Array] = None,
    metric: str = "l2",
    tile_m: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Exact single-NN — fused Pallas kernel on TPU, XLA scan elsewhere."""
    if _use_pallas(metric, queries.shape[1]):
        from .pallas_nn import nn1_pallas

        return nn1_pallas(
            queries, keys, query_valid=query_valid, key_valid=key_valid
        )
    return _nn1_xla(
        queries,
        keys,
        query_valid=query_valid,
        key_valid=key_valid,
        metric=metric,
        tile_m=tile_m,
    )
