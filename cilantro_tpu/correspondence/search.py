"""Correspondence search for registration.

TPU-native redesign of ``include/cilantro/correspondence_search/``:

* ``CorrespondenceSearchKDTree`` (``correspondence_search_kd_tree.hpp:23-305``)
  becomes :func:`find_nn_correspondences` — one batched NN kernel call per ICP
  iteration instead of per-point kd-tree queries under OpenMP
  (``correspondence_search_kd_tree_utilities.hpp:26-43``). Direction
  (FIRST_TO_SECOND / SECOND_TO_FIRST / BOTH), max-distance gating,
  inlier-fraction trimming, one-to-one and reciprocal filters
  (``correspondence_search_kd_tree.hpp:47-51,107-229``) are all masked,
  fixed-shape operations.
* the feature adaptors (``common_transformable_feature_adaptors.hpp:8-120``)
  map to :func:`point_features` / :func:`point_normal_features` — plain arrays
  re-built per iteration (a fused transform + concat, not a stateful object).
* ``CorrespondenceSearchOracle`` (``correspondence_search_oracle.hpp:31-59``)
  maps to :func:`oracle_correspondences`.

Representation: a :class:`Correspondences` pytree sized by the *query* cloud —
``dst_idx (Q,) int32`` partner indices, squared feature distances, weights and
a validity mask. "Filtering" clears mask bits; shapes never change.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.transforms import Transform
from ..neighbors.bruteforce import INVALID_DIST, nn1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Correspondences:
    """Fixed-shape correspondence set (query i ↔ ``dst_idx[i]``)."""

    dst_idx: jax.Array  # (Q,) int32 — safe to gather with (0 where invalid)
    distances: jax.Array  # (Q,) squared feature distance, INVALID_DIST if masked
    weights: jax.Array  # (Q,) evaluator weight (0 where masked)
    mask: jax.Array  # (Q,) bool

    def count(self) -> jax.Array:
        return jnp.sum(self.mask)


def point_features(points: jax.Array, tf: Optional[Transform] = None) -> jax.Array:
    """Reference ``PointFeaturesAdaptor::transformFeatures``
    (``common_transformable_feature_adaptors.hpp:28-34``)."""
    return points if tf is None else tf.apply(points)


def point_normal_features(
    points: jax.Array,
    normals: jax.Array,
    normal_weight: float,
    tf: Optional[Transform] = None,
    rigid: bool = True,
) -> jax.Array:
    """Point‖weighted-normal 2·D features (reference
    ``PointNormalFeaturesAdaptor``, ``common_transformable_feature_adaptors.hpp:61-120``)."""
    if tf is not None:
        points = tf.apply(points)
        normals = tf.apply_normals(normals, rigid=rigid)
    return jnp.concatenate([points, normal_weight * normals], axis=-1)


def _fraction_threshold(distances, mask, fraction):
    """Distance value at the ``fraction`` quantile of *valid* correspondences
    (reference sort+truncate, ``core/correspondence.hpp:57-66``)."""
    q = distances.shape[0]
    d = jnp.where(mask, distances, INVALID_DIST)
    d_sorted = jnp.sort(d)
    count = jnp.sum(mask)
    kth = jnp.clip((fraction * count.astype(jnp.float32)).astype(jnp.int32), 1, q) - 1
    return d_sorted[kth]


def _one_to_one_mask(dst_idx, distances, mask, num_dst):
    """Keep only the closest query per destination (reference
    ``filterCorrespondencesOneToOne``, ``core/correspondence.hpp:68-100``).
    Deterministic tie-break by smallest query index via two scatter-mins."""
    q = dst_idx.shape[0]
    big = jnp.float32(INVALID_DIST)
    d = jnp.where(mask, distances, big)
    best_d = jnp.full((num_dst,), big).at[dst_idx].min(d)
    is_best = mask & (d <= best_d[dst_idx])
    qidx = jnp.arange(q, dtype=jnp.int32)
    best_q = (
        jnp.full((num_dst,), q, jnp.int32)
        .at[dst_idx]
        .min(jnp.where(is_best, qidx, q))
    )
    return is_best & (best_q[dst_idx] == qidx)


def find_nn_correspondences(
    query_features: jax.Array,
    dst_features: jax.Array,
    *,
    query_valid: Optional[jax.Array] = None,
    dst_valid: Optional[jax.Array] = None,
    max_distance: Optional[float] = None,
    inlier_fraction: float = 1.0,
    one_to_one: bool = False,
    metric: str = "l2",
    prune_plan=None,
) -> Correspondences:
    """Unidirectional NN matching with the reference's filter stack.

    ``max_distance`` is compared against *squared* L2 feature distance,
    matching the reference default ``0.01²``
    (``correspondence_search_kd_tree.hpp:47-51``) — pass the squared value.

    With a distance gate on a large 3D L2 problem (TPU), the search runs the
    Morton-sorted tile-pruned kernel — the gate doubles as the kd-tree-style
    box-prune bound, skipping far tile pairs entirely. Callers that search
    repeatedly against a fixed ``dst`` (the ICP loop) pass ``prune_plan``
    (:func:`cilantro_tpu.neighbors.pallas_nn.maybe_make_nn1_prune_plan`) to
    hoist the Morton sorts out of the loop. The plan BAKES the key cloud,
    both validity masks, and the radius: ``dst_features`` must be the cloud
    the plan was built from (the shapes are checked; contents cannot be),
    and the per-call ``query_valid``/``dst_valid``/``max_distance`` still
    apply only through the post-kernel filter stack.
    """
    from ..neighbors.pallas_nn import prune_eligible

    if prune_plan is not None:
        from ..neighbors.pallas_nn import nn1_pruned_planned

        if prune_plan.kperm.shape[0] != dst_features.shape[0]:
            raise ValueError(
                f"prune_plan was built for {prune_plan.kperm.shape[0]} keys "
                f"but dst_features has {dst_features.shape[0]} rows"
            )
        if prune_plan.qperm.shape[0] != query_features.shape[0]:
            raise ValueError(
                f"prune_plan was built for {prune_plan.qperm.shape[0]} "
                f"queries but query_features has "
                f"{query_features.shape[0]} rows"
            )
        dist, idx = nn1_pruned_planned(query_features, prune_plan)
    elif prune_eligible(
        query_features.shape, dst_features.shape, max_distance, metric
    ):
        from ..neighbors.pallas_nn import nn1_pruned

        dist, idx = nn1_pruned(
            query_features,
            dst_features,
            jnp.sqrt(jnp.float32(max_distance)),
            query_valid=query_valid,
            key_valid=dst_valid,
        )
    else:
        dist, idx = nn1(
            query_features,
            dst_features,
            query_valid=query_valid,
            key_valid=dst_valid,
            metric=metric,
        )
    mask = dist < INVALID_DIST
    if max_distance is not None:
        mask &= dist <= max_distance
    if inlier_fraction < 1.0:
        mask &= dist <= _fraction_threshold(dist, mask, inlier_fraction)
    if one_to_one:
        mask &= _one_to_one_mask(idx, dist, mask, dst_features.shape[0])
    return Correspondences(
        dst_idx=jnp.where(mask, idx, 0),
        distances=jnp.where(mask, dist, INVALID_DIST),
        weights=mask.astype(query_features.dtype),
        mask=mask,
    )


def find_nn_correspondences_bidirectional(
    src_features: jax.Array,
    dst_features: jax.Array,
    *,
    src_valid: Optional[jax.Array] = None,
    dst_valid: Optional[jax.Array] = None,
    max_distance: Optional[float] = None,
    inlier_fraction: float = 1.0,
    require_reciprocal: bool = False,
    metric: str = "l2",
) -> Correspondences:
    """Bidirectional matching, sized by the src cloud.

    ``require_reciprocal=True`` is the intersection (src i kept iff its NN j
    maps back to i); ``False`` is the reference's union — approximated on
    fixed shapes by keeping the src→dst matches *plus* folding dst→src
    matches into their src partners where the src slot would otherwise be
    masked (maps ``findNNCorrespondencesBidirectional``,
    ``correspondence_search_kd_tree_utilities.hpp:67-101``).
    """
    fwd = find_nn_correspondences(
        src_features,
        dst_features,
        query_valid=src_valid,
        dst_valid=dst_valid,
        max_distance=max_distance,
        metric=metric,
    )
    bwd = find_nn_correspondences(
        dst_features,
        src_features,
        query_valid=dst_valid,
        dst_valid=src_valid,
        max_distance=max_distance,
        metric=metric,
    )
    back_of_fwd = bwd.dst_idx[fwd.dst_idx]  # src index the partner maps back to
    src_n = src_features.shape[0]
    qidx = jnp.arange(src_n, dtype=jnp.int32)
    if require_reciprocal:
        mask = fwd.mask & bwd.mask[fwd.dst_idx] & (back_of_fwd == qidx)
        dist = fwd.distances
        idx = fwd.dst_idx
    else:
        # Union: scatter dst→src matches into src slots, prefer the closer.
        rev_d = jnp.full((src_n,), INVALID_DIST).at[bwd.dst_idx].min(
            jnp.where(bwd.mask, bwd.distances, INVALID_DIST)
        )
        rev_j = (
            jnp.full((src_n,), 0, jnp.int32)
            .at[bwd.dst_idx]
            .max(jnp.where(bwd.mask & (bwd.distances <= rev_d[bwd.dst_idx]),
                           jnp.arange(bwd.dst_idx.shape[0], dtype=jnp.int32), 0))
        )
        use_rev = (rev_d < fwd.distances)
        dist = jnp.where(use_rev, rev_d, fwd.distances)
        idx = jnp.where(use_rev, rev_j, fwd.dst_idx)
        mask = dist < INVALID_DIST
    if inlier_fraction < 1.0:
        mask &= dist <= _fraction_threshold(dist, mask, inlier_fraction)
    return Correspondences(
        dst_idx=jnp.where(mask, idx, 0),
        distances=jnp.where(mask, dist, INVALID_DIST),
        weights=mask.astype(src_features.dtype),
        mask=mask,
    )


def oracle_correspondences(
    src_points: jax.Array,
    dst_points: jax.Array,
    dst_idx: jax.Array,
    mask: jax.Array,
    tf: Optional[Transform] = None,
    max_distance: Optional[float] = None,
) -> Correspondences:
    """Fixed user-provided correspondences, re-scored under the current
    transform with a distance gate (reference ``CorrespondenceSearchOracle``,
    ``correspondence_search_oracle.hpp:31-59``)."""
    s = src_points if tf is None else tf.apply(src_points)
    diff = dst_points[dst_idx] - s
    dist = jnp.sum(diff * diff, axis=-1)
    m = mask
    if max_distance is not None:
        m = m & (dist <= max_distance)
    return Correspondences(
        dst_idx=jnp.where(m, dst_idx, 0),
        distances=jnp.where(m, dist, INVALID_DIST),
        weights=m.astype(src_points.dtype),
        mask=m,
    )


def combine_metric_correspondences(
    corr_point: Correspondences,
    corr_plane: Correspondences,
    dst_points: jax.Array,
    dst_normals: jax.Array,
    *,
    point_weight: float = 1.0,
    plane_weight: float = 1.0,
):
    """Two-engine combined-metric correspondence combiner (reference
    ``correspondence_search_combined_metric_combiner.hpp:9-81``): the
    point-to-point and point-to-plane metrics may come from DIFFERENT search
    engines (e.g. point features vs point‖normal features); this merges
    their results into the gathered arrays + two weight channels the GN
    estimators consume.

    Returns ``(dst (2Q, D), nrm (2Q, D), w_point (2Q,), w_plane (2Q,))`` —
    the two metrics' correspondence sets STACKED (rows [0, Q) carry the
    point metric against ``corr_point``'s targets with the plane weight
    zeroed; rows [Q, 2Q) carry the plane metric against ``corr_plane``'s
    targets + normals with the point weight zeroed), exactly the
    reference's two independent correspondence vectors. Pass the source
    tiled twice: ``estimate_rigid_combined_metric(jnp.concatenate([s, s]),
    dst, nrm, point_weights=w_point, plane_weights=w_plane)``.
    """
    q = corr_point.dst_idx.shape[0]
    zeros = jnp.zeros(q, dst_points.dtype)
    dst = jnp.concatenate(
        [dst_points[corr_point.dst_idx], dst_points[corr_plane.dst_idx]]
    )
    nrm = jnp.concatenate(
        [jnp.zeros((q, dst_points.shape[1]), dst_points.dtype),
         dst_normals[corr_plane.dst_idx]]
    )
    w_point = jnp.concatenate([corr_point.weights * point_weight, zeros])
    w_plane = jnp.concatenate([zeros, corr_plane.weights * plane_weight])
    return dst, nrm, w_point, w_plane
