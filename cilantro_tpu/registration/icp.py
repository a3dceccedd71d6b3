"""Rigid/affine single-transform ICP.

TPU-native redesign of the reference ICP stack:

* ``IterativeClosestPointBase::estimate()`` (``registration/icp_base.hpp:68-93``)
  — init → repeat {update correspondences, update estimate} until
  ``last_delta_norm < tol`` or ``max_iterations`` — becomes a single jitted
  ``lax.while_loop``; the whole multi-iteration registration is ONE XLA
  program (no host round-trips between iterations).
* the per-metric instances (``icp_single_transform_point_to_point_metric.hpp``,
  ``icp_single_transform_combined_metric.hpp``) become the static ``metric``
  switch; the symmetric-metric dispatch when source normals are available
  follows ``icp_single_transform_combined_metric.hpp:180-197``.
* ``last_delta_norm = ‖ΔR − I‖ + ‖Δt‖`` follows
  ``icp_single_transform_point_to_point_metric.hpp:46-65``.
* the pre-wired "common instances" (``registration/icp_common_instances.hpp:213-335``)
  map to the convenience wrappers at the bottom.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.transforms import Transform, compose, identity, reproject_rigid
from ..core.vma import match_vma
from ..correspondence.search import (
    Correspondences,
    find_nn_correspondences,
    point_features,
    point_normal_features,
)
from .transform_estimation import (
    estimate_affine_combined_metric,
    estimate_affine_point_to_point,
    estimate_rigid_combined_metric,
    estimate_rigid_point_to_point,
    estimate_rigid_symmetric_metric,
    residuals_combined_metric,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ICPResult:
    transform: Transform
    iterations: jax.Array  # int32 — reference getNumberOfPerformedIterations
    delta_norm: jax.Array  # reference getLastUpdateNorm
    converged: jax.Array  # bool — reference hasConverged
    num_correspondences: jax.Array  # int32, last iteration


def _delta_norm(delta: Transform) -> jax.Array:
    d = delta.dim
    eye = jnp.eye(d, dtype=delta.linear.dtype)
    return jnp.linalg.norm(delta.linear - eye) + jnp.linalg.norm(delta.translation)


@partial(
    jax.jit,
    static_argnames=(
        "metric",
        "max_iterations",
        "max_gn_iterations",
        "inlier_fraction",
        "one_to_one",
        "weight_fn",
        "feature_normal_weight",
    ),
)
def icp(
    src_points: jax.Array,
    dst_points: jax.Array,
    *,
    src_normals: Optional[jax.Array] = None,
    dst_normals: Optional[jax.Array] = None,
    src_valid: Optional[jax.Array] = None,
    dst_valid: Optional[jax.Array] = None,
    init: Optional[Transform] = None,
    metric: str = "combined",  # point_to_point | combined | symmetric | affine
    point_weight: float = 0.0,
    plane_weight: float = 1.0,
    max_iterations: int = 15,
    convergence_tol: float = 1e-5,
    max_gn_iterations: int = 1,
    max_corr_dist_sq: Optional[float] = 0.0001,
    inlier_fraction: float = 1.0,
    one_to_one: bool = False,
    weight_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    feature_normal_weight: float = 0.0,
) -> ICPResult:
    """Register ``src`` onto ``dst``: returns ``T`` with ``T(src) ≈ dst``.

    Defaults mirror the reference: 15 outer iterations / tol 1e-5
    (``icp_base.hpp:24-25``), 1 inner GN iteration
    (``transform_estimation.hpp:44``), squared max correspondence distance
    0.01² (``correspondence_search_kd_tree.hpp:47-51``), combined metric with
    point weight 0 / plane weight 1
    (``icp_single_transform_combined_metric.hpp:46-47``).

    ``metric='combined'`` with ``src_normals`` given upgrades to the symmetric
    metric, as the reference does
    (``icp_single_transform_combined_metric.hpp:180-197``).
    ``feature_normal_weight > 0`` matches in point‖normal feature space.
    ``weight_fn`` maps squared correspondence distances to weights (the
    reference's RBF-kernel evaluators, ``common_pair_evaluators.hpp:46-79``).
    """
    if metric not in ("point_to_point", "combined", "symmetric", "affine"):
        raise ValueError(f"unknown metric {metric!r}")
    d = src_points.shape[1]
    if init is None:
        init = identity(d, dtype=src_points.dtype)
    use_plane = metric in ("combined", "symmetric", "affine") and dst_normals is not None
    use_symmetric = (
        metric == "symmetric"
        or (metric == "combined" and src_normals is not None and use_plane)
    )
    use_features_normals = (
        feature_normal_weight > 0.0
        and src_normals is not None
        and dst_normals is not None
    )

    if use_features_normals:
        dst_feat = point_normal_features(
            dst_points, dst_normals, feature_normal_weight
        )
    else:
        dst_feat = point_features(dst_points)

    # The dst cloud never moves and src moves ≤ the correspondence gate per
    # iteration, so the Morton sorts behind the tile-pruned NN kernel are
    # loop-invariant: build the prune plan ONCE here instead of re-sorting
    # both clouds inside every while_loop iteration (tile AABBs are still
    # recomputed per iteration from the actual transformed positions, so
    # pruning stays exact — motion only degrades tile compactness).
    prune_plan = None
    if not use_features_normals:
        from ..neighbors.pallas_nn import maybe_make_nn1_prune_plan

        prune_plan = maybe_make_nn1_prune_plan(
            dst_feat,
            max_corr_dist_sq,
            point_features(src_points, init),
            key_valid=dst_valid,
            query_valid=src_valid,
        )

    def update_correspondences(tf: Transform) -> Correspondences:
        if use_features_normals:
            qf = point_normal_features(
                src_points, src_normals, feature_normal_weight, tf
            )
        else:
            qf = point_features(src_points, tf)
        return find_nn_correspondences(
            qf,
            dst_feat,
            query_valid=src_valid,
            dst_valid=dst_valid,
            max_distance=max_corr_dist_sq,
            inlier_fraction=inlier_fraction,
            one_to_one=one_to_one,
            prune_plan=prune_plan,
        )

    def update_estimate(tf: Transform, corr: Correspondences) -> Transform:
        s = tf.apply(src_points)
        dgt = dst_points[corr.dst_idx]
        w = corr.weights
        if weight_fn is not None:
            w = w * weight_fn(corr.distances)
        if use_symmetric:
            ns = tf.apply_normals(src_normals)
            ngt = dst_normals[corr.dst_idx]
            delta, _ = estimate_rigid_symmetric_metric(
                s,
                dgt,
                ns,
                ngt,
                point_weights=w * point_weight,
                plane_weights=w * plane_weight,
                max_iterations=max_gn_iterations,
            )
        elif metric == "combined" and use_plane:
            ngt = dst_normals[corr.dst_idx]
            delta, _ = estimate_rigid_combined_metric(
                s,
                dgt,
                ngt,
                point_weights=w * point_weight,
                plane_weights=w * plane_weight,
                max_iterations=max_gn_iterations,
            )
        elif metric == "affine":
            if use_plane:
                ngt = dst_normals[corr.dst_idx]
                delta, _ = estimate_affine_combined_metric(
                    s,
                    dgt,
                    ngt,
                    point_weights=w * point_weight,
                    plane_weights=w * plane_weight,
                )
            else:
                delta, _ = estimate_affine_point_to_point(s, dgt, w)
        else:  # point_to_point
            delta, _ = estimate_rigid_point_to_point(s, dgt, w)
        return delta

    rigid = metric != "affine"

    def body(carry):
        tf, _, it, _ = carry
        corr = update_correspondences(tf)
        delta = update_estimate(tf, corr)
        new_tf = compose(delta, tf)
        if rigid:
            # Rotation re-projection (icp_single_transform_combined_metric.hpp:207-212).
            new_tf = reproject_rigid(new_tf)
        return new_tf, _delta_norm(delta), it + 1, corr.count().astype(jnp.int32)

    def cond(carry):
        _, dn, it, _ = carry
        return (it < max_iterations) & (dn >= convergence_tol)

    init_state = match_vma(
        (
            init,
            jnp.array(jnp.inf, src_points.dtype),
            jnp.array(0, jnp.int32),
            jnp.array(0, jnp.int32),
        ),
        src_points, dst_points,
    )
    tf, dn, it, ncorr = jax.lax.while_loop(cond, body, init_state)
    return ICPResult(
        transform=tf,
        iterations=it,
        delta_norm=dn,
        converged=dn < convergence_tol,
        num_correspondences=ncorr,
    )


def icp_residuals(
    result_tf: Transform,
    src_points: jax.Array,
    dst_points: jax.Array,
    dst_normals: Optional[jax.Array] = None,
    *,
    dst_valid: Optional[jax.Array] = None,
    point_weight: float = 0.0,
    plane_weight: float = 1.0,
) -> jax.Array:
    """Per-src-point residuals under the final transform (reference
    ``getResiduals``, ``icp_single_transform_combined_metric.hpp:220-243`` /
    NN squared distances for point-to-point ``:68-85``)."""
    from ..neighbors.bruteforce import nn1

    s = result_tf.apply(src_points)
    _, idx = nn1(s, dst_points, key_valid=dst_valid)
    if dst_normals is None:
        diff = dst_points[idx] - s
        return jnp.sum(diff * diff, axis=-1)
    return residuals_combined_metric(
        identity(s.shape[1], dtype=s.dtype),
        s,
        dst_points[idx],
        dst_normals[idx],
        point_weight,
        plane_weight,
    )


# ---------------------------------------------------------------------------
# Common instances (reference icp_common_instances.hpp:213-245).
# ---------------------------------------------------------------------------


def simple_point_to_point_icp(src_points, dst_points, **kwargs):
    """``SimplePointToPointMetricRigidICP`` equivalent."""
    kwargs.setdefault("metric", "point_to_point")
    return icp(src_points, dst_points, **kwargs)


def simple_combined_metric_icp(src_points, dst_points, dst_normals, **kwargs):
    """``SimpleCombinedMetricRigidICP`` equivalent (point-to-plane by default)."""
    kwargs.setdefault("metric", "combined")
    return icp(src_points, dst_points, dst_normals=dst_normals, **kwargs)


# ---------------------------------------------------------------------------
# Multi-resolution (coarse-to-fine) ICP.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("levels", "metric", "max_gn_iterations"))
def icp_multires(
    src_points,
    dst_points,
    *,
    src_normals=None,
    dst_normals=None,
    src_valid=None,
    dst_valid=None,
    init: Optional[Transform] = None,
    levels=((0.02, 10, 16384, 0.0064), (None, 3, None, 0.0004)),
    metric: str = "combined",
    point_weight: float = 0.0,
    plane_weight: float = 1.0,
    convergence_tol: float = 1e-5,
    max_gn_iterations: int = 1,
) -> ICPResult:
    """Coarse-to-fine ICP: each level is ``(bin_size, max_iterations,
    capacity, max_corr_dist_sq)``; ``bin_size=None`` runs at full resolution.

    Early levels run on voxel-downsampled clouds (NN cost drops quadratically
    with the downsample factor on the all-pairs TPU kernel), the final
    full-resolution level polishes to the same fixed point as single-level
    ICP. The reference has no multi-resolution mode — this is a TPU-side
    algorithmic upgrade, not a parity feature; accuracy is validated by the
    same distort-and-recover tests.
    """
    from ..core.containers import PointCloud
    from ..core.grid import grid_downsample

    tf = init
    result = None
    icp_kwargs = dict(
        metric=metric,
        point_weight=point_weight,
        plane_weight=plane_weight,
        convergence_tol=convergence_tol,
        max_gn_iterations=max_gn_iterations,
    )
    for bin_size, iters, capacity, mcd in levels:
        if bin_size is None:
            sp, sn, sv = src_points, src_normals, src_valid
            dp, dn, dv = dst_points, dst_normals, dst_valid
        else:
            sc = grid_downsample(
                PointCloud(points=src_points, normals=src_normals, valid=src_valid),
                bin_size,
                capacity=capacity,
            )
            dc = grid_downsample(
                PointCloud(points=dst_points, normals=dst_normals, valid=dst_valid),
                bin_size,
                capacity=capacity,
            )
            sp, sn, sv = sc.points, sc.normals, sc.valid
            dp, dn, dv = dc.points, dc.normals, dc.valid
        result = icp(
            sp,
            dp,
            src_normals=sn,
            dst_normals=dn,
            src_valid=sv,
            dst_valid=dv,
            init=tf,
            max_iterations=iters,
            max_corr_dist_sq=mcd,
            **icp_kwargs,
        )
        tf = result.transform
    return result


# ---------------------------------------------------------------------------
# Projective ICP (frame-to-model, organized clouds).
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "metric",
        "height",
        "width",
        "max_iterations",
        "max_gn_iterations",
    ),
)
def icp_projective(
    src_points: jax.Array,
    dst_points: jax.Array,
    intrinsics,
    *,
    height: int,
    width: int,
    index_map: Optional[jax.Array] = None,
    src_normals: Optional[jax.Array] = None,
    dst_normals: Optional[jax.Array] = None,
    src_valid: Optional[jax.Array] = None,
    dst_valid: Optional[jax.Array] = None,
    init: Optional[Transform] = None,
    metric: str = "combined",
    point_weight: float = 0.0,
    plane_weight: float = 1.0,
    max_iterations: int = 6,
    convergence_tol: float = 5e-4,
    max_gn_iterations: int = 1,
    max_corr_dist_sq: Optional[float] = 0.01,
) -> ICPResult:
    """Rigid ICP with projective correspondences — the reference's
    ``SimpleCombinedMetricRigidProjectiveICP3f`` (``icp_common_instances.hpp``)
    used by the fusion app (``examples/fusion.cpp:131-141``; defaults 6 outer
    iters, 1 GN iter, conv 5e-4 per ``fusion.cpp:139-140``).

    Both clouds are in the *camera frame of dst*; the dst index map is
    rendered once and cached across iterations
    (``correspondence_search_projective.hpp:161-167``).
    """
    from ..correspondence.projective import (
        build_projective_target,
        find_projective_correspondences_packed,
        pack_projective_target,
    )

    d = src_points.shape[1]
    if init is None:
        init = identity(d, dtype=src_points.dtype)
    if index_map is None:
        index_map = build_projective_target(
            dst_points, intrinsics, height, width, dst_valid=dst_valid
        )
    # Resolve the index map once into a packed per-pixel target → exactly one
    # gather per ICP iteration (see pack_projective_target).
    packed = pack_projective_target(
        dst_points, dst_normals, index_map, dst_valid=dst_valid
    )
    return icp_projective_packed(
        src_points,
        packed,
        intrinsics,
        height=height,
        width=width,
        src_normals=src_normals,
        src_valid=src_valid,
        init=init,
        target_has_normals=dst_normals is not None,
        metric=metric,
        point_weight=point_weight,
        plane_weight=plane_weight,
        max_iterations=max_iterations,
        convergence_tol=convergence_tol,
        max_gn_iterations=max_gn_iterations,
        max_corr_dist_sq=max_corr_dist_sq,
    )


@partial(
    jax.jit,
    static_argnames=(
        "metric",
        "height",
        "width",
        "target_has_normals",
        "max_iterations",
        "max_gn_iterations",
        "coalesced",
    ),
)
def icp_projective_packed(
    src_points: jax.Array,
    packed_target: jax.Array,  # (H·W, 8) from pack_projective_target
    intrinsics,
    *,
    height: int,
    width: int,
    src_normals: Optional[jax.Array] = None,
    src_valid: Optional[jax.Array] = None,
    init: Optional[Transform] = None,
    target_has_normals: bool = True,
    metric: str = "combined",
    point_weight: float = 0.0,
    plane_weight: float = 1.0,
    max_iterations: int = 6,
    convergence_tol: float = 5e-4,
    max_gn_iterations: int = 1,
    max_corr_dist_sq: Optional[float] = 0.01,
    coalesced: bool = False,
) -> ICPResult:
    """Projective ICP core over a pre-packed per-pixel target image — the
    shared hot loop of :func:`icp_projective` and the fusion localizer (which
    builds the packed image straight from its map pool, fusing the camera
    transform into the one-time gather). ``coalesced`` routes the
    per-iteration pixel gather through the run-coalescing DMA kernel."""
    from ..correspondence.projective import (
        find_projective_correspondences_packed,
    )

    if metric not in ("point_to_point", "combined"):
        raise ValueError(f"unknown projective-ICP metric {metric!r}")
    d = src_points.shape[1]
    if init is None:
        init = identity(d, dtype=src_points.dtype)
    use_symmetric = (
        metric == "combined" and src_normals is not None and target_has_normals
    )

    def body(carry):
        tf, _, it, _ = carry
        s, dgt, ngt, w = find_projective_correspondences_packed(
            src_points,
            packed_target,
            intrinsics,
            height,
            width,
            tf=tf,
            src_valid=src_valid,
            max_distance=max_corr_dist_sq,
            coalesced=coalesced,
        )
        if use_symmetric:
            ns = tf.apply_normals(src_normals)
            delta, _ = estimate_rigid_symmetric_metric(
                s,
                dgt,
                ns,
                ngt,
                point_weights=w * point_weight,
                plane_weights=w * plane_weight,
                max_iterations=max_gn_iterations,
            )
        elif target_has_normals and metric == "combined":
            delta, _ = estimate_rigid_combined_metric(
                s,
                dgt,
                ngt,
                point_weights=w * point_weight,
                plane_weights=w * plane_weight,
                max_iterations=max_gn_iterations,
            )
        else:
            delta, _ = estimate_rigid_point_to_point(s, dgt, w)
        new_tf = reproject_rigid(compose(delta, tf))
        return (
            new_tf,
            _delta_norm(delta),
            it + 1,
            jnp.sum(w).astype(jnp.int32),
        )

    def cond(carry):
        _, dn, it, _ = carry
        return (it < max_iterations) & (dn >= convergence_tol)

    state = match_vma(
        (
            init,
            jnp.array(jnp.inf, src_points.dtype),
            jnp.array(0, jnp.int32),
            jnp.array(0, jnp.int32),
        ),
        src_points, packed_target,
    )
    tf, dn, it, ncorr = jax.lax.while_loop(cond, body, state)
    return ICPResult(
        transform=tf,
        iterations=it,
        delta_norm=dn,
        converged=dn < convergence_tol,
        num_correspondences=ncorr,
    )
