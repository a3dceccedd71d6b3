"""Pair evaluators — the reference's weight/predicate functor library
(``include/cilantro/core/common_pair_evaluators.hpp:14-259``), vectorized.

Every evaluator is a callable ``(i, j, value) -> weight-or-bool`` over
*arrays* of index pairs (the signature the reference invokes element-wise
from OpenMP loops). They plug into the places the reference plugs functors:
ICP's ``weight_fn`` (scalar-only evaluators can be passed as
``lambda d: ev(None, None, d)`` or used directly where only distances
matter), connected-components similarity gates
(:func:`..clustering.connected_components.edge_mask_from_evaluator`), and
NN-graph affinity construction (:mod:`..utils.graph`).

Weight evaluators return floats; proximity evaluators return bool masks.
Negative ``max_angle`` means two-sided (orientation-invariant) normal
comparison, as the reference (``common_pair_evaluators.hpp:205-212``).
"""

from __future__ import annotations

import jax.numpy as jnp


def identity_weight(i, j, value):
    """``IdentityWeightEvaluator`` / ``DistanceEvaluator`` (``:14-28``)."""
    return value


def unity_weight(i, j, value):
    """``UnityWeightEvaluator`` / ``AdjacencyEvaluator`` (``:30-43``)."""
    return jnp.ones_like(value)


def rbf_kernel_weight(sigma: float, distances_are_squared: bool = True):
    """``RBFKernelWeightEvaluator`` (``:46-79``): ``exp(-d²/(2σ²))``."""
    coeff = -0.5 / (sigma * sigma)

    def ev(i, j, value):
        d2 = value if distances_are_squared else value * value
        return jnp.exp(coeff * d2)

    return ev


def points_proximity(max_distance: float):
    """``PointsProximityEvaluator`` (``:92-103``): squared-distance gate."""

    def ev(i, j, dist):
        return dist < max_distance

    return ev


def _normal_angle_ok(normals, i, j, max_angle: float):
    dots = jnp.clip(
        jnp.sum(normals[i] * normals[j], axis=-1), -1.0, 1.0
    )
    angle = jnp.arccos(dots)
    if max_angle >= 0.0:
        return angle < max_angle
    return jnp.minimum(angle, jnp.pi - angle) < -max_angle


def normals_proximity(normals, max_angle: float):
    """``NormalsProximityEvaluator``: normal-angle gate; negative
    ``max_angle`` compares orientation-invariantly (``:105-127``)."""

    def ev(i, j, value):
        return _normal_angle_ok(normals, i, j, max_angle)

    return ev


def colors_proximity(colors, max_color_diff: float):
    """``ColorsProximityEvaluator`` (``:129-147``): RGB L2 gate."""
    thresh = max_color_diff * max_color_diff

    def ev(i, j, value):
        diff = colors[i] - colors[j]
        return jnp.sum(diff * diff, axis=-1) < thresh

    return ev


def points_normals_proximity(normals, max_distance: float, max_angle: float):
    """``PointsNormalsProximityEvaluator`` (``:149-170``)."""

    def ev(i, j, dist):
        return (dist < max_distance) & _normal_angle_ok(
            normals, i, j, max_angle
        )

    return ev


def points_colors_proximity(colors, max_distance: float, max_color_diff: float):
    """``PointsColorsProximityEvaluator`` (``:172-188``)."""
    col = colors_proximity(colors, max_color_diff)

    def ev(i, j, dist):
        return (dist < max_distance) & col(i, j, dist)

    return ev


def normals_colors_proximity(normals, colors, max_angle: float, max_color_diff: float):
    """``NormalsColorsProximityEvaluator`` (``:190-216``)."""
    col = colors_proximity(colors, max_color_diff)

    def ev(i, j, value):
        return col(i, j, value) & _normal_angle_ok(normals, i, j, max_angle)

    return ev


def points_normals_colors_proximity(
    normals,
    colors,
    max_distance: float,
    max_angle: float,
    max_color_diff: float,
):
    """``PointsNormalsColorsProximityEvaluator`` (``:218-257``) — the full
    distance + normal-angle + color gate used by connected-component
    segmentation."""
    nc = normals_colors_proximity(normals, colors, max_angle, max_color_diff)

    def ev(i, j, dist):
        return (dist < max_distance) & nc(i, j, dist)

    return ev
