"""Surface normal + curvature estimation.

TPU-native redesign of ``include/cilantro/core/normal_estimation.hpp``:

* the reference's hot loop (``normal_estimation.hpp:297-307``: per-point
  kd-tree query → neighborhood covariance → ``SelfAdjointEigenSolver`` →
  smallest eigenvector, under ``#pragma omp parallel for``) becomes ONE fused
  batched program: a tiled-kNN call, a ``(N, k, 3)`` gather, vectorized
  covariance einsums, and a batched symmetric eigendecomposition.
* curvature = λ₀ / (λ₀+λ₁+λ₂) (``normal_estimation.hpp:389``).
* consistency: flip toward a view point (``:326-330``) or toward reference
  normals; without either, normals are sign-ambiguous exactly as the
  reference documents.
* all three neighborhood modes (kNN / radius / kNN-in-radius,
  ``normal_estimation.hpp:311-469``) are supported through the unified
  neighbor API.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..neighbors.api import Neighborhoods, knn_search, radius_search
from .covariance import neighborhood_mean_cov


def normals_from_neighborhoods(
    points: jax.Array,
    nb: Neighborhoods,
    view_point: Optional[jax.Array] = None,
    reference_normals: Optional[jax.Array] = None,
    min_neighbors: int = 3,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Normals+curvature for each query given precomputed neighborhoods.

    Returns ``(normals (Q, D), curvature (Q,), valid (Q,))``. Invalid entries
    (too few neighbors) get zero normal and zero curvature — the masked
    analogue of the reference's NaN fill.
    """
    _, cov, valid = neighborhood_mean_cov(
        points, nb.indices, nb.mask, min_sample_size=min_neighbors
    )
    w, v = jnp.linalg.eigh(cov)  # ascending eigenvalues
    normal = v[..., :, 0]  # smallest eigenvector
    lam0 = jnp.maximum(w[..., 0], 0.0)
    trace = jnp.maximum(jnp.sum(jnp.maximum(w, 0.0), axis=-1), 1e-30)
    curvature = lam0 / trace

    query_points = points[: nb.indices.shape[0]] if points.shape[0] != nb.indices.shape[0] else points
    if reference_normals is not None:
        sign = jnp.sign(jnp.sum(normal * reference_normals, axis=-1, keepdims=True))
    elif view_point is not None:
        to_view = view_point - query_points
        sign = jnp.sign(jnp.sum(normal * to_view, axis=-1, keepdims=True))
    else:
        sign = jnp.ones_like(normal[..., :1])
    normal = normal * jnp.where(sign == 0, 1.0, sign)
    normal = jnp.where(valid[..., None], normal, 0.0)
    curvature = jnp.where(valid, curvature, 0.0)
    return normal, curvature, valid


@partial(jax.jit, static_argnames=("k",))
def estimate_normals_knn(
    points: jax.Array,
    k: int = 12,
    *,
    valid: Optional[jax.Array] = None,
    view_point: Optional[jax.Array] = None,
    reference_normals: Optional[jax.Array] = None,
):
    """Normals from k-nearest-neighbor neighborhoods (self-query, the query
    point itself participates, as in the reference)."""
    nb = knn_search(points, points, k, query_valid=valid, key_valid=valid)
    return normals_from_neighborhoods(
        points, nb, view_point=view_point, reference_normals=reference_normals
    )


@partial(jax.jit, static_argnames=("max_neighbors",))
def estimate_normals_radius(
    points: jax.Array,
    radius: float,
    max_neighbors: int = 32,
    *,
    valid: Optional[jax.Array] = None,
    view_point: Optional[jax.Array] = None,
    reference_normals: Optional[jax.Array] = None,
):
    nb = radius_search(
        points, points, radius, max_neighbors, query_valid=valid, key_valid=valid
    )
    return normals_from_neighborhoods(
        points, nb, view_point=view_point, reference_normals=reference_normals
    )


def estimate_normals_knn_in_radius(
    points: jax.Array,
    k: int,
    radius: float,
    **kwargs,
):
    return estimate_normals_radius(points, radius, max_neighbors=k, **kwargs)


@partial(jax.jit, static_argnames=("k", "num_trials", "num_refinements"))
def estimate_normals_robust(
    key: jax.Array,
    points: jax.Array,
    k: int = 16,
    *,
    valid: Optional[jax.Array] = None,
    view_point: Optional[jax.Array] = None,
    num_trials: int = 6,
    num_refinements: int = 3,
    keep_fraction: float = 0.75,
):
    """Normals from Minimum-Covariance-Determinant neighborhood fits — the
    reference's robust path where ``MinimumCovarianceDeterminant`` is the
    drop-in ``CovarianceT`` for ``NormalEstimation``
    (``core/covariance.hpp:188-371``; defaults ``:365-367``). Resistant to
    outliers/mixed surfaces inside the neighborhood."""
    from .covariance import mcd_mean_cov

    nb = knn_search(points, points, k, query_valid=valid, key_valid=valid)
    gathered = points[nb.indices]  # (Q, k, D)
    keys = jax.random.split(key, points.shape[0])
    _, cov, ok = jax.vmap(
        lambda kk, pts, m: mcd_mean_cov(
            kk,
            pts,
            m,
            num_trials=num_trials,
            num_refinements=num_refinements,
            keep_fraction=keep_fraction,
        )
    )(keys, gathered, nb.mask)
    w, v = jnp.linalg.eigh(cov)
    normal = v[..., :, 0]
    lam0 = jnp.maximum(w[..., 0], 0.0)
    trace = jnp.maximum(jnp.sum(jnp.maximum(w, 0.0), axis=-1), 1e-30)
    curvature = lam0 / trace
    if view_point is not None:
        sign = jnp.sign(
            jnp.sum(normal * (view_point - points), axis=-1, keepdims=True)
        )
        normal = normal * jnp.where(sign == 0, 1.0, sign)
    ok = ok & (nb.counts() >= 3)
    normal = jnp.where(ok[..., None], normal, 0.0)
    return normal, jnp.where(ok, curvature, 0.0), ok
