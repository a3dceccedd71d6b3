"""Vmapped RANSAC estimators.

TPU-native redesign of ``include/cilantro/model_estimation/``:

* the reference's serial hypothesis loop with early stopping
  (``ransac_base.hpp:64-131``: Fisher-Yates minimal sample → fit → residuals
  → inlier count, keep best) becomes a *batched tournament*: all
  ``num_hypotheses`` minimal fits run as one ``vmap``, all residuals come from
  one ``(H, N)`` matmul-shaped kernel, and the winner is an ``argmax`` — the
  SPMD shape of RANSAC (SURVEY §3.5). Early exit buys nothing when all
  hypotheses run in parallel for the cost of one.
* plane fit = PCA smallest eigenvector (``ransac_hyperplane_estimator.hpp:69-82``),
  residual = absolute plane distance (``:47-55``);
* rigid/affine fit = closed-form point-to-point
  (``ransac_transform_estimator.hpp:72-82``), residual = per-pair Euclidean
  error (``:90-98``); minimal sample Dim (rigid) / Dim+1 (affine) (``:20-23``);
* optional re-estimation on all inliers of the winner
  (``ransac_base.hpp:118-128``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.covariance import mean_and_covariance
from ..core.transforms import Transform
from ..registration.transform_estimation import (
    estimate_affine_point_to_point,
    estimate_rigid_point_to_point,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hyperplane:
    """``n·x + d = 0`` with unit normal (Eigen::Hyperplane analogue)."""

    normal: jax.Array  # (D,)
    offset: jax.Array  # ()

    def signed_distance(self, points: jax.Array) -> jax.Array:
        return points @ self.normal + self.offset


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RANSACResult:
    inlier_mask: jax.Array  # (N,) bool
    num_inliers: jax.Array  # int32
    hypothesis_inliers: jax.Array  # (H,) int32 — per-hypothesis counts


def _sample_minimal_sets(key, n, valid, num_hypotheses, sample_size):
    """(H, sample_size) random distinct indices among valid points (the
    batched analogue of Fisher-Yates partial shuffles, ``ransac_base.hpp:83-91``)."""
    scores = jax.random.uniform(key, (num_hypotheses, n))
    scores = scores + jnp.where(valid, 0.0, 2.0)[None, :]
    _, idx = jax.lax.top_k(-scores, sample_size)
    return idx


def _fit_plane(points: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Plane through a small point set: smallest-eigenvector normal."""
    mean, cov, _ = mean_and_covariance(points)
    _, v = jnp.linalg.eigh(cov)
    normal = v[..., :, 0]
    return normal, -jnp.sum(normal * mean, axis=-1)


@partial(
    jax.jit, static_argnames=("num_hypotheses", "re_estimate", "sample_size")
)
def ransac_plane(
    key: jax.Array,
    points: jax.Array,
    inlier_threshold: float,
    *,
    valid: Optional[jax.Array] = None,
    num_hypotheses: int = 100,
    sample_size: Optional[int] = None,
    re_estimate: bool = True,
) -> Tuple[Hyperplane, RANSACResult]:
    """Robust hyperplane fit (``HyperplaneRANSACEstimator``).

    ``inlier_threshold`` is an absolute point-plane distance, matching the
    reference residual (``ransac_hyperplane_estimator.hpp:47-55``).
    """
    n, d = points.shape
    if valid is None:
        valid = jnp.ones(n, bool)
    if sample_size is None:
        sample_size = d
    idx = _sample_minimal_sets(key, n, valid, num_hypotheses, sample_size)
    normals, offsets = jax.vmap(_fit_plane)(points[idx])  # (H, D), (H,)

    # (H, N) absolute distances: one matmul.
    dist = jnp.abs(
        jnp.einsum("hd,nd->hn", normals, points) + offsets[:, None]
    )
    inl = (dist <= inlier_threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=1).astype(jnp.int32)
    best = jnp.argmax(counts)
    best_mask = inl[best]

    normal, offset = normals[best], offsets[best]
    if re_estimate:
        mean, cov, ok = mean_and_covariance(points, best_mask)
        _, v = jnp.linalg.eigh(cov)
        n_re = v[:, 0]
        o_re = -jnp.dot(n_re, mean)
        normal = jnp.where(ok, n_re, normal)
        offset = jnp.where(ok, o_re, offset)
        dist_b = jnp.abs(points @ normal + offset)
        best_mask = (dist_b <= inlier_threshold) & valid
    return (
        Hyperplane(normal=normal, offset=offset),
        RANSACResult(
            inlier_mask=best_mask,
            num_inliers=jnp.sum(best_mask).astype(jnp.int32),
            hypothesis_inliers=counts,
        ),
    )


@partial(
    jax.jit,
    static_argnames=("num_hypotheses", "re_estimate", "rigid", "sample_size"),
)
def ransac_transform(
    key: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    inlier_threshold: float,
    *,
    valid: Optional[jax.Array] = None,
    num_hypotheses: int = 100,
    sample_size: Optional[int] = None,
    rigid: bool = True,
    re_estimate: bool = True,
) -> Tuple[Transform, RANSACResult]:
    """Robust rigid/affine alignment from noisy correspondences
    (``TransformRANSACEstimator``): ``src[i] ↔ dst[i]``.

    ``inlier_threshold`` gates the per-pair Euclidean error ‖T(s) − d‖.
    """
    n, d = src.shape
    if valid is None:
        valid = jnp.ones(n, bool)
    if sample_size is None:
        sample_size = d if rigid else d + 1
    estimator = (
        estimate_rigid_point_to_point if rigid else estimate_affine_point_to_point
    )
    idx = _sample_minimal_sets(key, n, valid, num_hypotheses, sample_size)

    def fit(i):
        tf, ok = estimator(src[i], dst[i])
        return tf.linear, tf.translation, ok

    lins, trans, oks = jax.vmap(fit)(idx)  # (H, D, D), (H, D), (H,)

    # (H, N) Euclidean errors.
    mapped = jnp.einsum("hij,nj->hni", lins, src) + trans[:, None, :]
    err = jnp.linalg.norm(mapped - dst[None, :, :], axis=-1)
    inl = (err <= inlier_threshold) & valid[None, :] & oks[:, None]
    counts = jnp.sum(inl, axis=1).astype(jnp.int32)
    best = jnp.argmax(counts)
    best_mask = inl[best]
    tf = Transform(lins[best], trans[best])

    if re_estimate:
        w = best_mask.astype(src.dtype)
        tf_re, ok = estimator(src, dst, w)
        tf = Transform(
            jnp.where(ok, tf_re.linear, tf.linear),
            jnp.where(ok, tf_re.translation, tf.translation),
        )
        err_b = jnp.linalg.norm(tf.apply(src) - dst, axis=-1)
        best_mask = (err_b <= inlier_threshold) & valid
    return tf, RANSACResult(
        inlier_mask=best_mask,
        num_inliers=jnp.sum(best_mask).astype(jnp.int32),
        hypothesis_inliers=counts,
    )
