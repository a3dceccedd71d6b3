"""Rigid/affine transforms and stacked per-point transform sets.

TPU-native redesign of the reference's transform layer
(``include/cilantro/core/space_transformations.hpp:54-302``):

* The reference stores an ``Eigen::Isometry`` (or ``Eigen::Transform<...,Affine>``)
  per transform and a ``std::vector`` of them for per-point warp fields
  (``TransformSet``). Here a transform is a pytree ``Transform(linear, translation)``
  whose leaves carry arbitrary *leading batch dimensions* — a ``TransformSet`` is
  simply a ``Transform`` with leading shape ``(N,)``. All ops broadcast, vmap and
  jit cleanly; OpenMP loops over ``std::vector`` entries become vectorized einsums.
* ``LinearTransform::rotation()``'s SVD projection to SO(n)
  (``space_transformations.hpp:43-51``) maps to :func:`project_to_rotation`.
* Free functions ``transformPoints`` / ``transformNormals`` /
  ``transformPointsNormals`` (``space_transformations.hpp:204-302``), including the
  inverse-transpose normal matrix for affine transforms, map to
  :func:`transform_points`, :func:`transform_normals`,
  :func:`transform_points_normals`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Transform:
    """A (possibly batched) linear-plus-translation transform ``x -> A x + t``.

    ``linear``: ``(..., D, D)``; ``translation``: ``(..., D)``. A rigid transform
    has ``A in SO(D)``; nothing in the container enforces it — rigidity is a
    property maintained by the ops that produce transforms (closed-form
    estimators re-project, compositions of rotations stay rotations up to
    roundoff, :func:`project_to_rotation` restores it explicitly, mirroring the
    reference's re-projection discipline at
    ``icp_single_transform_combined_metric.hpp:207-212``).
    """

    linear: jax.Array
    translation: jax.Array

    @property
    def dim(self) -> int:
        return self.linear.shape[-1]

    @property
    def batch_shape(self):
        return self.linear.shape[:-2]

    def __matmul__(self, other: "Transform") -> "Transform":
        return compose(self, other)

    def apply(self, points: jax.Array) -> jax.Array:
        return transform_points(self, points)

    def apply_normals(self, normals: jax.Array, rigid: bool = True) -> jax.Array:
        return transform_normals(self, normals, rigid=rigid)

    def inverse(self, rigid: bool = True) -> "Transform":
        return inverse(self, rigid=rigid)

    def matrix(self) -> jax.Array:
        """Homogeneous ``(..., D+1, D+1)`` matrix."""
        d = self.dim
        batch = self.batch_shape
        m = jnp.zeros(batch + (d + 1, d + 1), self.linear.dtype)
        m = m.at[..., :d, :d].set(self.linear)
        m = m.at[..., :d, d].set(self.translation)
        m = m.at[..., d, d].set(1.0)
        return m


def identity(dim: int = 3, batch_shape=(), dtype=jnp.float32) -> Transform:
    eye = jnp.broadcast_to(jnp.eye(dim, dtype=dtype), batch_shape + (dim, dim))
    t = jnp.zeros(batch_shape + (dim,), dtype)
    return Transform(eye, t)


def from_matrix(m: jax.Array) -> Transform:
    """Build from a homogeneous ``(..., D+1, D+1)`` (or ``(..., D, D+1)``) matrix."""
    d = m.shape[-1] - 1
    return Transform(m[..., :d, :d], m[..., :d, d])


def compose(a: Transform, b: Transform) -> Transform:
    """``a ∘ b``: apply ``b`` first, then ``a`` (matrix product a.matrix @ b.matrix)."""
    linear = jnp.einsum("...ij,...jk->...ik", a.linear, b.linear)
    translation = (
        jnp.einsum("...ij,...j->...i", a.linear, b.translation) + a.translation
    )
    return Transform(linear, translation)


def inverse(tf: Transform, rigid: bool = True) -> Transform:
    if rigid:
        rt = jnp.swapaxes(tf.linear, -1, -2)
    else:
        rt = jnp.linalg.inv(tf.linear)
    return Transform(rt, -jnp.einsum("...ij,...j->...i", rt, tf.translation))


def transform_points(tf: Transform, points: jax.Array) -> jax.Array:
    """Apply a transform to points.

    Broadcasting rules (replacing the reference's two overloads at
    ``space_transformations.hpp:204-231``):

    * single transform (``batch_shape == ()``), points ``(..., D)`` → applied to all;
    * transform set (``batch_shape == (N,)``), points ``(N, D)`` → i-th transform
      applied to the i-th point (the per-point warp-field case).
    """
    return (
        jnp.einsum("...ij,...j->...i", tf.linear, points) + tf.translation
    )


def normal_matrix(tf: Transform, rigid: bool = True) -> jax.Array:
    """Matrix that maps normals: rotation for rigid, inverse-transpose for affine
    (reference: ``space_transformations.hpp:256-275``)."""
    if rigid:
        return tf.linear
    return jnp.swapaxes(jnp.linalg.inv(tf.linear), -1, -2)


def transform_normals(
    tf: Transform, normals: jax.Array, rigid: bool = True
) -> jax.Array:
    n = jnp.einsum("...ij,...j->...i", normal_matrix(tf, rigid), normals)
    if not rigid:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
    return n


def transform_points_normals(
    tf: Transform, points: jax.Array, normals: jax.Array, rigid: bool = True
):
    return transform_points(tf, points), transform_normals(tf, normals, rigid=rigid)


def project_to_rotation(linear: jax.Array) -> jax.Array:
    """Closest rotation (SVD, det-sign-corrected) — reference
    ``space_transformations.hpp:43-51``."""
    u, _, vt = jnp.linalg.svd(linear)
    r = jnp.einsum("...ij,...jk->...ik", u, vt)
    det = jnp.linalg.det(r)
    # Flip the last column of U where det < 0 to land in SO(D).
    u_fix = u.at[..., :, -1].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    return jnp.einsum("...ij,...jk->...ik", u_fix, vt)


def reproject_rigid(tf: Transform) -> Transform:
    return Transform(project_to_rotation(tf.linear), tf.translation)


# ---------------------------------------------------------------------------
# Rotation parameterizations used by the Gauss-Newton solvers.
# ---------------------------------------------------------------------------


def skew3(v: jax.Array) -> jax.Array:
    """Cross-product matrix ``[v]×`` for ``v (..., 3)`` → ``(..., 3, 3)``."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


def rot2d(theta: jax.Array, dtype=jnp.float32) -> jax.Array:
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2
    ).astype(dtype)


def axis_angle_to_rotation(omega: jax.Array) -> jax.Array:
    """Rodrigues formula, ``omega`` ``(..., 3)``. Safe at ``omega == 0``."""
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    small = theta < 1e-8
    axis = omega / jnp.where(small, 1.0, theta)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    k = jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )
    th = theta[..., None]
    eye = jnp.eye(3, dtype=omega.dtype)
    r = eye + jnp.sin(th) * k + (1.0 - jnp.cos(th)) * (k @ k)
    return jnp.where(small[..., None], eye + k * th, r)


def gn_update_3d(step: jax.Array) -> Transform:
    """Small-angle GN step ``[omega; t]`` (6,) → rigid transform, using the
    reference's ``R(atan‖ω‖, ω̂)`` convention (``transform_estimation.hpp:349-357``)."""
    omega, t = step[..., :3], step[..., 3:]
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    scale = jnp.where(theta > 1e-12, jnp.arctan(theta) / jnp.maximum(theta, 1e-30), 1.0)
    return Transform(axis_angle_to_rotation(omega * scale), t)


def gn_update_2d(step: jax.Array) -> Transform:
    """GN step ``[theta; t]`` (3,) → rigid 2D transform."""
    theta, t = step[..., 0], step[..., 1:]
    return Transform(rot2d(theta, dtype=step.dtype), t)
