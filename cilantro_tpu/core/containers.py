"""Masked fixed-capacity point-cloud containers.

TPU-native redesign of the reference's data model
(``include/cilantro/core/data_containers.hpp:50-163`` and
``include/cilantro/utilities/point_cloud.hpp:14-245``):

* The reference uses resizable column-major ``Dim x N`` Eigen matrices and
  mutates them in place (``append`` / ``remove`` with swap-to-end compaction).
  On TPU every shape must be static, so a :class:`PointCloud` is a pytree of
  row-major ``(N, D)`` arrays plus a boolean ``valid`` mask; "removal" clears
  mask bits and "append" writes into spare capacity. Host-side
  :func:`compact` re-packs when fragmentation matters.
* Normals/colors are optional exactly as in the reference's ``hasNormals()`` /
  ``hasColors()`` discipline.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import Transform, transform_points, transform_normals


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """Fixed-capacity masked point cloud.

    ``points``: ``(N, D)`` float; ``normals``/``colors``: ``(N, D)``/``(N, 3)``
    or ``None``; ``valid``: ``(N,)`` bool — padding/deleted slots are False.
    """

    points: jax.Array
    normals: Optional[jax.Array] = None
    colors: Optional[jax.Array] = None
    valid: Optional[jax.Array] = None

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    @property
    def dim(self) -> int:
        return self.points.shape[1]

    def has_normals(self) -> bool:
        return self.normals is not None

    def has_colors(self) -> bool:
        return self.colors is not None

    def valid_mask(self) -> jax.Array:
        if self.valid is None:
            return jnp.ones(self.points.shape[0], bool)
        return self.valid

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid_mask())

    def transformed(self, tf: Transform, rigid: bool = True) -> "PointCloud":
        """Reference ``PointCloud::transformed`` (``utilities/point_cloud.hpp``)."""
        normals = (
            transform_normals(tf, self.normals, rigid=rigid)
            if self.normals is not None
            else None
        )
        return dataclasses.replace(
            self, points=transform_points(tf, self.points), normals=normals
        )

    def select(self, indices: jax.Array) -> "PointCloud":
        """Gather a subcloud by index (reference index-select ctor,
        ``utilities/point_cloud.hpp:33-66``)."""
        take = lambda a: None if a is None else a[indices]
        return PointCloud(
            points=self.points[indices],
            normals=take(self.normals),
            colors=take(self.colors),
            valid=take(self.valid),
        )

    def remove(self, indices: jax.Array) -> "PointCloud":
        """Mask out points by index (reference swap-to-end removal,
        ``utilities/point_cloud.hpp:138-199`` — here a mask clear)."""
        valid = self.valid_mask().at[indices].set(False)
        return dataclasses.replace(self, valid=valid)

    def remove_invalid(self) -> "PointCloud":
        """Mask non-finite points/normals/colors (reference
        ``removeInvalidPoints/Normals/Colors``)."""
        ok = jnp.all(jnp.isfinite(self.points), axis=-1)
        if self.normals is not None:
            ok &= jnp.all(jnp.isfinite(self.normals), axis=-1)
        if self.colors is not None:
            ok &= jnp.all(jnp.isfinite(self.colors), axis=-1)
        return dataclasses.replace(self, valid=self.valid_mask() & ok)

    # -- chained convenience ops (reference PointCloud API) ----------------

    def grid_downsampled(
        self, bin_size: float, min_points_in_bin: int = 1
    ) -> "PointCloud":
        """Reference ``PointCloud::gridDownsample`` (``point_cloud.hpp:247-290``)."""
        from .grid import grid_downsample

        return grid_downsample(self, bin_size, min_points_in_bin)

    def with_normals_knn(
        self, k: int = 12, view_point=None
    ) -> "PointCloud":
        """Reference ``estimateNormalsKNN`` (``point_cloud.hpp:294-307``);
        default view point = origin, as the reference."""
        from .normals import estimate_normals_knn

        if view_point is None:
            view_point = jnp.zeros(self.dim, self.points.dtype)
        normals, _, ok = estimate_normals_knn(
            self.points, k, valid=self.valid, view_point=view_point
        )
        return dataclasses.replace(
            self, normals=normals, valid=self.valid_mask() & ok
        )

    def with_normals_radius(
        self, radius: float, max_neighbors: int = 32, view_point=None
    ) -> "PointCloud":
        from .normals import estimate_normals_radius

        if view_point is None:
            view_point = jnp.zeros(self.dim, self.points.dtype)
        normals, _, ok = estimate_normals_radius(
            self.points,
            radius,
            max_neighbors,
            valid=self.valid,
            view_point=view_point,
        )
        return dataclasses.replace(
            self, normals=normals, valid=self.valid_mask() & ok
        )

    def to_ply(self, path: str, binary: bool = True) -> None:
        """Reference ``toPLYFile``; drops invalid slots host-side."""
        import numpy as np
        from ..utils.ply_io import write_point_cloud

        mask = np.asarray(self.valid_mask())
        write_point_cloud(
            path,
            np.asarray(self.points)[mask],
            None if self.normals is None else np.asarray(self.normals)[mask],
            None if self.colors is None else np.asarray(self.colors)[mask],
            binary=binary,
        )

    @staticmethod
    def from_ply(path: str, capacity: Optional[int] = None) -> "PointCloud":
        """Reference PLY ctor (``point_cloud.hpp:118-121``)."""
        from ..utils.ply_io import read_point_cloud

        pts, normals, colors = read_point_cloud(path)
        return from_numpy(pts, normals, colors, capacity=capacity)


def from_numpy(
    points: np.ndarray,
    normals: Optional[np.ndarray] = None,
    colors: Optional[np.ndarray] = None,
    capacity: Optional[int] = None,
    dtype=jnp.float32,
) -> PointCloud:
    """Build a device cloud from host arrays, optionally padding to ``capacity``.

    Padding points are placed at a large sentinel coordinate so that distance
    based kernels naturally exclude them even before masking.
    """
    n, d = points.shape
    cap = capacity if capacity is not None else n
    assert cap >= n

    def pad(a, fill, width):
        if a is None:
            return None
        out = np.full((cap, width), fill, np.float32)
        out[:n] = a
        return jnp.asarray(out, dtype)

    pts = pad(points, 1e30, d)
    valid = jnp.asarray(np.arange(cap) < n)
    return PointCloud(
        points=pts,
        normals=pad(normals, 0.0, d) if normals is not None else None,
        colors=pad(colors, 0.0, colors.shape[1]) if colors is not None else None,
        valid=valid,
    )


def compact(cloud: PointCloud) -> PointCloud:
    """Host-side repack: drop invalid slots (not jittable — shapes change)."""
    mask = np.asarray(cloud.valid_mask())
    idx = np.flatnonzero(mask)
    take = lambda a: None if a is None else jnp.asarray(np.asarray(a)[idx])
    return PointCloud(
        points=take(cloud.points),
        normals=take(cloud.normals),
        colors=take(cloud.colors),
        valid=jnp.ones(len(idx), bool),
    )


def append(a: PointCloud, b: PointCloud) -> PointCloud:
    """Concatenate capacities (host-side; reference ``PointCloud::append``)."""

    def cat(x, y, width):
        if x is None and y is None:
            return None
        if x is None:
            x = jnp.zeros((a.capacity, width), y.dtype)
        if y is None:
            y = jnp.zeros((b.capacity, width), x.dtype)
        return jnp.concatenate([x, y], axis=0)

    return PointCloud(
        points=jnp.concatenate([a.points, b.points], axis=0),
        normals=cat(a.normals, b.normals, a.dim),
        colors=cat(a.colors, b.colors, 3),
        valid=jnp.concatenate([a.valid_mask(), b.valid_mask()]),
    )
