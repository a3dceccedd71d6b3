"""Voxel-grid binning and downsampling.

TPU-native redesign of ``include/cilantro/core/grid_accumulator.hpp`` +
``grid_downsampler.hpp`` + ``common_accumulators.hpp``:

* the reference bins points into a ``std::map`` keyed by integer grid
  coordinates (``grid_accumulator.hpp:114-123``, per-thread maps merged in a
  critical section ``:149-178``). Sorted containers and hash maps don't exist
  on TPU; instead points are **lexsorted by voxel coordinate** and reduced
  with ``segment_sum`` — the classic sort-based groupby. Outputs live in
  fixed-capacity arrays with a valid mask (#bins ≤ N always).
* the four accumulator payloads (points / +normals / +colors / both,
  ``common_accumulators.hpp:36-256``) become optional reduced channels;
  sign-consistent normal averaging (``:93-102``) anchors every normal to its
  bin's first normal before summing.
* ``min_points_in_bin`` filtering and normal renormalization follow
  ``grid_downsampler.hpp:9-132``.
* instead of the reference's per-bin index lists (``IndexAccumulator``),
  :func:`grid_bin_ids` returns the point→bin map, from which index lists are
  recoverable host-side.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .containers import PointCloud


def voxel_coords(points: jax.Array, bin_size: float) -> jax.Array:
    """Integer grid coordinates ``floor(p / bin)`` (reference
    ``grid_accumulator.hpp:114-123``)."""
    return jnp.floor(points / bin_size).astype(jnp.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridBins:
    """Sorted-groupby view of a point set's voxel structure.

    ``order (N,)``  — permutation sorting points by voxel (invalid last);
    ``segment_ids (N,)`` — bin id of each *sorted* point, in [0, N);
    ``bin_of_point (N,)`` — bin id of each *original* point (capacity slot
    for invalid points);
    ``counts (N,)`` — points per bin (0 for unused bin slots);
    ``num_bins ()`` — number of occupied bins.
    """

    order: jax.Array
    segment_ids: jax.Array
    bin_of_point: jax.Array
    counts: jax.Array
    num_bins: jax.Array


def build_grid_bins(
    points: jax.Array,
    bin_size: float,
    valid: Optional[jax.Array] = None,
) -> GridBins:
    n, d = points.shape
    if valid is None:
        valid = jnp.ones(n, bool)
    coords = voxel_coords(points, bin_size)
    # Clamp invalid points to a sentinel cell that lexsorts last.
    coords = jnp.where(valid[:, None], coords, jnp.int32(2**31 - 1))
    # lexsort: last key is primary → order by (c0, c1, ..., invalid-last).
    keys = tuple(coords[:, i] for i in range(d - 1, -1, -1)) + (~valid,)
    order = jnp.lexsort(keys)
    sc = coords[order]
    sv = valid[order]
    first = jnp.concatenate(
        [jnp.ones(1, bool), jnp.any(sc[1:] != sc[:-1], axis=1)]
    )
    seg = jnp.cumsum(first) - 1  # (N,), bin id per sorted point
    counts = jax.ops.segment_sum(sv.astype(jnp.int32), seg, num_segments=n)
    num_bins = jnp.sum(counts > 0)
    inv = jnp.zeros(n, jnp.int32).at[order].set(seg.astype(jnp.int32))
    return GridBins(
        order=order,
        segment_ids=seg.astype(jnp.int32),
        bin_of_point=inv,
        counts=counts,
        num_bins=num_bins,
    )


def segment_mean(
    values_sorted: jax.Array,
    seg: jax.Array,
    counts: jax.Array,
    weights_sorted: Optional[jax.Array] = None,
) -> jax.Array:
    w = weights_sorted
    v = values_sorted if w is None else values_sorted * w[..., None]
    s = jax.ops.segment_sum(v, seg, num_segments=counts.shape[0])
    denom = (
        counts.astype(v.dtype)
        if w is None
        else jax.ops.segment_sum(w, seg, num_segments=counts.shape[0])
    )
    return s / jnp.maximum(denom, 1e-30)[..., None]


@partial(jax.jit, static_argnames=("min_points_in_bin", "capacity"))
def grid_downsample(
    cloud: PointCloud,
    bin_size: float,
    min_points_in_bin: int = 1,
    capacity: Optional[int] = None,
) -> PointCloud:
    """Voxel downsample: per-bin mean of points (and colors), sign-consistent
    mean of normals — the union of all four reference downsampler variants
    (``grid_downsampler.hpp:9-340``). Output capacity equals input capacity
    unless ``capacity`` is given; when the occupied-bin count exceeds
    ``capacity``, the **most occupied** bins are kept — a spatially unbiased
    criterion (a lexicographic prefix would silently drop one spatial corner
    of the cloud, biasing downstream consumers like the coarse levels of
    multi-resolution ICP).
    """
    n = cloud.capacity
    valid = cloud.valid_mask()
    bins = build_grid_bins(cloud.points, bin_size, valid)
    seg, order, counts = bins.segment_ids, bins.order, bins.counts
    sv = valid[order].astype(jnp.float32)

    pts = segment_mean(cloud.points[order], seg, counts, sv)

    normals = None
    if cloud.normals is not None:
        ns = cloud.normals[order]
        # Anchor: the first (sorted) normal of each bin, broadcast back.
        first_in_seg = jnp.concatenate(
            [jnp.ones(1, bool), seg[1:] != seg[:-1]]
        )
        start_idx = jax.ops.segment_min(
            jnp.where(first_in_seg, jnp.arange(n), n - 1), seg, num_segments=n
        )
        anchor = ns[start_idx][seg]  # (N, D) anchor normal per sorted point
        sign = jnp.where(jnp.sum(ns * anchor, -1, keepdims=True) < 0, -1.0, 1.0)
        nsum = jax.ops.segment_sum(ns * sign * sv[:, None], seg, num_segments=n)
        norm = jnp.linalg.norm(nsum, axis=-1, keepdims=True)
        normals = nsum / jnp.maximum(norm, 1e-30)

    colors = None
    if cloud.colors is not None:
        colors = segment_mean(cloud.colors[order], seg, counts, sv)

    bin_valid = counts >= min_points_in_bin
    pts = jnp.where(bin_valid[:, None], pts, 1e30)
    if capacity is not None and capacity < n:
        # Keep the `capacity` most-occupied bins (occupancy is spatially
        # unbiased; the lexicographic prefix is not). Ties break on a hash of
        # the bin id — equal-occupancy grids would otherwise degenerate back
        # to the biased index order.
        tie = (
            (jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761))
            >> 16
        ).astype(jnp.float32) / 65536.0
        key = jnp.where(bin_valid, counts.astype(jnp.float32) + tie * 0.5, -1.0)
        _, keep = jax.lax.top_k(key, capacity)
        pts = pts[keep]
        normals = normals[keep] if normals is not None else None
        colors = colors[keep] if colors is not None else None
        bin_valid = bin_valid[keep]
        pts = jnp.where(bin_valid[:, None], pts, 1e30)
    return PointCloud(points=pts, normals=normals, colors=colors, valid=bin_valid)


def grid_bin_ids(
    points: jax.Array, bin_size: float, valid: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """Point→bin map + per-bin counts (the reference ``IndexAccumulator``'s
    information content in fixed shape)."""
    bins = build_grid_bins(points, bin_size, valid)
    return bins.bin_of_point, bins.counts
