"""Projective (O(1)-per-point) correspondence search for organized clouds.

TPU-native redesign of
``include/cilantro/correspondence_search/correspondence_search_projective.hpp``:

* the destination cloud is rendered ONCE into a z-buffered index map
  (``:161-167`` → :func:`cilantro_tpu.core.rgbd.points_to_index_map`);
* each ICP iteration projects the transformed source points through the
  intrinsics and reads the hit index (``:184-198``) — one gather instead of
  an NN search; the distance gate matches the kd-tree search semantics.

This is the fusion pipeline's fast path (reference ``examples/fusion.cpp``
uses it for frame-to-model localization) — per-iteration cost is O(N), about
two orders of magnitude below the all-pairs NN kernel at 120k points.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.rgbd import CameraIntrinsics, points_to_index_map, project_points
from ..core.transforms import Transform
from ..neighbors.bruteforce import INVALID_DIST
from .search import Correspondences


def build_projective_target(
    dst_points: jax.Array,
    intrinsics: CameraIntrinsics,
    h: int,
    w: int,
    dst_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Precompute the dst index map (cache it across ICP iterations, as the
    reference caches its index image)."""
    return points_to_index_map(dst_points, intrinsics, h, w, valid=dst_valid)


def pack_projective_target(
    dst_points: jax.Array,
    dst_normals: Optional[jax.Array],
    index_map: jax.Array,
    dst_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Resolve the index map into a packed per-pixel target image
    ``(H·W, 8)`` = ``[point xyz | normal xyz | hit flag | 0]``.

    TPU gathers are latency-bound (~1 ms per 100k rows regardless of width),
    so the per-ICP-iteration cost collapses from 4-5 gathers (index lookup,
    valid, point ×2, normal) to ONE row gather from this image. The pack
    itself is 2-3 gathers paid once per localize, not per iteration — the
    reference's "render once, look up per iteration" idea
    (``correspondence_search_projective.hpp:161-167``) taken one step
    further."""
    hit = index_map.reshape(-1)
    ok = hit >= 0
    safe = jnp.where(ok, hit, 0)
    if dst_valid is not None:
        ok &= dst_valid[safe]
    pts = dst_points[safe]
    nrm = (
        dst_normals[safe]
        if dst_normals is not None
        else jnp.zeros_like(pts)
    )
    flag = ok.astype(dst_points.dtype)[:, None]
    zero = jnp.zeros_like(flag)
    return jnp.where(
        ok[:, None],
        jnp.concatenate([pts, nrm, flag, zero], axis=1),
        0.0,
    )


def find_projective_correspondences_packed(
    src_points: jax.Array,
    packed_target: jax.Array,
    intrinsics: CameraIntrinsics,
    h: int,
    w: int,
    *,
    tf: Optional[Transform] = None,
    src_valid: Optional[jax.Array] = None,
    max_distance: Optional[jax.Array] = None,
    coalesced: bool = False,
):
    """Single-gather projective matching against a packed target image.

    Returns ``(s, dst_pts, dst_nrm, weights)`` — the transformed source, the
    matched model points/normals and 0/1 weights — ready for the GN
    accumulators (no index indirection left). ``coalesced`` routes the
    gather through the run-coalescing DMA kernel (projected pixel indices of
    an organized source are near-consecutive runs; out-of-image queries
    become wildcards whose rows the mask already kills)."""
    s = src_points if tf is None else tf.apply(src_points)
    u, v, z = project_points(s, intrinsics)
    in_img = (z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    if coalesced:
        from ..core.coalesced import coalesced_gather

        pix_idx = jnp.where(in_img, v * w + u, -1).astype(jnp.int32)
        row = coalesced_gather(packed_target, pix_idx)
    else:
        pix_idx = jnp.where(in_img, v * w + u, 0)
        row = packed_target[pix_idx]  # the ONE gather
    dst_pts = row[:, 0:3]
    dst_nrm = row[:, 3:6]
    mask = in_img & (row[:, 6] > 0.5)
    if src_valid is not None:
        mask &= src_valid
    diff = dst_pts - s
    dist = jnp.sum(diff * diff, axis=-1)
    if max_distance is not None:
        mask &= dist <= max_distance
    return s, dst_pts, dst_nrm, mask.astype(src_points.dtype)


def find_projective_correspondences(
    src_points: jax.Array,
    dst_points: jax.Array,
    index_map: jax.Array,
    intrinsics: CameraIntrinsics,
    *,
    tf: Optional[Transform] = None,
    src_valid: Optional[jax.Array] = None,
    dst_valid: Optional[jax.Array] = None,
    max_distance: Optional[jax.Array] = None,
) -> Correspondences:
    """Project (transformed) src points; correspondence = dst point rendered
    at the hit pixel. ``max_distance`` gates squared 3D distance.

    ``dst_valid`` re-gates hits whose dst point was invalidated after the
    index map was rendered (stale-map reuse across fusion frames)."""
    h, w = index_map.shape
    s = src_points if tf is None else tf.apply(src_points)
    u, v, z = project_points(s, intrinsics)
    in_img = (z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    pix_idx = jnp.where(in_img, v * w + u, 0)
    hit = index_map.reshape(-1)[pix_idx]
    mask = in_img & (hit >= 0)
    if src_valid is not None:
        mask &= src_valid
    if dst_valid is not None:
        mask &= dst_valid[jnp.where(mask, hit, 0)]
    safe_hit = jnp.where(mask, hit, 0)
    diff = dst_points[safe_hit] - s
    dist = jnp.sum(diff * diff, axis=-1)
    if max_distance is not None:
        mask &= dist <= max_distance
    return Correspondences(
        dst_idx=jnp.where(mask, safe_hit, 0),
        distances=jnp.where(mask, dist, INVALID_DIST),
        weights=mask.astype(src_points.dtype),
        mask=mask,
    )
