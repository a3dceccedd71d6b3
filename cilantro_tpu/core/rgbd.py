"""RGBD image ↔ point cloud conversions.

TPU-native redesign of ``include/cilantro/core/image_point_cloud_conversions.hpp``:

* depth → points: pinhole back-projection (``:53-96``), with extrinsics
  (``:98-147``) — pure vectorized arithmetic on the (H, W) grid;
* depth → points+normals via pixel-neighbor cross products (``:149-345``):
  central-difference tangents, normal = normalized cross, flipped toward the
  camera, invalidated across depth discontinuities;
* RGBD → points+colors(+normals) (``:346-696``);
* points → depth image z-buffer (``:697-773``) and points+colors → RGBD
  (``:774-865``): scatter-min z per pixel with a deterministic two-pass
  index tie-break (no atomics needed);
* ``points_to_index_map`` (``:866-936``) — the z-buffered point-index image
  that powers projective correspondence search;
* ``DepthValueConverter`` / ``TruncatedDepthValueConverter`` (``:7-51``) map
  to the scale/truncation parameters of :func:`depth_to_metric`.

All images are row-major ``(H, W)``; pixel (u, v) = (column, row); points are
in the camera frame (+z forward) unless a pose is given.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .containers import PointCloud
from .transforms import Transform


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Pinhole intrinsics. The reference fusion example uses
    fx=fy=525, cx=319.5, cy=239.5 @ 640×480 (``examples/fusion.cpp:63-64``)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array

    @staticmethod
    def make(fx, fy, cx, cy) -> "CameraIntrinsics":
        # Host numpy scalars, not device arrays: intrinsics are consumed both
        # by jitted code (converted at trace time, same as device scalars)
        # and by host-side generators/baselines — keeping them on the host
        # means constructing intrinsics never forces first device contact
        # (over a remote-tunnel backend that contact has been observed to
        # cost minutes, which round 3's bench paid inside the data
        # *generator* of all places).
        return CameraIntrinsics(
            np.float32(fx), np.float32(fy), np.float32(cx), np.float32(cy)
        )

    @staticmethod
    def kinect_640() -> "CameraIntrinsics":
        return CameraIntrinsics.make(525.0, 525.0, 319.5, 239.5)

    def matrix(self) -> jax.Array:
        return jnp.array(
            [
                [self.fx, 0.0, self.cx],
                [0.0, self.fy, self.cy],
                [0.0, 0.0, 1.0],
            ],
            jnp.float32,
        )


def depth_to_metric(
    raw: jax.Array, scale: float = 0.001, max_depth: Optional[float] = None
) -> jax.Array:
    """Raw sensor depth → metric, 0 = invalid (``DepthValueConverter`` /
    ``TruncatedDepthValueConverter``)."""
    z = raw.astype(jnp.float32) * scale
    if max_depth is not None:
        z = jnp.where(z > max_depth, 0.0, z)
    return z


@jax.jit
def depth_to_points(
    depth: jax.Array,
    intrinsics: CameraIntrinsics,
    pose: Optional[Transform] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Back-project a metric depth image: returns ``(points (H·W, 3),
    valid (H·W,))``, row-major pixel order (reference ``depthImageToPoints``,
    ``image_point_cloud_conversions.hpp:53-147``)."""
    h, w = depth.shape
    v, u = jnp.mgrid[0:h, 0:w]
    z = depth
    x = (u.astype(jnp.float32) - intrinsics.cx) * z / intrinsics.fx
    y = (v.astype(jnp.float32) - intrinsics.cy) * z / intrinsics.fy
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = (z > 0).reshape(-1)
    if pose is not None:
        pts = pose.apply(pts)
    pts = jnp.where(valid[:, None], pts, 1e30)
    return pts, valid


@partial(jax.jit, static_argnames=("max_depth_jump",))
def depth_to_points_normals(
    depth: jax.Array,
    intrinsics: CameraIntrinsics,
    pose: Optional[Transform] = None,
    max_depth_jump: float = 0.05,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Back-project + per-pixel normals from neighboring-pixel cross products
    (reference ``:149-345``). Normals flip toward the camera; pixels adjacent
    to depth discontinuities (> ``max_depth_jump``) are invalidated."""
    h, w = depth.shape
    pts_flat, valid_flat = depth_to_points(depth, intrinsics)
    pts = pts_flat.reshape(h, w, 3)
    valid = valid_flat.reshape(h, w)

    right = jnp.roll(pts, -1, axis=1)
    left = jnp.roll(pts, 1, axis=1)
    down = jnp.roll(pts, -1, axis=0)
    up = jnp.roll(pts, 1, axis=0)
    vr = jnp.roll(valid, -1, axis=1)
    vl = jnp.roll(valid, 1, axis=1)
    vd = jnp.roll(valid, -1, axis=0)
    vu = jnp.roll(valid, 1, axis=0)

    du = right - left  # horizontal tangent
    dv = down - up  # vertical tangent
    nrm = jnp.cross(dv, du)
    norm = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / jnp.maximum(norm, 1e-30)
    # Flip toward camera (view point at origin): normal·p < 0.
    flip = jnp.sum(nrm * pts, axis=-1, keepdims=True) > 0
    nrm = jnp.where(flip, -nrm, nrm)

    z = depth
    jump = (
        (jnp.abs(jnp.roll(z, -1, axis=1) - z) > max_depth_jump)
        | (jnp.abs(jnp.roll(z, 1, axis=1) - z) > max_depth_jump)
        | (jnp.abs(jnp.roll(z, -1, axis=0) - z) > max_depth_jump)
        | (jnp.abs(jnp.roll(z, 1, axis=0) - z) > max_depth_jump)
    )
    nvalid = valid & vr & vl & vd & vu & ~jump
    # Border pixels wrap under roll — invalidate them.
    nvalid = nvalid.at[0, :].set(False).at[-1, :].set(False)
    nvalid = nvalid.at[:, 0].set(False).at[:, -1].set(False)

    pts_o = pts.reshape(-1, 3)
    nrm_o = jnp.where(nvalid[..., None], nrm, 0.0).reshape(-1, 3)
    if pose is not None:
        pts_o = pose.apply(pts_o)
        nrm_o = pose.apply_normals(nrm_o)
    pts_o = jnp.where(valid.reshape(-1)[:, None], pts_o, 1e30)
    return pts_o, nrm_o, (valid & nvalid).reshape(-1)


@partial(jax.jit, static_argnames=("compute_normals",))
def rgbd_to_cloud(
    depth: jax.Array,
    colors: Optional[jax.Array],
    intrinsics: CameraIntrinsics,
    pose: Optional[Transform] = None,
    compute_normals: bool = False,
) -> PointCloud:
    """RGBD → PointCloud (reference ``RGBDImagesToPointsColors(Normals)``,
    ``:346-696``). ``colors`` is (H, W, 3) float in [0, 1] or None."""
    if compute_normals:
        pts, nrm, valid = depth_to_points_normals(depth, intrinsics, pose)
    else:
        pts, valid = depth_to_points(depth, intrinsics, pose)
        nrm = None
    cols = colors.reshape(-1, 3) if colors is not None else None
    return PointCloud(points=pts, normals=nrm, colors=cols, valid=valid)


def project_points(
    points: jax.Array, intrinsics: CameraIntrinsics
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Camera-frame points → (u, v) pixel coords (int32, rounded) + depth."""
    z = points[:, 2]
    safe_z = jnp.where(z > 0, z, 1.0)
    u = jnp.round(points[:, 0] * intrinsics.fx / safe_z + intrinsics.cx)
    v = jnp.round(points[:, 1] * intrinsics.fy / safe_z + intrinsics.cy)
    return u.astype(jnp.int32), v.astype(jnp.int32), z


def _zbuffer_winner(
    points: jax.Array,
    valid: jax.Array,
    intrinsics: CameraIntrinsics,
    h: int,
    w: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel winning point index (smallest z; ties → smallest index) and
    its depth. Returns ``(index (H, W) int32, depth (H, W))``; empty pixels
    hold index -1 and depth 0.

    Sort-based: XLA scatter-min serializes on TPU, so instead points are
    sorted by (pixel, z, index) and the first element of each pixel run wins;
    the single remaining scatter has unique indices (one winner per pixel),
    which lowers to the fast scatter path.
    """
    n = points.shape[0]
    u, v, z = project_points(points, intrinsics)
    ok = valid & (z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    # Duplicate-index scatter-min of a packed (quantized-z | index) key —
    # measured ~4× faster than any sort-based formulation on TPU (9.7 ms vs
    # 28.9 ms at 614k points; 100% winner agreement). z is quantized to the
    # bits above the index (≥ 11 → ≤ z_max/2048 buckets, ~1.5 mm at Kinect
    # range); only winner selection among same-pixel points inside one
    # bucket is affected (ties → smallest index within the winning group),
    # and stored depths are exact (gathered from the winner). Capacities
    # beyond 2^20 split into groups with their own scatter-min, combined by
    # an elementwise key min over the (h·w,) group images — row work is
    # unchanged and the combine is negligible.
    group = 1 << 20
    n_groups = (n + group - 1) // group
    idx_bits = min(max(n - 1, 1).bit_length(), 20)
    levels = float(1 << (31 - idx_bits))
    pix = jnp.where(ok, v * w + u, 0)
    z_max = jnp.max(jnp.where(ok, z, 0.0)) + 1e-6
    # Clip to levels-2: a full group's last row with zq == levels-1 would
    # otherwise produce an all-ones key equal to the invalid sentinel and
    # its pixel would be misreported as empty.
    zq = jnp.clip(z * (levels / z_max), 0, levels - 2).astype(jnp.int32)
    tgt_all = jnp.where(ok, pix, h * w)
    inval = jnp.int32(2**31 - 1)

    best_key = None
    best_group = None
    for g in range(n_groups):
        lo, hi = g * group, min((g + 1) * group, n)
        local_idx = jnp.arange(hi - lo, dtype=jnp.int32)
        key = jnp.where(
            ok[lo:hi], (zq[lo:hi] << idx_bits) | local_idx, inval
        )
        img = (
            jnp.full((h * w,), inval).at[tgt_all[lo:hi]].min(key, mode="drop")
        )
        if best_key is None:
            best_key, best_group = img, jnp.zeros_like(img)
        else:
            better = img < best_key
            best_key = jnp.where(better, img, best_key)
            best_group = jnp.where(better, jnp.int32(g), best_group)

    has = best_key != inval
    widx = jnp.where(
        has, (best_key & ((1 << idx_bits) - 1)) + best_group * group, -1
    )
    depth = jnp.where(has, z[jnp.where(has, widx, 0)], 0.0)
    return widx.reshape(h, w), depth.reshape(h, w)


def _zbuffer_winner_batched(
    points: jax.Array,
    valid: jax.Array,
    intrinsics: CameraIntrinsics,
    h: int,
    w: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel winner for B independent streams in ONE rank-1 scatter-min.

    ``points (B, N, 3)`` camera-frame, ``valid (B, N)`` → ``(index (B, h, w)
    int32 — LOCAL within each stream's N rows — and depth (B, h, w))``.

    vmapping :func:`_zbuffer_winner` batches the scatter into a rank-2
    indexed op that falls off XLA's fast path; here the B images are laid
    out as one ``(B·h·w,)`` pixel space and the rows as one ``(B·N,)``
    stream, so the packed-key scatter-min stays the same rank-1 fast-path
    op the single-stream kernel uses (same key packing + >2^20 grouping).
    """
    bsz, n, _ = points.shape
    flat = points.reshape(bsz * n, 3)
    u, v, z = project_points(flat, intrinsics)
    okf = (
        valid.reshape(-1) & (z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    )
    stream = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), n)
    total = bsz * n
    npix = bsz * h * w
    group = 1 << 20
    n_groups = (total + group - 1) // group
    idx_bits = min(max(total - 1, 1).bit_length(), 20)
    levels = float(1 << (31 - idx_bits))
    pix_g = jnp.where(okf, stream * (h * w) + (v * w + u), npix)
    z_max = jnp.max(jnp.where(okf, z, 0.0)) + 1e-6
    zq = jnp.clip(z * (levels / z_max), 0, levels - 2).astype(jnp.int32)
    inval = jnp.int32(2**31 - 1)

    best_key = None
    best_group = None
    for g in range(n_groups):
        lo, hi = g * group, min((g + 1) * group, total)
        local_idx = jnp.arange(hi - lo, dtype=jnp.int32)
        key = jnp.where(
            okf[lo:hi], (zq[lo:hi] << idx_bits) | local_idx, inval
        )
        img = jnp.full((npix,), inval).at[pix_g[lo:hi]].min(key, mode="drop")
        if best_key is None:
            best_key, best_group = img, jnp.zeros_like(img)
        else:
            better = img < best_key
            best_key = jnp.where(better, img, best_key)
            best_group = jnp.where(better, jnp.int32(g), best_group)

    has = best_key != inval
    widx_g = jnp.where(
        has, (best_key & ((1 << idx_bits) - 1)) + best_group * group, 0
    )
    # Global row index → stream-local index (each output pixel belongs to a
    # known stream, so the subtraction is exact).
    pix_stream = (
        jnp.arange(npix, dtype=jnp.int32) // (h * w)
    )
    widx = jnp.where(has, widx_g - pix_stream * n, -1)
    depth = jnp.where(has, z[widx_g], 0.0)
    return widx.reshape(bsz, h, w), depth.reshape(bsz, h, w)


@partial(jax.jit, static_argnames=("h", "w"))
def points_to_index_map(
    points: jax.Array,
    intrinsics: CameraIntrinsics,
    h: int,
    w: int,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Z-buffered point-index image (reference ``pointsToIndexMap``,
    ``image_point_cloud_conversions.hpp:866-936``); -1 = empty pixel."""
    if valid is None:
        valid = jnp.ones(points.shape[0], bool)
    index_map, _ = _zbuffer_winner(points, valid, intrinsics, h, w)
    return index_map


@partial(jax.jit, static_argnames=("h", "w"))
def points_to_depth_image(
    points: jax.Array,
    intrinsics: CameraIntrinsics,
    h: int,
    w: int,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Render points to a z-buffered depth image (reference ``:697-773``)."""
    if valid is None:
        valid = jnp.ones(points.shape[0], bool)
    _, depth_map = _zbuffer_winner(points, valid, intrinsics, h, w)
    return depth_map


@partial(jax.jit, static_argnames=("h", "w"))
def cloud_to_rgbd(
    cloud: PointCloud,
    intrinsics: CameraIntrinsics,
    h: int,
    w: int,
) -> Tuple[jax.Array, jax.Array]:
    """Points+colors → (depth (H, W), rgb (H, W, 3)) via the z-buffer winner
    (reference ``pointsColorsToRGBDImages``, ``:774-865``)."""
    index_map, depth_map = _zbuffer_winner(
        cloud.points, cloud.valid_mask(), intrinsics, h, w
    )
    safe = jnp.maximum(index_map, 0)
    if cloud.colors is not None:
        rgb = jnp.where(
            (index_map >= 0)[..., None], cloud.colors[safe], 0.0
        )
    else:
        rgb = jnp.zeros((h, w, 3), jnp.float32)
    return depth_map, rgb
