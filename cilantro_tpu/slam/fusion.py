"""Point-based RGBD fusion (frame-to-model SLAM).

TPU-native redesign of the reference fusion app (``examples/fusion.cpp:125-254``,
SURVEY §3.3):

* **Localize**: projective combined-metric ICP of the incoming frame against
  the model rendered in the predicted camera frame (``fusion.cpp:131-141``;
  6 outer iterations, 1 GN iteration, conv 5e-4).
* **Map**: per-pixel classification against z-buffered index maps
  (``fusion.cpp:148-238``), an if/elif priority chain over interior pixels:
  - *fuse* — model hit, depth within 0.01 and normal angle < 75°:
    radial-confidence-weighted average of point/normal/color with
    ``w = radial / (radial + confidence)`` and ``confidence += w``
    (``fusion.cpp:185-203``);
  - *augment* — (pixel and its 4 neighbors model-empty) OR normals disagree
    by > 105°: new point with confidence = radial weight
    (``fusion.cpp:204-217``);
  - *carve* — frame surface > 0.025 behind the model point AND the model
    point is seen head-on (view angle < 45°): remove it
    (``fusion.cpp:218-226``).
  The radial weight is ``exp(-0.5 ((u-cx)² + (v-cy)²) / 120²)``
  (``fusion.cpp:98-101,187-188``).

The model is a fixed-capacity masked pool (:class:`FusionMap`); "append"
writes into free slots assigned by a prefix-sum (no dynamic shapes), "remove"
clears mask bits — the static-shape discipline of SURVEY §7's hard-parts
list. One frame = one jitted program (localize) + one jitted program (map
update).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.rgbd import CameraIntrinsics, _zbuffer_winner
from ..core.transforms import Transform, compose, inverse
from ..registration.icp import ICPResult, icp_projective_packed


# Packed pool rows come in two widths. The isolated 307k-row combined
# scatter is ~25% cheaper at width 8 (17.0 vs 22.5 ms) but the FULL fusion
# pipeline measures FASTER at width 16 (29.6 vs 33.3 ms/frame @640×480) —
# the narrower pool loses more on gathers/layout than the scatter saves, so
# width 16 is the default and width 8 an opt-in memory saver:
#   width 16 (colors):  [pts 0:3 | nrm 3:6 | col 6:9 | conf 9  | valid 10]
#   width  8 (no col):  [pts 0:3 | nrm 3:6 |           conf 6  | valid 7 ]
_MAP_WIDTH = 16
_MAP_WIDTH_NC = 8


def _conf_col(width: int) -> int:
    return 6 if width == _MAP_WIDTH_NC else 9


def _valid_col(width: int) -> int:
    return 7 if width == _MAP_WIDTH_NC else 10


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusionMap:
    """World-frame model: fixed-capacity masked point pool + confidence.

    Storage is ONE packed ``(C, 16)`` array. TPU gathers/scatters are
    latency-bound per *op*, not per byte, so the per-frame map update touches
    the pool through a single row gather and a single combined scatter
    instead of one op per field — the map-scale twin of
    :func:`..correspondence.projective.pack_projective_target`. Field views
    are exposed as properties (zero-copy slices under jit).
    """

    data: jax.Array  # (C, 16) with colors / (C, 8) without

    @property
    def points(self) -> jax.Array:
        return self.data[:, 0:3]

    @property
    def normals(self) -> jax.Array:
        return self.data[:, 3:6]

    @property
    def colors(self) -> Optional[jax.Array]:
        if self.data.shape[1] == _MAP_WIDTH_NC:
            return None
        return self.data[:, 6:9]

    @property
    def confidence(self) -> jax.Array:
        return self.data[:, _conf_col(self.data.shape[1])]

    @property
    def valid(self) -> jax.Array:
        return self.data[:, _valid_col(self.data.shape[1])] > 0.5

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    def num_points(self) -> jax.Array:
        return jnp.sum(self.valid)

    @classmethod
    def from_fields(
        cls, points, normals, colors, confidence, valid
    ) -> "FusionMap":
        c = points.shape[0]
        w = _MAP_WIDTH_NC if colors is None else _MAP_WIDTH
        data = jnp.zeros((c, w), jnp.float32)
        data = data.at[:, 0:3].set(points)
        data = data.at[:, 3:6].set(normals)
        if colors is not None:
            data = data.at[:, 6:9].set(colors)
        data = data.at[:, _conf_col(w)].set(confidence)
        data = data.at[:, _valid_col(w)].set(valid.astype(jnp.float32))
        return cls(data=data)

    def replace_fields(self, **kw) -> "FusionMap":
        """Functional field update (accepts points/normals/colors/confidence/
        valid arrays)."""
        return FusionMap.from_fields(
            points=kw.get("points", self.points),
            normals=kw.get("normals", self.normals),
            colors=kw.get("colors", self.colors),
            confidence=kw.get("confidence", self.confidence),
            valid=kw.get("valid", self.valid),
        )


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """Reference thresholds (``fusion.cpp:98-101,139-140,188-226``)."""

    fuse_depth: float = 0.01
    occlusion_depth: float = 0.025
    fuse_normal_cos: float = 0.25881904  # cos 75° (fusion.cpp:190-193)
    augment_normal_cos: float = -0.25881904  # cos 105° (fusion.cpp:208-211)
    carve_view_cos: float = 0.70710678  # cos 45° (fusion.cpp:219-224)
    radial_sigma_px: float = 120.0  # fusion.cpp:99 radial_factor
    confidence_thresh: float = 3.0  # fusion.cpp:100 (cleanup_map)
    icp_iterations: int = 6
    icp_convergence_tol: float = 5e-4
    icp_max_corr_dist_sq: float = 0.01
    icp_point_weight: float = 0.0
    icp_plane_weight: float = 1.0
    # GN steps per correspondence set (the reference's
    # max_optimization_iterations, icp_base.hpp:26 / fusion.cpp:140 uses 1).
    # The per-outer-iteration cost is dominated by the projective
    # correspondence GATHER (~17.5 ns/row); an extra GN step on the same
    # correspondences is nearly free, so 2 lets the outer loop converge in
    # fewer gathers.
    icp_gn_iterations: int = 1
    # Localize on every k-th pixel row/column (KinectFusion-style pyramid
    # trick; 2 → 4x fewer correspondences). Integration always uses the full
    # frame; accuracy is guarded by the ATE checks.
    localize_stride: int = 1
    # Augment slot allocation. False (default): append to the virgin tail —
    # one max-reduction instead of a capacity-sized prefix-sum + scatter
    # (~10-20 ms/frame at mapping capacities); carved holes are reclaimed
    # only by host-side compaction (cleanup_map / checkpoint reload). True:
    # reuse free slots anywhere, exactly (the round-1 machinery).
    reuse_carved_slots: bool = False
    # How update rows reach the pool. TPU scatters are latency-bound per
    # ROW: a 16-channel row scatter costs ~61 ns/row (18.7 ms at H·W=307k)
    # while a 1-channel scatter rides a ~10 ns fast path and gathers cost
    # ~17.5 ns/row. "inverse_gather" therefore scatters only PIXEL IDS
    # (1-channel) into a slot→pixel map, then GATHERS the update rows by
    # slot and rewrites the pool — cost scales with capacity, not with
    # H·W·(row latency). "row_scatter" is the direct one-scatter form.
    # "auto" picks inverse_gather when capacity ≤ 3·H·W (the break-even:
    # capacity·17.5 ns + H·W·10 ns vs H·W·61 ns).
    update_mode: str = "auto"
    # Route integrate's two big pool-row gathers (model rows by index map,
    # update rows by inverse map) through the run-coalescing DMA kernel
    # (core/coalesced.py): the streams are 96-100% consecutive runs because
    # the pool is appended in image order, so one (2, 128)-lane window DMA
    # replaces up to 8 per-row descriptors. Bit-exact vs plain gathers
    # (test); off by default until it wins on the target chip.
    coalesced_gathers: bool = False


def radial_weights(
    height: int,
    width: int,
    intrinsics: CameraIntrinsics,
    sigma_px: float = 120.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Per-pixel radial confidence ``exp(-0.5 r² / σ²)`` with ``r`` the pixel
    distance from the principal point (``fusion.cpp:99,187-188``)."""
    u = (jnp.arange(width, dtype=dtype) - intrinsics.cx)[None, :]
    v = (jnp.arange(height, dtype=dtype) - intrinsics.cy)[:, None]
    r2 = u * u + v * v
    return jnp.exp(-0.5 * r2 / (sigma_px * sigma_px)).reshape(-1)


def compact_map(fmap: FusionMap) -> FusionMap:
    """Move valid rows to the leading slots (stable), freeing the tail.

    This is how carved holes are reclaimed under the default tail-append
    augment allocator (see :class:`FusionConfig`): run occasionally (e.g. at
    keyframes or checkpoints) — one stable sort + one row gather, far
    cheaper than per-frame hole tracking. Point order among valid rows is
    preserved, so renders and fusion behavior are unchanged up to slot ids.
    """
    free = ~fmap.valid
    order = jnp.argsort(free, stable=True)  # valid first, stable
    return FusionMap(data=fmap.data[order])


def cleanup_map(fmap: FusionMap, confidence_thresh: float = 3.0) -> FusionMap:
    """Drop low-confidence points (the reference's 's'-key cleanup callback,
    ``fusion.cpp:32-40,104-105``)."""
    valid = fmap.valid & (fmap.confidence >= confidence_thresh)
    return fmap.replace_fields(
        points=jnp.where(valid[:, None], fmap.points, 1e30),
        valid=valid,
    )


def empty_map(capacity: int, with_colors: bool = True) -> FusionMap:
    w = _MAP_WIDTH if with_colors else _MAP_WIDTH_NC
    data = jnp.zeros((capacity, w), jnp.float32)
    data = data.at[:, 0:3].set(1e30)
    return FusionMap(data=data)


def init_map_from_frame(
    capacity: int,
    frame_points: jax.Array,
    frame_normals: jax.Array,
    frame_colors: Optional[jax.Array],
    frame_valid: jax.Array,
    pose: Optional[Transform] = None,
    confidence: Optional[jax.Array] = None,
    with_color_slots: Optional[bool] = None,
) -> FusionMap:
    """Seed the model with the first frame (world frame = first camera).

    ``confidence`` defaults to 1; pass :func:`radial_weights` to mirror the
    reference, whose first frame enters through the augment path with
    confidence = radial weight (``fusion.cpp:212-217``).
    ``with_color_slots`` picks the pool layout explicitly. Default: the
    (C, 16) layout even without colors — measured end-to-end it beats the
    narrower (C, 8) pool (29.6 vs 33.3 ms/frame at 640×480) despite the
    isolated combined scatter being ~25% cheaper at width 8; opt into
    ``False`` to halve pool memory."""
    if with_color_slots is None:
        with_color_slots = True
    if frame_colors is not None and not with_color_slots:
        raise ValueError("with_color_slots=False but frame_colors given")
    m = empty_map(capacity, with_colors=with_color_slots)
    w = m.data.shape[1]
    n = frame_points.shape[0]
    assert n <= capacity
    pts = frame_points if pose is None else pose.apply(frame_points)
    nrm = frame_normals if pose is None else pose.apply_normals(frame_normals)
    conf = frame_valid.astype(jnp.float32)
    if confidence is not None:
        conf = conf * confidence
    rows = jnp.zeros((n, w), jnp.float32)
    rows = rows.at[:, 0:3].set(jnp.where(frame_valid[:, None], pts, 1e30))
    rows = rows.at[:, 3:6].set(nrm)
    if frame_colors is not None:
        rows = rows.at[:, 6:9].set(frame_colors)
    rows = rows.at[:, _conf_col(w)].set(conf)
    rows = rows.at[:, _valid_col(w)].set(frame_valid.astype(jnp.float32))
    return FusionMap(data=m.data.at[:n].set(rows))


@partial(jax.jit, static_argnames=("height", "width", "cfg"))
def localize(
    fmap: FusionMap,
    frame_points: jax.Array,
    frame_normals: jax.Array,
    frame_valid: jax.Array,
    pose_guess: Transform,
    intrinsics: CameraIntrinsics,
    *,
    height: int,
    width: int,
    cfg: FusionConfig = FusionConfig(),
    index_map: Optional[jax.Array] = None,
    packed_target: Optional[jax.Array] = None,
) -> Tuple[Transform, ICPResult]:
    """Frame-to-model projective ICP. Returns the refined world pose of the
    frame camera (``fusion.cpp:131-141``).

    ``index_map`` may be the render the previous integrate produced at this
    very pose (warm-started fusion: pose_guess == previous refined pose), so
    no re-render is needed; carved points are re-gated via the pool's valid
    flag. ``packed_target`` goes one further: the previous integrate's
    post-update packed camera-frame target (see
    :func:`integrate_frame_with_imap`) — no render AND no pool gather.
    """
    if packed_target is not None:
        # Warm start: the previous integrate emitted the packed camera-frame
        # target for exactly this pose_guess — zero render/gather work here.
        packed = packed_target
    else:
        cam_from_world = inverse(pose_guess)
        if index_map is None:
            model_cam = cam_from_world.apply(fmap.points)
            index_map, _ = _zbuffer_winner(
                model_cam, fmap.valid, intrinsics, height, width
            )
        # Build the packed per-pixel target with ONE pool gather; the camera
        # transform runs on the H·W gathered rows, never on the capacity.
        hit = index_map.reshape(-1)
        ok = hit >= 0
        rows = fmap.data[jnp.where(ok, hit, 0)]
        ok &= rows[:, _valid_col(rows.shape[1])] > 0.5
        packed = pack_camera_target(rows, ok, cam_from_world)
    res = icp_projective_packed(
        frame_points,
        packed,
        intrinsics,
        height=height,
        width=width,
        src_normals=frame_normals,
        src_valid=frame_valid,
        metric="combined",
        point_weight=cfg.icp_point_weight,
        plane_weight=cfg.icp_plane_weight,
        max_iterations=cfg.icp_iterations,
        convergence_tol=cfg.icp_convergence_tol,
        max_gn_iterations=cfg.icp_gn_iterations,
        max_corr_dist_sq=cfg.icp_max_corr_dist_sq,
        coalesced=cfg.coalesced_gathers,
    )
    # res.transform maps frame (camera) points onto the model in the
    # *predicted* camera frame; world pose = pose_guess ∘ delta.
    new_pose = compose(pose_guess, res.transform)
    return new_pose, res


def free_slot_table(valid: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """``(slot_of_rank, num_free)``: rank ``r`` → index of the ``r``-th free
    slot, built with ONE unique-index scatter (free-slot ranks are distinct;
    occupied slots take DISTINCT out-of-bounds indices so ``mode="drop"``
    discards them without violating the ``unique_indices=True`` contract).
    Avoids a capacity-sized sort per frame."""
    free = ~valid
    c = valid.shape[0]
    rank_of_slot = jnp.cumsum(free.astype(jnp.int32)) - 1
    cap_ids = jnp.arange(c, dtype=jnp.int32)
    slot_of_rank = (
        jnp.zeros((c,), jnp.int32)
        .at[jnp.where(free, rank_of_slot, c + cap_ids)]
        .set(cap_ids, mode="drop", unique_indices=True)
    )
    return slot_of_rank, jnp.sum(free)


def apply_pool_update(
    data: jax.Array, tgt: jax.Array, rows_out: jax.Array, cfg: "FusionConfig"
) -> jax.Array:
    """ONE combined pool update: write ``rows_out[i]`` to slot ``tgt[i]``
    (out-of-bounds targets dropped; targets must be unique — z-buffer
    winners, dealt free slots, and distinct OOB lanes are by construction).

    ``cfg.update_mode`` dispatch: ``row_scatter`` is the direct wide-row
    scatter (~61 ns/row over the update count); ``inverse_gather`` inverts
    pixel→slot into slot→pixel with a 1-channel scatter (fast path), then
    GATHERs each updated slot's row and rewrites the pool — the wide-row
    latency is paid at gather rates (~17.5 ns/row over capacity) instead.
    ``auto`` picks inverse_gather when capacity ≤ 3·updates (the measured
    break-even)."""
    c = data.shape[0]
    n_upd = tgt.shape[0]
    mode = cfg.update_mode
    if mode == "auto":
        mode = "inverse_gather" if c <= 3 * n_upd else "row_scatter"
    if mode == "inverse_gather":
        pix_of_slot = (
            jnp.full((c,), -1, jnp.int32)
            .at[tgt]
            .set(
                jnp.arange(n_upd, dtype=jnp.int32),
                mode="drop",
                unique_indices=True,
            )
        )
        touched = pix_of_slot >= 0
        return jnp.where(
            touched[:, None],
            _pool_gather(
                rows_out, pix_of_slot, jnp.where(touched, pix_of_slot, 0),
                cfg,
            ),
            data,
        )
    if mode == "row_scatter":
        return data.at[tgt].set(rows_out, mode="drop", unique_indices=True)
    raise ValueError(f"unknown update_mode {cfg.update_mode!r}")


def pack_camera_target(rows: jax.Array, ok: jax.Array, cam) -> jax.Array:
    """Pack the 8-column camera-frame localize target consumed by
    ``find_projective_correspondences_packed``: ``[pts_cam | nrm_cam |
    flag | 0]`` per pixel, zeroed where ``~ok`` (masked lanes stay finite).
    ``rows`` are pool rows in world frame; ``cam`` maps world → camera."""
    rows = jnp.where(ok[:, None], rows, 0.0)
    pts_cam = cam.apply(rows[:, 0:3])
    nrm_cam = cam.apply_normals(rows[:, 3:6])
    flag = ok.astype(jnp.float32)[:, None]
    return jnp.where(
        ok[:, None],
        jnp.concatenate(
            [pts_cam, nrm_cam, flag, jnp.zeros_like(flag)], axis=1
        ),
        0.0,
    )


def _pool_gather(data, raw_idx, safe_idx, cfg):
    """Gather wide pool rows by index, optionally through the
    run-coalescing DMA kernel. ``raw_idx`` may contain -1 (wildcards whose
    rows the caller masks); ``safe_idx`` is the 0-clamped version used by
    the plain path."""
    if cfg.coalesced_gathers:
        from ..core.coalesced import coalesced_gather

        return coalesced_gather(data, raw_idx.astype(jnp.int32))
    return data[safe_idx]


def _classify_and_build_rows(
    mrows: jax.Array,  # (H·W, 16) model row per pixel (0 where no hit)
    m_ok: jax.Array,  # (H·W,) model hit mask
    mdepth_flat: jax.Array,  # (H·W,) model depth per pixel
    frame_points: jax.Array,
    frame_normals: jax.Array,
    frame_valid: jax.Array,
    frame_colors: Optional[jax.Array],
    pose: Transform,
    cam_from_world: Transform,
    intrinsics: CameraIntrinsics,
    height: int,
    width: int,
    cfg: FusionConfig,
):
    """Per-pixel fuse/augment/carve classification + update-row construction
    (``fusion.cpp:172-226``) — shared by the single-device and the
    map-sharded integrators (the sharded one builds ``mrows`` via a psum of
    per-shard contributions instead of a local gather).

    Returns ``(do_fuse, do_augment, do_carve, fuse_rows, aug_rows,
    carve_row)``.
    """
    fd = frame_points[:, 2]
    f_ok = frame_valid & (fd > 0)

    # Interior pixels only (fusion.cpp:172-173 loops y,x in 1..h-2/1..w-2).
    pix = jnp.arange(height * width, dtype=jnp.int32)
    pix_u = pix % width
    pix_v = pix // width
    f_ok &= (
        (pix_u >= 1) & (pix_u <= width - 2)
        & (pix_v >= 1) & (pix_v <= height - 2)
    )

    radial = radial_weights(height, width, intrinsics, cfg.radial_sigma_px)

    w = mrows.shape[1]
    m_pts_w = mrows[:, 0:3]
    m_nrm_w = mrows[:, 3:6]
    m_cols = mrows[:, 6:9] if w == _MAP_WIDTH else None
    c_old = mrows[:, _conf_col(w)]
    m_pts_cam = cam_from_world.apply(m_pts_w)
    model_nrm_cam_px = cam_from_world.apply_normals(m_nrm_w)

    ncos = jnp.sum(frame_normals * model_nrm_cam_px, axis=-1)
    depth_diff = fd - mdepth_flat

    # fuse: model hit, depth agrees, normals within 75° (fusion.cpp:190-193).
    do_fuse = (
        f_ok & m_ok
        & (jnp.abs(depth_diff) < cfg.fuse_depth)
        & (ncos > cfg.fuse_normal_cos)
    )
    # augment: pixel + its 4 neighbors model-empty, OR normals disagree
    # by > 105° (fusion.cpp:204-211).
    m_img = m_ok.reshape(height, width)
    nb_occ = (
        jnp.roll(m_img, 1, axis=0) | jnp.roll(m_img, -1, axis=0)
        | jnp.roll(m_img, 1, axis=1) | jnp.roll(m_img, -1, axis=1)
    ).reshape(-1)
    do_augment = (
        ~do_fuse & f_ok
        & (
            (~m_ok & ~nb_occ)
            | (m_ok & (ncos < cfg.augment_normal_cos))
        )
    )
    # carve: frame surface well behind a model point that is seen head-on
    # (view angle < 45°) → it floats in observed free space
    # (fusion.cpp:218-226).
    view_cos = -jnp.sum(
        m_pts_cam
        / jnp.maximum(
            jnp.linalg.norm(m_pts_cam, axis=-1, keepdims=True), 1e-30
        )
        * model_nrm_cam_px,
        axis=-1,
    )
    do_carve = (
        ~do_fuse & ~do_augment & f_ok & m_ok
        & (depth_diff > cfg.occlusion_depth)
        & (view_cos > cfg.carve_view_cos)
    )

    # fuse: radial-confidence blend w = radial/(radial + conf)
    # (fusion.cpp:194-203); augment: fresh row with confidence = radial
    # (fusion.cpp:215); carve: dead row (points parked at 1e30).
    pts_w = pose.apply(frame_points)
    nrm_w = pose.apply_normals(frame_normals)
    npix = mrows.shape[0]
    w_f = radial / jnp.maximum(radial + c_old, 1e-30)
    fused_nrm = m_nrm_w * (1.0 - w_f[:, None]) + nrm_w * w_f[:, None]
    fused_nrm = fused_nrm / jnp.maximum(
        jnp.linalg.norm(fused_nrm, axis=-1, keepdims=True), 1e-30
    )
    one = jnp.ones((npix, 1), jnp.float32)
    zeros_tail = jnp.zeros((npix, w - _conf_col(w) - 2), jnp.float32)
    fuse_parts = [
        m_pts_w * (1.0 - w_f[:, None]) + pts_w * w_f[:, None],
        fused_nrm,
    ]
    aug_parts = [pts_w, nrm_w]
    if w == _MAP_WIDTH:
        cols = (
            frame_colors
            if frame_colors is not None
            else jnp.zeros_like(frame_points)
        )
        fuse_parts.append(m_cols * (1.0 - w_f[:, None]) + cols * w_f[:, None])
        aug_parts.append(cols)
    fuse_rows = jnp.concatenate(
        fuse_parts + [(c_old + w_f)[:, None], one, zeros_tail], axis=1
    )
    aug_rows = jnp.concatenate(
        aug_parts + [radial[:, None], one, zeros_tail], axis=1
    )
    carve_row = jnp.zeros((w,), jnp.float32).at[0:3].set(1e30)
    return do_fuse, do_augment, do_carve, fuse_rows, aug_rows, carve_row


@partial(jax.jit, static_argnames=("height", "width", "cfg"))
def integrate_frame_with_imap(
    fmap: FusionMap,
    frame_points: jax.Array,  # (H·W, 3) organized, camera frame
    frame_normals: jax.Array,
    frame_colors: Optional[jax.Array],
    frame_valid: jax.Array,
    pose: Transform,  # camera-to-world
    intrinsics: CameraIntrinsics,
    *,
    height: int,
    width: int,
    cfg: FusionConfig = FusionConfig(),
) -> Tuple[FusionMap, jax.Array, jax.Array]:
    """Fuse / augment / carve one organized frame into the model
    (``fusion.cpp:148-238``). Returns ``(map, index_map, packed_next)`` —
    the render at ``pose`` doubles as the next frame's localize target, and
    ``packed_next`` is that target already packed in camera frame (see
    :func:`localize`)."""
    if frame_colors is not None and fmap.data.shape[1] == _MAP_WIDTH_NC:
        raise ValueError(
            "map was initialized without colors (width-8 pool); "
            "re-init with frame_colors to fuse colors"
        )
    cam_from_world = inverse(pose)
    model_cam = cam_from_world.apply(fmap.points)

    # Model index map in the new camera (one winner per pixel).
    imap, mdepth = _zbuffer_winner(
        model_cam, fmap.valid, intrinsics, height, width
    )
    imap_flat = imap.reshape(-1)  # (H·W,) model index or -1
    mdepth_flat = mdepth.reshape(-1)

    # The frame is organized: pixel p ↔ frame point p (the reference z-buffers
    # the frame too, fusion.cpp:158, which is near-identity for organized
    # input; the identity shortcut is the static-shape redesign).
    m_ok = imap_flat >= 0
    m_idx = jnp.where(m_ok, imap_flat, 0)

    # ONE pool gather serves every per-pixel model read below; the camera
    # transform of normals runs on the gathered H·W rows, not the capacity.
    mrows = jnp.where(
        m_ok[:, None], _pool_gather(fmap.data, imap_flat, m_idx, cfg), 0.0
    )

    (
        do_fuse,
        do_augment,
        do_carve,
        fuse_rows,
        aug_rows,
        carve_row,
    ) = _classify_and_build_rows(
        mrows,
        m_ok,
        mdepth_flat,
        frame_points,
        frame_normals,
        frame_valid,
        frame_colors,
        pose,
        cam_from_world,
        intrinsics,
        height,
        width,
        cfg,
    )
    npix = m_idx.shape[0]

    # --- free-slot assignment for augments -------------------------------
    aug_rank = jnp.cumsum(do_augment.astype(jnp.int32)) - 1  # per pixel
    if cfg.reuse_carved_slots:
        # Exact free-slot reuse (carved slots become reusable from the NEXT
        # frame: their rows are written this frame, so they cannot double
        # as augment targets).
        slot_of_rank, num_free = free_slot_table(fmap.valid)
        aug_slot = slot_of_rank[jnp.clip(aug_rank, 0, fmap.capacity - 1)]
        aug_ok = do_augment & (aug_rank < num_free)
    else:
        # Tail append: every slot past the highest valid one is free by
        # construction (carve targets are valid slots, so they stay below
        # the tail and cannot collide with augments this frame). One cheap
        # max-reduction replaces the capacity-sized machinery.
        cap_ids = jnp.arange(fmap.capacity, dtype=jnp.int32)
        tail_start = (
            jnp.max(jnp.where(fmap.valid, cap_ids, -1)) + 1
        ).astype(jnp.int32)
        aug_slot = tail_start + aug_rank
        aug_ok = do_augment & (aug_slot < fmap.capacity)
        aug_slot = jnp.clip(aug_slot, 0, fmap.capacity - 1)

    # --- ONE combined update ---------------------------------------------
    # Targets are unique: each model point wins ≤ 1 pixel (fuse/carve hit
    # valid slots, mutually exclusive per pixel), augments hit free slots,
    # and masked lanes get DISTINCT out-of-bounds indices so mode="drop"
    # discards them while unique_indices=True stays honest.
    oob = fmap.capacity + jnp.arange(npix, dtype=jnp.int32)
    tgt = jnp.where(
        do_fuse | do_carve, m_idx, jnp.where(aug_ok, aug_slot, oob)
    )
    rows_out = jnp.where(
        do_fuse[:, None],
        fuse_rows,
        jnp.where(do_carve[:, None], carve_row[None, :], aug_rows),
    )
    data = apply_pool_update(fmap.data, tgt, rows_out, cfg)

    # Next frame's localize warm-starts at THIS pose against THIS render —
    # emit its packed camera-frame target from rows already in hand (a
    # select over the gathered image, zero extra indexed ops). Fused pixels
    # use their post-update rows, carved pixels drop out; augments (not in
    # this render) appear one frame later, as with any cached render.
    post_rows = jnp.where(do_fuse[:, None], fuse_rows, mrows)
    alive = (
        m_ok & ~do_carve
        & (post_rows[:, _valid_col(post_rows.shape[1])] > 0.5)
    )
    packed_next = pack_camera_target(post_rows, alive, cam_from_world)
    return FusionMap(data=data), imap, packed_next


def integrate_frame(*args, **kwargs) -> FusionMap:
    """Fuse / augment / carve (``fusion.cpp:148-238``); see
    :func:`integrate_frame_with_imap` for the variant that also returns the
    rendered index map + next-localize packed target."""
    fmap, _, _ = integrate_frame_with_imap(*args, **kwargs)
    return fmap


def seed_localize_target(
    fmap: FusionMap,
    pose: Transform,
    intrinsics: CameraIntrinsics,
    height: int,
    width: int,
) -> Tuple[jax.Array, jax.Array]:
    """Initial (index map, packed camera-frame localize target) from a fresh
    render of the map at ``pose`` — what :func:`fusion_step` otherwise gets
    for free from the previous integrate. Used to seed scanned/pipelined
    whole-sequence drivers."""
    from ..core.transforms import inverse as _inverse

    cam = _inverse(pose)
    imap, _ = _zbuffer_winner(
        cam.apply(fmap.points), fmap.valid, intrinsics, height, width
    )
    hit = imap.reshape(-1)
    ok = hit >= 0
    rows = fmap.data[jnp.where(ok, hit, 0)]
    ok &= rows[:, _valid_col(rows.shape[1])] > 0.5
    return imap, pack_camera_target(rows, ok, cam)


@partial(
    jax.jit, static_argnames=("height", "width", "cfg", "do_integrate")
)
def fusion_step(
    fmap: FusionMap,
    frame_points: jax.Array,
    frame_normals: jax.Array,
    frame_colors: Optional[jax.Array],
    frame_valid: jax.Array,
    pose_guess: Transform,
    intrinsics: CameraIntrinsics,
    *,
    cached_index_map: Optional[jax.Array] = None,
    cached_packed_target: Optional[jax.Array] = None,
    height: int,
    width: int,
    cfg: FusionConfig = FusionConfig(),
    do_integrate: bool = True,
) -> Tuple[
    FusionMap, Transform, ICPResult, Optional[jax.Array], Optional[jax.Array]
]:
    """One full fusion frame (localize + integrate) as a single program —
    one dispatch per frame keeps the device streaming over the host loop.

    ``cached_packed_target`` is the previous integrate's post-update packed
    camera-frame target (valid because pose_guess == the pose it was built
    at) — localize then does no render and no pool gather at all; the new
    target comes back as the 5th output. ``cached_index_map`` is the weaker
    cache (render only)."""
    s = cfg.localize_stride
    if s > 1:
        rows = jnp.arange(0, height, s)
        cols = jnp.arange(0, width, s)
        sub = (rows[:, None] * width + cols[None, :]).reshape(-1)
        loc_pts = frame_points[sub]
        loc_nrm = frame_normals[sub]
        loc_valid = frame_valid[sub]
    else:
        loc_pts, loc_nrm, loc_valid = frame_points, frame_normals, frame_valid
    pose, res = localize(
        fmap,
        loc_pts,
        loc_nrm,
        loc_valid,
        pose_guess,
        intrinsics,
        height=height,
        width=width,
        cfg=cfg,
        index_map=cached_index_map,
        packed_target=cached_packed_target,
    )
    new_imap = cached_index_map
    # A skipped integrate leaves the packed target keyed to an OLDER pose —
    # its geometry is camera-frame, so reusing it at the next pose_guess
    # would compose the ICP delta in the wrong frame. Drop it; the index-map
    # cache stays valid (world-frame rows are re-transformed at the new
    # pose; only winner selection is stale, the documented trade).
    new_packed = None
    if do_integrate:
        fmap, new_imap, new_packed = integrate_frame_with_imap(
            fmap,
            frame_points,
            frame_normals,
            frame_colors,
            frame_valid,
            pose,
            intrinsics,
            height=height,
            width=width,
            cfg=cfg,
        )
    return fmap, pose, res, new_imap, new_packed
