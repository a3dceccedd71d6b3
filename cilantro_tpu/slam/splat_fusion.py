"""Splat fusion — frame-to-model RGBD fusion over an IMAGE-organized model.

The pool fusion (``slam/fusion.py``, after ``/root/reference/examples/
fusion.cpp:125-254``) keeps the model as an unordered surfel pool and pays a
per-row-latency-bound scatter/gather tax every frame (z-buffer render,
pool gathers, slot updates — the measured wall of the whole pipeline at
~10-60 ns/row). This module is the TPU-native alternative for *tracked*
sequences: the model lives as a two-layer SURFEL IMAGE homed to the current
camera, and every per-frame operation is dense:

* **localize** — model→frame projective point-to-plane ICP where each model
  surfel window-reads the frame at its projected pixel
  (:func:`..slam.splat.window_read_codes` on bit-cast f32 channels) — a VPU
  stencil, no gathers;
* **re-associate** — project every surfel under the refined pose; the
  winner/runner-up per target pixel is a bounded-window argmin
  (:func:`..slam.splat.splat_argmin2`), and their rows are rebuilt with
  :func:`..slam.splat.flow_select_rows` — no scatter, no z-buffer;
* **integrate** — the reference's fuse / augment / carve per-pixel classify
  (``fusion.cpp:148-238``) as pure elementwise selects on the re-homed
  image vs the frame.

Validity bound: between consecutive frames every visible surfel's pixel
home moves at most ``cfg.radius`` pixels (measured ≤ 4 px on the bench
trajectories). Surfels whose flow exceeds the window and third-and-deeper
surfels landing on one pixel are dropped — the model is a bounded two-deep
z-ordered image, padded by ``cfg.margin`` so surfels leaving the frustum
survive panning within the margin.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rgbd import CameraIntrinsics, depth_to_points_normals
from ..core.transforms import (
    Transform,
    compose,
    gn_update_3d,
    identity,
    inverse,
    reproject_rigid,
)
from .splat import (
    _BAND,
    flow_select_rows,
    offset_code,
    pad_hw,
    splat_argmin2,
    window_read_codes,
)

# Channel layout of the surfel image (colors appended when enabled).
_CH_PT = slice(0, 3)  # world-frame position
_CH_NRM = slice(3, 6)  # world-frame normal
_CH_CONF = 6  # accumulated confidence weight
_CH_VALID = 7  # 1.0 = live surfel
_C_BASE = 8
_CH_COL = slice(8, 11)


@dataclasses.dataclass(frozen=True)
class SplatConfig:
    """Static knobs (jit-static). Thresholds follow the reference's fusion
    example (``fusion.cpp:98-101``): fuse depth gate 0.01, occlusion gate
    0.025, fuse normal angle 75°."""

    radius: int = 4  # re-association window (±px per frame)
    margin: int = 16  # off-frustum survival band (multiple of 16)
    icp_iterations: int = 6
    # GN early exit, matching the reference localize's convergence check
    # (``fusion.cpp:139-140``: max 6 iterations, tol 5e-4): warm-started
    # frames converge in 2-3 iterations, and each saved iteration is a
    # full-frame window read (~1 ms at 640×480 — measured 10.5 → 7.6
    # ms/frame at identical ATE when iterations drop 6 → 3).
    icp_convergence_tol: float = 5e-4
    icp_max_corr_dist_sq: float = 0.01
    icp_normal_dot_min: float = 0.0  # correspondence gate (off by default)
    depth_fuse_thresh: float = 0.01
    occlusion_thresh: float = 0.025
    fuse_normal_dot_min: float = 0.2588  # cos 75°
    max_confidence: float = 100.0
    carve_penalty: float = 2.0
    with_colors: bool = False

    @property
    def channels(self) -> int:
        return _C_BASE + (3 if self.with_colors else 0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SplatMap:
    """Two-layer surfel image homed to the camera at ``pose`` (layer 0 =
    front surface). ``rows``: ``(2, C, Hm, Wm)`` with ``Hm = H + 2·margin``,
    ``Wm = W + 2·margin``; model pixel ``(margin+i, margin+j)`` is frame
    pixel ``(i, j)``."""

    rows: jax.Array
    pose: Transform  # camera-to-world of the home frame

    @property
    def layers(self) -> int:
        return self.rows.shape[0]


def _img(flat: jax.Array, h: int, w: int) -> jax.Array:
    """(H·W, C) → (C, H, W)."""
    return jnp.moveaxis(flat.reshape(h, w, -1), -1, 0)


def _frame_images(depth, intrinsics, h, w):
    pts, nrm, valid = depth_to_points_normals(depth, intrinsics)
    return (
        _img(pts, h, w),
        _img(nrm, h, w),
        valid.reshape(h, w),
    )


def init_splat_map(
    frame_pts: jax.Array,  # (3, H, W) camera frame
    frame_nrm: jax.Array,  # (3, H, W)
    frame_valid: jax.Array,  # (H, W) bool
    cfg: SplatConfig,
    *,
    colors: Optional[jax.Array] = None,  # (3, H, W)
) -> SplatMap:
    """Seed the model from the first frame (world frame = first camera)."""
    h, w = frame_valid.shape
    m = cfg.margin
    c = cfg.channels
    rows = jnp.zeros((2, c, h + 2 * m, w + 2 * m), jnp.float32)
    v = frame_valid.astype(jnp.float32)
    chans = [frame_pts, frame_nrm, (v * 1.0)[None], v[None]]
    if cfg.with_colors:
        chans.append(
            colors
            if colors is not None
            else jnp.zeros((3, h, w), jnp.float32)
        )
    frame_rows = jnp.concatenate(chans, axis=0)
    rows = rows.at[0, :, m : m + h, m : m + w].set(frame_rows)
    return SplatMap(rows=rows, pose=identity(3))


def _project_model(
    rows: jax.Array,  # (L, C, Hm, Wm)
    cam_from_world: Transform,
    intrinsics: CameraIntrinsics,
    margin: int,
    radius: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Project every surfel through ``cam_from_world``. Returns
    ``(z (L,Hm,Wm) camera depth, off (L,Hm,Wm) window offset code from the
    surfel's home to its projected MODEL pixel, valid (L,Hm,Wm))`` — ``off``
    is -1 where invalid, behind the camera, or out of window."""
    l, c, hm, wm = rows.shape
    x = rows[:, 0]
    y = rows[:, 1]
    z = rows[:, 2]
    r00, r01, r02 = (cam_from_world.linear[0, i] for i in range(3))
    r10, r11, r12 = (cam_from_world.linear[1, i] for i in range(3))
    r20, r21, r22 = (cam_from_world.linear[2, i] for i in range(3))
    t0, t1, t2 = (cam_from_world.translation[i] for i in range(3))
    xc = r00 * x + r01 * y + r02 * z + t0
    yc = r10 * x + r11 * y + r12 * z + t1
    zc = r20 * x + r21 * y + r22 * z + t2
    valid = (rows[:, _CH_VALID] > 0.5) & (zc > 1e-6)
    zsafe = jnp.where(valid, zc, 1.0)
    # Projected pixel in MODEL coords (frame pixel + margin).
    u = jnp.round(xc * intrinsics.fx / zsafe + intrinsics.cx) + margin
    v = jnp.round(yc * intrinsics.fy / zsafe + intrinsics.cy) + margin
    cols = jax.lax.broadcasted_iota(jnp.int32, (l, hm, wm), 2)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (l, hm, wm), 1)
    du = u.astype(jnp.int32) - cols
    dv = v.astype(jnp.int32) - rows_i
    off = jnp.where(valid, offset_code(du, dv, radius), -1)
    return zc, off, valid


@partial(jax.jit, static_argnames=("cfg",))
def splat_localize(
    smap: SplatMap,
    frame_pts: jax.Array,  # (3, H, W) camera frame
    frame_nrm: jax.Array,  # (3, H, W)
    frame_valid: jax.Array,  # (H, W) bool
    pose_guess: Transform,
    intrinsics: CameraIntrinsics,
    *,
    cfg: SplatConfig,
) -> Transform:
    """Model→frame projective point-to-plane ICP (the splat analogue of
    ``fusion.cpp:131-141``'s localize). Each iteration: project model
    surfels through the current estimate, window-read the frame's
    point/normal at the projected pixel, one GN step on the 6-DoF pose.
    Returns the refined camera-to-world pose."""
    m, r = cfg.margin, cfg.radius
    hm, wm = smap.rows.shape[2], smap.rows.shape[3]
    h, w = hm - 2 * m, wm - 2 * m
    # Frame channels [pt(3) | nrm(3) | valid] padded to the model grid and
    # bit-cast for the integer window-read kernel (pure selects — any bits).
    fv = frame_valid.astype(jnp.float32)
    fimg = jnp.concatenate([frame_pts, frame_nrm, fv[None]], axis=0)
    fimg = jnp.pad(fimg, ((0, 0), (m + r, m + r), (m + r, m + r)))
    fimg_i = jax.lax.bitcast_convert_type(fimg, jnp.int32)[None]  # (1,C,..)

    mdl_pts = smap.rows[:, _CH_PT]  # (L, 3, Hm, Wm) world
    mdl_nrm = smap.rows[:, _CH_NRM]
    l = smap.rows.shape[0]

    def gn_iter(carry):
        cw, _, it = carry
        zc, off, mvalid = _project_model(smap.rows, cw, intrinsics, m, r)
        # Window-read the frame at each surfel's projected pixel; layers
        # share one kernel launch via the batch axis.
        read = window_read_codes(
            jnp.broadcast_to(fimg_i, (l,) + fimg_i.shape[1:]),
            off,
            radius=r,
        )
        read = jax.lax.bitcast_convert_type(read, jnp.float32)
        fok = read[:, 6] > 0.5  # NaN (unwritten -1 bits) compares False
        # Zero the unwritten lanes: their -1 bit pattern is NaN, and
        # NaN·0 would poison the JᵀJ reduction.
        read = jnp.where(fok[:, None], read, 0.0)
        fpt = read[:, 0:3]  # (L, 3, Hm, Wm) camera frame
        fnm = read[:, 3:6]
        # Model point/normal in the CURRENT camera frame.
        xc = jnp.einsum("ij,ljyx->liyx", cw.linear, mdl_pts) + (
            cw.translation[None, :, None, None]
        )
        nc = jnp.einsum("ij,ljyx->liyx", cw.linear, mdl_nrm)
        diff = fpt - xc
        dist2 = jnp.sum(diff * diff, axis=1)
        ok = (
            mvalid
            & fok
            & (off >= 0)
            & (dist2 <= cfg.icp_max_corr_dist_sq)
        )
        if cfg.icp_normal_dot_min > 0.0:
            ok &= jnp.sum(nc * fnm, axis=1) > cfg.icp_normal_dot_min
        wgt = ok.astype(jnp.float32)
        # Point-to-plane on the frame normal: r = n_f · (x_c − x_f);
        # d r = (x_c × n_f)·ω + n_f·dt for x_c ← x_c + ω×x_c + dt.
        res = jnp.sum(fnm * (xc - fpt), axis=1)
        cxn = jnp.cross(
            jnp.moveaxis(xc, 1, -1), jnp.moveaxis(fnm, 1, -1)
        )  # (L, Hm, Wm, 3)
        jrow = jnp.concatenate(
            [cxn, jnp.moveaxis(fnm, 1, -1)], axis=-1
        )  # (L, Hm, Wm, 6)
        jw = jrow * wgt[..., None]
        jtj = jnp.einsum("lyxi,lyxj->ij", jw, jrow)
        jtr = jnp.einsum("lyxi,lyx->i", jw, res)
        jtj = jtj + 1e-8 * jnp.eye(6, dtype=jtj.dtype)
        step = -jnp.linalg.solve(jtj, jtr)
        delta = gn_update_3d(step)
        return (
            reproject_rigid(compose(delta, cw)),
            jnp.linalg.norm(step),
            it + 1,
        )

    def gn_cond(carry):
        _, step_norm, it = carry
        return (it < cfg.icp_iterations) & (
            step_norm >= cfg.icp_convergence_tol
        )

    cw0 = inverse(pose_guess)
    cw, _, _ = jax.lax.while_loop(
        gn_cond,
        gn_iter,
        (cw0, jnp.array(jnp.inf, jnp.float32), jnp.array(0, jnp.int32)),
    )
    return inverse(cw)


@partial(jax.jit, static_argnames=("cfg",))
def splat_integrate(
    smap: SplatMap,
    frame_pts: jax.Array,  # (3, H, W) camera frame
    frame_nrm: jax.Array,
    frame_valid: jax.Array,
    new_pose: Transform,
    intrinsics: CameraIntrinsics,
    *,
    cfg: SplatConfig,
    frame_colors: Optional[jax.Array] = None,
) -> SplatMap:
    """Re-home the model to ``new_pose`` (bounded-window argmin election +
    row rebuild) and run the fuse/augment/carve classify against the frame
    (``fusion.cpp:148-238``) as dense selects."""
    m, r = cfg.margin, cfg.radius
    l, c, hm, wm = smap.rows.shape
    h, w = hm - 2 * m, wm - 2 * m
    cw = inverse(new_pose)

    # --- re-association: elect winner/runner-up per new home pixel ---
    zc, off, _ = _project_model(smap.rows, cw, intrinsics, m, r)
    key = jnp.where(off >= 0, zc, jnp.inf)
    bk, bc, sk, sc = splat_argmin2(
        pad_hw(key, r, jnp.inf)[None], pad_hw(off, r, -1)[None], radius=r
    )
    rows_p = pad_hw(smap.rows, r, 0.0)[None]
    win = flow_select_rows(rows_p, bc, radius=r)[0]  # (C, Hm, Wm)
    sec = flow_select_rows(rows_p, sc, radius=r)[0]
    bk, bc, sk, sc = bk[0], bc[0], sk[0], sc[0]
    w_ok = (bc >= 0) & (win[_CH_VALID] > 0.5)
    s_ok = (sc >= 0) & (sec[_CH_VALID] > 0.5)

    # --- frame data on the model grid ---
    fv = jnp.pad(frame_valid, m)
    zf = jnp.pad(frame_pts[2], m)
    fpt_w = jnp.einsum(
        "ij,jyx->iyx", new_pose.linear, jnp.pad(frame_pts, ((0, 0), (m, m), (m, m)))
    ) + new_pose.translation[:, None, None]
    fnm_w = jnp.einsum(
        "ij,jyx->iyx", new_pose.linear, jnp.pad(frame_nrm, ((0, 0), (m, m), (m, m)))
    )
    # Radial confidence weight (fusion.cpp's distance-from-center weight).
    ys = jnp.arange(hm, dtype=jnp.float32)[:, None] - (intrinsics.cy + m)
    xs = jnp.arange(wm, dtype=jnp.float32)[None, :] - (intrinsics.cx + m)
    rad2 = (ys / jnp.float32(h)) ** 2 + (xs / jnp.float32(w)) ** 2
    wf = jnp.exp(-2.0 * rad2) * fv

    conf_w = win[_CH_CONF]
    zw = jnp.where(w_ok, bk, jnp.inf)
    ndot = jnp.sum(win[_CH_NRM] * fnm_w, axis=0)

    fuse = (
        fv
        & w_ok
        & (jnp.abs(zw - zf) <= cfg.depth_fuse_thresh)
        & (ndot > cfg.fuse_normal_dot_min)
    )
    carve = fv & w_ok & ~fuse & (zw < zf - cfg.occlusion_thresh)
    infront = fv & w_ok & ~fuse & (zf < zw - cfg.occlusion_thresh)
    augment = fv & (~w_ok | infront)

    # fused winner rows: confidence-weighted average of position/normal(s).
    tot = conf_w + wf
    tsafe = jnp.maximum(tot, 1e-12)
    def avg(a, b):
        return (a * conf_w[None] + b * wf[None]) / tsafe[None]

    fused = win
    fused = fused.at[_CH_PT].set(avg(win[_CH_PT], fpt_w))
    nrm_avg = avg(win[_CH_NRM], fnm_w)
    nn = jnp.linalg.norm(nrm_avg, axis=0, keepdims=True)
    fused = fused.at[_CH_NRM].set(nrm_avg / jnp.maximum(nn, 1e-12))
    if cfg.with_colors:
        fcol = (
            jnp.pad(frame_colors, ((0, 0), (m, m), (m, m)))
            if frame_colors is not None
            else jnp.zeros((3, hm, wm), jnp.float32)
        )
        fused = fused.at[_CH_COL].set(avg(win[_CH_COL], fcol))
    fused = fused.at[_CH_CONF].set(
        jnp.minimum(tot, cfg.max_confidence)
    )

    # carved winner: confidence decays; drops at ≤ 0.
    carved_conf = conf_w - cfg.carve_penalty
    carved = win.at[_CH_CONF].set(carved_conf)
    carved = carved.at[_CH_VALID].set(
        jnp.where(carved_conf > 0.0, win[_CH_VALID], 0.0)
    )

    # new surfel from the frame.
    newrow_chans = [fpt_w, fnm_w, wf[None], fv.astype(jnp.float32)[None]]
    if cfg.with_colors:
        newrow_chans.append(fcol)
    newrow = jnp.concatenate(newrow_chans, axis=0)

    zero = jnp.zeros_like(win)
    sec_live = jnp.where(s_ok[None], sec, zero)
    win_live = jnp.where(w_ok[None], win, zero)

    # Layer assembly (front-to-back):
    #   fuse    → [fused, second]
    #   carve   → [carved-or-dropped winner, second]  (frame saw through it)
    #   infront → [new, winner]                        (second dropped)
    #   augment w/o winner → [new, second]
    #   no frame data      → [winner, second]
    l0 = win_live
    l0 = jnp.where(fuse[None], fused, l0)
    l0 = jnp.where(carve[None], carved, l0)
    l0 = jnp.where(augment[None], newrow, l0)
    l1 = sec_live
    l1 = jnp.where(infront[None], win_live, l1)
    rows_new = jnp.stack([l0, l1], axis=0)
    return SplatMap(rows=rows_new, pose=new_pose)


@partial(jax.jit, static_argnames=("cfg",))
def splat_fusion_step(
    smap: SplatMap,
    depth: jax.Array,  # (H, W) metric depth
    pose_guess: Transform,
    intrinsics: CameraIntrinsics,
    *,
    cfg: SplatConfig,
) -> Tuple[SplatMap, Transform]:
    h, w = depth.shape
    fpt, fnm, fval = _frame_images(depth, intrinsics, h, w)
    pose = splat_localize(
        smap, fpt, fnm, fval, pose_guess, intrinsics, cfg=cfg
    )
    smap = splat_integrate(
        smap, fpt, fnm, fval, pose, intrinsics, cfg=cfg
    )
    return smap, pose


def extract_cloud(
    smap: SplatMap, min_confidence: float = 0.0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Live surfels as host arrays ``(points, normals, confidence)``."""
    rows = np.asarray(smap.rows)
    live = (rows[:, _CH_VALID] > 0.5) & (rows[:, _CH_CONF] >= min_confidence)
    pts = np.moveaxis(rows[:, _CH_PT], 1, -1)[live]
    nrm = np.moveaxis(rows[:, _CH_NRM], 1, -1)[live]
    conf = rows[:, _CH_CONF][live]
    return pts, nrm, conf


def run_splat_sequence(
    depths: Sequence[np.ndarray],
    intrinsics: CameraIntrinsics,
    *,
    cfg: SplatConfig = SplatConfig(),
) -> Tuple[SplatMap, List[np.ndarray], float]:
    """Host-loop splat fusion over a depth sequence. Returns the final map,
    per-frame camera-to-world pose matrices, and steady-state seconds/frame
    (first step's compile excluded)."""
    h, w = depths[0].shape
    staged = [jnp.asarray(d) for d in depths]
    fpt, fnm, fval = _frame_images(staged[0], intrinsics, h, w)
    smap = init_splat_map(fpt, fnm, fval, cfg)
    pose = identity(3)
    poses_dev = [pose.matrix()]
    t0 = time.perf_counter()
    t_first = None
    for fi in range(1, len(depths)):
        smap, pose = splat_fusion_step(
            smap, staged[fi], pose, intrinsics, cfg=cfg
        )
        poses_dev.append(pose.matrix())
        if fi == 1:
            jax.block_until_ready(poses_dev[-1])
            t_first = time.perf_counter()
    poses = [np.asarray(p) for p in poses_dev]
    t1 = time.perf_counter()
    n_steady = max(len(depths) - 2, 1)
    sec_per_frame = (t1 - (t_first or t0)) / n_steady
    return smap, poses, sec_per_frame


def run_splat_sequence_scanned(
    depths: Sequence[np.ndarray],
    intrinsics: CameraIntrinsics,
    *,
    cfg: SplatConfig = SplatConfig(),
) -> Tuple[SplatMap, List[np.ndarray], float]:
    """Whole-sequence splat fusion as ONE jitted ``lax.scan`` (amortizes the
    per-step dispatch floor; the timed number is a pure device rate)."""
    h, w = depths[0].shape
    depth_stack = jnp.asarray(np.stack(depths[1:]))
    fpt, fnm, fval = _frame_images(jnp.asarray(depths[0]), intrinsics, h, w)
    smap0 = init_splat_map(fpt, fnm, fval, cfg)

    @jax.jit
    def run(smap0, depth_stack):
        def step(carry, depth):
            smap, pose = carry
            smap, pose = splat_fusion_step(
                smap, depth, pose, intrinsics, cfg=cfg
            )
            return (smap, pose), pose.matrix()

        return jax.lax.scan(step, (smap0, identity(3)), depth_stack)

    (smap, _), mats = run(smap0, depth_stack)
    np.asarray(mats)  # hard drain: block_until_ready returns early on the
    # remote-tunnel backend and a queued first run would poison the timing
    best = float("inf")
    for _ in range(3):  # best-of-3 guards against transient tunnel stalls
        t0 = time.perf_counter()
        (smap, _), mats = run(smap0, depth_stack)
        mats_h = np.asarray(mats)
        best = min(best, time.perf_counter() - t0)
    sec_per_frame = best / depth_stack.shape[0]
    poses = [np.eye(4, dtype=np.float32)] + [m for m in mats_h]
    return smap, poses, sec_per_frame
