"""Headless fusion-sequence driver + trajectory metrics.

The reference's fusion app is interactive (Pangolin loop,
``examples/fusion.cpp:125-254``); this is the headless equivalent: a host
loop over RGBD frames calling the two jitted programs per frame
(:func:`cilantro_tpu.slam.localize`, :func:`cilantro_tpu.slam.integrate_frame`)
with warm-started poses, producing a trajectory + map + per-frame metrics.

Also provides ATE (absolute trajectory error after Umeyama alignment) — the
accuracy bound the BASELINE requires against reference trajectories — and a
synthetic RGBD sequence generator for self-contained benchmarks.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.rgbd import CameraIntrinsics, depth_to_points_normals
from ..core.transforms import identity
from ..registration.transform_estimation import estimate_rigid_point_to_point
from .fusion import (
    FusionConfig,
    FusionMap,
    fusion_step,
    init_map_from_frame,
    integrate_frame,
    localize,
)


@dataclasses.dataclass
class FusionMetrics:
    poses: List[np.ndarray]  # (4, 4) per frame
    frames: int
    seconds_per_frame: float
    icp_iterations: List[int]
    num_map_points: int


def run_fusion_sequence(
    depths: Sequence[np.ndarray],  # (H, W) metric depth per frame
    intrinsics: CameraIntrinsics,
    *,
    colors: Optional[Sequence[np.ndarray]] = None,
    map_capacity: Optional[int] = None,
    cfg: FusionConfig = FusionConfig(),
    integrate_every: int = 1,
    resume_from: Optional[str] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: Optional[int] = None,
    on_frame=None,
) -> Tuple[FusionMap, FusionMetrics]:
    """Run frame-to-model fusion over a depth sequence (world frame = first
    camera). Returns the final map and per-frame metrics.

    ``resume_from`` restarts from a checkpoint written by an earlier run over
    the same sequence; the continuation is bit-identical to the uninterrupted
    run (the cached index map is part of the saved carry). ``checkpoint_path``
    (+ optional ``checkpoint_every`` frames; default: once at the end) writes
    checkpoints via :mod:`.checkpoint`.

    ``on_frame``: optional ``callback(frame_idx, fmap, pose)`` invoked after
    each frame on the host loop — the during-run visualization hook (pass a
    :class:`cilantro_tpu.viz.live.LiveMapViewer` to follow the map in a
    browser). Its wall time (host fetches included) is EXCLUDED from the
    reported seconds_per_frame, like checkpoint writes.
    """
    from .checkpoint import load_checkpoint, save_checkpoint

    h, w = depths[0].shape
    if map_capacity is None:
        map_capacity = 4 * h * w

    # Stage frames on device up front (a real pipeline would prefetch
    # asynchronously); the timed loop then has no host↔device transfers and
    # no per-frame syncs — poses/iteration counts stay on device and are
    # fetched once at the end.
    staged = [jnp.asarray(d) for d in depths]
    col_staged = (
        [jnp.asarray(c.reshape(-1, 3)) for c in colors]
        if colors is not None
        else None
    )

    if resume_from is not None:
        ck = load_checkpoint(resume_from)
        fmap = ck.fusion_map()
        from ..core.transforms import from_matrix

        pose = from_matrix(jnp.asarray(ck.poses[-1]))
        poses_dev = [jnp.asarray(p) for p in ck.poses]
        iters_dev = (
            [jnp.int32(i) for i in ck.icp_iterations]
            if ck.icp_iterations is not None
            else [jnp.int32(0)] * len(ck.poses)
        )
        imap = (
            jnp.asarray(ck.index_map) if ck.index_map is not None else None
        )
        start = ck.next_frame
    else:
        pts, nrm, valid = depth_to_points_normals(staged[0], intrinsics)
        col0 = col_staged[0] if col_staged is not None else None
        fmap = init_map_from_frame(map_capacity, pts, nrm, col0, valid)
        pose = identity(3)
        poses_dev = [pose.matrix()]
        iters_dev = [jnp.int32(0)]
        imap = None
        start = 1
    packed = None  # rebuilt from imap on the first step; cached thereafter

    t0 = time.perf_counter()
    t_first = None  # wall time of the first step (absorbs jit compiles)
    t_ckpt = 0.0  # checkpoint writes are persistence, not pipeline time
    for fi in range(start, len(depths)):
        pts, nrm, valid = depth_to_points_normals(staged[fi], intrinsics)
        colf = col_staged[fi] if col_staged is not None else None
        fmap, pose, res, imap, packed = fusion_step(
            fmap, pts, nrm, colf, valid, pose, intrinsics,
            cached_index_map=imap,
            cached_packed_target=packed,
            height=h, width=w, cfg=cfg,
            do_integrate=(fi % integrate_every == 0),
        )
        poses_dev.append(pose.matrix())
        iters_dev.append(res.iterations)
        if t_first is None:
            t_first = time.perf_counter() - t0
        if on_frame is not None:
            # Drain queued device work so the snapshot fetch isn't charged
            # to the pipeline clock (same discipline as checkpoints).
            np.asarray(fmap.data[0, 0])
            tc = time.perf_counter()
            try:
                on_frame(fi, fmap, pose)
            except Exception as e:  # a viewer must never kill the pipeline
                import sys as _sys

                print(f"[viz.live] on_frame failed at frame {fi}: "
                      f"{type(e).__name__}: {e}", file=_sys.stderr)
            t_ckpt += time.perf_counter() - tc
        if (
            checkpoint_path is not None
            and checkpoint_every is not None
            and (fi - start + 1) % checkpoint_every == 0
        ):
            # Drain the async-dispatched frame work BEFORE starting the
            # checkpoint timer: save_checkpoint's host fetch would otherwise
            # block on queued device compute and charge it to t_ckpt,
            # under-reporting seconds_per_frame. A scalar fetch (not
            # block_until_ready, which returns early on remote-tunnel
            # backends) is the reliable drain.
            np.asarray(fmap.data[0, 0])
            tc = time.perf_counter()
            save_checkpoint(
                checkpoint_path,
                fmap,
                [np.asarray(p) for p in poses_dev],
                fi + 1,
                index_map=imap,
                icp_iterations=[int(i) for i in iters_dev],
            )
            t_ckpt += time.perf_counter() - tc
    # One sync at the end bounds the whole pipeline.
    n_map = int(fmap.num_points())
    total = time.perf_counter() - t0 - t_ckpt
    n_steps = len(depths) - start
    # Report steady-state seconds/frame: the first step's host time is
    # dominated by tracing + XLA compilation (minutes on a cold TPU
    # program), which would otherwise swamp a short sequence's average —
    # the scanned/pipelined drivers warm up before timing for the same
    # reason.
    if n_steps >= 2 and t_first is not None:
        dt = (total - t_first) / (n_steps - 1)
    else:
        dt = total / max(n_steps, 1)
    if checkpoint_path is not None and checkpoint_every is None:
        save_checkpoint(
            checkpoint_path,
            fmap,
            [np.asarray(p) for p in poses_dev],
            len(depths),
            index_map=imap,
            icp_iterations=[int(i) for i in iters_dev],
        )

    return fmap, FusionMetrics(
        poses=[np.asarray(p) for p in poses_dev],
        frames=len(depths),
        seconds_per_frame=dt,
        icp_iterations=[int(i) for i in iters_dev],
        num_map_points=n_map,
    )


def ate_rmse(
    est_poses: Sequence[np.ndarray], gt_poses: Sequence[np.ndarray]
) -> float:
    """Absolute trajectory error (RMSE of positions) after rigid Umeyama
    alignment of the estimated trajectory onto the ground truth."""
    est = np.stack([p[:3, 3] for p in est_poses])
    gt = np.stack([p[:3, 3] for p in gt_poses])
    if len(est) >= 3 and np.linalg.matrix_rank(est - est.mean(0)) >= 2:
        tf, ok = estimate_rigid_point_to_point(
            jnp.asarray(est, jnp.float32), jnp.asarray(gt, jnp.float32)
        )
        if bool(ok):
            est = est @ np.asarray(tf.linear).T + np.asarray(tf.translation)
    return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1))))


# ---------------------------------------------------------------------------
# Synthetic RGBD sequence (self-contained benchmark input).
# ---------------------------------------------------------------------------


def synthetic_sequence(
    num_frames: int,
    h: int,
    w: int,
    intrinsics: CameraIntrinsics,
    *,
    seed: int = 0,
    motion_scale: float = 0.004,
    cache_dir: Optional[str] = None,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Render a wavy-room depth sequence from a smoothly moving camera.

    Returns (depth frames, ground-truth camera-to-world 4×4 poses). The
    scene is a dense height-field point set rendered through a numpy
    z-buffer — data generation stays entirely on the host (no device
    contact) so benchmarks measure the pipeline, not the renderer.

    ``cache_dir``: if given, the rendered stack is memoized to
    ``{cache_dir}/seq_{frames}x{h}x{w}_s{seed}_m{motion}.npz`` and later
    calls with the same key load instead of re-rendering (bench runs under a
    wall budget must not spend it re-rendering identical input).
    """
    cache_path = None
    if cache_dir is not None:
        import os as _os

        _os.makedirs(cache_dir, exist_ok=True)
        _k = "-".join(
            f"{float(np.asarray(v)):g}"
            for v in (intrinsics.fx, intrinsics.fy,
                      intrinsics.cx, intrinsics.cy)
        )
        cache_path = _os.path.join(
            cache_dir,
            f"seq_{num_frames}x{h}x{w}_s{seed}_m{motion_scale:g}_k{_k}.npz",
        )
        if _os.path.exists(cache_path):
            try:
                with np.load(cache_path) as z:
                    return (
                        [d for d in z["depths"]],
                        [p for p in z["poses"]],
                    )
            except Exception:
                pass  # corrupt cache: fall through and re-render
    rng = np.random.default_rng(seed)
    fx = float(np.asarray(intrinsics.fx))
    fy = float(np.asarray(intrinsics.fy))
    cx = float(np.asarray(intrinsics.cx))
    cy = float(np.asarray(intrinsics.cy))

    def render_depth(cam_pts: np.ndarray) -> np.ndarray:
        z = cam_pts[:, 2]
        ok = z > 0
        u = np.round(cam_pts[:, 0] * fx / np.where(ok, z, 1.0) + cx).astype(np.int64)
        v = np.round(cam_pts[:, 1] * fy / np.where(ok, z, 1.0) + cy).astype(np.int64)
        ok &= (u >= 0) & (u < w) & (v >= 0) & (v < h)
        pix = v[ok] * w + u[ok]
        zbuf = np.full(h * w, np.inf, np.float32)
        np.minimum.at(zbuf, pix, z[ok].astype(np.float32))
        return np.where(np.isinf(zbuf), 0.0, zbuf).reshape(h, w)
    # Dense scene: height field over x-y at ~2 m depth, 4 samples per pixel.
    gx, gy = np.meshgrid(
        np.linspace(-1.6, 1.6, 2 * w), np.linspace(-1.2, 1.2, 2 * h)
    )
    gz = (
        2.0
        + 0.25 * np.sin(2.0 * gx) * np.cos(1.5 * gy)
        + 0.05 * np.sin(7.0 * gx)
    )
    scene = np.column_stack(
        [gx.ravel(), gy.ravel(), gz.ravel()]
    ).astype(np.float32)

    depths, poses = [], []
    ang = 0.0
    pos = np.zeros(3)
    vel = rng.standard_normal(3) * motion_scale
    for i in range(num_frames):
        r = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ],
            np.float32,
        )
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = r
        pose[:3, 3] = pos
        poses.append(pose)
        # Render: scene in camera frame = R⁻¹(X − t).
        cam_pts = (scene - pose[:3, 3]) @ r  # (N, 3) @ R = Rᵀ applied rowwise
        dn = render_depth(cam_pts.astype(np.float32))
        # Fill tiny z-buffer holes from the 3×3 neighborhood. grey_dilation
        # is a MAX filter (holes carry 0, so any real neighbor wins); the
        # filled depth is therefore the FARTHEST neighbor, a conservative
        # choice that cannot hallucinate surface in front of the scene.
        holes = dn == 0
        if holes.any():
            from scipy.ndimage import grey_dilation

            filled = grey_dilation(np.where(holes, 0.0, dn), size=3)
            dn = np.where(holes, filled, dn)
        depths.append(dn.astype(np.float32))
        # Smooth random walk.
        ang += rng.standard_normal() * motion_scale
        vel = 0.9 * vel + rng.standard_normal(3) * motion_scale * 0.5
        pos = pos + vel
    if cache_path is not None:
        import os as _os

        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:  # savez on a file object keeps the name
            np.savez(f, depths=np.stack(depths), poses=np.stack(poses))
        _os.replace(tmp, cache_path)
    return depths, poses


def synthetic_panorama_sequence(
    num_frames: int,
    h: int,
    w: int,
    intrinsics: CameraIntrinsics,
    *,
    seed: int = 0,
    sweep_deg: float = 360.0,
    room_radius: float = 2.5,
    depth_noise: float = 0.02,
    cache_dir: Optional[str] = None,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """In-place panorama sweep with DRIFT-INDUCING depth noise — the SLAM
    loop-closure workload (:func:`cilantro_tpu.slam.run_slam`).

    The camera sits at the origin and yaws through ``sweep_deg`` in equal
    steps, viewing a wavy cylindrical room. Each frame's depth is warped by
    a smooth low-frequency random field of relative amplitude
    ``depth_noise``: unlike white noise (which averages out over 10⁵ pixels
    and leaves frame-to-model tracking drift-free), correlated error biases
    each localization by a random ~0.1-0.5° — so odometry accumulates a
    random-walk yaw drift that only a loop closure can remove. Returns
    ``(depths, ground-truth camera-to-world poses)``.
    """
    cache_path = None
    if cache_dir is not None:
        import os as _os

        _os.makedirs(cache_dir, exist_ok=True)
        cache_path = _os.path.join(
            cache_dir,
            f"pano_{num_frames}x{h}x{w}_s{seed}_d{sweep_deg:g}"
            f"_n{depth_noise:g}_r{room_radius:g}.npz",
        )
        if _os.path.exists(cache_path):
            try:
                with np.load(cache_path) as z:
                    return [d for d in z["depths"]], [p for p in z["poses"]]
            except Exception:
                pass
    rng = np.random.default_rng(seed)
    fx = float(np.asarray(intrinsics.fx))
    fy = float(np.asarray(intrinsics.fy))
    cx = float(np.asarray(intrinsics.cx))
    cy = float(np.asarray(intrinsics.cy))

    # Wavy cylindrical room around the origin (dense angular sampling so
    # every view direction sees surface).
    n_th = max(4096, 10 * w)
    n_y = 4 * h
    th = np.linspace(0.0, 2 * np.pi, n_th, endpoint=False)
    yy = np.linspace(-1.4, 1.4, n_y)
    tg, yg = np.meshgrid(th, yy)
    # Feature-rich wall: a random-phase sum of cross-coupled θ/y modes.
    # A smooth cylinder is yaw↔lateral-slide degenerate under
    # partial-overlap ICP (measured: ~0.3 m tangential slide at converged
    # residual), and a REGULAR bump pattern aliases into false minima
    # (measured: a consistent ~11° lock-in offset); integer θ frequencies
    # keep the 2π seam continuous while random phases/mixtures leave one
    # global basin. The texture is a fixed property of the scene (seeded
    # separately from the per-frame noise).
    rng_scene = np.random.default_rng(10_000 + seed)
    r = room_radius + 0.18 * np.sin(3.0 * tg) * np.cos(2.0 * yg)
    for _ in range(16):
        f_th = int(rng_scene.integers(2, 26))
        f_y = float(rng_scene.uniform(0.0, 6.0))
        amp = float(rng_scene.uniform(0.5, 1.0)) * 0.55 / (2.0 + f_th)
        r = r + amp * np.sin(
            f_th * tg + rng_scene.uniform(0, 2 * np.pi)
        ) * np.cos(f_y * yg + rng_scene.uniform(0, 2 * np.pi))
    scene = np.column_stack(
        [(r * np.sin(tg)).ravel(), yg.ravel(), (r * np.cos(tg)).ravel()]
    ).astype(np.float32)

    def render_depth(cam_pts: np.ndarray) -> np.ndarray:
        z = cam_pts[:, 2]
        ok = z > 0.1
        u = np.round(cam_pts[:, 0] * fx / np.where(ok, z, 1.0) + cx).astype(np.int64)
        v = np.round(cam_pts[:, 1] * fy / np.where(ok, z, 1.0) + cy).astype(np.int64)
        ok &= (u >= 0) & (u < w) & (v >= 0) & (v < h)
        pix = v[ok] * w + u[ok]
        zbuf = np.full(h * w, np.inf, np.float32)
        np.minimum.at(zbuf, pix, z[ok].astype(np.float32))
        return np.where(np.isinf(zbuf), 0.0, zbuf).reshape(h, w)

    def smooth_noise() -> np.ndarray:
        coarse = rng.standard_normal((6, 8)).astype(np.float32)
        from scipy.ndimage import zoom

        f = zoom(coarse, (h / 6.0, w / 8.0), order=1)[:h, :w]
        return 1.0 + depth_noise * f

    depths, poses = [], []
    for i in range(num_frames):
        ang = np.deg2rad(sweep_deg) * i / num_frames
        rmat = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ],
            np.float32,
        )
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = rmat
        poses.append(pose)
        cam_pts = scene @ rmat  # camera at origin: Rᵀ · X rowwise
        dn = render_depth(cam_pts.astype(np.float32))
        holes = dn == 0
        if holes.any():
            from scipy.ndimage import grey_dilation

            filled = grey_dilation(np.where(holes, 0.0, dn), size=3)
            dn = np.where(holes, filled, dn)
        depths.append((dn * smooth_noise()).astype(np.float32))
    if cache_path is not None:
        import os as _os

        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, depths=np.stack(depths), poses=np.stack(poses))
        _os.replace(tmp, cache_path)
    return depths, poses


def run_fusion_sequence_scanned(
    depths: Sequence[np.ndarray],
    intrinsics: CameraIntrinsics,
    *,
    map_capacity: Optional[int] = None,
    cfg: FusionConfig = FusionConfig(),
) -> Tuple[FusionMap, FusionMetrics]:
    """Whole-sequence fusion as ONE jitted ``lax.scan`` program.

    The per-frame host loop of :func:`run_fusion_sequence` pays a dispatch
    round trip per frame (expensive over a remote-tunnel chip; cheap but
    nonzero anywhere). Here the full sequence — depth conversion, localize,
    integrate, per-frame poses — is a single XLA computation over the stacked
    depth stack; the host is involved exactly once.
    """
    from functools import partial as _partial

    from .fusion import fusion_step

    h, w = depths[0].shape
    if map_capacity is None:
        map_capacity = 4 * h * w

    pts, nrm, valid = depth_to_points_normals(jnp.asarray(depths[0]), intrinsics)
    fmap0 = init_map_from_frame(map_capacity, pts, nrm, None, valid)
    if len(depths) == 1:  # nothing to track: the seeded map is the result
        return fmap0, FusionMetrics(
            poses=[np.eye(4, dtype=np.float32)],
            frames=1,
            seconds_per_frame=0.0,
            icp_iterations=[0],
            num_map_points=int(fmap0.num_points()),
        )

    depth_stack = jnp.asarray(np.stack(depths[1:]))  # (F-1, H, W)

    @_partial(jax.jit, static_argnames=())
    def run(fmap0, depth_stack):
        from .fusion import seed_localize_target

        pose0 = identity(3)
        # Initial packed localize target from the seed render (thereafter
        # each integrate emits the next one for free).
        imap0, packed0 = seed_localize_target(fmap0, pose0, intrinsics, h, w)

        def step(carry, depth):
            fmap, pose, imap, packed = carry
            p, n, v = depth_to_points_normals(depth, intrinsics)
            fmap, pose, res, imap, packed = fusion_step(
                fmap, p, n, None, v, pose, intrinsics,
                cached_index_map=imap, cached_packed_target=packed,
                height=h, width=w, cfg=cfg,
            )
            return (fmap, pose, imap, packed), (pose.matrix(), res.iterations)

        (fmap, pose, _, _), (mats, iters) = jax.lax.scan(
            step, (fmap0, pose0, imap0, packed0), depth_stack
        )
        return fmap, mats, iters

    # Warm (compile) once — with a hard drain (block_until_ready returns
    # early on the remote-tunnel backend) — then time best-of-3: the tunnel
    # shows transient multi-second stalls (and background prewarm compiles
    # once perturbed a sample) — a single sample would hand the headline
    # row to one.
    fmap, mats, iters = run(fmap0, depth_stack)
    n_map = int(fmap.num_points())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fmap, mats, iters = run(fmap0, depth_stack)
        n_map = int(fmap.num_points())
        best = min(best, time.perf_counter() - t0)
    dt = best / max(len(depths) - 1, 1)

    mats_np = np.asarray(mats)
    poses = [np.eye(4, dtype=np.float32)] + [m for m in mats_np]
    return fmap, FusionMetrics(
        poses=poses,
        frames=len(depths),
        seconds_per_frame=dt,
        icp_iterations=[0] + [int(i) for i in np.asarray(iters)],
        num_map_points=n_map,
    )
