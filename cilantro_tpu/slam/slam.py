"""End-to-end SLAM: fusion odometry → keyframes → loop closure →
pose-graph (+ optional landmark BA) → map rewrite.

The reference's fusion app is the front half of this loop only
(``/root/reference/examples/fusion.cpp:125-254``: frame-to-model tracking +
fuse/augment/carve, no keyframes, no backend). This driver is the BASELINE
north-star extension: the fusion front end provides odometry and spawns
keyframes (:mod:`.keyframes`); spatially-revisiting keyframes are
registered directly (loop closures); the pose graph (and optionally a
Schur-complement landmark BA, :mod:`.bundle_adjustment`) redistributes the
accumulated drift; and the map is REBUILT by re-integrating every frame at
its corrected pose — so the output is a drift-corrected
:class:`~cilantro_tpu.slam.fusion.FusionMap`, not just a trajectory.

Design notes (TPU): the per-frame front end reuses the jitted
``fusion_step`` programs of :func:`..slam.driver.run_fusion_sequence`; the
backend graph is tiny (host numpy + small jitted GN programs); the map
rewrite reuses the jitted :func:`..slam.fusion.integrate_frame` program at
fixed poses (no localization).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.rgbd import CameraIntrinsics, depth_to_points_normals
from ..core.transforms import Transform, from_matrix
from .driver import FusionMetrics, run_fusion_sequence
from .fusion import FusionConfig, FusionMap, init_map_from_frame, integrate_frame
from .keyframes import KeyframeGraph, detect_loop_closures, spawn_keyframe


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    """Backend knobs on top of :class:`FusionConfig`."""

    keyframe_every: int = 4  # spawn a keyframe every N frames
    keyframe_subsample: int = 4096  # points kept per keyframe cloud
    loop_min_separation: int = 3  # keyframes, temporal gate
    loop_max_translation: float = 0.5  # m, spatial gate
    loop_max_rotation_deg: Optional[float] = 30.0  # orientation gate: only
    # high-view-overlap revisits — low-overlap pairs drag partial-overlap
    # ICP toward non-overlap false matches (measured on the panorama
    # workload: a 40° offset pair converged ~10° off; a 10-15° offset pair
    # locks to ~1°)
    loop_icp_max_corr_dist_sq: float = 0.0025
    # Coarse-to-fine schedule sized for several degrees of accumulated
    # drift: generous coarse gate to capture, tight final gate to reject
    # non-overlap drag, big iteration budgets (partial-overlap basins
    # need them — measured 2.5° residual at the 8/6/4 budgets vs 1.3°
    # converged at 20/15/10).
    loop_icp_levels: tuple = (
        (0.04, 20, 8192, 0.04),
        (0.01, 15, 8192, 0.0064),
        (None, 10, None, 0.0025),
    )
    pose_graph_iterations: int = 25
    loop_edge_weight: float = 5.0  # loop edges trusted over drifted odometry
    # (measured on the panorama workload: w=5 roughly halves endpoint error
    # vs w=2 at unchanged mid-sequence quality)
    run_ba: bool = False  # refine with landmark BA after the pose graph
    ba_match_dist: float = 0.08  # m, landmark association gate
    ba_max_landmarks_per_edge: int = 512
    # Optional jax.sharding.Mesh: landmark-partitioned Schur BA over a
    # device mesh (bundle_adjust_sharded) — the BASELINE north star's
    # distributed backend inside the same loop. None = single device.
    ba_mesh: Optional[object] = None
    rebuild_map: bool = True  # re-integrate all frames at corrected poses


@dataclasses.dataclass
class SlamResult:
    odometry_poses: List[np.ndarray]  # (4,4) per frame, front-end only
    refined_poses: List[np.ndarray]  # (4,4) per frame, after the backend
    keyframe_indices: List[int]
    num_loop_closures: int
    pose_graph_update: float  # final GN update norm
    metrics: FusionMetrics  # front-end fusion metrics


def _unproject_host(
    depth: np.ndarray, intrinsics: CameraIntrinsics
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side organized unprojection (keyframe clouds only — the hot
    per-frame path unprojects on device via depth_to_points_normals)."""
    h, w = depth.shape
    fx = float(np.asarray(intrinsics.fx))
    fy = float(np.asarray(intrinsics.fy))
    cx = float(np.asarray(intrinsics.cx))
    cy = float(np.asarray(intrinsics.cy))
    us, vs = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    z = depth.astype(np.float32)
    pts = np.stack(
        [(us - cx) / fx * z, (vs - cy) / fy * z, z], axis=-1
    ).reshape(-1, 3)
    return pts, (z > 0).reshape(-1)


def _propagate_correction(
    odometry: List[np.ndarray],
    kf_indices: List[int],
    kf_refined: List[np.ndarray],
) -> List[np.ndarray]:
    """Anchor every frame to its nearest preceding keyframe: the refined
    frame pose composes the keyframe's correction with the frame's odometry
    increment since that keyframe (standard pose-graph back-propagation)."""
    out = []
    ki = 0
    for f, odo in enumerate(odometry):
        while ki + 1 < len(kf_indices) and kf_indices[ki + 1] <= f:
            ki += 1
        anchor = kf_indices[ki]
        rel = np.linalg.inv(odometry[anchor]) @ odo
        out.append((kf_refined[ki] @ rel).astype(np.float32))
    return out


def _refine_ba(
    graph: KeyframeGraph,
    refined: List[np.ndarray],
    cfg: SlamConfig,
) -> List[np.ndarray]:
    """Landmark BA over the keyframe graph: landmarks are NN-associated
    point pairs along every graph edge (odometry + loop), observed in both
    cameras; poses and landmarks refined jointly with the Schur solver."""
    from ..neighbors import nn1
    from .bundle_adjustment import bundle_adjust

    rng = np.random.default_rng(0)
    cam_idx, lmk_idx, obs, lmks = [], [], [], []
    for i, j in zip(graph.edge_i, graph.edge_j):
        a, b = graph.keyframes[i], graph.keyframes[j]
        pa, pb = refined[i], refined[j]
        wa = a.points @ pa[:3, :3].T + pa[:3, 3]
        wb = b.points @ pb[:3, :3].T + pb[:3, 3]
        d, idx = nn1(jnp.asarray(wb), jnp.asarray(wa))
        d, idx = np.asarray(d), np.asarray(idx)
        ok = np.flatnonzero(d <= cfg.ba_match_dist**2)
        if len(ok) == 0:
            continue
        if len(ok) > cfg.ba_max_landmarks_per_edge:
            ok = rng.choice(ok, cfg.ba_max_landmarks_per_edge, replace=False)
        base = len(lmks)
        lmks.extend(0.5 * (wb[ok] + wa[idx[ok]]))
        ids = base + np.arange(len(ok))
        cam_idx.extend([j] * len(ok))
        lmk_idx.extend(ids)
        obs.extend(b.points[ok])
        cam_idx.extend([i] * len(ok))
        lmk_idx.extend(ids)
        obs.extend(a.points[idx[ok]])
    if not lmks:
        return refined
    poses0 = Transform(
        jnp.asarray(np.stack([p[:3, :3] for p in refined]), jnp.float32),
        jnp.asarray(np.stack([p[:3, 3] for p in refined]), jnp.float32),
    )
    lmks = np.asarray(lmks, np.float32)
    cam_idx = np.asarray(cam_idx, np.int32)
    lmk_idx = np.asarray(lmk_idx, np.int32)
    obs = np.asarray(obs, np.float32)
    if cfg.ba_mesh is not None:
        from .bundle_adjustment import bundle_adjust_sharded

        d_sh = int(cfg.ba_mesh.size)
        # Pad to a shard-divisible landmark count; every landmark here has
        # exactly 2 observations, so landmark-sorted observations split
        # into equal per-shard blocks (pad landmarks get 2 invalid obs).
        l0 = len(lmks)
        l_pad = -(-l0 // d_sh) * d_sh
        if l_pad > l0:
            lmks = np.concatenate(
                [lmks, np.zeros((l_pad - l0, 3), np.float32)]
            )
            extra = l_pad - l0
            cam_idx = np.concatenate(
                [cam_idx, np.zeros(2 * extra, np.int32)]
            )
            lmk_idx = np.concatenate(
                [lmk_idx, np.repeat(np.arange(l0, l_pad), 2)]
            ).astype(np.int32)
            obs = np.concatenate(
                [obs, np.zeros((2 * extra, 3), np.float32)]
            )
        valid = np.concatenate(
            [np.ones(2 * l0, bool), np.zeros(2 * (l_pad - l0), bool)]
        )
        lp = l_pad // d_sh
        order = np.argsort(lmk_idx // lp, kind="stable")
        new_poses, _, _ = bundle_adjust_sharded(
            poses0,
            jnp.asarray(lmks),
            jnp.asarray(cam_idx[order]),
            jnp.asarray((lmk_idx[order] % lp).astype(np.int32)),
            jnp.asarray(obs[order]),
            jnp.asarray(valid[order]),
            mesh=cfg.ba_mesh,
        )
    else:
        new_poses, _, _ = bundle_adjust(
            poses0,
            jnp.asarray(lmks),
            jnp.asarray(cam_idx),
            jnp.asarray(lmk_idx),
            jnp.asarray(obs),
        )
    lin = np.asarray(new_poses.linear)
    tr = np.asarray(new_poses.translation)
    out = []
    for i in range(len(refined)):
        p = np.eye(4, dtype=np.float32)
        p[:3, :3] = lin[i]
        p[:3, 3] = tr[i]
        out.append(p)
    return out


def integrate_sequence(
    depths: Sequence[np.ndarray],
    poses: Sequence[np.ndarray],  # (4,4) camera-to-world per frame, FIXED
    intrinsics: CameraIntrinsics,
    *,
    map_capacity: Optional[int] = None,
    cfg: FusionConfig = FusionConfig(),
) -> FusionMap:
    """Map (re)construction at known poses: seed from frame 0, then
    fuse/augment/carve every later frame — localization skipped entirely
    (the backend already fixed the trajectory)."""
    h, w = depths[0].shape
    if map_capacity is None:
        map_capacity = 4 * h * w
    pts, nrm, valid = depth_to_points_normals(
        jnp.asarray(depths[0]), intrinsics
    )
    fmap = init_map_from_frame(
        map_capacity, pts, nrm, None, valid,
        pose=from_matrix(jnp.asarray(poses[0])),
    )
    for fi in range(1, len(depths)):
        pts, nrm, valid = depth_to_points_normals(
            jnp.asarray(depths[fi]), intrinsics
        )
        fmap = integrate_frame(
            fmap, pts, nrm, None, valid,
            from_matrix(jnp.asarray(poses[fi])), intrinsics,
            height=h, width=w, cfg=cfg,
        )
    return fmap


def run_slam(
    depths: Sequence[np.ndarray],
    intrinsics: CameraIntrinsics,
    *,
    map_capacity: Optional[int] = None,
    cfg: FusionConfig = FusionConfig(),
    slam: SlamConfig = SlamConfig(),
    frontend: str = "loop",
) -> Tuple[FusionMap, SlamResult]:
    """The full loop: fusion odometry → keyframes → loop closure →
    pose graph (+ optional BA) → corrected trajectory → rebuilt map.

    Returns ``(map, result)`` where ``map`` is integrated at the CORRECTED
    poses when ``slam.rebuild_map`` (the odometry map otherwise) and
    ``result`` carries both trajectories so callers can report ATE
    before/after backend correction.
    """
    h, w = depths[0].shape
    # 1. Front end (odometry + keyframe spawning from the estimated poses).
    # ``frontend="scanned"`` runs the whole odometry pass as ONE jitted
    # lax.scan (one compile, one dispatch — the bench-friendly shape);
    # "loop" is the per-frame host loop (checkpointing, integrate_every).
    if frontend == "scanned":
        from .driver import run_fusion_sequence_scanned

        fmap_odo, metrics = run_fusion_sequence_scanned(
            depths, intrinsics, map_capacity=map_capacity, cfg=cfg
        )
    else:
        fmap_odo, metrics = run_fusion_sequence(
            depths, intrinsics, map_capacity=map_capacity, cfg=cfg
        )
    odometry = [np.asarray(p, np.float32) for p in metrics.poses]

    graph = KeyframeGraph.empty()
    kf_indices: List[int] = []
    for f in range(0, len(depths), slam.keyframe_every):
        # Device unprojection WITH normals: the loop-closure ICP then runs
        # the combined metric, which registers noticeably tighter than
        # point-to-point on partial-overlap revisits.
        pts_d, nrm_d, valid_d = depth_to_points_normals(
            jnp.asarray(depths[f]), intrinsics
        )
        spawn_keyframe(
            graph, f, odometry[f],
            np.asarray(pts_d), np.asarray(nrm_d),
            valid=np.asarray(valid_d),
            subsample=slam.keyframe_subsample,
        )
        kf_indices.append(f)

    # 2. Loop closures: temporally-distant, spatially-near keyframe pairs
    # re-registered with multires ICP.
    n_loops = detect_loop_closures(
        graph,
        min_separation=slam.loop_min_separation,
        max_translation=slam.loop_max_translation,
        max_rotation_deg=slam.loop_max_rotation_deg,
        icp_max_corr_dist_sq=slam.loop_icp_max_corr_dist_sq,
        icp_levels=slam.loop_icp_levels,
        convergence_tol=1e-5,
        weight=slam.loop_edge_weight,
    )

    # 3. Backend: pose-graph GN over keyframes, correction propagated to
    # every frame; optional landmark BA polish.
    if n_loops > 0:
        kf_refined, upd = graph.optimize(
            max_iterations=slam.pose_graph_iterations
        )
    else:  # nothing to correct against — keep odometry
        kf_refined, upd = [kf.pose for kf in graph.keyframes], 0.0
    if slam.run_ba and n_loops > 0:
        kf_refined = _refine_ba(graph, kf_refined, slam)
    refined = _propagate_correction(odometry, kf_indices, kf_refined)

    # 4. Map rewrite at the corrected trajectory.
    fmap = (
        integrate_sequence(
            depths, refined, intrinsics,
            map_capacity=map_capacity, cfg=cfg,
        )
        if slam.rebuild_map and n_loops > 0
        else fmap_odo
    )
    return fmap, SlamResult(
        odometry_poses=odometry,
        refined_poses=refined,
        keyframe_indices=kf_indices,
        num_loop_closures=n_loops,
        pose_graph_update=float(upd),
        metrics=metrics,
    )
