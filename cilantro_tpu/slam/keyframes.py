"""Keyframe SLAM: fusion tracking + pose-graph backend + landmark BA.

Beyond-reference subsystem (BASELINE config #5: "multi-keyframe RGBD fusion
with pose-graph + distributed Schur-complement BA"). The front end is the
fusion tracker (:mod:`cilantro_tpu.slam.fusion`); this module adds:

* keyframe spawning every N frames, storing the pose and a subsampled frame
  cloud per keyframe;
* sequential odometry edges between consecutive keyframes, plus loop-closure
  edges: a new keyframe whose pose is near an old non-adjacent keyframe is
  registered against it directly (multires ICP) and an edge is added;
* backend refinement: pose-graph GN over the keyframe poses
  (:func:`optimize_pose_graph`), optionally followed by landmark BA — map
  points observed in multiple keyframes refined with the Schur solver
  (:func:`bundle_adjust` / the sharded variant on a mesh).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.transforms import Transform
from .pose_graph import optimize_pose_graph


@dataclasses.dataclass
class Keyframe:
    index: int  # frame index in the sequence
    pose: np.ndarray  # (4, 4) camera-to-world at spawn time
    points: np.ndarray  # (S, 3) subsampled frame points (camera frame)
    normals: Optional[np.ndarray]


@dataclasses.dataclass
class KeyframeGraph:
    keyframes: List[Keyframe]
    edge_i: List[int]
    edge_j: List[int]
    measurements: List[np.ndarray]  # (4, 4) relative transforms Z_ij
    edge_weights: List[float]

    @staticmethod
    def empty() -> "KeyframeGraph":
        return KeyframeGraph([], [], [], [], [])

    def add_keyframe(self, kf: Keyframe) -> int:
        self.keyframes.append(kf)
        return len(self.keyframes) - 1

    def add_edge(self, i: int, j: int, z: np.ndarray, weight: float = 1.0):
        self.edge_i.append(i)
        self.edge_j.append(j)
        self.measurements.append(z)
        self.edge_weights.append(weight)

    def optimize(
        self, max_iterations: int = 20
    ) -> Tuple[List[np.ndarray], float]:
        """Pose-graph GN over the stored keyframe poses. Returns the refined
        (4, 4) poses and the final update norm."""
        k = len(self.keyframes)
        poses = Transform(
            jnp.asarray(
                np.stack([kf.pose[:3, :3] for kf in self.keyframes]),
                jnp.float32,
            ),
            jnp.asarray(
                np.stack([kf.pose[:3, 3] for kf in self.keyframes]), jnp.float32
            ),
        )
        meas = Transform(
            jnp.asarray(np.stack([z[:3, :3] for z in self.measurements]), jnp.float32),
            jnp.asarray(np.stack([z[:3, 3] for z in self.measurements]), jnp.float32),
        )
        opt, dn = optimize_pose_graph(
            poses,
            jnp.asarray(np.array(self.edge_i, np.int32)),
            jnp.asarray(np.array(self.edge_j, np.int32)),
            meas,
            edge_weights=jnp.asarray(np.array(self.edge_weights, np.float32)),
            max_iterations=max_iterations,
        )
        out = []
        lin = np.asarray(opt.linear)
        tr = np.asarray(opt.translation)
        for i in range(k):
            p = np.eye(4, dtype=np.float32)
            p[:3, :3] = lin[i]
            p[:3, 3] = tr[i]
            out.append(p)
        return out, float(dn)


def relative_pose(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Z_ab = a⁻¹ b."""
    return np.linalg.inv(a) @ b


def spawn_keyframe(
    graph: KeyframeGraph,
    frame_index: int,
    pose: np.ndarray,
    points: np.ndarray,
    normals: Optional[np.ndarray],
    valid: Optional[np.ndarray] = None,
    subsample: int = 4096,
) -> int:
    """Record a keyframe (subsampled frame cloud) and the odometry edge from
    the previous keyframe."""
    pts = points if valid is None else points[valid]
    nrm = (
        None
        if normals is None
        else (normals if valid is None else normals[valid])
    )
    # EXACTLY min(subsample, len) rows via even selection: keyframe clouds
    # then share one static shape, so the loop-closure ICP program compiles
    # once per run instead of once per (valid-count) pair.
    sel = np.linspace(
        0, len(pts) - 1, min(subsample, len(pts))
    ).astype(np.int64)
    kf = Keyframe(
        index=frame_index,
        pose=pose.copy(),
        points=np.asarray(pts[sel], np.float32),
        normals=None if nrm is None else np.asarray(nrm[sel], np.float32),
    )
    kid = graph.add_keyframe(kf)
    if kid > 0:
        prev = graph.keyframes[kid - 1]
        graph.add_edge(kid - 1, kid, relative_pose(prev.pose, pose))
    return kid


def detect_loop_closures(
    graph: KeyframeGraph,
    *,
    min_separation: int = 3,
    max_translation: float = 0.3,
    max_rotation_deg: Optional[float] = None,
    icp_max_corr_dist_sq: float = 0.01,
    icp_levels: Optional[tuple] = None,
    convergence_tol: float = 1e-5,  # icp_multires' default (unchanged behavior)
    weight: float = 1.0,
) -> int:
    """Register spatially-close, temporally-distant keyframe pairs with
    multires ICP and add loop-closure edges. Returns #edges added.

    ``max_rotation_deg`` additionally gates candidate pairs on relative
    orientation — essential for rotation-dominant trajectories (an in-place
    panorama sweep keeps every keyframe within ``max_translation`` of every
    other, and without the orientation gate the candidate set is all
    O(K²) pairs, most with zero view overlap)."""
    from ..registration import icp_multires

    added = 0
    k = len(graph.keyframes)
    existing = set(zip(graph.edge_i, graph.edge_j))
    for j in range(k):
        # i ranges over keyframes separated from j by AT LEAST
        # min_separation (j - i >= min_separation), inclusive; i < j always,
        # so min_separation=0 cannot register a keyframe against itself.
        for i in range(min(j, j - min_separation + 1)):
            if (i, j) in existing:
                continue
            a, b = graph.keyframes[i], graph.keyframes[j]
            if (
                np.linalg.norm(a.pose[:3, 3] - b.pose[:3, 3])
                > max_translation
            ):
                continue
            if max_rotation_deg is not None:
                rel = a.pose[:3, :3].T @ b.pose[:3, :3]
                ang = np.degrees(
                    np.arccos(np.clip((np.trace(rel) - 1.0) / 2.0, -1.0, 1.0))
                )
                if ang > max_rotation_deg:
                    continue
            # Register frame j onto frame i in i's camera frame; initial
            # guess from current pose estimates.
            z0 = relative_pose(a.pose, b.pose)
            init = Transform(
                jnp.asarray(z0[:3, :3]), jnp.asarray(z0[:3, 3])
            )
            levels = icp_levels
            if levels is None:
                levels = (
                    (0.04, 6, 8192, 0.01),
                    (None, 4, None, icp_max_corr_dist_sq),
                )
            res = icp_multires(
                jnp.asarray(b.points),
                jnp.asarray(a.points),
                src_normals=None if b.normals is None else jnp.asarray(b.normals),
                dst_normals=None if a.normals is None else jnp.asarray(a.normals),
                init=init,
                levels=levels,
                convergence_tol=convergence_tol,
                metric="combined" if a.normals is not None else "point_to_point",
            )
            z = np.eye(4, dtype=np.float32)
            z[:3, :3] = np.asarray(res.transform.linear)
            z[:3, 3] = np.asarray(res.transform.translation)
            graph.add_edge(i, j, z, weight)
            added += 1
    return added
