"""Keyframe graph: odometry chain + loop closure reduces drift."""

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.slam import (
    KeyframeGraph,
    detect_loop_closures,
    relative_pose,
    spawn_keyframe,
)


def rot_z(a):
    return np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
        np.float32,
    )


def test_loop_closure_corrects_drift(rng):
    # Square loop: 8 keyframes around a loop, odometry with accumulated
    # drift; the final keyframe revisits the start.
    n_kf = 9  # 8 steps around the loop + return to start
    true_poses = []
    for i in range(n_kf):
        a = 2 * np.pi * i / (n_kf - 1)
        p = np.eye(4, dtype=np.float32)
        p[:3, :3] = rot_z(a)
        p[:3, 3] = [np.cos(a) - 1.0, np.sin(a), 0.0]
        true_poses.append(p)

    # A shared scene cloud (viewed from each keyframe's camera frame).
    scene = rng.uniform(-1, 1, (4000, 3)).astype(np.float32)
    scene[:, 2] = 0.3 * np.sin(3 * scene[:, 0]) * np.cos(2 * scene[:, 1]) + 3.0

    graph = KeyframeGraph.empty()
    drift = np.eye(4, dtype=np.float32)
    est_poses = []
    for i, tp in enumerate(true_poses):
        # Odometry drift: small error accumulating each step.
        if i > 0:
            d = np.eye(4, dtype=np.float32)
            d[:3, :3] = rot_z(0.01)
            d[:3, 3] = [0.01, -0.005, 0.0]
            drift = drift @ d
        est = (tp @ drift).astype(np.float32)
        est_poses.append(est)
        cam_pts = (scene - tp[:3, 3]) @ tp[:3, :3]  # camera frame via Rᵀ
        spawn_keyframe(graph, i, est, cam_pts, None, subsample=2000)

    # Drift before: last keyframe should be near the 2π rotation of start.
    err_before = np.linalg.norm(
        est_poses[-1][:3, 3] - true_poses[-1][:3, 3]
    )
    assert err_before > 0.02  # drift exists

    # Loop closure: keyframe 7 is spatially near keyframe 0.
    added = detect_loop_closures(
        graph, min_separation=3, max_translation=0.6,
        icp_max_corr_dist_sq=0.25,
    )
    assert added >= 1

    refined, _ = graph.optimize(max_iterations=25)
    err_after = np.linalg.norm(refined[-1][:3, 3] - true_poses[-1][:3, 3])
    assert err_after < err_before * 0.5, (err_before, err_after)


def test_relative_pose_roundtrip(rng):
    a = np.eye(4, dtype=np.float32)
    a[:3, :3] = rot_z(0.3)
    a[:3, 3] = rng.standard_normal(3)
    b = np.eye(4, dtype=np.float32)
    b[:3, :3] = rot_z(-0.2)
    b[:3, 3] = rng.standard_normal(3)
    z = relative_pose(a, b)
    np.testing.assert_allclose(a @ z, b, atol=1e-5)


def test_loop_closure_min_separation_inclusive(rng):
    # A pair separated by EXACTLY min_separation qualifies (j - i >= sep).
    from cilantro_tpu.slam import KeyframeGraph

    scene = rng.uniform(-1, 1, (4000, 3)).astype(np.float32)
    scene[:, 2] = 0.3 * np.sin(3 * scene[:, 0]) + 3.0
    graph = KeyframeGraph.empty()
    for i in range(4):
        spawn_keyframe(
            graph, i, np.eye(4, dtype=np.float32), scene, None,
            subsample=2000,
        )
    detect_loop_closures(
        graph, min_separation=3, max_translation=0.5,
        icp_max_corr_dist_sq=0.25,
    )
    assert (0, 3) in set(zip(graph.edge_i, graph.edge_j))


def test_loop_closure_never_self_pairs(rng):
    # min_separation=0 must not ICP a keyframe against itself.
    from cilantro_tpu.slam import KeyframeGraph

    scene = rng.uniform(-1, 1, (3000, 3)).astype(np.float32)
    scene[:, 2] += 3.0
    graph = KeyframeGraph.empty()
    for i in range(3):
        spawn_keyframe(
            graph, i, np.eye(4, dtype=np.float32), scene, None,
            subsample=1500,
        )
    detect_loop_closures(
        graph, min_separation=0, max_translation=0.5,
        icp_max_corr_dist_sq=0.25,
    )
    assert all(i < j for i, j in zip(graph.edge_i, graph.edge_j))
