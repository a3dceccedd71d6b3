"""Checkpoint/resume: kill-and-resume must reproduce the trajectory tail
bit-identically (SURVEY §5 checkpoint plan)."""

import numpy as np

from cilantro_tpu.core.rgbd import CameraIntrinsics
from cilantro_tpu.slam import (
    load_checkpoint,
    run_fusion_sequence,
    save_checkpoint,
    synthetic_sequence,
)

K = CameraIntrinsics.make(100.0, 100.0, 31.5, 23.5)
H, W = 48, 64


def test_kill_and_resume_bit_identical(tmp_path):
    depths, _ = synthetic_sequence(8, H, W, K, seed=3)
    ckpt = str(tmp_path / "ck.npz")

    # Uninterrupted run.
    _, met_full = run_fusion_sequence(depths, K)

    # Run the first half, checkpointing after frame 4; then resume.
    _, met_a = run_fusion_sequence(
        depths[:5], K, checkpoint_path=ckpt
    )
    _, met_b = run_fusion_sequence(depths, K, resume_from=ckpt)

    assert len(met_b.poses) == len(met_full.poses)
    for i, (pa, pb) in enumerate(zip(met_full.poses, met_b.poses)):
        np.testing.assert_array_equal(pa, pb, err_msg=f"frame {i}")


def test_checkpoint_roundtrip_fields(tmp_path):
    depths, _ = synthetic_sequence(3, H, W, K, seed=4)
    ckpt = str(tmp_path / "ck.npz")
    fmap, met = run_fusion_sequence(depths, K, checkpoint_path=ckpt)
    ck = load_checkpoint(ckpt)
    np.testing.assert_array_equal(ck.map_data, np.asarray(fmap.data))
    assert ck.next_frame == 3
    assert len(ck.poses) == 3
    assert ck.index_map is not None and ck.index_map.shape == (H, W)


def test_checkpoint_keyframe_graph(tmp_path):
    from cilantro_tpu.slam import Keyframe, KeyframeGraph
    from cilantro_tpu.slam.fusion import empty_map

    g = KeyframeGraph.empty()
    rng = np.random.default_rng(0)
    for i in range(3):
        g.add_keyframe(
            Keyframe(
                index=i * 5,
                pose=np.eye(4, dtype=np.float32),
                points=rng.standard_normal((20, 3)).astype(np.float32),
                normals=None if i == 1 else rng.standard_normal((20, 3)).astype(np.float32),
            )
        )
    g.add_edge(0, 1, np.eye(4, dtype=np.float32), 2.0)
    p = str(tmp_path / "g.npz")
    save_checkpoint(p, empty_map(64), [np.eye(4, dtype=np.float32)], 1, graph=g)
    ck = load_checkpoint(p)
    assert len(ck.graph.keyframes) == 3
    assert ck.graph.keyframes[1].normals is None
    assert ck.graph.keyframes[2].normals is not None
    assert ck.graph.edge_i == [0] and ck.graph.edge_weights == [2.0]
    np.testing.assert_array_equal(
        ck.graph.keyframes[0].points, g.keyframes[0].points
    )
