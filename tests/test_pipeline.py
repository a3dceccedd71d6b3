"""Two-stage pipeline-parallel fusion on the CPU virtual mesh: numerical
agreement with the sequential scanned driver."""

import numpy as np
import jax

from cilantro_tpu.core.rgbd import CameraIntrinsics
from cilantro_tpu.slam import (
    FusionConfig,
    ate_rmse,
    make_pipeline_mesh,
    run_fusion_sequence_pipelined,
    synthetic_sequence,
)
from cilantro_tpu.slam.driver import run_fusion_sequence_scanned

K = CameraIntrinsics.make(100.0, 100.0, 31.5, 23.5)
H, W = 48, 64


def test_pipelined_matches_scanned():
    depths, gt = synthetic_sequence(6, H, W, K, seed=3)
    cfg = FusionConfig()
    cap = 2 * H * W

    fmap_s, met_s = run_fusion_sequence_scanned(
        depths, K, map_capacity=cap, cfg=cfg
    )
    mesh = make_pipeline_mesh(jax.devices()[:2])
    fmap_p, met_p = run_fusion_sequence_pipelined(
        depths, K, mesh=mesh, map_capacity=cap, cfg=cfg
    )

    assert len(met_p.poses) == len(met_s.poses)
    for a, b in zip(met_s.poses, met_p.poses):
        np.testing.assert_allclose(a, b, atol=1e-5)
    assert met_p.icp_iterations == met_s.icp_iterations
    # Same map contents (same ops in the same order on stage 1).
    np.testing.assert_allclose(
        np.asarray(fmap_s.data), np.asarray(fmap_p.data), atol=1e-5
    )
    # And the trajectory is actually good, not just consistent.
    assert ate_rmse(met_p.poses, gt) < 5e-3


def test_pipeline_mesh_requires_two_devices():
    import pytest

    with pytest.raises(ValueError):
        make_pipeline_mesh(jax.devices()[:1])


def test_pipelined_single_frame():
    from cilantro_tpu.core import CameraIntrinsics
    from cilantro_tpu.slam import synthetic_sequence
    from cilantro_tpu.slam.pipeline import run_fusion_sequence_pipelined

    k = CameraIntrinsics.make(100.0, 100.0, 31.5, 23.5)
    depths, _ = synthetic_sequence(1, 48, 64, k, seed=0)
    fmap, m = run_fusion_sequence_pipelined(depths, k)
    assert m.frames == 1 and len(m.poses) == 1
    assert m.num_map_points > 0
