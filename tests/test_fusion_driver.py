"""End-to-end fusion driver: synthetic sequence, ATE vs ground truth."""

import numpy as np

from cilantro_tpu.core import CameraIntrinsics
from cilantro_tpu.slam import ate_rmse, run_fusion_sequence, synthetic_sequence


def test_sequence_ate_small():
    k = CameraIntrinsics.make(120.0, 120.0, 63.5, 47.5)
    h, w = 96, 128
    depths, gt = synthetic_sequence(8, h, w, k, seed=0)
    fmap, metrics = run_fusion_sequence(depths, k, map_capacity=6 * h * w)
    assert metrics.frames == 8
    err = ate_rmse(metrics.poses, gt)
    # Camera moves ~4 mm/frame; trajectory must track well under that.
    assert err < 0.01, f"ATE {err}"
    assert metrics.num_map_points > h * w * 0.5


def test_ate_alignment_invariance():
    # ATE of an exactly-shifted trajectory is ~0 after alignment.
    gt = []
    est = []
    rng = np.random.default_rng(0)
    shift = np.float32([1.0, -2.0, 0.5])
    for i in range(10):
        p = np.eye(4, dtype=np.float32)
        p[:3, 3] = rng.standard_normal(3)
        gt.append(p)
        q = p.copy()
        q[:3, 3] += shift
        est.append(q)
    assert ate_rmse(est, gt) < 1e-4


def test_scanned_sequence_matches_loop():
    from cilantro_tpu.slam import run_fusion_sequence_scanned

    k = CameraIntrinsics.make(120.0, 120.0, 63.5, 47.5)
    h, w = 96, 128
    depths, gt = synthetic_sequence(6, h, w, k, seed=0)
    _, m_loop = run_fusion_sequence(depths, k, map_capacity=4 * h * w)
    _, m_scan = run_fusion_sequence_scanned(depths, k, map_capacity=4 * h * w)
    err = ate_rmse(m_scan.poses, gt)
    assert err < 0.01
    # Same pipeline, same trajectory (up to float noise).
    a = np.stack(m_loop.poses)
    b = np.stack(m_scan.poses)
    assert np.abs(a - b).max() < 1e-4


def test_scanned_with_localize_stride():
    from cilantro_tpu.slam import run_fusion_sequence_scanned
    from cilantro_tpu.slam.fusion import FusionConfig

    k = CameraIntrinsics.make(120.0, 120.0, 63.5, 47.5)
    h, w = 96, 128
    depths, gt = synthetic_sequence(6, h, w, k, seed=0)
    _, m = run_fusion_sequence_scanned(
        depths, k, map_capacity=4 * h * w,
        cfg=FusionConfig(localize_stride=2),
    )
    assert ate_rmse(m.poses, gt) < 0.01


def test_single_frame_sequences():
    # One-frame input: every driver returns the seeded map, no tracking.
    from cilantro_tpu.slam import run_fusion_sequence_scanned

    k = CameraIntrinsics.make(120.0, 120.0, 63.5, 47.5)
    h, w = 96, 128
    depths, _ = synthetic_sequence(1, h, w, k, seed=0)
    fmap, m = run_fusion_sequence_scanned(depths, k, map_capacity=4 * h * w)
    assert m.frames == 1 and len(m.poses) == 1
    assert np.allclose(m.poses[0], np.eye(4))
    assert m.num_map_points > 0

    fmap2, m2 = run_fusion_sequence(depths, k, map_capacity=4 * h * w)
    assert m2.frames == 1 and len(m2.poses) == 1
    assert m2.num_map_points == m.num_map_points


def test_free_slot_table_contract():
    # slot_of_rank maps rank r to the r-th free slot, for every occupancy
    # pattern; occupied-slot lanes must not clobber real entries.
    import jax.numpy as jnp
    from cilantro_tpu.slam.fusion import free_slot_table

    rng = np.random.default_rng(3)
    for _ in range(5):
        valid = jnp.asarray(rng.random(64) < 0.6)
        slot_of_rank, num_free = free_slot_table(valid)
        expected = np.flatnonzero(~np.asarray(valid))
        assert int(num_free) == expected.size
        got = np.asarray(slot_of_rank)[: expected.size]
        np.testing.assert_array_equal(got, expected)
