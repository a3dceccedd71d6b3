"""Map-sharded fusion on the 8-virtual-device CPU mesh: agreement with the
single-device pipeline + capacity-padding behavior under uneven load."""

import numpy as np
import jax
import jax.numpy as jnp

from cilantro_tpu.core.rgbd import CameraIntrinsics, depth_to_points_normals
from cilantro_tpu.core.transforms import identity
from cilantro_tpu.parallel.sharded import make_mesh
from cilantro_tpu.parallel.sharded_fusion import (
    init_sharded_map,
    sharded_fusion_step,
)
from cilantro_tpu.slam import (
    FusionConfig,
    fusion_step,
    init_map_from_frame,
    synthetic_sequence,
)
from cilantro_tpu.slam.fusion import _valid_col

K = CameraIntrinsics.make(100.0, 100.0, 31.5, 23.5)
H, W = 48, 64


def run_both(n_frames=4, capacity=2 * H * W):
    depths, gt = synthetic_sequence(n_frames, H, W, K, seed=5)
    cfg = FusionConfig()
    mesh = make_mesh(1, 8)

    pts0, nrm0, val0 = depth_to_points_normals(jnp.asarray(depths[0]), K)
    fmap = init_map_from_frame(capacity, pts0, nrm0, None, val0)
    sdata = init_sharded_map(mesh, capacity, pts0, nrm0, None, val0)

    pose_s = identity(3)
    pose_d = identity(3)
    imap = None
    poses_s, poses_d = [], []
    for fi in range(1, n_frames):
        pts, nrm, val = depth_to_points_normals(jnp.asarray(depths[fi]), K)
        fmap, pose_d, _, imap, _ = fusion_step(
            fmap, pts, nrm, None, val, pose_d, K,
            cached_index_map=imap, height=H, width=W, cfg=cfg,
        )
        sdata, pose_s, _ = sharded_fusion_step(
            sdata, pts, nrm, None, val, pose_s, K,
            mesh=mesh, height=H, width=W, cfg=cfg,
        )
        poses_d.append(np.asarray(pose_d.matrix()))
        poses_s.append(np.asarray(pose_s.matrix()))
    return fmap, sdata, poses_d, poses_s, gt


class TestShardedFusion:
    def test_agrees_with_single_device(self):
        fmap, sdata, poses_d, poses_s, _ = run_both()
        # Trajectories agree to sub-millimeter (tie-breaks in the z-buffer
        # may differ; the estimate must not).
        for pd, ps in zip(poses_d, poses_s):
            assert np.abs(pd[:3, 3] - ps[:3, 3]).max() < 1e-3
            assert np.abs(pd[:3, :3] - ps[:3, :3]).max() < 1e-3

        sd = np.asarray(sdata)
        dd = np.asarray(fmap.data)
        n_s = int((sd[:, _valid_col(sd.shape[1])] > 0.5).sum())
        n_d = int((dd[:, _valid_col(dd.shape[1])] > 0.5).sum())
        # Same map size up to augment-placement edge effects.
        assert abs(n_s - n_d) < 0.02 * max(n_d, 1)

        # Same geometry: mean confidence-weighted centroid close.
        cs = sd[sd[:, _valid_col(sd.shape[1])] > 0.5]
        cd = dd[dd[:, _valid_col(dd.shape[1])] > 0.5]
        assert np.abs(cs[:, 0:3].mean(0) - cd[:, 0:3].mean(0)).max() < 1e-3

    def test_coalesced_update_bit_identical(self):
        """Sharded update through the run-coalescing gather equals the plain
        sharded update bit-exactly."""
        depths, _ = synthetic_sequence(3, H, W, K, seed=7)
        mesh = make_mesh(1, 8)
        pts0, nrm0, val0 = depth_to_points_normals(jnp.asarray(depths[0]), K)
        out = {}
        for coal in (False, True):
            cfg = FusionConfig(coalesced_gathers=coal)
            sdata = init_sharded_map(mesh, 2 * H * W, pts0, nrm0, None, val0)
            pose = identity(3)
            for fi in range(1, 3):
                pts, nrm, val = depth_to_points_normals(
                    jnp.asarray(depths[fi]), K
                )
                sdata, pose, _ = sharded_fusion_step(
                    sdata, pts, nrm, None, val, pose, K,
                    mesh=mesh, height=H, width=W, cfg=cfg,
                )
            out[coal] = np.asarray(sdata)
        np.testing.assert_array_equal(out[False], out[True])

    def test_uneven_capacity_padding(self):
        """A deliberately tiny pool: augments beyond per-shard capacity must
        drop gracefully (no wraparound writes, valid count bounded)."""
        depths, _ = synthetic_sequence(3, H, W, K, seed=6)
        mesh = make_mesh(1, 8)
        cap = 1024  # << one frame's point count (≈2.8k valid)
        pts0, nrm0, val0 = depth_to_points_normals(jnp.asarray(depths[0]), K)
        # Seed with only the first 500 points so shards start uneven-ish.
        val_small = jnp.asarray(np.asarray(val0) & (np.arange(H * W) < 900))
        sdata = init_sharded_map(mesh, cap, pts0, nrm0, None, val_small)
        pose = identity(3)
        for fi in range(1, 3):
            pts, nrm, val = depth_to_points_normals(
                jnp.asarray(depths[fi]), K
            )
            sdata, pose, _ = sharded_fusion_step(
                sdata, pts, nrm, None, val, pose, K,
                mesh=mesh, height=H, width=W,
            )
        sd = np.asarray(sdata)
        vcol = _valid_col(sd.shape[1])
        n_valid = int((sd[:, vcol] > 0.5).sum())
        assert n_valid <= cap
        # Pool filled up (augments landed until capacity).
        assert n_valid > 0.9 * cap
        # No NaNs / corrupted rows.
        assert np.isfinite(sd[sd[:, vcol] > 0.5]).all()

    def test_sharded_render_matches_winner_semantics(self):
        """Every winner index returned by the sharded step is a valid global
        slot whose row is valid in the pool."""
        depths, _ = synthetic_sequence(2, H, W, K, seed=7)
        mesh = make_mesh(1, 8)
        cap = 2 * H * W
        pts0, nrm0, val0 = depth_to_points_normals(jnp.asarray(depths[0]), K)
        sdata = init_sharded_map(mesh, cap, pts0, nrm0, None, val0)
        pts, nrm, val = depth_to_points_normals(jnp.asarray(depths[1]), K)
        sdata, pose, widx = sharded_fusion_step(
            sdata, pts, nrm, None, val, identity(3), K,
            mesh=mesh, height=H, width=W,
        )
        w = np.asarray(widx)
        hit = w[w >= 0]
        assert (hit < cap).all()
        assert len(hit) > 100
