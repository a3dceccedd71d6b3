"""Batched multi-stream fusion vs the single-stream integrator.

The flat-batched integrator must be BIT-identical to the single-stream one
at equal poses and B=1 (same key packing, same allocator, same update).
End-to-end (localize included) the vmapped ICP while_loop reorders float
reductions, so trajectories/pools agree to tight tolerance instead.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cilantro_tpu.core.rgbd import (
    CameraIntrinsics,
    depth_to_points_normals,
)
from cilantro_tpu.core.transforms import Transform, identity
from cilantro_tpu.slam import synthetic_sequence
from cilantro_tpu.slam.batched_fusion import (
    batched_fusion_step,
    batched_integrate,
    batched_seed_localize_target,
    stack_maps,
    unstack_maps,
)
from cilantro_tpu.slam.fusion import (
    FusionConfig,
    FusionMap,
    fusion_step,
    init_map_from_frame,
    integrate_frame_with_imap,
    seed_localize_target,
)

H, W = 120, 160
CAP = int(1.4 * H * W)
F = 4


def _k():
    return CameraIntrinsics.make(140.0, 140.0, W / 2 - 0.5, H / 2 - 0.5)


def _frames(depths):
    return [
        depth_to_points_normals(jnp.asarray(d), _k()) for d in depths
    ]


def test_batched_integrate_bitexact_vs_single():
    """Same pose, same frame: the flat-batched integrate must produce the
    bit-identical index map (same winner election) and a pool/packed target
    equal to the single-stream integrate up to einsum contraction-order ulp
    (batched transforms lower differently), for B=1 and each stream of B=3."""
    k = _k()
    cfg = FusionConfig()
    all_depths = [synthetic_sequence(2, H, W, k, seed=s)[0] for s in range(3)]
    maps, frames = [], []
    for d in all_depths:
        f0, f1 = _frames(d)
        maps.append(init_map_from_frame(CAP, f0[0], f0[1], None, f0[2]))
        frames.append(f1)
    # a non-identity pose so the render actually moves
    rot = np.eye(3, dtype=np.float32)
    th = 0.01
    rot[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    pose1 = Transform(
        jnp.asarray(rot), jnp.asarray(np.float32([0.002, -0.001, 0.003]))
    )

    singles = [
        integrate_frame_with_imap(
            maps[b], frames[b][0], frames[b][1], None, frames[b][2], pose1,
            k, height=H, width=W, cfg=cfg,
        )
        for b in range(3)
    ]

    for bsz in (1, 3):
        data = stack_maps(maps[:bsz])
        poses = Transform(
            jnp.broadcast_to(pose1.linear, (bsz, 3, 3)),
            jnp.broadcast_to(pose1.translation, (bsz, 3)),
        )
        p = jnp.stack([frames[b][0] for b in range(bsz)])
        n = jnp.stack([frames[b][1] for b in range(bsz)])
        v = jnp.stack([frames[b][2] for b in range(bsz)])
        new_data, imap, packed = batched_integrate(
            data, p, n, None, v, poses, k, height=H, width=W, cfg=cfg,
        )
        for b in range(bsz):
            fmap_s, imap_s, packed_s = singles[b]
            np.testing.assert_array_equal(
                np.asarray(imap[b]), np.asarray(imap_s),
                err_msg=f"B={bsz} stream {b}: index map",
            )
            np.testing.assert_allclose(
                np.asarray(new_data[b]), np.asarray(fmap_s.data),
                atol=1e-5, rtol=1e-5,
                err_msg=f"B={bsz} stream {b}: pool",
            )
            np.testing.assert_allclose(
                np.asarray(packed[b]), np.asarray(packed_s),
                atol=1e-5, rtol=1e-5,
                err_msg=f"B={bsz} stream {b}: packed target",
            )


def _run_single(depths, k, cfg):
    f0 = _frames(depths[:1])[0]
    fmap = init_map_from_frame(CAP, f0[0], f0[1], None, f0[2])
    pose = identity(3)
    imap, packed = seed_localize_target(fmap, pose, k, H, W)
    poses = [np.eye(4, dtype=np.float32)]
    for f in range(1, len(depths)):
        p, n, v = depth_to_points_normals(jnp.asarray(depths[f]), k)
        fmap, pose, res, imap, packed = fusion_step(
            fmap, p, n, None, v, pose, k,
            cached_index_map=imap, cached_packed_target=packed,
            height=H, width=W, cfg=cfg,
        )
        poses.append(np.asarray(pose.matrix()))
    return fmap, poses


def _run_batched(all_depths, k, cfg):
    bsz = len(all_depths)
    maps = []
    for b in range(bsz):
        f0 = _frames(all_depths[b][:1])[0]
        maps.append(init_map_from_frame(CAP, f0[0], f0[1], None, f0[2]))
    data = stack_maps(maps)
    poses = identity(3, batch_shape=(bsz,))
    imap, packed = batched_seed_localize_target(data, poses, k, H, W)
    traj = [[np.eye(4, dtype=np.float32)] for _ in range(bsz)]
    for f in range(1, len(all_depths[0])):
        frames = [
            depth_to_points_normals(jnp.asarray(all_depths[b][f]), k)
            for b in range(bsz)
        ]
        p = jnp.stack([fr[0] for fr in frames])
        n = jnp.stack([fr[1] for fr in frames])
        v = jnp.stack([fr[2] for fr in frames])
        data, poses, res, imap, packed = batched_fusion_step(
            data, p, n, None, v, poses, k, packed,
            height=H, width=W, cfg=cfg,
        )
        mats = np.asarray(poses.matrix())
        for b in range(bsz):
            traj[b].append(mats[b])
    return unstack_maps(data), traj


def test_batched_end_to_end_matches_single():
    k = _k()
    all_depths = [synthetic_sequence(F, H, W, k, seed=s)[0] for s in range(2)]
    cfg = FusionConfig()
    singles = [_run_single(d, k, cfg) for d in all_depths]
    maps_b, traj_b = _run_batched(all_depths, k, cfg)
    for b in range(2):
        fmap_s, traj_s = singles[b]
        for f in range(F):
            np.testing.assert_allclose(
                traj_b[b][f], traj_s[f], atol=5e-5,
                err_msg=f"stream {b} pose mismatch at frame {f}",
            )
        d_s = np.asarray(fmap_s.data)
        d_b = np.asarray(maps_b[b].data)
        # Tiny pose deltas (reduction order in the vmapped ICP) shift world
        # coordinates; rows must still agree closely and occupancy match.
        vs, vb = d_s[:, 10] > 0.5, d_b[:, 10] > 0.5
        assert (vs == vb).mean() > 0.999, f"stream {b}: occupancy"
        both = vs & vb
        close = np.isclose(
            d_b[both], np.where(d_s[both] > 1e29, d_b[both], d_s[both]),
            atol=2e-3,
        ).all(axis=1)
        assert close.mean() > 0.995, f"stream {b}: rows {close.mean():.4f}"


def test_batched_update_modes_agree():
    k = _k()
    all_depths = [synthetic_sequence(3, H, W, k, seed=s)[0] for s in range(2)]
    out = {}
    for mode in ("row_scatter", "inverse_gather"):
        cfg = dataclasses.replace(FusionConfig(), update_mode=mode)
        maps_b, traj = _run_batched(all_depths, k, cfg)
        out[mode] = maps_b
    for b in range(2):
        np.testing.assert_array_equal(
            np.asarray(out["row_scatter"][b].data),
            np.asarray(out["inverse_gather"][b].data),
        )
