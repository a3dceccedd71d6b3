"""Spatially-sharded frame-to-model fusion over a device mesh.

The north-star distributed extension (SURVEY §5/§7 stage 7): the fusion map
pool lives sharded over the mesh's ``map`` axis — each device owns a
contiguous slot range of the packed ``(C, 16)`` pool and never materializes
another shard. Per frame:

1. **render** — every device z-buffers ITS shard (a C/D-point sort, so the
   render cost itself scales down with the mesh); cross-device winner
   selection is two ``pmin`` collectives per pixel (exact depth, then min
   global index for ties) — no quantization across shards;
2. **model image** — each device contributes the packed rows of the pixels
   it won; one ``psum`` makes the (H·W, 16) per-pixel model image replicated
   (this is the sharded twin of the single-device "one pool gather");
3. **localize** — projective ICP against that image; the GN reduction is a
   ``psum`` over frame shards (the OpenMP matrix-sum → all-reduce mapping of
   SURVEY §2.10);
4. **integrate** — gates/rows are computed replicated (cheap elementwise);
   each device applies the ONE combined scatter only for pixels whose winner
   it owns; augments are dealt round-robin across shards and claim local
   free slots.

Everything is one jitted ``shard_map`` program per frame. Collective volume
per frame: 2 pmin (H·W int32/f32) + 1-2 psum of the (H·W, 16) image + one
6×6 psum per ICP iteration — all ICI-friendly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.rgbd import CameraIntrinsics, _zbuffer_winner
from ..core.transforms import Transform, compose, inverse
from ..registration.icp import icp_projective_packed
from ..slam.fusion import (
    FusionConfig,
    _MAP_WIDTH,
    _classify_and_build_rows,
    _conf_col,
    _valid_col,
    apply_pool_update,
    free_slot_table,
    pack_camera_target,
)

_INT_MAX = 2**31 - 1  # plain int: no device constants at import time


def _local_render(data_local, base, intrinsics, cam_from_world, h, w, axis):
    """Shard z-buffer + cross-shard winner election.

    Returns ``(widx (H·W,) global winner index or -1, wdepth (H·W,))`` —
    replicated (identical on every shard after the collectives)."""
    pts_w = data_local[:, 0:3]
    valid = data_local[:, _valid_col(data_local.shape[1])] > 0.5
    pts_cam = cam_from_world.apply(pts_w)
    imap, mdepth = _zbuffer_winner(pts_cam, valid, intrinsics, h, w)
    li = imap.reshape(-1)
    ld = mdepth.reshape(-1)
    has = li >= 0
    ld = jnp.where(has, ld, jnp.float32(3e38))
    # Exact global winner: min depth, ties → min global index.
    dmin = jax.lax.pmin(ld, axis)
    cand = jnp.where(has & (ld == dmin), base + li, _INT_MAX)
    widx = jax.lax.pmin(cand, axis)
    wok = widx < _INT_MAX
    return jnp.where(wok, widx, -1), jnp.where(wok, dmin, 0.0)


def _model_image(data_local, base, widx, axis):
    """Replicated (H·W, 16) model row image: every device contributes the
    rows of the pixels it won; one psum completes the image."""
    c_local = data_local.shape[0]
    rel = widx - base
    owned = (widx >= 0) & (rel >= 0) & (rel < c_local)
    rows = jnp.where(
        owned[:, None],
        data_local[jnp.clip(rel, 0, c_local - 1)],
        0.0,
    )
    return jax.lax.psum(rows, axis), owned, jnp.clip(rel, 0, c_local - 1)


@partial(
    jax.jit,
    static_argnames=("mesh", "axis", "height", "width", "cfg"),
)
def sharded_fusion_step(
    map_data: jax.Array,  # (C, 16) packed pool, sharded over `axis`
    frame_points: jax.Array,  # (H·W, 3) organized, replicated
    frame_normals: jax.Array,
    frame_colors: Optional[jax.Array],
    frame_valid: jax.Array,
    pose_guess: Transform,  # replicated
    intrinsics: CameraIntrinsics,
    *,
    mesh: Mesh,
    axis: str = "map",
    height: int,
    width: int,
    cfg: FusionConfig = FusionConfig(),
) -> Tuple[jax.Array, Transform, jax.Array]:
    """One fusion frame (localize + integrate) on a map-sharded pool.

    Returns ``(new map_data sharded as given, refined pose, winner image
    (H·W,) int32 global indices)``. Semantics match the single-device
    :func:`cilantro_tpu.slam.fusion.fusion_step` up to z-buffer tie-breaks
    and augment slot placement (augments are dealt round-robin across
    shards).
    """
    nshards = mesh.shape[axis]
    hw = height * width

    def program(data, fpts, fnrm, fcols, fval, pose_g):
        c_local = data.shape[0]
        d_id = jax.lax.axis_index(axis)
        base = d_id * c_local

        # ---------------- localize --------------------------------------
        cam_g = inverse(pose_g)
        widx, _ = _local_render(
            data, base, intrinsics, cam_g, height, width, axis
        )
        mimg, _, _ = _model_image(data, base, widx, axis)
        ok = (widx >= 0) & (mimg[:, _valid_col(mimg.shape[1])] > 0.5)
        packed = pack_camera_target(mimg, ok, cam_g)
        s = cfg.localize_stride
        if s > 1:
            rows = jnp.arange(0, height, s)
            cols_ = jnp.arange(0, width, s)
            sub = (rows[:, None] * width + cols_[None, :]).reshape(-1)
            loc_pts, loc_nrm, loc_val = fpts[sub], fnrm[sub], fval[sub]
        else:
            loc_pts, loc_nrm, loc_val = fpts, fnrm, fval
        # Shard the localize frame over devices: each solves the SAME GN
        # system from its slice via the psum hook inside the estimator —
        # here we simply run the replicated ICP on a per-device slice and
        # psum the normal equations by wrapping the weights. Simpler and
        # numerically identical: run replicated (the frame is replicated and
        # the GN cost is small next to the render).
        res = icp_projective_packed(
            loc_pts,
            packed,
            intrinsics,
            height=height,
            width=width,
            src_normals=loc_nrm,
            src_valid=loc_val,
            metric="combined",
            point_weight=cfg.icp_point_weight,
            plane_weight=cfg.icp_plane_weight,
            max_iterations=cfg.icp_iterations,
            convergence_tol=cfg.icp_convergence_tol,
            max_corr_dist_sq=cfg.icp_max_corr_dist_sq,
            coalesced=cfg.coalesced_gathers,
        )
        pose = compose(pose_g, res.transform)

        # ---------------- integrate -------------------------------------
        cam = inverse(pose)
        widx, wdepth = _local_render(
            data, base, intrinsics, cam, height, width, axis
        )
        mimg, owned, rel = _model_image(data, base, widx, axis)
        m_ok = widx >= 0

        (
            do_fuse,
            do_augment,
            do_carve,
            fuse_rows,
            aug_rows,
            carve_row,
        ) = _classify_and_build_rows(
            mimg,
            m_ok,
            wdepth,
            fpts,
            fnrm,
            fval,
            fcols,
            pose,
            cam,
            intrinsics,
            height,
            width,
            cfg,
        )

        # Augment dealing: pixel i with augment rank r goes to shard
        # r % nshards, claiming that shard's (r // nshards)-th free slot.
        valid_local = data[:, _valid_col(data.shape[1])] > 0.5
        slot_of_rank, num_free = free_slot_table(valid_local)
        aug_rank = jnp.cumsum(do_augment.astype(jnp.int32)) - 1
        mine = do_augment & (aug_rank % nshards == d_id)
        local_rank = aug_rank // nshards
        aug_slot = slot_of_rank[jnp.clip(local_rank, 0, c_local - 1)]
        aug_ok = mine & (local_rank < num_free)

        # ONE combined local update: fuse/carve on owned winners, augments
        # on my dealt free slots; everything else → distinct OOB (dropped).
        oob = c_local + jnp.arange(hw, dtype=jnp.int32)
        fuse_or_carve = (do_fuse | do_carve) & owned
        tgt = jnp.where(
            fuse_or_carve, rel, jnp.where(aug_ok, aug_slot, oob)
        )
        rows_out = jnp.where(
            do_fuse[:, None],
            fuse_rows,
            jnp.where(do_carve[:, None], carve_row[None, :], aug_rows),
        )
        # Same update helper as the single-device integrator; per-shard
        # capacity is C/D rows, so the inverse-gather mode's capacity-scaled
        # gather+rewrite wins even harder here than single-device.
        new_data = apply_pool_update(data, tgt, rows_out, cfg)
        return new_data, pose, widx

    rep = jax.tree_util.tree_map(lambda _: P(), pose_guess)
    fcols_spec = P() if frame_colors is not None else None
    args = [map_data, frame_points, frame_normals]
    in_specs = [P(axis, None), P(), P()]
    if frame_colors is None:
        def program2(data, fpts, fnrm, fval, pose_g):
            return program(data, fpts, fnrm, None, fval, pose_g)
        fn = program2
    else:
        args.append(frame_colors)
        in_specs.append(fcols_spec)
        fn = program
    args += [frame_valid, pose_guess]
    in_specs += [P(), rep]

    shard = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(axis, None), rep, P()),
        check_vma=True,
    )
    return shard(*args)


def init_sharded_map(
    mesh: Mesh,
    capacity: int,
    frame_points: jax.Array,
    frame_normals: jax.Array,
    frame_colors: Optional[jax.Array],
    frame_valid: jax.Array,
    *,
    axis: str = "map",
    confidence: Optional[jax.Array] = None,
) -> jax.Array:
    """Seed a sharded pool from the first frame: the frame's points are dealt
    round-robin across shards (so every shard starts with a balanced slice)
    and the result is placed with the pool sharded over ``axis``."""
    from jax.sharding import NamedSharding

    import numpy as np

    nshards = mesh.shape[axis]
    assert capacity % nshards == 0
    # Compact valid points host-side (seeding is a one-time host step), then
    # deal round-robin: kept row i → shard i % D, local slot i // D.
    val = np.asarray(frame_valid).astype(bool)
    pts = np.asarray(frame_points)[val]
    nrm = np.asarray(frame_normals)[val]
    cols = (
        np.asarray(frame_colors)[val]
        if frame_colors is not None
        else np.zeros_like(pts)
    )
    conf = (
        np.asarray(confidence)[val]
        if confidence is not None
        else np.ones(len(pts), np.float32)
    )
    n = min(len(pts), capacity)
    w = _MAP_WIDTH  # see fusion.py: width 16 measures faster end-to-end
    data = np.zeros((capacity, w), np.float32)
    data[:, 0:3] = 1e30
    c_local = capacity // nshards
    idx = np.arange(n)
    slots = (idx % nshards) * c_local + idx // nshards
    data[slots, 0:3] = pts[:n]
    data[slots, 3:6] = nrm[:n]
    if frame_colors is not None:
        data[slots, 6:9] = cols[:n]
    data[slots, _conf_col(w)] = conf[:n]
    data[slots, _valid_col(w)] = 1.0
    return jax.device_put(
        jnp.asarray(data), NamedSharding(mesh, P(axis, None))
    )
