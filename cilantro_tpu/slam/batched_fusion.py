"""Multi-stream batched fusion: B independent RGBD streams in ONE program.

Round-3 TPU redesign for per-chip *throughput* (the reference runs one
stream on one machine, ``examples/fusion.cpp:125-254``; a chip serves many).
Measured motivation: ``jax.vmap`` of the single-stream integrator batches
its gathers/scatters into rank-2 indexed ops that fall off XLA's fast
rank-1 paths (pool row gather 17.5 → 33.7 ns/row, pool update ~2×, stage
bisect 2026-08-19). This module lays the B pools out as ONE ``(B·C, 16)``
flat pool and the B frames as ONE ``(B·H·W,)`` pixel space with per-stream
offsets, so every indexed op stays the same rank-1 fast-path op the
single-stream pipeline uses, while elementwise stages batch naturally on
the VPU. Per-stream semantics match :mod:`cilantro_tpu.slam.fusion`
(test-asserted against the unbatched integrator).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.rgbd import CameraIntrinsics, _zbuffer_winner_batched
from ..core.transforms import Transform, compose, inverse
from ..registration.icp import ICPResult, icp_projective_packed
from .fusion import (
    FusionConfig,
    FusionMap,
    _classify_and_build_rows,
    _valid_col,
    pack_camera_target,
)


def stack_maps(maps: List[FusionMap]) -> jax.Array:
    """B single-stream pools → one ``(B, C, W)`` batched pool."""
    return jnp.stack([m.data for m in maps])


def unstack_maps(data: jax.Array) -> List[FusionMap]:
    return [FusionMap(data=data[b]) for b in range(data.shape[0])]


def _apply_b(tf: Transform, pts: jax.Array) -> jax.Array:
    """Batched transform apply: ``tf`` batch ``(B,)``, ``pts (B, N, 3)``."""
    return (
        jnp.einsum("bij,bnj->bni", tf.linear, pts)
        + tf.translation[:, None, :]
    )


# Wide-row gathers fall off XLA's fast path once the operand passes ~2M
# rows (measured on v5e: 26 -> 46 ns/row between 1.7M and 3.4M rows of
# (., 16) f32, flat_stage_bisect 2026-08-19). Gathers over the flat pool
# are therefore issued in groups of streams whose combined operand stays
# under the cliff; scatters and the z-buffer scatter-min keep scaling and
# stay fully flat.
_GATHER_ROW_CLIFF = 2_000_000


def _grouped_wide_gather(
    flat: jax.Array,  # (B·R, W) operand laid out as B blocks of R rows
    idx_local: jax.Array,  # (B, Q) block-local row indices
    rows_per_block: int,
) -> jax.Array:
    """``stack([flat[b·R + idx_local[b]] for b])`` with each underlying
    gather's operand kept below the wide-gather row cliff."""
    bsz, q = idx_local.shape
    wcol = flat.shape[1]
    group = max(1, _GATHER_ROW_CLIFF // max(rows_per_block, 1))
    if bsz <= group:
        offs = (
            jnp.arange(bsz, dtype=jnp.int32) * rows_per_block
        )[:, None]
        return flat[idx_local + offs]
    outs = []
    for g0 in range(0, bsz, group):
        g1 = min(g0 + group, bsz)
        piece = jax.lax.dynamic_slice_in_dim(
            flat, g0 * rows_per_block, (g1 - g0) * rows_per_block
        )
        offs = (
            jnp.arange(g1 - g0, dtype=jnp.int32) * rows_per_block
        )[:, None]
        outs.append(piece[idx_local[g0:g1] + offs])
    return jnp.concatenate(outs, axis=0).reshape(bsz, q, wcol)


def _apply_normals_b(tf: Transform, nrm: jax.Array) -> jax.Array:
    return jnp.einsum("bij,bnj->bni", tf.linear, nrm)


def batched_seed_localize_target(
    data: jax.Array,
    poses: Transform,
    intrinsics: CameraIntrinsics,
    height: int,
    width: int,
) -> Tuple[jax.Array, jax.Array]:
    """Initial ``(index maps (B, H, W), packed targets (B, H·W, 8))`` from a
    fresh render of every stream's map at its pose (flat-batched twin of
    :func:`..slam.fusion.seed_localize_target`)."""
    bsz, cap, wcol = data.shape
    cams = inverse(poses)
    vcol = _valid_col(wcol)
    valid = data[..., vcol] > 0.5
    model_cam = _apply_b(cams, data[..., 0:3])
    imap, _ = _zbuffer_winner_batched(
        model_cam, valid, intrinsics, height, width
    )
    hit = imap.reshape(bsz, -1)
    ok = hit >= 0
    flat = data.reshape(bsz * cap, wcol)
    rows = _grouped_wide_gather(flat, jnp.where(ok, hit, 0), cap)
    ok &= rows[..., vcol] > 0.5
    packed = jax.vmap(pack_camera_target)(rows, ok, cams)
    return imap, packed


def batched_integrate(
    data: jax.Array,  # (B, C, W) batched pool
    frame_points: jax.Array,  # (B, H·W, 3) organized, camera frame
    frame_normals: jax.Array,
    frame_colors: Optional[jax.Array],
    frame_valid: jax.Array,
    poses: Transform,  # batch (B,), camera-to-world per stream
    intrinsics: CameraIntrinsics,
    *,
    height: int,
    width: int,
    cfg: FusionConfig = FusionConfig(),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fuse / augment / carve one frame into each of B models — all indexed
    ops rank-1 over the flattened pool/pixel spaces. Returns
    ``(data, index_maps (B, H, W), packed_next (B, H·W, 8))``."""
    bsz, cap, wcol = data.shape
    npix = height * width
    vcol = _valid_col(wcol)
    cams = inverse(poses)
    valid = data[..., vcol] > 0.5

    # Render: ONE flat scatter-min over (B·H·W,) pixels.
    model_cam = _apply_b(cams, data[..., 0:3])
    imap, mdepth = _zbuffer_winner_batched(
        model_cam, valid, intrinsics, height, width
    )
    imap_flat = imap.reshape(bsz, npix)
    mdepth_flat = mdepth.reshape(bsz, npix)
    m_ok = imap_flat >= 0
    m_idx = jnp.where(m_ok, imap_flat, 0)

    # Model rows: rank-1 gathers of B·H·W rows from the flat pool (grouped
    # below the wide-gather row cliff).
    flat = data.reshape(bsz * cap, wcol)
    offs = (jnp.arange(bsz, dtype=jnp.int32) * cap)[:, None]
    mrows = jnp.where(
        m_ok[..., None], _grouped_wide_gather(flat, m_idx, cap), 0.0
    )

    # Classify + build update rows: elementwise, batches fine under vmap.
    classify = jax.vmap(
        lambda mr, ok, md, p, n, v, c, po, cm: _classify_and_build_rows(
            mr, ok, md, p, n, v, c, po, cm, intrinsics, height, width, cfg
        ),
        in_axes=(0, 0, 0, 0, 0, 0, None if frame_colors is None else 0, 0, 0),
    )
    (
        do_fuse,
        do_augment,
        do_carve,
        fuse_rows,
        aug_rows,
        carve_row,
    ) = classify(
        mrows,
        m_ok,
        mdepth_flat,
        frame_points,
        frame_normals,
        frame_valid,
        frame_colors,
        poses,
        cams,
    )

    # Tail-append allocator per stream (fusion.py's default; carved slots
    # reclaimed by host-side compaction).
    aug_rank = jnp.cumsum(do_augment.astype(jnp.int32), axis=1) - 1
    cap_ids = jnp.arange(cap, dtype=jnp.int32)[None, :]
    tail = (
        jnp.max(jnp.where(valid, cap_ids, -1), axis=1) + 1
    ).astype(jnp.int32)
    aug_slot = tail[:, None] + aug_rank
    aug_ok = do_augment & (aug_slot < cap)
    aug_slot = jnp.clip(aug_slot, 0, cap - 1)

    # ONE combined rank-1 update over the flat pool. Masked lanes take
    # globally-distinct out-of-bounds targets (mode="drop" discards them,
    # unique_indices stays honest across streams).
    tgt_local = jnp.where(
        do_fuse | do_carve, m_idx, jnp.where(aug_ok, aug_slot, cap)
    )
    lane = jnp.arange(bsz * npix, dtype=jnp.int32).reshape(bsz, npix)
    tgt_g = jnp.where(
        tgt_local < cap, tgt_local + offs, bsz * cap + lane
    ).reshape(-1)
    rows_out = jnp.where(
        do_fuse[..., None],
        fuse_rows,
        jnp.where(do_carve[..., None], carve_row[:, None, :], aug_rows),
    ).reshape(bsz * npix, wcol)

    mode = cfg.update_mode
    if mode == "auto":
        mode = "inverse_gather" if cap <= 3 * npix else "row_scatter"
    if mode == "inverse_gather":
        pix_of_slot = (
            jnp.full((bsz * cap,), -1, jnp.int32)
            .at[tgt_g]
            .set(
                jnp.arange(bsz * npix, dtype=jnp.int32),
                mode="drop",
                unique_indices=True,
            )
        )
        touched = pix_of_slot >= 0
        # pix_of_slot is stream-structured (stream b's slots point into
        # [b·npix, (b+1)·npix)); gather in stream groups below the cliff.
        pix_local = jnp.where(touched, pix_of_slot, 0).reshape(
            bsz, cap
        ) - (jnp.arange(bsz, dtype=jnp.int32) * npix)[:, None]
        pix_local = jnp.clip(pix_local, 0, npix - 1)
        upd_rows = _grouped_wide_gather(rows_out, pix_local, npix).reshape(
            bsz * cap, wcol
        )
        new_flat = jnp.where(touched[:, None], upd_rows, flat)
    elif mode == "row_scatter":
        new_flat = flat.at[tgt_g].set(
            rows_out, mode="drop", unique_indices=True
        )
    else:
        raise ValueError(f"unknown update_mode {cfg.update_mode!r}")

    # Next localize's packed camera-frame target, from rows already in hand
    # (same free-render warm start as the single-stream integrator).
    post_rows = jnp.where(
        do_fuse[..., None], fuse_rows, mrows
    )
    alive = m_ok & ~do_carve & (post_rows[..., vcol] > 0.5)
    packed_next = jax.vmap(pack_camera_target)(post_rows, alive, cams)
    return new_flat.reshape(bsz, cap, wcol), imap, packed_next


@partial(
    jax.jit, static_argnames=("height", "width", "cfg", "do_integrate")
)
def batched_fusion_step(
    data: jax.Array,  # (B, C, W)
    frame_points: jax.Array,  # (B, H·W, 3)
    frame_normals: jax.Array,
    frame_colors: Optional[jax.Array],
    frame_valid: jax.Array,
    pose_guess: Transform,  # batch (B,)
    intrinsics: CameraIntrinsics,
    cached_packed_target: jax.Array,  # (B, H·W, 8)
    *,
    height: int,
    width: int,
    cfg: FusionConfig = FusionConfig(),
    do_integrate: bool = True,
):
    """One localize + integrate frame for B streams as a single program.

    Localize rides the cached packed target (built at ``pose_guess`` by the
    previous integrate), so it does no render and no pool access; the inner
    projective-ICP while_loop is vmapped (all streams share iteration
    count — converged streams coast, measured cheap)."""
    s = cfg.localize_stride
    npix = height * width
    if s > 1:
        rows = jnp.arange(0, height, s)
        cols = jnp.arange(0, width, s)
        sub = (rows[:, None] * width + cols[None, :]).reshape(-1)
        loc_pts = frame_points[:, sub]
        loc_nrm = frame_normals[:, sub]
        loc_valid = frame_valid[:, sub]
    else:
        loc_pts, loc_nrm, loc_valid = frame_points, frame_normals, frame_valid

    def loc_one(p, n, v, packed):
        return icp_projective_packed(
            p,
            packed,
            intrinsics,
            height=height,
            width=width,
            src_normals=n,
            src_valid=v,
            metric="combined",
            point_weight=cfg.icp_point_weight,
            plane_weight=cfg.icp_plane_weight,
            max_iterations=cfg.icp_iterations,
            convergence_tol=cfg.icp_convergence_tol,
            max_gn_iterations=cfg.icp_gn_iterations,
            max_corr_dist_sq=cfg.icp_max_corr_dist_sq,
        )

    res: ICPResult = jax.vmap(loc_one)(
        loc_pts, loc_nrm, loc_valid, cached_packed_target
    )
    poses = compose(pose_guess, res.transform)

    if not do_integrate:
        return data, poses, res, None, None
    data, imap, packed_next = batched_integrate(
        data,
        frame_points,
        frame_normals,
        frame_colors,
        frame_valid,
        poses,
        intrinsics,
        height=height,
        width=width,
        cfg=cfg,
    )
    return data, poses, res, imap, packed_next


@dataclasses.dataclass
class BatchedFusionMetrics:
    poses: "np.ndarray"  # (B, F, 4, 4) per-stream trajectories
    streams: int
    frames: int
    seconds_per_step: float  # one step advances ALL B streams one frame
    aggregate_fps: float  # B / seconds_per_step
    num_map_points: "np.ndarray"  # (B,)


def run_batched_fusion_sequences(
    depth_stacks,  # (B, F, H, W) array-like, metric depth
    intrinsics: CameraIntrinsics,
    *,
    map_capacity: Optional[int] = None,
    cfg: FusionConfig = FusionConfig(),
) -> Tuple[jax.Array, BatchedFusionMetrics]:
    """B independent fusion streams, whole sequences, ONE jitted scan.

    The aggregate-throughput twin of
    :func:`cilantro_tpu.slam.driver.run_fusion_sequence_scanned`: each scan
    step advances every stream one frame through the flat-pool batched
    localize+integrate, so per-chip throughput is ``B / seconds_per_step``
    frames/s. Warm-runs once (compile), then times a second run. Returns the
    final ``(B, C, 16)`` pool stack and per-stream metrics.
    """
    import time as _time

    import numpy as np

    from ..core.rgbd import depth_to_points_normals
    from ..core.transforms import identity
    from .fusion import init_map_from_frame

    stacks = np.asarray(depth_stacks, np.float32)
    bsz, nf, h, w = stacks.shape
    if map_capacity is None:
        map_capacity = 4 * h * w

    d0 = jnp.asarray(stacks[:, 0])

    def init_one(d):
        p, n, v = depth_to_points_normals(d, intrinsics)
        return init_map_from_frame(map_capacity, p, n, None, v).data

    data0 = jax.jit(jax.vmap(init_one))(d0)
    rest = jnp.asarray(stacks[:, 1:].transpose(1, 0, 2, 3))  # (F-1, B, H, W)

    @jax.jit
    def run(data0, rest):
        pose0 = identity(3, batch_shape=(bsz,))
        imap0, packed0 = batched_seed_localize_target(
            data0, pose0, intrinsics, h, w
        )

        def step(carry, depth_b):
            data, poses, packed = carry
            p, n, v = jax.vmap(
                lambda d: depth_to_points_normals(d, intrinsics)
            )(depth_b)
            data, poses, res, _, packed = batched_fusion_step(
                data, p, n, None, v, poses, intrinsics, packed,
                height=h, width=w, cfg=cfg,
            )
            return (data, poses, packed), poses.matrix()

        del imap0  # localize rides the packed target; imap unused here
        (data, _, _), mats = jax.lax.scan(step, (data0, pose0, packed0), rest)
        return data, mats

    data, mats = run(data0, rest)
    np.asarray(mats[-1, 0])  # drain compile + first run
    t0 = _time.perf_counter()
    data, mats = run(data0, rest)
    np.asarray(mats[-1, 0])
    per_step = (_time.perf_counter() - t0) / max(nf - 1, 1)

    mats_np = np.asarray(mats)  # (F-1, B, 4, 4)
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (bsz, 1, 4, 4))
    poses = np.concatenate([eye, mats_np.transpose(1, 0, 2, 3)], axis=1)
    vcol = _valid_col(data.shape[-1])
    n_pts = np.asarray(jnp.sum(data[..., vcol] > 0.5, axis=1))
    return data, BatchedFusionMetrics(
        poses=poses,
        streams=bsz,
        frames=nf,
        seconds_per_step=per_step,
        aggregate_fps=bsz / per_step,
        num_map_points=n_pts,
    )
