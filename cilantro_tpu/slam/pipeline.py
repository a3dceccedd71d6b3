"""Pipeline-parallel fusion: the frame front-end on one device, the
tracker/integrator on another.

SURVEY §2.10's optional pipeline-parallelism row: overlap frame ``t``'s
preparation with frame ``t−1``'s solve. A fusion step has a strict
frame-to-model dependency chain (localize(t) needs the map after
integrate(t−1)), so the *solver* cannot be split across frames — but the
frame front-end (depth → points + pixel-neighbor normals,
``core/rgbd.depth_to_points_normals``) depends only on the input frame. The
classic SLAM production split is therefore:

    stage 0 (device 0):  preprocess frame t          (front-end)
    stage 1 (device 1):  localize + integrate t−1    (tracker/mapper)

expressed SPMD: one ``shard_map`` over a 2-device ``('pipe',)`` mesh, a
``lax.scan`` over frames whose carry holds the one-frame-deep in-flight
buffer, ``lax.cond`` on ``lax.axis_index`` so each device executes only its
stage, and a ``ppermute`` 0→1 handing the preprocessed frame downstream.
Results are bit-equivalent to the sequential scanned driver, delayed one
step; the trajectory psum-broadcasts back so every device returns it.

On real multi-chip hardware the handoff rides ICI (one (H·W, 7) frame
≈ 8.6 MB at 640×480 per step). The same program runs on the CPU virtual
mesh for tests and on the multichip dryrun.
"""

from __future__ import annotations

import time
from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..core.rgbd import CameraIntrinsics, depth_to_points_normals
from ..core.vma import match_vma
from ..core.transforms import Transform, identity
from .driver import FusionMetrics
from .fusion import (
    FusionConfig,
    FusionMap,
    fusion_step,
    init_map_from_frame,
    seed_localize_target,
)


def make_pipeline_mesh(devices=None) -> Mesh:
    """A 2-device ``('pipe',)`` mesh: stage 0 = front-end, stage 1 = tracker."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < 2:
        raise ValueError("pipeline parallelism needs at least 2 devices")
    return Mesh(np.asarray(devices[:2]), ("pipe",))


def run_fusion_sequence_pipelined(
    depths: Sequence[np.ndarray],
    intrinsics: CameraIntrinsics,
    *,
    mesh: Optional[Mesh] = None,
    map_capacity: Optional[int] = None,
    cfg: FusionConfig = FusionConfig(),
) -> Tuple[FusionMap, FusionMetrics]:
    """Whole-sequence fusion as ONE two-stage pipelined SPMD program.

    Matches :func:`..slam.driver.run_fusion_sequence_scanned` numerically
    (same per-frame program on the same inputs, one pipeline-fill step of
    latency); returns the same ``(FusionMap, FusionMetrics)``.
    """
    h, w = depths[0].shape
    if map_capacity is None:
        map_capacity = 4 * h * w
    n_fuse = len(depths) - 1
    # Single frame: the seeded map is the result — return before building
    # the mesh, so one-frame inputs work even on single-device hosts.
    if n_fuse == 0:
        pts, nrm, valid = depth_to_points_normals(
            jnp.asarray(depths[0]), intrinsics
        )
        fmap0 = init_map_from_frame(map_capacity, pts, nrm, None, valid)
        return fmap0, FusionMetrics(
            poses=[np.eye(4, dtype=np.float32)],
            frames=1,
            seconds_per_frame=0.0,
            icp_iterations=[0],
            num_map_points=int(fmap0.num_points()),
        )
    if mesh is None:
        mesh = make_pipeline_mesh()

    # Frames 1..F-1 + one zero drain frame; frame 0 seeds the map.
    depth_stack = jnp.asarray(
        np.concatenate(
            [np.stack(depths[1:]), np.zeros((1, h, w), np.float32)]
        )
    )
    pts, nrm, valid = depth_to_points_normals(jnp.asarray(depths[0]), intrinsics)
    fmap0 = init_map_from_frame(map_capacity, pts, nrm, None, valid)

    def program(fmap0: FusionMap, depth_stack: jax.Array):
        me = lax.axis_index("pipe")
        pose0 = identity(3)
        imap0, packed0 = seed_localize_target(fmap0, pose0, intrinsics, h, w)
        hw = h * w
        empty_frame = (
            jnp.zeros((hw, 3), jnp.float32),  # points
            jnp.zeros((hw, 3), jnp.float32),  # normals
            jnp.zeros((hw,), jnp.float32),    # valid (f32 for the handoff)
            jnp.float32(0.0),                 # in-flight flag
        )

        def preprocess(depth):
            p, n, v = depth_to_points_normals(depth, intrinsics)
            return p, n, v.astype(jnp.float32), jnp.float32(1.0)

        def step(carry, depth):
            inflight, fmap, pose, imap, packed = carry

            # stage 0: front-end on this step's frame (device 0 only)
            pre = lax.cond(
                me == 0,
                preprocess,
                lambda _d: empty_frame,
                depth,
            )

            # stage 1: track + integrate the in-flight frame (device 1 only,
            # once the pipeline has filled)
            def fuse(args):
                fmap, pose, imap, packed = args
                ipts, inrm, ivalid, _ = inflight
                fmap, pose, res, imap, packed = fusion_step(
                    fmap, ipts, inrm, None, ivalid > 0.5, pose, intrinsics,
                    cached_index_map=imap, cached_packed_target=packed,
                    height=h, width=w, cfg=cfg,
                )
                return fmap, pose, imap, packed, res.iterations

            def skip(args):
                fmap, pose, imap, packed = args
                return fmap, pose, imap, packed, match_vma(
                    jnp.int32(0), pose
                )

            fmap, pose, imap, packed, iters = lax.cond(
                (me == 1) & (inflight[3] > 0.5),
                fuse,
                skip,
                (fmap, pose, imap, packed),
            )

            # hand the preprocessed frame downstream (0 → 1); the collective
            # sits outside both conds so every device participates.
            nxt = jax.tree.map(
                lambda x: lax.ppermute(x, "pipe", [(0, 1)]), pre
            )
            fused_flag = ((me == 1) & (inflight[3] > 0.5)).astype(jnp.float32)
            out = (
                pose.matrix() * fused_flag,
                iters * fused_flag.astype(jnp.int32),
                fused_flag,
            )
            return (nxt, fmap, pose, imap, packed), out

        # Every carry component becomes device-varying on the first step
        # (all updates branch on ``me``); cast the replicated initial values
        # varying so the scan typechecks under check_vma=True.
        init = jax.tree.map(
            lambda x: lax.pcast(x, ("pipe",), to="varying"),
            (empty_frame, fmap0, pose0, imap0, packed0),
        )
        (_, fmap, pose, _, _), (mats, iters, flags) = lax.scan(
            step, init, depth_stack
        )
        # stage-1 results → replicated outputs
        mats = lax.psum(mats, "pipe")
        iters = lax.psum(iters, "pipe")
        flags = lax.psum(flags, "pipe")
        fdata = lax.psum(
            jnp.where(me == 1, fmap.data, jnp.zeros_like(fmap.data)), "pipe"
        )
        return fdata, mats, iters, flags

    run = jax.jit(
        jax.shard_map(
            program,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=True,
        )
    )

    fdata, mats, iters, flags = run(fmap0, depth_stack)
    fdata.block_until_ready()
    t0 = time.perf_counter()
    fdata, mats, iters, flags = run(fmap0, depth_stack)
    fmap = FusionMap(data=fdata)
    n_map = int(fmap.num_points())  # host fetch syncs the pipeline
    dt = (time.perf_counter() - t0) / max(n_fuse, 1)

    # Steps that actually fused a frame (pipeline fill drops step 0).
    keep = np.flatnonzero(np.asarray(flags) > 0.5)
    mats_np = np.asarray(mats)[keep]
    iters_np = np.asarray(iters)[keep]
    poses: List[np.ndarray] = [np.eye(4, dtype=np.float32)] + list(mats_np)
    return fmap, FusionMetrics(
        poses=poses,
        frames=len(depths),
        seconds_per_frame=dt,
        icp_iterations=[0] + [int(i) for i in iters_np],
        num_map_points=n_map,
    )
