"""Batched serving demos — the TPU-only capabilities beyond the reference.

The reference serves one stream/solve per process (OpenMP inside each);
a chip serves many. Two demos:

1. splat fusion: dense bounded-window frame-to-model fusion (the headline
   fusion pipeline — no scatter, no pool gathers) on a synthetic sequence;
2. batched non-rigid warp: B deformed observations of one template
   registered in ONE program (shared-index gathers + one batched MXU
   Cholesky; ``registration/warp_field_batched.py``).

Run: PYTHONPATH=/root/repo python examples/batched_serving.py [n_frames]
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.core.rgbd import CameraIntrinsics
from cilantro_tpu.core.containers import PointCloud
from cilantro_tpu.core.grid import grid_downsample
from cilantro_tpu.registration import (
    build_deformation_graph,
    icp_warp_field_batched,
    warp_points_batched,
)
from cilantro_tpu.slam import (
    SplatConfig,
    ate_rmse,
    extract_cloud,
    run_splat_sequence_scanned,
    synthetic_sequence,
)


def splat_demo(frames: int):
    h, w = 480, 640
    k = CameraIntrinsics.kinect_640()
    print(f"rendering {frames}-frame synthetic 640x480 sequence...")
    depths, gt = synthetic_sequence(frames, h, w, k, seed=0)
    t0 = time.perf_counter()
    smap, poses, spf = run_splat_sequence_scanned(
        depths, k, cfg=SplatConfig(radius=4, margin=16)
    )
    ate = ate_rmse(poses, gt)
    pts, nrm, conf = extract_cloud(smap)
    print(
        f"splat fusion: {spf*1e3:.1f} ms/frame ({1/spf:.1f} fps), "
        f"ATE {ate*1e3:.3f} mm, {len(pts)} live surfels "
        f"(total {time.perf_counter()-t0:.0f}s incl. compile)"
    )


def batched_warp_demo(streams: int = 4):
    rng = np.random.default_rng(0)
    n = 30000
    src = rng.uniform(-0.6, 0.6, (n, 3)).astype(np.float32)
    src[:, 2] = 0.2 * np.sin(3 * src[:, 0]) * np.cos(2 * src[:, 1])
    dsts = []
    for b in range(streams):
        d = src.copy()
        d[:, 2] += 0.02 * np.sin((6 + b) * src[:, 0])
        dsts.append(d)
    srcj = jnp.asarray(src)
    ctrl = grid_downsample(PointCloud(points=srcj), 0.08, capacity=512)
    graph = build_deformation_graph(
        srcj, ctrl.points, node_valid=ctrl.valid, k_anchors=4, k_arcs=8
    )
    t0 = time.perf_counter()
    tfb, iters, conv = icp_warp_field_batched(
        graph, srcj, jnp.asarray(np.stack(dsts)),
        max_corr_dist_sq=0.0025, point_weight=1.0, plane_weight=0.0,
        stiffness=50.0, max_iterations=8,
    )
    wb = np.asarray(warp_points_batched(graph, tfb, srcj))
    errs = [
        np.median(np.linalg.norm(wb[:, b] - dsts[b], axis=1))
        for b in range(streams)
    ]
    print(
        f"batched warp x{streams}: {int(iters)} outer iters, converged "
        f"{np.asarray(conv).tolist()}, median errors "
        f"{[f'{e*1e3:.2f}mm' for e in errs]} "
        f"({time.perf_counter()-t0:.0f}s incl. compile)"
    )


if __name__ == "__main__":
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    splat_demo(frames)
    batched_warp_demo()
