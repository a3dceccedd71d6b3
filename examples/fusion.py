"""Headless RGBD fusion demo — the reference's ``examples/fusion.cpp``
pipeline (localize → fuse/augment/carve) on a synthetic sequence, with
artifact output.

Usage: python examples/fusion.py [num_frames] [out_dir]
"""

import sys

import numpy as np

from cilantro_tpu.core import CameraIntrinsics
from cilantro_tpu.core.containers import PointCloud
from cilantro_tpu.slam import ate_rmse, run_fusion_sequence, synthetic_sequence
from cilantro_tpu.viz import dump_artifacts

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 12
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fusion_out"

k = CameraIntrinsics.kinect_640()
h, w = 480, 640
print("rendering synthetic sequence...")
depths, gt = synthetic_sequence(frames, h, w, k, seed=0)

fmap, metrics = run_fusion_sequence(depths, k, map_capacity=2 * h * w)
ate = ate_rmse(metrics.poses, gt)
print(
    f"{metrics.frames} frames, {metrics.seconds_per_frame*1e3:.1f} ms/frame, "
    f"ATE {ate*1e3:.2f} mm, {metrics.num_map_points} map points"
)

cloud = PointCloud(
    points=fmap.points, normals=fmap.normals,
    colors=fmap.colors, valid=fmap.valid,
)
dump_artifacts(out_dir, cloud, metrics.poses, gt, prefix="fusion")
print(f"artifacts in {out_dir}/")
