"""ImageViewer demo — the reference's ``examples/image_viewer.cpp`` shows an
RGB + depth image pair from a camera stream; a headless TPU host instead
renders the pair from a cloud through the device z-buffer rasterizer and
exports two zoomable/pannable HTML image views.

Usage: python examples/image_viewer.py [cloud.ply] [out_dir]
"""

import os
import sys

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.core.containers import PointCloud
from cilantro_tpu.core.rgbd import CameraIntrinsics, cloud_to_rgbd
from cilantro_tpu.utils import read_point_cloud
from cilantro_tpu.utils.colormap import colormap
from cilantro_tpu.viz import ImageViewer, auto_camera

path = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/examples/test_clouds/frame_1.ply"
)
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cilantro_tpu_viz"
os.makedirs(out_dir, exist_ok=True)

pts, normals, colors = read_point_cloud(path)
cloud = PointCloud(
    points=jnp.asarray(pts),
    normals=None if normals is None else jnp.asarray(normals),
    colors=jnp.asarray(colors) if colors is not None
    else 0.5 * (jnp.asarray(normals) + 1.0),
)

# Render RGB + depth through the device rasterizer (the framework's own
# points->RGBD conversion, core/rgbd.py).
intr = CameraIntrinsics.kinect_640()
pose = auto_camera(np.asarray(cloud.points))
pts_cam = pose.inverse().apply(cloud.points)
cam_cloud = PointCloud(points=pts_cam, colors=cloud.colors)
depth, rgb = cloud_to_rgbd(cam_cloud, intr, 480, 640)

rgb_np = np.asarray(rgb)
depth_np = np.asarray(depth)
print(f"rendered {rgb_np.shape} rgb + depth; "
      f"depth range [{depth_np[depth_np > 0].min():.3f}, {depth_np.max():.3f}] m")

p1 = ImageViewer("rgb").set_image(rgb_np).export_html(
    os.path.join(out_dir, "image_viewer_rgb.html"))
valid = depth_np > 0
lo, hi = depth_np[valid].min(), depth_np.max()
norm = np.where(valid, (depth_np - lo) / max(hi - lo, 1e-9), 0.0)
depth_vis = np.asarray(colormap(jnp.asarray(norm), "jet")) * valid[..., None]
p2 = ImageViewer("depth").set_image(depth_vis).export_html(
    os.path.join(out_dir, "image_viewer_depth.html"))
print(f"rgb -> {p1}\ndepth -> {p2}")
