"""Interactive Visualizer demo — the reference's ``examples/visualizer.cpp``
recipe, headless-TPU style: two scenes exported as standalone interactive
HTML artifacts (WebGL trackball viewer, zero dependencies).

Scene 1: the cloud colormapped by distance-to-origin + a coordinate frame +
anchored text.  Scene 2: two opacity-blended copies with correspondence
lines.  Open the written ``.html`` files in any browser; keys mirror the
reference handler (r/+/-/n/w/p/l/h/q).

Usage: python examples/visualizer.py [cloud.ply] [out_dir]
"""

import os
import sys

import numpy as np

from cilantro_tpu.utils import read_point_cloud
from cilantro_tpu.viz import (
    CoordinateFrameRenderable,
    PointCloudRenderable,
    PointCorrespondencesRenderable,
    RenderingProperties,
    TextRenderable,
    Visualizer,
)

path = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/examples/test_clouds/frame_1.ply"
)
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cilantro_tpu_viz"
os.makedirs(out_dir, exist_ok=True)

pts, normals, colors = read_point_cloud(path)
print(f"{len(pts)} points from {path}")

# --- window 1: scalar-colormapped cloud + frame + text (visualizer.cpp:20-44)
viz1 = Visualizer("Visualizer demo (window 1)", "disp1")
scalars = np.linalg.norm(pts, axis=1)
viz1.add_object(
    "pcd",
    PointCloudRenderable(
        (pts, normals, None),
        RenderingProperties(colormap_type="jet", line_density_fraction=0.2,
                            use_lighting=False),
    ),
).set_point_values(scalars)
viz1.add_object(
    "axis",
    CoordinateFrameRenderable(np.eye(4), scale=0.4,
                              rp=RenderingProperties(line_width=5.0)),
)
viz1.add_object(
    "text",
    TextRenderable(
        "Coordinate Frame", [0, 0, 0],
        RenderingProperties(font_size=20.0, point_color=(1.0, 1.0, 0.0),
                            text_anchor_point=(0.5, -1.0)),
    ),
)
p1 = viz1.export_html(os.path.join(out_dir, "visualizer_window1.html"))
print(f"window 1 -> {p1}")

# --- window 2: blended clouds + correspondences (visualizer.cpp:46-67) ----
shifted = pts + np.array([1.0, 0.0, 1.0], np.float32)
viz2 = Visualizer("Visualizer demo (window 2)", "disp2")
viz2.add_object(
    "pcd1",
    PointCloudRenderable(
        pts, RenderingProperties(point_color=(1.0, 0.0, 0.0), opacity=0.4)
    ),
)
viz2.add_object(
    "pcd2",
    PointCloudRenderable(
        shifted, RenderingProperties(point_color=(0.0, 0.0, 1.0), opacity=0.4)
    ),
)
viz2.add_object(
    "correspondences",
    PointCorrespondencesRenderable(
        shifted, pts,
        rp=RenderingProperties(line_density_fraction=0.005, opacity=0.3),
    ),
)
viz2.add_object(
    "axis",
    CoordinateFrameRenderable(np.eye(4), scale=0.4,
                              rp=RenderingProperties(line_width=5.0)),
)
p2 = viz2.export_html(os.path.join(out_dir, "visualizer_window2.html"))
print(f"window 2 -> {p2}")
print("Press 'n' in the viewer to toggle rendering of normals")
