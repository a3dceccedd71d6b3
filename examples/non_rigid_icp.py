"""Non-rigid (embedded-deformation-graph) ICP demo — the reference's
``examples/non_rigid_icp.cpp`` recipe: bend a cloud smoothly, recover the
warp field with 2.5 cm control nodes.

Usage: python examples/non_rigid_icp.py [cloud.ply]
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.core.containers import PointCloud
from cilantro_tpu.core.grid import grid_downsample
from cilantro_tpu.registration import (
    build_deformation_graph,
    icp_warp_field,
    warp_points,
)
from cilantro_tpu.utils import read_point_cloud

path = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/examples/test_clouds/frame_1.ply"
)
src, _, _ = read_point_cloud(path)
print(f"{len(src)} points")

dst = src.copy()
dst[:, 2] += 0.02 * np.sin(8.0 * src[:, 0])
dst[:, 1] += 0.01 * np.cos(6.0 * src[:, 0])

ctrl = grid_downsample(
    PointCloud(points=jnp.asarray(src)), 0.025, capacity=16384
)
graph = build_deformation_graph(
    jnp.asarray(src), ctrl.points, node_valid=ctrl.valid,
    k_anchors=4, k_arcs=8,
)
print(f"{int(jnp.sum(ctrl.valid))} control nodes")

t0 = time.time()
node_tf, iters, converged = icp_warp_field(
    graph,
    jnp.asarray(src),
    jnp.asarray(dst),
    max_corr_dist_sq=0.0025,
    point_weight=1.0,
    plane_weight=0.0,
    stiffness=50.0,
    max_iterations=10,
    max_cg_iterations=200,
)
warped = np.asarray(warp_points(graph, node_tf, jnp.asarray(src)))
err = np.linalg.norm(warped - dst, axis=1)
print(f"done in {time.time()-t0:.1f}s ({int(iters)} outer iterations)")
print(f"median error {np.median(err)*1e3:.2f} mm vs ~20 mm deformation")
