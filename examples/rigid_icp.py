"""Rigid ICP demo — the reference's ``examples/rigid_icp.cpp`` recipe:
apply a known transform to a cloud, recover it, print TRUE vs ESTIMATED.

Usage: python examples/rigid_icp.py [cloud.ply]
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.utils import read_point_cloud
from cilantro_tpu.registration import icp_multires

path = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/examples/test_clouds/frame_1.ply"
)
pts, normals, _ = read_point_cloud(path)
print(f"{len(pts)} points from {path}")

# Distort: a known rigid transform about the centroid.
ang = 0.05
r_true = np.array(
    [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
    np.float32,
)
t_true = np.array([0.02, -0.015, 0.01], np.float32)
c = pts.mean(0)
src = (pts - c) @ r_true.T + t_true + c

t0 = time.time()
res = icp_multires(
    jnp.asarray(src),
    jnp.asarray(pts),
    dst_normals=jnp.asarray(normals) if normals is not None else None,
    metric="combined",
    convergence_tol=1e-6,
)
est = np.asarray(res.transform.matrix())
print(f"registered in {time.time()-t0:.2f}s (includes compile)")

true = np.eye(4, dtype=np.float32)
true[:3, :3] = r_true.T
true[:3, 3] = c - r_true.T @ (t_true + c)
print("TRUE transform (inverse of distortion):\n", true)
print("ESTIMATED transform:\n", est)
print("max abs error:", np.abs(est - true).max())
