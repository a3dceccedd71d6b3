"""RANSAC + clustering demo — the reference's ``ransac_plane_estimator.cpp``,
``ransac_transform_estimator.cpp`` and clustering examples in one script.

Usage: python examples/ransac_and_clustering.py [cloud.ply]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from cilantro_tpu.clustering import connected_components, edge_mask_from_evaluator, kmeans
from cilantro_tpu.model_estimation import ransac_plane, ransac_transform
from cilantro_tpu.neighbors import knn_search
from cilantro_tpu.utils import read_point_cloud

path = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/examples/test_clouds/frame_1.ply"
)
pts, normals, _ = read_point_cloud(path)
pts_j = jnp.asarray(pts[:: max(len(pts) // 15000, 1)])  # subsample for demo
print(f"{pts_j.shape[0]} points")

# --- dominant plane ---------------------------------------------------------
plane, res = ransac_plane(jax.random.PRNGKey(0), pts_j, 0.01, num_hypotheses=200)
print(
    f"RANSAC plane: n={np.asarray(plane.normal).round(3)}, "
    f"d={float(plane.offset):.3f}, inliers={int(res.num_inliers)}"
)

# --- robust transform from corrupted correspondences ------------------------
rng = np.random.default_rng(0)
sub = np.asarray(pts_j[:2000])
ang = 0.3
r = np.array(
    [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
    np.float32,
)
t = np.float32([0.1, -0.2, 0.3])
dst = sub @ r.T + t
dst[:500] = rng.uniform(-2, 2, (500, 3))  # 25% junk correspondences
tf, tres = ransac_transform(
    jax.random.PRNGKey(1), jnp.asarray(sub), jnp.asarray(dst), 0.02,
    num_hypotheses=200,
)
print(
    f"RANSAC transform: rot err {np.linalg.norm(np.asarray(tf.linear)-r):.2e}, "
    f"t err {np.linalg.norm(np.asarray(tf.translation)-t):.2e}, "
    f"inliers {int(tres.num_inliers)}/2000"
)

# --- k-means ----------------------------------------------------------------
km = kmeans(jax.random.PRNGKey(2), pts_j, 8)
print(f"k-means: {int(km.iterations)} iterations, 8 clusters")

# --- connected components (euclidean) ---------------------------------------
nb = knn_search(pts_j, pts_j, 8, exclude_self=True)
em = edge_mask_from_evaluator(nb, pts_j, max_distance=0.02)
cc = connected_components(nb, edge_mask=em, min_size=100)
print(
    f"connected components: {int(cc.num_components)} segments ≥100 pts, "
    f"largest {int(cc.sizes[0])}"
)
