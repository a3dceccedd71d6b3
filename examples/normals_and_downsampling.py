"""Normal estimation + grid downsampling demo — the reference's
``normal_estimation.cpp`` / ``downsampling.cpp`` examples.

Usage: python examples/normals_and_downsampling.py [cloud.ply]
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.core.containers import PointCloud
from cilantro_tpu.utils import read_point_cloud

path = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/examples/test_clouds/frame_1.ply"
)
pts, stored_normals, _ = read_point_cloud(path)
cloud = PointCloud(points=jnp.asarray(pts))
print(f"{len(pts)} points")

t0 = time.time()
down = cloud.grid_downsampled(0.01)
print(f"downsample @1cm: {int(down.num_valid())} bins ({time.time()-t0:.2f}s)")

# kNN normals on a subsample (full-cloud all-pairs kNN is a TPU workload;
# keep the demo snappy on CPU too).
sub = pts[:: max(len(pts) // 20000, 1)]
sub_n = stored_normals[:: max(len(pts) // 20000, 1)] if stored_normals is not None else None
t0 = time.time()
with_n = PointCloud(points=jnp.asarray(sub)).with_normals_knn(k=12)
print(f"kNN normals on {len(sub)} points: {time.time()-t0:.2f}s")

if sub_n is not None:
    est = np.asarray(with_n.normals)
    agree = np.abs(np.einsum("nd,nd->n", est, sub_n))
    print(f"|dot| vs PLY's stored normals: median {np.median(agree):.3f}")
