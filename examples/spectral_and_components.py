"""Spectral clustering + connected components (reference
``examples/spectral_clustering.cpp`` + ``connected_component_extraction.cpp``):
three Laplacians with eigengap model selection, and normal-similarity
connected components on a real cloud.

Usage: python examples/spectral_and_components.py [cloud.ply]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from cilantro_tpu.clustering import (
    connected_components,
    edge_mask_from_evaluator,
    spectral_clustering,
)
from cilantro_tpu.neighbors import knn_search
from cilantro_tpu.utils import read_point_cloud
from cilantro_tpu.utils.graph import function_value_dense

# --- spectral clustering on three concentric rings ------------------------
rng = np.random.default_rng(0)
pts2 = []
for r in (1.0, 3.0, 5.0):
    th = rng.uniform(0, 2 * np.pi, 200)
    pts2.append(
        np.column_stack([r * np.cos(th), r * np.sin(th)])
        + rng.normal(0, 0.05, (200, 2))
    )
rings = jnp.asarray(np.concatenate(pts2), jnp.float32)
nb = knn_search(rings, rings, 12, exclude_self=True)
aff = function_value_dense(
    nb, lambda d: jnp.exp(-d / (2 * 0.4**2)), symmetrize=True
)
true = np.repeat(np.arange(3), 200)
for kind in ("unnormalized", "normalized", "random_walk"):
    est = spectral_clustering(
        jax.random.PRNGKey(0), aff, num_clusters=None, kind=kind
    )
    res = spectral_clustering(jax.random.PRNGKey(0), aff, 3, kind=kind)
    labels = np.asarray(res.labels)
    # Purity: each true ring should map to one cluster.
    purity = 0
    for t in range(3):
        vals, counts = np.unique(labels[true == t], return_counts=True)
        purity += counts.max()
    print(
        f"spectral [{kind:12s}]: eigengap estimate "
        f"{int(est.num_clusters)} (reference heuristic), k=3 purity "
        f"{purity}/600"
    )

# --- connected components on a real cloud ---------------------------------
path = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/examples/test_clouds/frame_1.ply"
)
pts, nrm, _ = read_point_cloud(path)
sel = slice(0, len(pts), 8)  # subsample for the dense demo
p = jnp.asarray(pts[sel])
n = jnp.asarray(nrm[sel])
nb = knn_search(p, p, 10, exclude_self=True)
# Similarity gate: neighbors within 2 cm AND normals within 30°
# (the reference's NormalsProximityEvaluator composition).
edge_ok = edge_mask_from_evaluator(
    nb,
    lambda i, j, d: (d <= 0.02**2)
    & (jnp.sum(n[i] * n[j], axis=-1) >= jnp.cos(jnp.deg2rad(30.0))),
)
cc = connected_components(nb, edge_mask=edge_ok, min_size=50)
sizes = np.asarray(cc.sizes)
sizes = np.sort(sizes[sizes > 0])[::-1]
print(
    f"connected components ({p.shape[0]} pts): {len(sizes)} segments ≥ 50 "
    f"pts; largest {sizes[:5].tolist()}"
)
