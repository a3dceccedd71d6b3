"""Multidimensional scaling + PCA (reference
``examples/multidimensional_scaling.cpp`` +
``principal_component_analysis.cpp``).

Usage: python examples/mds_and_pca.py
"""

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.core.pca import fit_pca
from cilantro_tpu.utils.mds import mds

rng = np.random.default_rng(0)

# --- MDS: recover a planar configuration from pairwise distances ----------
true2d = rng.uniform(-1, 1, (200, 2)).astype(np.float32)
d = np.linalg.norm(true2d[:, None] - true2d[None, :], axis=-1)
res = mds(jnp.asarray(d), max_dim=6, estimate_dim=True)
emb = np.asarray(res.embedding)[:, : int(res.used_dims)]
d_emb = np.linalg.norm(emb[:, None] - emb[None, :], axis=-1)
print(
    f"MDS: eigengap picked dim {int(res.used_dims)} (true 2); "
    f"distance-matrix RMS error {np.sqrt(((d_emb - d) ** 2).mean()):.2e}"
)

# --- PCA: project/reconstruct an elongated cloud --------------------------
basis = np.array([[3, 0, 0], [0, 0.5, 0], [0, 0, 0.05]], np.float32)
cloud = rng.standard_normal((5000, 3)).astype(np.float32) @ basis
pca = fit_pca(jnp.asarray(cloud))
print(
    "PCA eigenvalues (→ 9 : 0.25 : 0.0025):",
    np.round(np.asarray(pca.eigenvalues), 4),
)
proj2 = pca.project(jnp.asarray(cloud), 2)
rec = pca.reconstruct(proj2)
err = np.linalg.norm(np.asarray(rec) - cloud, axis=1)
print(
    f"project→2D→reconstruct residual: mean {err.mean():.4f} "
    f"(≈ the dropped component's σ = 0.05)"
)
det = float(np.linalg.det(np.asarray(pca.eigenvectors)))
print(f"basis determinant {det:+.3f} (right-handed by construction)")
