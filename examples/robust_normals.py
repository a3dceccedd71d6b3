"""Robust (MCD) normal estimation (reference
``examples/robust_normal_estimation.cpp``): plain vs Minimum-Covariance-
Determinant neighborhood fits on an outlier-contaminated surface, with the
chi-square inlier gate.

Usage: python examples/robust_normals.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from cilantro_tpu.core.covariance import mcd_mean_cov
from cilantro_tpu.core.normals import (
    estimate_normals_knn,
    estimate_normals_robust,
)

rng = np.random.default_rng(0)

# Flat plane (true normal +z) with 25% gross outliers above it.
n = 4000
pts = np.column_stack(
    [rng.uniform(-1, 1, (n, 2)), rng.normal(0, 0.002, n)]
).astype(np.float32)
n_out = n // 4
out_idx = rng.choice(n, n_out, replace=False)
pts[out_idx, 2] += rng.uniform(0.05, 0.3, n_out)

truth = np.array([0, 0, 1.0], np.float32)

plain_n, _, _ = estimate_normals_knn(
    jnp.asarray(pts), k=24, view_point=jnp.array([0, 0, 10.0])
)
rob_n, _, rob_ok = estimate_normals_robust(
    jax.random.PRNGKey(0), jnp.asarray(pts), k=24,
    view_point=jnp.array([0, 0, 10.0]),
)

clean = np.ones(n, bool)
clean[out_idx] = False
ang = lambda nn: np.degrees(  # noqa: E731
    np.arccos(np.clip(np.abs(np.asarray(nn) @ truth), 0, 1))
)
print(
    f"clean-point normal error: plain {np.median(ang(plain_n)[clean]):.2f}° "
    f"vs robust {np.median(ang(rob_n)[clean]):.2f}° (median)"
)

# Chi-square gate: an outlier query against its own neighborhood flips
# valid to False (covariance.hpp:352-359).
nbr = pts[rng.choice(np.flatnonzero(clean), 60)]
inlier_set = np.vstack([pts[clean][:1], nbr]).astype(np.float32)
outlier_set = np.vstack([pts[out_idx][:1], nbr]).astype(np.float32)
_, _, ok_in = mcd_mean_cov(
    jax.random.PRNGKey(1), jnp.asarray(inlier_set), chi_square_threshold=7.81
)
_, _, ok_out = mcd_mean_cov(
    jax.random.PRNGKey(1), jnp.asarray(outlier_set), chi_square_threshold=7.81
)
print(
    f"chi-square gate: inlier query valid={bool(ok_in)}, "
    f"outlier query valid={bool(ok_out)}"
)
