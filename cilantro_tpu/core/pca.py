"""Principal component analysis.

Maps ``include/cilantro/core/principal_component_analysis.hpp``: mean +
covariance → symmetric eigendecomposition, eigenvectors sorted *descending*
with a determinant-sign fix (``principal_component_analysis.hpp:76-84``), and
``project`` / ``reconstruct`` to/from the leading subspace (``:46-68``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .covariance import mean_and_covariance


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PCA:
    mean: jax.Array        # (D,)
    eigenvalues: jax.Array  # (D,) descending
    eigenvectors: jax.Array  # (D, D) columns, descending, det = +1

    def project(self, points: jax.Array, num_components: int) -> jax.Array:
        basis = self.eigenvectors[:, :num_components]
        return (points - self.mean) @ basis

    def reconstruct(self, projected: jax.Array) -> jax.Array:
        k = projected.shape[-1]
        basis = self.eigenvectors[:, :k]
        return projected @ basis.T + self.mean


def fit_pca(points: jax.Array, mask: Optional[jax.Array] = None) -> PCA:
    mean, cov, _ = mean_and_covariance(points, mask)
    w, v = jnp.linalg.eigh(cov)
    w = w[..., ::-1]
    v = v[..., :, ::-1]
    # Determinant-sign fix: make the basis a proper rotation.
    det = jnp.linalg.det(v)
    v = v.at[..., :, -1].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    return PCA(mean=mean, eigenvalues=w, eigenvectors=v)
