"""Classical multidimensional scaling.

Maps ``include/cilantro/utilities/multidimensional_scaling.hpp``: square the
distances, double-center the Gram matrix, take the top eigenpairs, embed as
``V·√Λ``. The reference uses Spectra's Lanczos for the top-k eigenpairs; a
dense ``eigh`` is the right call on TPU for the N ≤ few-thousand regime MDS
is used in (the MXU eats dense symmetric eigensolves; no sparse tree code).
Eigengap-based dimension estimation mirrors the reference (``:46-68``).
"""

from __future__ import annotations

import dataclasses
from functools import partial


import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MDSResult:
    embedding: jax.Array  # (N, max_dim), zero-padded beyond used_dims
    eigenvalues: jax.Array  # (max_dim,) descending
    used_dims: jax.Array  # int32 (eigengap estimate or requested dim)


@partial(jax.jit, static_argnames=("max_dim", "estimate_dim"))
def mds(
    distances: jax.Array,
    max_dim: int,
    *,
    squared: bool = False,
    estimate_dim: bool = False,
) -> MDSResult:
    """Embed an (N, N) symmetric distance matrix into ``max_dim`` dimensions.

    ``estimate_dim=True`` picks the dimension at the largest eigengap among
    the positive eigenvalues (reference ``estimateEmbeddingDimensionEigengap``).
    """
    n = distances.shape[0]
    d2 = distances if squared else distances * distances
    j = jnp.eye(n) - jnp.full((n, n), 1.0 / n)
    b = -0.5 * j @ d2 @ j  # double-centered Gram
    w, v = jnp.linalg.eigh(b)  # ascending
    w = w[::-1][:max_dim]
    v = v[:, ::-1][:, :max_dim]
    w_pos = jnp.maximum(w, 0.0)
    emb = v * jnp.sqrt(w_pos)[None, :]
    if estimate_dim:
        gaps = w_pos[:-1] - w_pos[1:]
        used = jnp.argmax(gaps).astype(jnp.int32) + 1
        emb = jnp.where(jnp.arange(max_dim)[None, :] < used, emb, 0.0)
    else:
        used = jnp.int32(max_dim)
    return MDSResult(embedding=emb, eigenvalues=w_pos, used_dims=used)
