"""Spectral clustering.

TPU-native redesign of ``include/cilantro/clustering/spectral_clustering.hpp``:

* graph Laplacian in the reference's three flavors (unnormalized /
  normalized-symmetric / random-walk, ``spectral_clustering.hpp:44,88-180``);
* smallest-k eigenvectors: the reference uses bundled Spectra
  (shift-invert Lanczos). On TPU a dense ``eigh`` is both simpler and faster
  for the N ≤ few-thousand regime spectral clustering lives in (the MXU
  solves dense symmetric eigenproblems at matmul rate; sparse Lanczos is a
  latency chain of matvecs). The random-walk variant solves the equivalent
  symmetric problem ``D^{-1/2} L D^{-1/2}`` and rescales, keeping ``eigh``;
* eigengap cluster-count estimation (``:46-68``);
* k-means on the row-normalized embedding (``SpectralClustering`` class,
  ``:318``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .kmeans import kmeans


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpectralResult:
    labels: jax.Array  # (N,) int32
    embedding: jax.Array  # (N, k)
    eigenvalues: jax.Array  # (k,) ascending
    num_clusters: jax.Array  # int32


def laplacian(affinity: jax.Array, kind: str = "normalized") -> jax.Array:
    """Build L from a symmetric affinity matrix W.

    ``unnormalized``: L = D − W; ``normalized``: L_sym = I − D^{-1/2} W D^{-1/2};
    ``random_walk`` uses L_sym too (same eigenvectors up to D^{-1/2} scaling,
    applied in :func:`spectral_embedding`)."""
    d = jnp.sum(affinity, axis=1)
    if kind == "unnormalized":
        return jnp.diag(d) - affinity
    dm = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-30))
    n = affinity.shape[0]
    return jnp.eye(n) - (dm[:, None] * affinity) * dm[None, :]


@partial(jax.jit, static_argnames=("num_components", "kind"))
def spectral_embedding(
    affinity: jax.Array,
    num_components: int,
    kind: str = "normalized",
):
    """Smallest-eigenvector embedding of the Laplacian
    (``computeLaplacianSpectralEmbedding``). Returns (embedding (N, k),
    eigenvalues (k,) ascending)."""
    lap = laplacian(affinity, "unnormalized" if kind == "unnormalized" else kind)
    w, v = jnp.linalg.eigh(lap)
    emb = v[:, :num_components]
    vals = w[:num_components]
    if kind == "random_walk":
        d = jnp.sum(affinity, axis=1)
        emb = emb / jnp.sqrt(jnp.maximum(d, 1e-30))[:, None]
    return emb, vals


def estimate_num_clusters_eigengap(eigenvalues: jax.Array) -> jax.Array:
    """Largest-gap heuristic over ascending Laplacian eigenvalues
    (``spectral_clustering.hpp:46-68``); at least 2."""
    gaps = eigenvalues[1:] - eigenvalues[:-1]
    return jnp.maximum(jnp.argmax(gaps).astype(jnp.int32) + 1, 2)


@partial(
    jax.jit,
    static_argnames=("num_clusters", "kind", "max_embedding_dim", "row_normalize"),
)
def spectral_clustering(
    key: jax.Array,
    affinity: jax.Array,
    num_clusters: Optional[int] = None,
    *,
    kind: str = "normalized",
    max_embedding_dim: int = 8,
    row_normalize: bool = True,
) -> SpectralResult:
    """Cluster from a dense symmetric affinity matrix.

    ``num_clusters=None`` estimates the count via the eigengap; the embedding
    then keeps ``max_embedding_dim`` components with the unused ones zeroed
    (static shapes)."""
    k_emb = max_embedding_dim if num_clusters is None else num_clusters
    emb, vals = spectral_embedding(affinity, k_emb, kind)
    if num_clusters is None:
        n_est = estimate_num_clusters_eigengap(vals)
        col_ok = jnp.arange(k_emb)[None, :] < n_est
        emb = jnp.where(col_ok, emb, 0.0)
        k_fit = k_emb  # capacity; extra clusters starve and stay empty-ish
        num = n_est
    else:
        k_fit = num_clusters
        num = jnp.int32(num_clusters)
    if row_normalize:
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-30
        )
    km = kmeans(key, emb, k_fit)
    return SpectralResult(
        labels=km.labels,
        embedding=emb,
        eigenvalues=vals,
        num_clusters=num,
    )
