"""Spectral clustering.

TPU-native redesign of ``include/cilantro/clustering/spectral_clustering.hpp``:

* graph Laplacian in the reference's three flavors (unnormalized /
  normalized-symmetric / random-walk, ``spectral_clustering.hpp:44,88-180``);
* smallest-k eigenvectors: the reference uses bundled Spectra
  (shift-invert Lanczos). On TPU a dense ``eigh`` is both simpler and faster
  for the N ≤ few-thousand regime spectral clustering usually lives in (the
  MXU solves dense symmetric eigenproblems at matmul rate; sparse Lanczos is
  a latency chain of matvecs). The random-walk variant solves the equivalent
  symmetric problem ``D^{-1/2} L D^{-1/2}`` and rescales, keeping ``eigh``;
* for LARGE N the dense (N, N) affinity is the limit, not the eigensolver:
  :func:`spectral_embedding_knn` / :func:`spectral_clustering_knn` work on
  the fixed-shape masked kNN graph directly (the output of
  ``neighbors.knn_search``) and run block-iterative LOBPCG on the
  spectrum-shifted operator ``σI − L`` (top-k of the shift = smallest-k of
  L) — the TPU answer to the reference's sparse Spectra/Lanczos path, with
  matvecs that are one gather + one segment-sum over the edge list;
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
    return _cluster_embedding(
        key, emb, vals, num_clusters, k_emb, row_normalize
    )


def _cluster_embedding(key, emb, vals, num_clusters, k_emb, row_normalize):
    """Shared tail of the dense and kNN paths: eigengap count estimation,
    unused-column zeroing (static shapes), optional row normalization, and
    the final k-means fit."""
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


# ---------------------------------------------------------------------------
# Large-N path: masked kNN graph + block-iterative eigensolver.
# ---------------------------------------------------------------------------


def _knn_laplacian_matvec(indices, weights, mask, kind):
    """Returns ``(matvec, sigma, dm)`` for the symmetrized kNN affinity
    W = (A + Aᵀ)/2: ``matvec(X) (N, B) → L X``, a Gershgorin upper bound
    ``sigma ≥ λ_max(L)``, and the D^{-1/2} vector (None when unnormalized).

    One gather (A X) + one segment-sum (Aᵀ X) per application — no (N, N)
    object ever exists.
    """
    n, k = indices.shape
    wm = jnp.where(mask, weights, 0.0)
    flat_idx = indices.reshape(-1)

    def w_apply(x):  # (N, B) → W x
        ax = jnp.einsum("nk,nkb->nb", wm, x[indices])
        atx = jax.ops.segment_sum(
            (wm[..., None] * x[:, None, :]).reshape(n * k, -1),
            flat_idx,
            num_segments=n,
        )
        return 0.5 * (ax + atx)

    d = w_apply(jnp.ones((n, 1), wm.dtype))[:, 0]
    if kind == "unnormalized":
        sigma = 2.0 * jnp.max(d)

        def matvec(x):
            return d[:, None] * x - w_apply(x)

        return matvec, sigma, None

    dm = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-30))

    def matvec(x):  # L_sym x = x − D^{-1/2} W D^{-1/2} x
        return x - dm[:, None] * w_apply(dm[:, None] * x)

    return matvec, jnp.asarray(2.0, wm.dtype), dm


@partial(
    jax.jit,
    static_argnames=("num_components", "kind", "max_iterations",
                     "filter_degree"),
)
def spectral_embedding_knn(
    key: jax.Array,
    indices: jax.Array,
    weights: jax.Array,
    mask: jax.Array,
    num_components: int,
    *,
    kind: str = "normalized",
    max_iterations: int = 100,
    filter_degree: int = 8,
    tol: float = 0.0,
):
    """Smallest-eigenvector Laplacian embedding of a masked kNN affinity
    graph (``indices/weights/mask (N, k)`` as produced by
    ``neighbors.knn_search`` + an affinity of the distances).

    LOBPCG on the polynomial-filtered operator ``((σI − L)/σ)^q`` — a
    monotone-decreasing map of [0, σ] onto [0, 1], so its top-k eigenvectors
    are L's smallest-k, with the bottom of L's (near-degenerate, Lanczos-
    hostile) spectrum sharpened by ~q per iteration. This is the matvec-only
    TPU answer to the reference's shift-invert Spectra/Lanczos path
    (``spectral_clustering.hpp:88-180``), which instead pays a sparse
    factorization. Eigenvalues are recovered from the filtered eigenvectors
    by Rayleigh quotients against the true L (exact for converged vectors).
    σ = 2 for the normalized Laplacian, a Gershgorin bound otherwise.

    ``tol=0.0`` (default) runs all ``max_iterations`` LOBPCG steps: the
    filtered spectrum packs the sought eigenvalues into a narrow band near
    1, where LOBPCG's default f32 stopping rule fires many decades too
    early (observed: stop at iteration 6 on the *wrong* interior modes).
    Returns ``(embedding (N, num_components), eigenvalues ascending)``.
    """
    from jax.experimental.sparse.linalg import lobpcg_standard

    n = indices.shape[0]
    matvec, sigma, dm = _knn_laplacian_matvec(indices, weights, mask, kind)

    def filtered(x):
        for _ in range(max(1, filter_degree)):
            x = x - matvec(x) / sigma
        return x

    x0 = jax.random.normal(key, (n, num_components), weights.dtype)
    _, v, _ = lobpcg_standard(filtered, x0, m=max_iterations, tol=tol)
    lam = jnp.einsum("nk,nk->k", v, matvec(v))  # Rayleigh (v orthonormal)
    order = jnp.argsort(lam)
    lam = lam[order]
    emb = v[:, order]
    if kind == "random_walk":
        emb = emb * dm[:, None]
    return emb, lam


@partial(
    jax.jit,
    static_argnames=("num_clusters", "kind", "max_embedding_dim",
                     "row_normalize", "max_iterations", "filter_degree"),
)
def spectral_clustering_knn(
    key: jax.Array,
    indices: jax.Array,
    weights: jax.Array,
    mask: jax.Array,
    num_clusters: Optional[int] = None,
    *,
    kind: str = "normalized",
    max_embedding_dim: int = 8,
    row_normalize: bool = True,
    max_iterations: int = 100,
    filter_degree: int = 8,
) -> SpectralResult:
    """Spectral clustering on a masked kNN affinity graph — the large-N twin
    of :func:`spectral_clustering` (same eigengap estimation and k-means on
    the row-normalized embedding; iterative embedding instead of dense
    ``eigh``)."""
    k_key, e_key = jax.random.split(key)
    k_emb = max_embedding_dim if num_clusters is None else num_clusters
    emb, vals = spectral_embedding_knn(
        e_key, indices, weights, mask, k_emb, kind=kind,
        max_iterations=max_iterations, filter_degree=filter_degree,
    )
    return _cluster_embedding(
        k_key, emb, vals, num_clusters, k_emb, row_normalize
    )
