"""k-means clustering (Lloyd iterations).

TPU-native redesign of ``include/cilantro/clustering/kmeans.hpp``:

* assignment by brute force is ONE ``(N, K)`` distance matmul + argmin —
  exactly the compile-time fast path the reference special-cases for L2
  (``kmeans.hpp:86-120``); there is no kd-tree-over-centroids variant because
  the matmul already runs at MXU rate for any practical K;
* centroid update is a ``segment_sum``;
* empty-cluster repair follows the reference's policy (steal far points,
  ``kmeans.hpp:133-176``) in batched form: the e-th empty cluster takes the
  e-th farthest-from-its-centroid point;
* init: k-means++ (D² categorical sampling via one ``fori_loop``) by
  default — on embeddings with very uneven cluster sizes (e.g. spectral
  indicator embeddings) random init routinely misses small clusters and
  Lloyd cannot recover; ``init="random"`` gives the reference's distinct
  random points (swap-sampling analogue, ``kmeans.hpp:38-49``).

The whole fit is one jitted ``lax.while_loop``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KMeansResult:
    centroids: jax.Array  # (K, D)
    labels: jax.Array  # (N,) int32 — capacity slot K-1 junk for invalid pts
    iterations: jax.Array  # int32
    converged: jax.Array  # bool


def _assign(points, centroids, valid, metric="l2"):
    """(N,) argmin cluster per point via one matmul-shaped distance block.
    ``metric`` plugs any of the NN metric family (L1/L2/SO2/SO3) into the
    assignment, mirroring the reference's pluggable nanoflann metric
    (``clustering/kmeans.hpp:9-13``); centroid updates stay means (Lloyd)."""
    from ..neighbors.bruteforce import _TILE_DISTS

    dist = _TILE_DISTS[metric](points, centroids)  # (N, K)
    lab = jnp.argmin(dist, axis=1).astype(jnp.int32)
    # d(label) == min over the row — no take_along_axis row gather needed.
    d_min = jnp.where(valid, jnp.min(dist, axis=1), -jnp.inf)
    return lab, d_min


def _update(points, labels, valid, k):
    """Per-cluster sums/counts via ONE one-hot matmul on the MXU.

    A ``segment_sum`` here is an N-row scatter-add (~15-30 ns/row serialized
    per Lloyd iteration); the (N, K) one-hot contraction is a dense matmul
    the MXU eats in microseconds and is exactly equal (0/1 weights)."""
    w = valid.astype(points.dtype)
    onehot = (
        labels[:, None] == jnp.arange(k, dtype=labels.dtype)[None, :]
    ).astype(points.dtype) * w[:, None]
    sums = jnp.einsum(
        "nk,nd->kd", onehot, points, preferred_element_type=points.dtype
    )
    counts = jnp.sum(onehot, axis=0)
    return sums, counts


def _kmeanspp_init(key, points, valid, k, metric):
    """k-means++ seeding: each next centroid is a point sampled with
    probability ∝ its (squared) distance to the nearest already-chosen
    centroid. Chosen/duplicate points get a log(1e-30) floor, so they are
    only re-picked when no distinct valid point remains."""
    from ..neighbors.bruteforce import _TILE_DISTS

    n = points.shape[0]
    keys = jax.random.split(key, k)
    i0 = jax.random.categorical(keys[0], jnp.where(valid, 0.0, -jnp.inf))
    cents = jnp.zeros((k, points.shape[1]), points.dtype).at[0].set(points[i0])
    d2 = _TILE_DISTS[metric](points, points[i0][None])[:, 0]

    def body(j, carry):
        cents, d2 = carry
        logits = jnp.where(valid, jnp.log(jnp.maximum(d2, 1e-30)), -jnp.inf)
        idx = jax.random.categorical(keys[j], logits)
        c = points[idx]
        d2 = jnp.minimum(d2, _TILE_DISTS[metric](points, c[None])[:, 0])
        return cents.at[j].set(c), d2

    cents, _ = jax.lax.fori_loop(1, k, body, (cents, d2))
    return cents


@partial(
    jax.jit,
    static_argnames=("num_clusters", "max_iterations", "metric", "init"),
)
def kmeans(
    key: jax.Array,
    points: jax.Array,
    num_clusters: int,
    *,
    valid: Optional[jax.Array] = None,
    max_iterations: int = 100,
    tol: float = 1e-7,
    metric: str = "l2",
    init: str = "k-means++",
) -> KMeansResult:
    n, d = points.shape
    k = num_clusters
    if valid is None:
        valid = jnp.ones(n, bool)

    if init == "k-means++":
        init_centroids = _kmeanspp_init(key, points, valid, k, metric)
    elif init == "random":
        # Distinct random valid points as initial centroids.
        scores = jax.random.uniform(key, (n,)) + jnp.where(valid, 0.0, 2.0)
        _, init_idx = jax.lax.top_k(-scores, k)
        init_centroids = points[init_idx]
    else:
        raise ValueError(f"unknown init {init!r}")

    def body(carry):
        centroids, _, it, _ = carry
        labels, d_min = _assign(points, centroids, valid, metric)
        sums, counts = _update(points, labels, valid, k)

        # Empty-cluster repair: e-th empty cluster ← e-th farthest point.
        # The top_k over N only runs on iterations that actually have an
        # empty cluster (rare after the first assignment).
        empty = counts == 0
        means = sums / jnp.maximum(counts, 1.0)[:, None]

        def _repair(_):
            n_far = min(k, n)
            _, far_idx = jax.lax.top_k(d_min, n_far)  # farthest valid pts
            empty_rank = jnp.cumsum(empty.astype(jnp.int32)) - 1  # (K,)
            steal = points[far_idx[jnp.clip(empty_rank, 0, n_far - 1)]]
            return jnp.where(empty[:, None], steal, means)

        new_centroids = jax.lax.cond(
            jnp.any(empty), _repair, lambda _: means, operand=None
        )
        shift = jnp.max(jnp.sum((new_centroids - centroids) ** 2, axis=1))
        return new_centroids, labels, it + 1, shift

    def cond(carry):
        _, _, it, shift = carry
        return (it < max_iterations) & (shift >= tol)

    init_state = (
        init_centroids,
        jnp.zeros(n, jnp.int32),
        jnp.array(0, jnp.int32),
        jnp.array(jnp.inf, points.dtype),
    )
    centroids, labels, it, shift = jax.lax.while_loop(cond, body, init_state)
    labels, _ = _assign(points, centroids, valid, metric)  # final consistent labels
    return KMeansResult(
        centroids=centroids,
        labels=labels,
        iterations=it,
        converged=shift < tol,
    )
