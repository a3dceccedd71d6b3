"""Unified neighborhood-search API.

Maps the reference's search-spec dispatch
(``core/nearest_neighbors.hpp:58-86`` — ``KNNNeighborhoodSpecification``,
``RadiusNeighborhoodSpecification``, ``KNNInRadiusNeighborhoodSpecification``
selecting a ``KDTree::search`` overload at ``core/kd_tree.hpp:320-388``) onto
three functions returning fixed-shape ``Neighborhoods``:

* :func:`knn_search`           — k nearest, all valid;
* :func:`radius_search`        — up to ``max_results`` within radius, masked;
* :func:`knn_in_radius_search` — k nearest, masked by radius.

All return squared L2 distances (or L1 distances with ``metric='l1'``).
Backend selection is automatic for radius-bounded queries: tiled brute force
for small problems, the Morton-sorted grid-bucketed backend
(:mod:`.gridhash`) for large ones; both are exact, and fixed-capacity
truncation is reported per query via ``Neighborhoods.overflowed``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .bruteforce import INVALID_DIST, knn


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Neighborhoods:
    """Fixed-shape neighborhood set: the TPU analogue of the reference's
    ``NeighborhoodSet`` (``core/nearest_neighbors.hpp:50-56``).

    ``indices (Q, k) int32`` are always safe to gather with (invalid slots hold
    0); ``mask (Q, k)`` marks real neighbors; ``distances (Q, k)`` holds the
    metric value (squared L2 by default), ``INVALID_DIST`` in masked slots.
    ``overflowed (Q,)``, when present, flags queries whose true result set was
    truncated by the fixed ``max_results`` capacity (the reference's dynamic
    ``NeighborhoodSet`` grows instead; a fixed-shape API must say when it
    clipped).
    """

    indices: jax.Array
    distances: jax.Array
    mask: jax.Array
    overflowed: Optional[jax.Array] = None

    @property
    def k(self) -> int:
        return self.indices.shape[-1]

    def counts(self) -> jax.Array:
        return jnp.sum(self.mask, axis=-1)


def _finish(dist, idx, overflowed=None) -> Neighborhoods:
    mask = dist < INVALID_DIST
    return Neighborhoods(
        indices=jnp.where(mask, idx, 0),
        distances=dist,
        mask=mask,
        overflowed=overflowed,
    )


def knn_search(
    queries: jax.Array,
    keys: jax.Array,
    k: int,
    *,
    query_valid: Optional[jax.Array] = None,
    key_valid: Optional[jax.Array] = None,
    metric: str = "l2",
    exclude_self: bool = False,
    backend: str = "auto",
) -> Neighborhoods:
    """Exact kNN. ``backend``: ``'auto'`` (TPU: pruned kernel for large L2
    3-D problems, fused Pallas otherwise; CPU: XLA scan), ``'pruned'``
    (force :func:`..pallas_nn.knn_pruned`), or ``'brute'`` (never prune)."""
    if backend not in ("auto", "pruned", "brute"):
        raise ValueError(f"unknown backend {backend!r}")
    if backend == "pruned":
        if metric != "l2" or queries.shape[1] != 3:
            raise ValueError(
                "backend='pruned' supports the L2 metric in 3D only "
                f"(got metric={metric!r}, D={queries.shape[1]})"
            )
        from .pallas_nn import knn_pruned

        dist, idx = knn_pruned(
            queries,
            keys,
            k,
            query_valid=query_valid,
            key_valid=key_valid,
            exclude_self=exclude_self,
        )
        return _finish(dist, idx)
    dist, idx = knn(
        queries,
        keys,
        k,
        query_valid=query_valid,
        key_valid=key_valid,
        metric=metric,
        exclude_self=exclude_self,
        allow_pruned=backend == "auto",
    )
    return _finish(dist, idx)


def radius_search(
    queries: jax.Array,
    keys: jax.Array,
    radius: float,
    max_results: int,
    *,
    query_valid: Optional[jax.Array] = None,
    key_valid: Optional[jax.Array] = None,
    metric: str = "l2",
    exclude_self: bool = False,
    backend: str = "auto",
) -> Neighborhoods:
    """All neighbors within ``radius``, capped at ``max_results`` (closest
    kept — the reference returns distance-sorted radius results, so a cap
    keeps the same prefix). ``radius`` is compared against squared distance
    for L2, matching the reference's squared-radius convention.

    The result's ``overflowed`` flags queries whose within-radius set was
    truncated by ``max_results`` (or, on the grid backend, whose tile budget
    clipped candidates); without a flag the result is exact.

    ``backend``: ``'auto'`` (on TPU, large 3-D L2 searches with a small
    cap — ``max_results ≤ 16`` — take the compacted-pair Pallas kernel,
    the fastest measured backend for that shape; other large L2 2D/3D
    problems take the grid; everything else brute), ``'grid'``
    (:func:`..gridhash.radius_search_grid`), ``'pruned'``
    (:func:`..pallas_nn.radius_search_pruned` — the compacted-pair Pallas
    kernel; TPU, L2, 3D only), or ``'brute'``.
    """
    d = queries.shape[1]
    if backend == "grid" and (metric != "l2" or d not in (2, 3)):
        raise ValueError(
            "backend='grid' supports the L2 metric in 2D/3D only "
            f"(got metric={metric!r}, D={d})"
        )
    big = queries.shape[0] * keys.shape[0] >= 1 << 26
    if (
        backend == "auto"
        and metric == "l2"
        and d == 3
        and big
        and max_results <= 16
        and jax.default_backend() == "tpu"
    ):
        # Large 3-D L2 on the chip with a small cap: the compacted-pair
        # kernel dominates the gather-grid backend (r4 measured 94 vs
        # 138-181 ms at the 120k/1cm/cap-10 bench row) with the same
        # exactness contract. Its cost scales with the cap (it runs a
        # (max_results+1)-slot top-k fold per query), so large caps —
        # unmeasured territory — keep the grid path.
        backend = "pruned"
    if backend == "pruned":
        if metric != "l2" or d != 3:
            raise ValueError(
                "backend='pruned' supports the L2 metric in 3D only "
                f"(got metric={metric!r}, D={d})"
            )
        from .pallas_nn import radius_search_pruned

        dist, idx, over = radius_search_pruned(
            queries,
            keys,
            radius,
            max_results,
            query_valid=query_valid,
            key_valid=key_valid,
            exclude_self=exclude_self,
        )
        return _finish(dist, idx, over)
    use_grid = backend == "grid" or (
        backend == "auto" and metric == "l2" and d in (2, 3) and big
    )
    if use_grid:
        from .gridhash import radius_search_grid

        dist, idx, over = radius_search_grid(
            queries,
            keys,
            radius,
            max_results,
            query_valid=query_valid,
            key_valid=key_valid,
            exclude_self=exclude_self,
        )
        return _finish(dist, idx, over)

    # Brute: search one extra neighbor so max_results-truncation is exactly
    # detectable (the (cap+1)-th hit inside the radius ⇒ overflow).
    nb = knn_search(
        queries,
        keys,
        max_results + 1,
        query_valid=query_valid,
        key_valid=key_valid,
        metric=metric,
        exclude_self=exclude_self,
        backend=backend,
    )
    r = radius * radius if metric in ("l2", "so2") else radius
    full_mask = nb.mask & (nb.distances <= r)
    over = (
        full_mask[:, max_results]
        if nb.distances.shape[1] > max_results
        else jnp.zeros(queries.shape[0], bool)
    )
    mask = full_mask[:, :max_results]
    return Neighborhoods(
        indices=jnp.where(mask, nb.indices[:, :max_results], 0),
        distances=jnp.where(
            mask, nb.distances[:, :max_results], INVALID_DIST
        ),
        mask=mask,
        overflowed=over,
    )


def knn_in_radius_search(
    queries: jax.Array,
    keys: jax.Array,
    k: int,
    radius: float,
    **kwargs,
) -> Neighborhoods:
    return radius_search(queries, keys, radius, k, **kwargs)
