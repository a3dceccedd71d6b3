"""Nearest-neighbor-graph utilities.

Maps ``include/cilantro/utilities/nearest_neighbor_graph_utilities.hpp:8-152``:
neighborhoods → degrees, dense/sparse adjacency, distance, or arbitrary
functor-valued matrices — the affinity inputs to spectral clustering and MDS.
Sparse output is (rows, cols, values) COO triplets in fixed shape (masked).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..neighbors.api import Neighborhoods


def neighborhood_degrees(nb: Neighborhoods) -> jax.Array:
    """Valid-neighbor count per point (``getNNGraphNodeDegrees``)."""
    return nb.counts()


def adjacency_dense(nb: Neighborhoods, symmetrize: bool = True) -> jax.Array:
    """(N, N) boolean adjacency (``getNNGraphAdjacencyDenseMatrix``)."""
    n, k = nb.indices.shape
    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    cols = nb.indices.reshape(-1)
    vals = nb.mask.reshape(-1)
    a = jnp.zeros((n, n), bool).at[rows, cols].max(vals)
    if symmetrize:
        a = a | a.T
    return a


def function_value_dense(
    nb: Neighborhoods,
    fn: Callable[[jax.Array], jax.Array],
    fill: float = 0.0,
    symmetrize: bool = True,
) -> jax.Array:
    """(N, N) matrix of ``fn(squared_distance)`` over graph edges
    (``getNNGraphFunctionValueDenseMatrix``) — e.g. an RBF affinity."""
    n, k = nb.indices.shape
    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    cols = nb.indices.reshape(-1)
    vals = jnp.where(nb.mask, fn(nb.distances), fill).reshape(-1)
    a = jnp.full((n, n), fill).at[rows, cols].max(vals)
    if symmetrize:
        a = jnp.maximum(a, a.T)
    return a


def distance_dense(nb: Neighborhoods, fill: float = 0.0) -> jax.Array:
    """(N, N) squared-distance matrix over graph edges
    (``getNNGraphDistanceDenseMatrix``)."""
    return function_value_dense(nb, lambda d: d, fill=fill)


def function_value_sparse(
    nb: Neighborhoods, fn: Callable[[jax.Array], jax.Array]
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """COO triplets ``(rows, cols, values, mask)`` of ``fn(d²)`` over edges
    (``getNNGraphFunctionValueSparseMatrix``) — fixed shape (N·k,)."""
    n, k = nb.indices.shape
    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    cols = nb.indices.reshape(-1)
    mask = nb.mask.reshape(-1)
    vals = jnp.where(mask, fn(nb.distances.reshape(-1)), 0.0)
    return rows, cols, vals, mask
