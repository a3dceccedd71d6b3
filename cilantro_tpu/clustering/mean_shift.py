"""Mean shift clustering.

TPU-native redesign of ``include/cilantro/clustering/mean_shift.hpp``:

* the reference shifts each seed by a kernel-weighted radius-neighborhood
  mean until convergence (``mean_shift.hpp:55-82``), with per-seed early
  exit. Here ALL seeds shift in lockstep: each iteration is one
  ``(S, N)`` distance block (matmul) + masked weighted mean — converged
  seeds simply stop moving (their shift is ~0), and the loop ends when the
  max shift drops below tol;
* kernels: flat (unit weights in radius) and Epanechnikov-style profile via
  ``kernel='flat' | 'normal'`` or a custom ``weight_fn(dist²)`` (the
  reference's evaluator hook, ``mean_shift.hpp:38-42``);
* mode merging by distance threshold (``mean_shift.hpp:84-112``) via
  label-propagation connected components on the mode-proximity graph.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MeanShiftResult:
    modes: jax.Array  # (K, D) cluster modes (slot-padded)
    labels: jax.Array  # (S,) int32 cluster id per seed
    num_clusters: jax.Array  # int32
    iterations: jax.Array  # int32
    # True when any capped-path neighborhood was truncated (max_neighbors
    # cap or the grid backend's tile budget) — the result may then deviate
    # from the exact dense path. Always False on the dense path.
    overflowed: jax.Array


def _pairwise_sq(a, b):
    aa = jnp.sum(a * a, axis=1, keepdims=True)
    bb = jnp.sum(b * b, axis=1)[None, :]
    return jnp.maximum(aa + bb - 2.0 * (a @ b.T), 0.0)


def _merge_labels(adj):
    """Connected components of a small dense adjacency via min-label
    propagation with pointer jumping."""
    s = adj.shape[0]
    init = jnp.arange(s, dtype=jnp.int32)

    def body(carry):
        lab, _, it = carry
        neigh_min = jnp.min(
            jnp.where(adj, lab[None, :], jnp.int32(s)), axis=1
        )
        new = jnp.minimum(lab, neigh_min)
        new = new[new]  # pointer jumping
        return new, jnp.any(new != lab), it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < s)

    lab, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.array(True), jnp.array(0, jnp.int32))
    )
    return lab


@partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "kernel", "weight_fn", "max_neighbors", "merge_cap"
    ),
)
def mean_shift(
    points: jax.Array,
    radius: float,
    *,
    seeds: Optional[jax.Array] = None,
    valid: Optional[jax.Array] = None,
    max_iterations: int = 100,
    tol: float = 1e-7,
    merge_distance: Optional[float] = None,
    kernel: str = "flat",
    weight_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    max_neighbors: Optional[int] = None,
    merge_cap: int = 32,
) -> MeanShiftResult:
    """Shift ``seeds`` (default: all points) to their kernel density modes.

    ``radius`` is the kernel support; ``merge_distance`` (default ``radius/2``
    as a squared-free absolute distance) merges converged modes.

    ``max_neighbors=None`` (default) is the exact dense path — each
    iteration materializes one ``(S, N)`` distance block, matching the
    reference's uncapped radius neighborhoods; its memory is the scale
    ceiling (~20k seeds). ``max_neighbors=R`` switches to the capped
    large-N path: each iteration is a radius search (closest ``R`` kept,
    the fixed-capacity convention used throughout this package) + a
    gathered weighted mean, and mode merging becomes ``merge_cap``-capped
    connected components. Exact whenever no neighborhood exceeds the caps;
    a denser-than-``R`` kernel support biases the shift toward the nearest
    ``R`` samples (coincident converged modes still merge: tied closest
    sets share the lowest-index core, keeping the proximity graph
    connected).
    """
    n, d = points.shape
    if seeds is None:
        seeds = points
    if valid is None:
        valid = jnp.ones(n, bool)
    r2 = radius * radius
    if merge_distance is None:
        merge_distance = radius * 0.5

    if weight_fn is None and kernel not in ("flat", "normal", "gaussian"):
        raise ValueError(f"unknown kernel {kernel!r}")

    def kernel_w(dist2):
        if weight_fn is not None:
            return weight_fn(dist2)
        if kernel in ("normal", "gaussian"):
            return jnp.exp(-dist2 / (2.0 * r2))
        return jnp.ones_like(dist2)  # flat

    def weights_of(dist2):
        return jnp.where(
            (dist2 <= r2) & valid[None, :], kernel_w(dist2), 0.0
        )

    if max_neighbors is None:

        def body(carry):
            pos, _, it, over = carry
            dist2 = _pairwise_sq(pos, points)  # (S, N)
            w = weights_of(dist2)
            wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-30)
            new_pos = (w @ points) / wsum
            shift = jnp.max(jnp.sum((new_pos - pos) ** 2, axis=1))
            return new_pos, shift, it + 1, over

    else:
        from ..neighbors import radius_search

        def body(carry):
            pos, _, it, over = carry
            nb = radius_search(
                pos, points, radius, max_neighbors, key_valid=valid
            )
            w = jnp.where(
                nb.mask, kernel_w(jnp.maximum(nb.distances, 0.0)), 0.0
            )
            gathered = points[nb.indices]  # (S, R, D)
            wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-30)
            new_pos = jnp.einsum("sr,srd->sd", w, gathered) / wsum
            # Seeds with an empty neighborhood stay put.
            new_pos = jnp.where(
                jnp.any(nb.mask, axis=1)[:, None], new_pos, pos
            )
            shift = jnp.max(jnp.sum((new_pos - pos) ** 2, axis=1))
            # Honesty: a truncated neighborhood (cap or grid tile budget)
            # biases the shift — surface it instead of dropping the flag.
            return new_pos, shift, it + 1, over | jnp.any(nb.overflowed)

    def cond(carry):
        _, shift, it, _ = carry
        return (it < max_iterations) & (shift >= tol)

    init = (
        seeds,
        jnp.array(jnp.inf, points.dtype),
        jnp.array(0, jnp.int32),
        jnp.array(False),
    )
    modes, _, iters, overflowed = jax.lax.while_loop(cond, body, init)

    # Merge modes closer than merge_distance → cluster labels.
    if max_neighbors is None:
        md2 = _pairwise_sq(modes, modes)
        adj = md2 <= merge_distance * merge_distance
        raw = _merge_labels(adj)
    else:
        from ..neighbors import radius_search
        from .connected_components import propagate_labels

        # Merge-step truncation is NOT folded into `overflowed`: converged
        # modes of one cluster are (near-)coincident, so every capped
        # neighbor list shares the cluster's lowest-index core and the
        # proximity graph stays connected — truncation here is expected on
        # every dense cluster and changes nothing.
        nb = radius_search(modes, modes, merge_distance, merge_cap)
        raw = propagate_labels(nb.indices, nb.mask)
        raw = jnp.minimum(raw, jnp.int32(modes.shape[0] - 1))
    # Compact labels to 0..K-1 (raw labels are representative seed indices).
    is_rep = raw == jnp.arange(raw.shape[0], dtype=jnp.int32)
    compact = jnp.cumsum(is_rep.astype(jnp.int32)) - 1
    labels = compact[raw]
    num_clusters = jnp.sum(is_rep).astype(jnp.int32)
    # Representative mode position per cluster.
    k_cap = modes.shape[0]
    cluster_modes = jax.ops.segment_sum(
        jnp.where(is_rep[:, None], modes, 0.0), compact, num_segments=k_cap
    )
    return MeanShiftResult(
        modes=cluster_modes,
        labels=labels,
        num_clusters=num_clusters,
        iterations=iters,
        overflowed=overflowed,
    )
