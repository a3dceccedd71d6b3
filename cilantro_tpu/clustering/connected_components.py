"""Connected-component extraction over neighbor graphs.

TPU-native redesign of ``include/cilantro/clustering/connected_component_extraction.hpp``:

* the reference runs parallel multi-seed BFS with cross-seed merge sets
  (``connected_component_extraction.hpp:37-97``). BFS frontiers are dynamic;
  the TPU-native equivalent is *min-label propagation with pointer jumping*
  over a fixed-shape ``(N, k)`` neighbor-index matrix: each round every point
  takes the min label over its masked neighbors, then labels compress via
  ``l = l[l]`` — O(log N) rounds on typical graphs, a ``lax.while_loop``
  to an exact fixed point;
* the similarity gate (any pair evaluator: distance/normal angle/color,
  ``core/common_pair_evaluators.hpp:227-259``) arrives as the neighborhood
  mask — compose it host-side or with :func:`edge_mask_from_evaluator`;
* min/max segment size filters and size-sorted labels follow
  (``connected_component_extraction.hpp:99-117``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..neighbors.api import Neighborhoods


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConnectedComponents:
    labels: jax.Array  # (N,) int32, size-ranked: 0 = largest; -1 = filtered/invalid
    num_components: jax.Array  # int32
    sizes: jax.Array  # (N,) int32 per size-ranked component (0-padded)


def propagate_labels(
    neighbor_idx: jax.Array,
    neighbor_mask: jax.Array,
    valid: Optional[jax.Array] = None,
    max_rounds: Optional[int] = None,
) -> jax.Array:
    """Exact connected-component labels (representative = min point index).

    The graph is symmetrized implicitly: a directed edge propagates labels
    both ways because the *source* also lowers itself through later rounds —
    to guarantee exactness we propagate along both directions explicitly via
    a scatter-min on the reverse edges.
    """
    n, k = neighbor_idx.shape
    if valid is None:
        valid = jnp.ones(n, bool)
    big = jnp.int32(n)
    init = jnp.where(valid, jnp.arange(n, dtype=jnp.int32), big)

    def body(carry):
        lab, _, rounds = carry
        # Forward: min over neighbors' labels.
        nb = jnp.where(neighbor_mask, lab[neighbor_idx], big)
        fwd = jnp.minimum(lab, jnp.min(nb, axis=1))
        # Reverse: scatter my (updated) label into my neighbors.
        upd = jnp.broadcast_to(fwd[:, None], (n, k))
        tgt = jnp.where(neighbor_mask, neighbor_idx, n)  # dump slot n
        rev = (
            jnp.full((n + 1,), big, jnp.int32)
            .at[tgt.reshape(-1)]
            .min(upd.reshape(-1))[:n]
        )
        new = jnp.minimum(fwd, rev)
        # Pointer jumping (path compression).
        safe = jnp.clip(new, 0, n - 1)
        jumped = jnp.where(new < big, new[safe], big)
        jumped = jnp.where(valid, jnp.minimum(new, jumped), big)
        return jumped, jnp.any(jumped != lab), rounds + 1

    def cond(carry):
        _, changed, rounds = carry
        limit = max_rounds if max_rounds is not None else n
        return changed & (rounds < limit)

    lab, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.array(True), jnp.array(0, jnp.int32))
    )
    return lab


@partial(jax.jit, static_argnames=("min_size", "max_size"))
def connected_components(
    neighborhoods: Neighborhoods,
    *,
    valid: Optional[jax.Array] = None,
    edge_mask: Optional[jax.Array] = None,
    min_size: int = 1,
    max_size: Optional[int] = None,
) -> ConnectedComponents:
    """Extract components, labels ranked by size (0 = largest), as the
    reference's size-sorted output (``connected_component_extraction.hpp:99-117``).
    """
    idx = neighborhoods.indices
    mask = neighborhoods.mask
    if edge_mask is not None:
        mask = mask & edge_mask
    n = idx.shape[0]
    raw = propagate_labels(idx, mask, valid)  # representative indices, n=invalid

    ok = raw < n
    safe_raw = jnp.where(ok, raw, 0)
    sizes_by_rep = jax.ops.segment_sum(
        ok.astype(jnp.int32), safe_raw, num_segments=n
    )
    my_size = jnp.where(ok, sizes_by_rep[safe_raw], 0)
    size_ok = (my_size >= min_size) & (
        my_size <= (max_size if max_size is not None else n)
    )

    # Rank components by size (descending); representative slots only.
    is_rep = ok & (raw == jnp.arange(n, dtype=jnp.int32)) & size_ok
    rep_sizes = jnp.where(is_rep, sizes_by_rep, -1)
    order = jnp.argsort(-rep_sizes)  # component reps first, by size desc
    rank_of = jnp.zeros(n, jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    labels = jnp.where(ok & size_ok, rank_of[safe_raw], -1)
    num = jnp.sum(is_rep).astype(jnp.int32)
    sizes_ranked = jnp.where(rep_sizes[order] > 0, rep_sizes[order], 0)
    return ConnectedComponents(
        labels=labels, num_components=num, sizes=sizes_ranked
    )


def edge_mask_from_evaluator(
    neighborhoods: Neighborhoods,
    points: jax.Array,
    normals: Optional[jax.Array] = None,
    colors: Optional[jax.Array] = None,
    *,
    max_distance: Optional[float] = None,
    max_normal_angle: Optional[float] = None,
    max_color_diff: Optional[float] = None,
) -> jax.Array:
    """Similarity gates matching the reference's proximity evaluators
    (``core/common_pair_evaluators.hpp:92-259``): squared distance, normal
    angle (radians, sign-invariant), and Euclidean color difference."""
    idx = neighborhoods.indices
    m = neighborhoods.mask
    if max_distance is not None:
        diff = points[idx] - points[:, None, :]
        m = m & (jnp.sum(diff * diff, axis=-1) <= max_distance * max_distance)
    if max_normal_angle is not None and normals is not None:
        dots = jnp.abs(jnp.einsum("nkd,nd->nk", normals[idx], normals))
        m = m & (dots >= jnp.cos(max_normal_angle))
    if max_color_diff is not None and colors is not None:
        cdiff = colors[idx] - colors[:, None, :]
        m = m & (
            jnp.sum(cdiff * cdiff, axis=-1) <= max_color_diff * max_color_diff
        )
    return m
