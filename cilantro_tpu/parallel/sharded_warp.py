"""Point-sharded non-rigid (EDG) warp-field estimation.

The warp-field Gauss-Newton system separates cleanly across the mesh:

* point-aligned operands (source points, correspondence targets/normals/
  weights, per-point anchors and anchor weights) shard over ``points``;
* node-aligned state (node transforms, positions, arcs, the dense or CG
  normal system — a few thousand nodes at most) stays replicated;
* every reduction that crosses the boundary is a segment-sum from point
  rows into node slots — exactly an ``all-reduce`` over the point axis
  (SURVEY §2.10's OpenMP-reduction → psum mapping, applied to the sparse
  Jacobian instead of the rigid 6×6).

Rather than re-deriving :func:`..registration.warp_field.estimate_warp_field`
inside a ``shard_map`` body, this wrapper places the operands with those
shardings and lets the SPMD partitioner insert the collectives — the solver
is already expressed as gathers/einsums/segment-sums with no data-dependent
shapes, which is the form GSPMD partitions well. (The explicitly-sharded
ICP/fusion/BA paths in this package keep their hand-written ``shard_map``
programs; the warp solver's per-node state is small enough that the
partitioner's choices are not load-bearing.)

One real constraint: the graph's flattened-anchor sort cache is a global
permutation over N·K point-rows, which would force an all-to-all under
sharding — the sharded path therefore rebuilds the segment reduction as a
plain (unsorted) scatter-add, trading the single-device vectorized-segment
win for shard locality.
"""

from __future__ import annotations

from typing import Optional, Tuple

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.transforms import Transform
from ..registration.warp_field import DeformationGraph, estimate_warp_field


def _replicate_sort_caches(g: DeformationGraph) -> DeformationGraph:
    """Disable the flattened-anchor sort cache (identity permutation): the
    global sort would shuffle rows across shards. ``segment_over_anchors``
    then runs as an unsorted scatter-add, which partitions shard-locally."""
    nk = g.anchors.size
    ident = jnp.arange(nk, dtype=jnp.int32)
    a = g.arc_j.shape[0]
    return dataclasses.replace(
        g,
        anchor_order=ident,
        anchor_sorted_ids=g.anchors.reshape(-1),
        arc_j_order=jnp.arange(a, dtype=jnp.int32),
        arc_j_sorted=g.arc_j,
        caches_sorted=False,
        # Pair-assembly caches are global-sort artifacts; the sharded CG
        # solver never runs the direct assembler, so drop them.
        pair_order=None,
        pair_seg_ids=None,
        pair_uniq_keys=None,
    )


def shard_warp_problem(
    mesh: Mesh,
    graph: DeformationGraph,
    src_points: jax.Array,
    dst_points: jax.Array,
    dst_normals: Optional[jax.Array],
    corr_weights: jax.Array,
    *,
    axis: str = "points",
):
    """Place a warp-field problem on ``mesh``: point-aligned arrays sharded
    over ``axis``, node-aligned graph state replicated. Returns
    ``(graph, src, dst, nrm, w)`` ready for
    :func:`sharded_estimate_warp_field`. The leading point count must
    divide the mesh axis size (pad with ``corr_weights = 0`` rows first)."""
    pt = NamedSharding(mesh, P(axis))
    pt2 = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())

    def put(x, s):
        return jax.device_put(x, s)

    g = _replicate_sort_caches(graph)
    # The identity anchor_order/anchor_sorted_ids are (N·K,) point-aligned:
    # shard them with the points so the scatter-add stays local.
    g = dataclasses.replace(
        g,
        node_positions=put(g.node_positions, rep),
        node_valid=put(g.node_valid, rep),
        anchors=put(g.anchors, pt2),
        anchor_weights=put(g.anchor_weights, pt2),
        arc_i=put(g.arc_i, rep),
        arc_j=put(g.arc_j, rep),
        arc_mask=put(g.arc_mask, rep),
        anchor_order=put(g.anchor_order, pt),
        anchor_sorted_ids=put(g.anchor_sorted_ids, pt),
        arc_j_order=put(g.arc_j_order, rep),
        arc_j_sorted=put(g.arc_j_sorted, rep),
    )
    src = put(src_points, pt2)
    dst = put(dst_points, pt2)
    nrm = None if dst_normals is None else put(dst_normals, pt2)
    w = put(corr_weights, pt)
    return g, src, dst, nrm, w


def sharded_icp_warp_field(
    graph: DeformationGraph,
    src_points: jax.Array,
    dst_points: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "points",
    dst_normals: Optional[jax.Array] = None,
    src_valid: Optional[jax.Array] = None,
    dst_valid: Optional[jax.Array] = None,
    **kwargs,
):
    """The FULL sparse (EDG) non-rigid ICP over a mesh: src points (and all
    point-aligned graph state) shard over ``axis``; the dst cloud and node
    system replicate (a 120k frame is ~1.4 MB — replication is the right
    trade until the map outgrows device memory, at which point the ring
    pattern of :func:`..sharded.sharded_combined_icp_ring` applies).
    Same arguments/results as :func:`..registration.warp_field.icp_warp_field`.
    """
    from ..registration.warp_field import icp_warp_field

    n = src_points.shape[0]
    if src_valid is None:
        src_valid = jnp.ones(n, bool)
    g, src, _, nrm_s, sv = shard_warp_problem(
        mesh, graph, src_points, src_points, None,
        src_valid.astype(jnp.float32), axis=axis,
    )
    rep = NamedSharding(mesh, P())
    dst = jax.device_put(dst_points, rep)
    nrm = None if dst_normals is None else jax.device_put(dst_normals, rep)
    dv = None if dst_valid is None else jax.device_put(dst_valid, rep)
    kwargs.setdefault("solver", "cg")
    return icp_warp_field(
        g, src, dst,
        dst_normals=nrm, src_valid=sv > 0.5, dst_valid=dv, **kwargs,
    )


def sharded_estimate_warp_field(
    graph: DeformationGraph,
    src_points: jax.Array,
    dst_points: jax.Array,
    dst_normals: Optional[jax.Array],
    corr_weights: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "points",
    **kwargs,
) -> Tuple[Transform, jax.Array, jax.Array]:
    """Multi-device :func:`..registration.warp_field.estimate_warp_field`:
    same arguments and results, with the point-term work (anchor gathers,
    Jacobian products, per-node reductions) split across ``mesh`` and node
    state replicated. Inputs may be unplaced (this places them via
    :func:`shard_warp_problem`) or already placed with those shardings."""
    g, src, dst, nrm, w = shard_warp_problem(
        mesh, graph, src_points, dst_points, dst_normals, corr_weights,
        axis=axis,
    )
    kwargs.setdefault("solver", "cg")  # matrix-free: one psum per matvec
    return estimate_warp_field(g, src, dst, nrm, w, **kwargs)
