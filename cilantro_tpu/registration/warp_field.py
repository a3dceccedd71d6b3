"""Non-rigid warp-field estimation (dense + embedded deformation graph).

TPU-native redesign of ``include/cilantro/registration/warp_field_estimation.hpp``
(2,236 lines of OpenMP/Eigen-Sparse Gauss-Newton solvers) and
``registration/warp_field_utilities.hpp``:

* the reference assembles a CSR Jacobian in parallel and solves the normal
  equations with Eigen's diagonally-preconditioned CG
  (``warp_field_estimation.hpp:160-192``). Here the sparsity is *structural
  and fixed* (each source point is attached to exactly ``k_anchors = 4``
  control nodes, regularization arcs come from a fixed k-NN graph,
  ``non_rigid_icp.cpp:53-58``), so Jᵀ(J·x) is evaluated matrix-free with
  gathers + segment-sums — no sparse matrix is ever materialized — and CG is
  a jitted ``lax.while_loop``;
* data terms: combined point-to-point + point-to-plane on the blended warped
  position ``x_i = Σ_j w_ij (ΔT_j ∘ T_j)(p_i)`` (per-node small-angle
  increments ``[δω; δt]``);
* regularization: pairwise warp-difference arcs under sqrt-Huber IRLS
  (``warp_field_estimation.hpp:10-36,286-328``), residual
  ``T̃_j(c_l) − T̃_l(c_l)`` per arc;
* the dense warp field is the special case ``k_anchors = 1`` with identity
  weights (every point its own node);
* ``resampleTransforms`` (``warp_field_utilities.hpp:14-48``) maps to
  :func:`resample_transforms` — a gather + weighted blend + rotation
  re-projection.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.transforms import (
    Transform,
    axis_angle_to_rotation,
    compose,
    project_to_rotation,
)
from ..neighbors.api import knn_search

_EPS = 1e-12


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeformationGraph:
    """Fixed-sparsity embedded deformation graph.

    ``node_positions (M, D)``; ``anchors (N, K)`` node ids per source point
    with normalized weights ``anchor_weights (N, K)`` (0 rows for invalid
    points); regularization arcs ``arc_i/arc_j (A,)`` with ``arc_mask``.
    """

    node_positions: jax.Array
    node_valid: jax.Array
    anchors: jax.Array
    anchor_weights: jax.Array
    arc_i: jax.Array
    arc_j: jax.Array
    arc_mask: jax.Array
    # Precomputed sort of the flattened anchor ids: segment reductions over a
    # sorted key take XLA's vectorized path instead of serialized
    # scatter-adds (the graph is fixed, so sorting once at build time makes
    # every CG matvec cheap).
    anchor_order: jax.Array  # (N·K,) permutation
    anchor_sorted_ids: jax.Array  # (N·K,) node ids, ascending
    arc_j_order: jax.Array  # (A,) permutation sorting arc_j
    arc_j_sorted: jax.Array  # (A,) ascending
    # Whether the caches above really are globally sorted. The sharded path
    # (parallel/sharded_warp.py) replaces them with identity permutations —
    # a global sort would shuffle rows across shards — and must NOT claim
    # sortedness to the segment reductions. Static: selects the lowering.
    caches_sorted: bool = dataclasses.field(
        default=True, metadata={"static": True}
    )
    # Direct-solver pair-block assembly caches (host-precomputed when the
    # graph is built from concrete arrays; None when traced or sharded).
    # The anchor-pair/arc block keys are STATIC per graph, so the unordered
    # scatter-add of ~N·K(K+1)/2 rows (measured 188 ms/GN at bench scale —
    # ~150 ns/row serialized) is replaced by one static-permutation gather +
    # SORTED segment_sum into the ~U occupied node pairs + one unique sorted
    # expand (measured 71 ms; probe tools/pairblock_probe.py).
    pair_order: Optional[jax.Array] = None  # (R,) permutation
    pair_seg_ids: Optional[jax.Array] = None  # (R,) ascending run ids
    pair_uniq_keys: Optional[jax.Array] = None  # (U_pad,) keys, m·m = pad
    # Sorted NARROW-INPUT assembly caches (rigid 3-D direct solver). The
    # r4 path gathered COMPUTED 36-wide block rows through pair_order —
    # but gather cost scales hard with row width (measured r5 probe:
    # 1.25M rows at 36w = 41.6 ms vs 8w = 5.7 ms), so the r5 path gathers
    # the 8-wide INPUTS (y_anchor | w_pp w_pl n) in pair-key-sorted order
    # and computes the closed-form block entries AFTER the permutation:
    # 31.5 ms for gathers+compute+segsum+expand vs 54.7 ms for the old
    # gather+segsum alone (plus the whole chunked SoA compute scan it
    # replaces — tools/round5_warp_probe.py part 6).
    ps_kkf: Optional[jax.Array] = None  # (R1,) pt*K + kk[t], key-sorted
    ps_llf: Optional[jax.Array] = None  # (R1,) pt*K + ll[t]
    ps_w2: Optional[jax.Array] = None  # (R1,) wa_k*wa_l*half_diag (static)
    ps_swap: Optional[jax.Array] = None  # (R1,) bool: node_k > node_l
    ps_seg: Optional[jax.Array] = None  # (R1,) ascending segment ids
    arc_sorted_order: Optional[jax.Array] = None  # (3A,) arc-row sort
    arc_sorted_seg: Optional[jax.Array] = None  # (3A,) ascending seg ids

    @property
    def num_nodes(self) -> int:
        return self.node_positions.shape[0]

    def segment_over_anchors(self, values: jax.Array) -> jax.Array:
        """Σ over anchors per node; ``values (N, K, ...)`` → ``(M, ...)``."""
        flat = values.reshape((values.shape[0] * values.shape[1],) + values.shape[2:])
        return jax.ops.segment_sum(
            flat[self.anchor_order],
            self.anchor_sorted_ids,
            num_segments=self.num_nodes,
            indices_are_sorted=self.caches_sorted,
        )

    def segment_over_arc_j(self, values: jax.Array) -> jax.Array:
        return jax.ops.segment_sum(
            values[self.arc_j_order],
            self.arc_j_sorted,
            num_segments=self.num_nodes,
            indices_are_sorted=self.caches_sorted,
        )


def build_deformation_graph(
    src_points: jax.Array,
    node_positions: jax.Array,
    *,
    src_valid: Optional[jax.Array] = None,
    node_valid: Optional[jax.Array] = None,
    k_anchors: int = 4,
    k_arcs: int = 8,
    weight_sigma: Optional[float] = None,
) -> DeformationGraph:
    """Attach each source point to its ``k_anchors`` nearest control nodes
    with normalized RBF weights (``icp_warp_field_combined_metric_sparse`` /
    ``non_rigid_icp.cpp:53-58``); arcs = node k-NN pairs."""
    nb = knn_search(
        src_points,
        node_positions,
        k_anchors,
        query_valid=src_valid,
        key_valid=node_valid,
    )
    d2 = jnp.where(nb.mask, nb.distances, 0.0)
    if weight_sigma is None:
        # Reference uses an RBF at the control resolution; a robust default
        # is the per-point max anchor distance.
        sigma2 = jnp.maximum(jnp.max(d2, axis=1, keepdims=True), _EPS)
    else:
        sigma2 = jnp.float32(weight_sigma) ** 2
    w = jnp.exp(-0.5 * d2 / sigma2) * nb.mask
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), _EPS)

    arcs = knn_search(
        node_positions,
        node_positions,
        k_arcs,
        query_valid=node_valid,
        key_valid=node_valid,
        exclude_self=True,
    )
    m = node_positions.shape[0]
    arc_i = jnp.repeat(jnp.arange(m, dtype=jnp.int32), k_arcs)
    arc_j = arcs.indices.reshape(-1)
    arc_mask = arcs.mask.reshape(-1)
    if node_valid is None:
        node_valid = jnp.ones(m, bool)
    return _with_sort_caches(
        DeformationGraph(
            node_positions=node_positions,
            node_valid=node_valid,
            anchors=nb.indices,
            anchor_weights=w,
            arc_i=arc_i,
            arc_j=arc_j,
            arc_mask=arc_mask,
            anchor_order=jnp.zeros(0, jnp.int32),
            anchor_sorted_ids=jnp.zeros(0, jnp.int32),
            arc_j_order=jnp.zeros(0, jnp.int32),
            arc_j_sorted=jnp.zeros(0, jnp.int32),
        )
    )


_ASSEMBLY_CHUNK = 4096  # direct-assembly scan chunk (shared with caches)


def _pair_assembly_caches(g: DeformationGraph):
    """Host-side static pair-block sort caches (see the dataclass fields).
    Returns ``(order, seg_ids, uniq_keys_padded)`` or ``None`` when the
    graph arrays are traced (can't be concretized) or the node count is too
    large for the dense direct solver anyway."""
    import numpy as np

    m = g.num_nodes
    if m > 2048:  # direct solver never runs (and m·m would not fit int32)
        return None
    try:
        anchors = np.asarray(g.anchors)
        arc_i = np.asarray(g.arc_i, np.int64)
        arc_j = np.asarray(g.arc_j, np.int64)
    except Exception:  # traced build (e.g. inside jit) — fall back
        return None
    n, K = anchors.shape
    kk, ll = np.triu_indices(K)  # same order as the assembly double loop
    chunk = _ASSEMBLY_CHUNK
    n_pad = max(1, -(-n // chunk)) * chunk
    a_pad = np.zeros((n_pad, K), np.int64)
    a_pad[:n] = anchors
    an, bn = a_pad[:, kk], a_pad[:, ll]
    pair_keys = (np.minimum(an, bn) * m + np.maximum(an, bn)).reshape(-1)
    arc_keys = np.concatenate(
        [
            arc_i * m + arc_i,
            arc_j * m + arc_j,
            np.minimum(arc_i, arc_j) * m + np.maximum(arc_i, arc_j),
        ]
    )
    keys = np.concatenate([pair_keys, arc_keys])
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    new_run = np.empty(len(sk), bool)
    new_run[0] = True
    new_run[1:] = sk[1:] != sk[:-1]
    seg = np.cumsum(new_run) - 1
    uniq = sk[new_run]
    u_pad = max(8, -(-len(uniq) // 8) * 8)
    # DISTINCT out-of-bounds pad keys: the expand scatter consuming these
    # passes unique_indices=True, and duplicated indices under that hint are
    # documented-undefined in JAX even with mode='drop' (ADVICE r3).
    uniq_p = m * m + np.arange(u_pad, dtype=np.int64)
    uniq_p[: len(uniq)] = uniq

    # Sorted narrow-input caches (see the dataclass fields): UNPADDED
    # point-pair stream (n·T rows) sorted by key, with the static weight
    # product folded in, plus the arc stream's own sort into the same
    # segment list.
    try:
        wa = np.asarray(g.anchor_weights).astype(np.float64)
    except Exception:
        wa = None
    sorted_caches = None
    if wa is not None:
        K = anchors.shape[1]
        an_u, bn_u = anchors[:, kk], anchors[:, ll]  # (n, T)
        keys_u = (np.minimum(an_u, bn_u) * m + np.maximum(an_u, bn_u))
        order_u = np.argsort(keys_u.reshape(-1), kind="stable")
        pt = order_u // len(kk)
        t = order_u % len(kk)
        hd = np.where(kk == ll, 0.5, 1.0)
        ps_w2 = (wa[pt, kk[t]] * wa[pt, ll[t]] * hd[t]).astype(np.float32)
        ps_seg = np.searchsorted(
            uniq, keys_u.reshape(-1)[order_u]
        ).astype(np.int32)
        arc_order3 = np.argsort(arc_keys, kind="stable")
        arc_seg3 = np.searchsorted(uniq, arc_keys[arc_order3]).astype(
            np.int32
        )
        sorted_caches = (
            jnp.asarray((pt * K + kk[t]).astype(np.int32)),
            jnp.asarray((pt * K + ll[t]).astype(np.int32)),
            jnp.asarray(ps_w2),
            jnp.asarray(anchors[pt, kk[t]] > anchors[pt, ll[t]]),
            jnp.asarray(ps_seg),
            jnp.asarray(arc_order3.astype(np.int32)),
            jnp.asarray(arc_seg3),
        )
    return (
        jnp.asarray(order.astype(np.int32)),
        jnp.asarray(seg.astype(np.int32)),
        jnp.asarray(uniq_p.astype(np.int32)),
        sorted_caches,
    )


def _with_sort_caches(g: DeformationGraph) -> DeformationGraph:
    flat = g.anchors.reshape(-1)
    order = jnp.argsort(flat)
    jorder = jnp.argsort(g.arc_j)
    pair = _pair_assembly_caches(g)
    sc = pair[3] if pair else None
    return dataclasses.replace(
        g,
        anchor_order=order.astype(jnp.int32),
        anchor_sorted_ids=flat[order],
        arc_j_order=jorder.astype(jnp.int32),
        arc_j_sorted=g.arc_j[jorder],
        pair_order=pair[0] if pair else None,
        pair_seg_ids=pair[1] if pair else None,
        pair_uniq_keys=pair[2] if pair else None,
        ps_kkf=sc[0] if sc else None,
        ps_llf=sc[1] if sc else None,
        ps_w2=sc[2] if sc else None,
        ps_swap=sc[3] if sc else None,
        ps_seg=sc[4] if sc else None,
        arc_sorted_order=sc[5] if sc else None,
        arc_sorted_seg=sc[6] if sc else None,
    )


def identity_warp(num_nodes: int, dim: int = 3) -> Transform:
    return Transform(
        jnp.broadcast_to(jnp.eye(dim), (num_nodes, dim, dim)),
        jnp.zeros((num_nodes, dim)),
    )


def _nodes_packed(node_tf: Transform) -> jax.Array:
    """Per-node transforms packed as ONE ``(M, D·D + D)`` row array
    (linear then translation) so graph gathers cost one row each —
    indexed ops price rows, not bytes. Split with :func:`_split_packed`."""
    m, d = node_tf.translation.shape
    return jnp.concatenate(
        [node_tf.linear.reshape(m, d * d), node_tf.translation], axis=1
    )


def _split_packed(pa: jax.Array, d: int):
    """Gathered packed rows → ``(lin (..., D, D), tr (..., D))``."""
    lin = pa[..., : d * d].reshape(pa.shape[:-1] + (d, d))
    return lin, pa[..., d * d:]


def warp_points(
    graph: DeformationGraph, node_tf: Transform, points: jax.Array
) -> jax.Array:
    """Blend node transforms per point and apply: the dense-field application
    of ``resampleTransforms`` fused with ``transformPoints``."""
    d = node_tf.translation.shape[1]
    lin, tr = _split_packed(
        _nodes_packed(node_tf)[graph.anchors], d
    )  # (N, K, D, D), (N, K, D)
    w = graph.anchor_weights
    blended_lin = jnp.einsum("nk,nkij->nij", w, lin)
    blended_tr = jnp.einsum("nk,nki->ni", w, tr)
    return (
        jnp.einsum("nij,nj->ni", blended_lin, points) + blended_tr
    )


def resample_transforms(
    node_tf: Transform,
    neighborhood_idx: jax.Array,
    neighborhood_weights: jax.Array,
    rigid: bool = True,
) -> Transform:
    """Weighted blend of node transforms onto arbitrary targets, rotation
    re-projection for rigid fields (``warp_field_utilities.hpp:14-48``)."""
    lin = jnp.einsum(
        "nk,nkij->nij", neighborhood_weights, node_tf.linear[neighborhood_idx]
    )
    tr = jnp.einsum(
        "nk,nki->ni", neighborhood_weights, node_tf.translation[neighborhood_idx]
    )
    if rigid:
        lin = project_to_rotation(lin)
    return Transform(lin, tr)


# ---------------------------------------------------------------------------
# Gauss-Newton solver (matrix-free block-sparse normal equations + CG).
# ---------------------------------------------------------------------------


def _huber_weights(r_norm, delta):
    """IRLS weights for the sqrt-Huber loss on arc residual norms
    (``warp_field_estimation.hpp:10-36``)."""
    return jnp.where(r_norm <= delta, 1.0, delta / jnp.maximum(r_norm, _EPS))


@partial(
    jax.jit,
    static_argnames=(
        "max_gn_iterations",
        "max_cg_iterations",
        "node_type",
        "solver",
    ),
)
def estimate_warp_field(
    graph: DeformationGraph,
    src_points: jax.Array,
    dst_points: jax.Array,  # (N, D) gathered correspondence targets
    dst_normals: Optional[jax.Array],
    corr_weights: jax.Array,  # (N,) 0 = no correspondence
    *,
    init: Optional[Transform] = None,
    point_weight: float = 0.0,
    plane_weight: float = 1.0,
    stiffness: float = 200.0,
    huber_delta: float = 1e-2,
    max_gn_iterations: int = 10,
    gn_tol: float = 2.5e-3,
    max_cg_iterations: int = 500,
    cg_tol: float = 1e-5,
    levenberg: float = 1e-6,
    node_type: str = "rigid",
    solver: str = "auto",
) -> Tuple[Transform, jax.Array]:
    """Estimate per-node transforms minimizing the combined metric plus
    stiffness-weighted sqrt-Huber arc regularization (the sparse solvers at
    ``warp_field_estimation.hpp:1387-1847``; defaults follow
    ``non_rigid_icp.cpp:66-82``: stiffness 200, Huber 1e-2, CG ≤500 @1e-5).

    ``node_type='rigid'`` uses small-angle increments ``[δω; δt]`` with SO(D)
    re-projection (D ∈ {2, 3} — rotations); ``'affine'`` uses full linear
    increments ``[vec(δA); δt]`` and, like the reference's general-Dim
    templates (``warp_field_estimation.hpp:717-995,1848-2236``), works in
    ANY dimension — tested at D=4 with both solvers
    (``tests/test_warp_field.py::test_affine_warp_general_dimension``).

    ``solver``: ``'cg'`` = matrix-free preconditioned CG (any graph size);
    ``'direct'`` = assemble the dense normal matrix (anchor-pair blocks
    scatter-added once per GN iteration, chunked so no tile-padded
    intermediate exceeds ~10 MB) and Cholesky-solve on the MXU. Measured
    at EDG bench scale (120k pts, 837 nodes / 1024 capacity, v5e chip):
    5.42 s vs 6.80 s per 10-outer-iteration solve — the per-CG-iteration
    sparse matvec is bound by two pair-count-row reindexes at ~30 ns/row,
    while the dense factorization rides the MXU once per GN step.
    ``'auto'`` picks ``direct`` whenever the dense system and pair-block
    intermediates are small enough (node capacity × params ≤ 8192).

    Returns ``(node_transforms, converged, total_cg_iterations)``
    (0 CG iterations under the direct solver).
    """
    m = graph.num_nodes
    n, d = src_points.shape
    node_tf = init if init is not None else identity_warp(m, d)
    w_pp = corr_weights * point_weight
    w_pl = corr_weights * plane_weight

    _affine = node_type == "affine"
    _n_lin = d * d if _affine else (d if d == 3 else 1)
    _n_par = _n_lin + d
    _k_anch = graph.anchors.shape[1]
    if solver == "auto":
        use_direct = (
            m * _n_par <= 8192
            and n * _k_anch * _k_anch * _n_par * _n_par * 4 <= 1_500_000_000
        )
    elif solver in ("direct", "cg"):
        use_direct = solver == "direct"
    else:
        raise ValueError(f"unknown solver {solver!r}")

    def gn_body(carry):
        node_tf, _, it, cg_total = carry
        # Current warped anchor positions y_ij = T_j(p_i). ONE packed
        # (M, D·D + D) gather instead of separate linear/translation
        # gathers — indexed ops price rows, not bytes (~12 ms saved per
        # outer iteration at bench scale).
        lin_a, tr_a = _split_packed(
            _nodes_packed(node_tf)[graph.anchors], d
        )  # (N, K, D, D), (N, K, D)
        y = jnp.einsum("nkij,nj->nki", lin_a, src_points) + tr_a  # (N, K, D)
        wa = graph.anchor_weights  # (N, K)
        x = jnp.einsum("nk,nki->ni", wa, y)  # blended warped points

        # Arc geometry: y_jl = T_j(c_l), y_ll = T_l(c_l).
        cl = graph.node_positions[graph.arc_j]  # (A, D)
        y_jl = (
            jnp.einsum("aij,aj->ai", node_tf.linear[graph.arc_i], cl)
            + node_tf.translation[graph.arc_i]
        )
        y_ll = (
            jnp.einsum("aij,aj->ai", node_tf.linear[graph.arc_j], cl)
            + node_tf.translation[graph.arc_j]
        )
        r_arc0 = y_jl - y_ll  # (A, D)
        h = _huber_weights(jnp.linalg.norm(r_arc0, axis=-1), huber_delta)
        w_arc = graph.arc_mask * h * graph.node_valid[graph.arc_i] * \
            graph.node_valid[graph.arc_j]

        # Residuals at δ = 0.
        r_pp0 = x - dst_points  # (N, D)
        if dst_normals is not None:
            r_pl0 = jnp.einsum("ni,ni->n", dst_normals, r_pp0)
        else:
            r_pl0 = jnp.zeros(n, src_points.dtype)

        affine = node_type == "affine"
        n_lin = d * d if affine else (d if d == 3 else 1)

        def _lin_apply(dl, pts):
            """Apply the linear-part increment to points: rotation generators
            for rigid, full matrices for affine. ``dl (..., n_lin)``."""
            if affine:
                da = dl.reshape(dl.shape[:-1] + (d, d))
                return jnp.einsum("...ij,...j->...i", da, pts)
            if d == 3:
                return jnp.cross(dl, pts)
            perp = jnp.stack([-pts[..., 1], pts[..., 0]], axis=-1)
            return dl * perp

        def _lin_grad(g, pts):
            """(∂(linear-part increment · pts)/∂params)ᵀ g."""
            if affine:
                return jnp.einsum("...i,...j->...ij", g, pts).reshape(
                    g.shape[:-1] + (d * d,)
                )
            if d == 3:
                return jnp.cross(pts, g)
            perp = jnp.stack([-pts[..., 1], pts[..., 0]], axis=-1)
            return jnp.sum(perp * g, axis=-1, keepdims=True)

        def J_apply(delta):
            """J·δ for all rows. δ: (M, n_lin + D) per node.

            TPU gathers cost per ROW, not per byte — every per-node operand
            travels through ONE gather of the full (n_lin + D)-wide rows
            (anchors, arc_i, arc_j) instead of separate rotation/translation
            gathers."""
            da = delta[graph.anchors]  # (N, K, P) — the one anchor gather
            v = _lin_apply(da[..., :n_lin], y) + da[..., n_lin:]  # (N, K, D)
            v_pt = jnp.einsum("nk,nki->ni", wa, v)  # data point rows (N, D)
            if dst_normals is not None:
                v_pl = jnp.einsum("ni,ni->n", dst_normals, v_pt)
            else:
                v_pl = jnp.zeros(n, src_points.dtype)
            # Arc rows — one gather per endpoint.
            di = delta[graph.arc_i]
            dj = delta[graph.arc_j]
            va = (
                _lin_apply(di[..., :n_lin], y_jl)
                + di[..., n_lin:]
                - _lin_apply(dj[..., :n_lin], y_ll)
                - dj[..., n_lin:]
            )
            return v_pt, v_pl, va

        def Jt_apply(v_pt, v_pl, va):
            """Jᵀ·[v] accumulated per node — ONE segmented reduction per
            index set, on packed (n_lin + D)-wide rows."""
            # Data rows: contribution to node j from point i is
            # w_ij (J_ij)ᵀ (w_pp v_pt + w_pl v_pl n).
            g = w_pp[:, None] * v_pt
            if dst_normals is not None:
                g = g + (w_pl * v_pl)[:, None] * dst_normals  # (N, D)
            gk = wa[..., None] * g[:, None, :]  # (N, K, D)
            gw = _lin_grad(gk, y)  # (N, K, n_lin)
            acc = graph.segment_over_anchors(
                jnp.concatenate([gw, gk], axis=-1)
            )  # (M, P)
            # Arc rows (weight stiffness · huber).
            ga = (stiffness * w_arc)[:, None] * va  # (A, D)
            rows_i = jnp.concatenate([_lin_grad(ga, y_jl), ga], axis=-1)
            rows_j = jnp.concatenate([-_lin_grad(ga, y_ll), -ga], axis=-1)
            # arc_i = repeat(arange) is sorted by construction.
            acc = acc + jax.ops.segment_sum(
                rows_i, graph.arc_i, num_segments=m, indices_are_sorted=True
            )
            acc = acc + graph.segment_over_arc_j(rows_j)
            return acc  # (M, P)

        def normal_matvec(delta):
            v_pt, v_pl, va = J_apply(delta)
            return Jt_apply(v_pt, v_pl, va) + levenberg * delta

        rhs = -Jt_apply(r_pp0, r_pl0, r_arc0)

        def _row_blocks(pts):
            """Row-derivative block B = d(increment applied at pts)/d(params)
            with shape (..., D, P) — consistent with ``_lin_apply``."""
            if affine:
                eye = jnp.eye(d, dtype=pts.dtype)
                blin = jnp.einsum("rs,...c->...rsc", eye, pts).reshape(
                    pts.shape[:-1] + (d, d * d)
                )
                eye_b = jnp.broadcast_to(eye, pts.shape[:-1] + (d, d))
                return jnp.concatenate([blin, eye_b], axis=-1)
            if d == 3:
                from ..core.transforms import skew3

                eye_b = jnp.broadcast_to(
                    jnp.eye(3, dtype=pts.dtype), pts.shape[:-1] + (3, 3)
                )
                return jnp.concatenate([-skew3(pts), eye_b], axis=-1)
            perp = jnp.stack([-pts[..., 1], pts[..., 0]], axis=-1)[..., None]
            eye_b = jnp.broadcast_to(
                jnp.eye(2, dtype=pts.dtype), pts.shape[:-1] + (2, 2)
            )
            return jnp.concatenate([perp, eye_b], axis=-1)

        if use_direct:
            # Dense normal-matrix assembly + Cholesky (see docstring). Each
            # UNORDERED anchor-pair (P, P) block scatter-adds ONCE into an
            # (M·M, P·P) accumulator (upper-triangle orientation; diagonal
            # contributions halved) and the dense matrix is symmetrized as
            # S + Sᵀ at the end — K(K+1)/2 scatter rows per point instead of
            # K², and the scatter IS the assembly's cost (~30 ns/row). The
            # factorization then runs on the MXU; no per-CG-iteration
            # reindexes exist at all.
            #
            # Assembly is CHUNKED over points: a monolithic (N, K, K, P, P)
            # intermediate tile-pads ~30× on TPU (observed 264 MB → 8.3 GB),
            # so per-chunk blocks are built and scatter-added inside a scan.
            p_par = n_lin + d
            pp = p_par * p_par
            chunk = _ASSEMBLY_CHUNK
            n_chunks = max(1, -(-n // chunk))
            n_pad = n_chunks * chunk
            kk, ll = [], []
            for _k in range(_k_anch):
                for _l in range(_k, _k_anch):
                    kk.append(_k)
                    ll.append(_l)
            kk = jnp.array(kk, jnp.int32)
            ll = jnp.array(ll, jnp.int32)
            half_diag = jnp.where(kk == ll, 0.5, 1.0)[:, None, None]

            def _padc(a, fill=0.0):
                widths = ((0, n_pad - n),) + ((0, 0),) * (a.ndim - 1)
                return jnp.pad(a, widths, constant_values=fill)

            def _chunked(a, fill=0.0):
                return _padc(a, fill).reshape(
                    (n_chunks, chunk) + a.shape[1:]
                )

            nrm_src = (
                dst_normals
                if dst_normals is not None
                else jnp.zeros((n, d), rhs.dtype)
            )
            chunk_args = (
                _chunked(y),
                _chunked(wa),
                _chunked(graph.anchors, 0),
                _chunked(w_pp),
                _chunked(w_pl),
                _chunked(nrm_src),
            )

            def chunk_blocks(args):
                """Oriented, half-diagonal pair blocks for one chunk:
                returns ``(pair (C·T, pp), keys (C·T,))``."""
                y_k, wa_k, an_k, wpp_k, wpl_k, nrm_k = args
                bw = wa_k[..., None, None] * _row_blocks(y_k)  # (C,K,D,P)
                bk, bl = bw[:, kk], bw[:, ll]  # (C,T,D,P), T=K(K+1)/2
                pair = wpp_k[:, None, None, None] * jnp.einsum(
                    "ntdp,ntdq->ntpq", bk, bl
                )
                if dst_normals is not None:
                    bn = jnp.einsum("nd,nkdp->nkp", nrm_k, bw)
                    pair = pair + wpl_k[:, None, None, None] * jnp.einsum(
                        "ntp,ntq->ntpq", bn[:, kk], bn[:, ll]
                    )
                pair = pair * half_diag
                # Orient every block upper-triangle in NODE ids (anchor k's
                # node may exceed anchor l's): store Bᵀ at (min, max).
                a_n, b_n = an_k[:, kk], an_k[:, ll]  # (C,T)
                swap = a_n > b_n
                pair = jnp.where(
                    swap[..., None, None],
                    jnp.swapaxes(pair, -1, -2),
                    pair,
                )
                keys = (
                    jnp.minimum(a_n, b_n) * m + jnp.maximum(a_n, b_n)
                ).reshape(-1)
                return pair.reshape(-1, pp), keys

            def chunk_blocks_soa(args):
                """Rigid-3D pair blocks with the point-chunk axis LAST (the
                lane dim): the AoS (…, P, P) layout above tile-pads ~21×
                and dominated the direct GN (bisect 2026-08-20: 644 of
                808 ms at B=8 in the batched twin). Same arithmetic,
                lane-aligned. Returns the row-layout ``(C·T, pp)`` block
                (point-major then t, matching ``graph.pair_order``)."""
                y_k, wa_k, an_k, wpp_k, wpl_k, nrm_k = args
                yt = y_k.transpose(1, 2, 0)  # (K, 3, C)
                xk, yk, zk = yt[:, 0], yt[:, 1], yt[:, 2]  # (K, C)
                zero = jnp.zeros_like(xk)
                one = jnp.ones_like(xk)
                r0 = jnp.stack([zero, zk, -yk, one, zero, zero], axis=1)
                r1 = jnp.stack([-zk, zero, xk, zero, one, zero], axis=1)
                r2 = jnp.stack([yk, -xk, zero, zero, zero, one], axis=1)
                bw = (
                    jnp.stack([r0, r1, r2], axis=1)
                    * wa_k.T[:, None, None, :]
                )  # (K, 3, 6, C)
                bk, bl = bw[kk], bw[ll]  # (T, 3, 6, C)
                pair = wpp_k[None, None, None, :] * jnp.einsum(
                    "tdpc,tdqc->tpqc", bk, bl
                )
                if dst_normals is not None:
                    bn = jnp.einsum("dc,kdpc->kpc", nrm_k.T, bw)
                    pair = pair + wpl_k[None, None, None, :] * jnp.einsum(
                        "tpc,tqc->tpqc", bn[kk], bn[ll]
                    )
                pair = pair * half_diag[..., None]
                a_n, b_n = an_k[:, kk], an_k[:, ll]
                swap = (a_n > b_n).T  # (T, C)
                pair = jnp.where(
                    swap[:, None, None, :],
                    jnp.swapaxes(pair, 1, 2),
                    pair,
                )
                # Row layout BEFORE leaving the chunk (the scan-stacked SoA
                # tensor otherwise materializes with (P, P) minor — a 7×
                # tile-padded allocation; observed OOM in the batched twin).
                return pair.transpose(3, 0, 1, 2).reshape(-1, pp)

            # Arcs follow the same one-block-per-unordered-pair scheme.
            sa = (stiffness * w_arc)[:, None, None]
            b_i = _row_blocks(y_jl)
            b_j = -_row_blocks(y_ll)
            off = sa * jnp.einsum("adp,adq->apq", b_i, b_j)
            a_swap = graph.arc_i > graph.arc_j
            off = jnp.where(
                a_swap[:, None, None], jnp.swapaxes(off, -1, -2), off
            )
            arc_vals = jnp.concatenate(
                [
                    (0.5 * sa * jnp.einsum("adp,adq->apq", b_i, b_i))
                    .reshape(-1, pp),
                    (0.5 * sa * jnp.einsum("adp,adq->apq", b_j, b_j))
                    .reshape(-1, pp),
                    off.reshape(-1, pp),
                ]
            )
            n_arc_rows = 3 * graph.arc_i.shape[0]
            have_pair_caches = (
                graph.pair_order is not None
                and graph.pair_order.shape[0]
                == n_pad * len(kk) + n_arc_rows
            )
            have_sorted = (
                (not affine)
                and d == 3
                and graph.ps_kkf is not None
                and graph.ps_kkf.shape[0] == n * len(kk)
                and graph.arc_sorted_order is not None
                and graph.arc_sorted_order.shape[0] == n_arc_rows
                and graph.pair_uniq_keys is not None
            )
            n_seg = (
                graph.pair_uniq_keys.shape[0]
                if graph.pair_uniq_keys is not None
                else 0
            )
            if have_sorted:
                # r5 narrow-input SORTED assembly: gather the 8-wide
                # inputs (y_anchor | w_pp w_pl n) in pair-key-sorted order
                # and evaluate the closed-form BkᵀBl entries AFTER the
                # permutation — gather cost scales with row width, so
                # permuting inputs (2×8w) instead of computed blocks
                # (1×36w) more than halves the assembly (probe part 6:
                # 31.5 ms vs 54.7 + the whole chunked compute scan).
                ptdata = jnp.concatenate(
                    [w_pp[:, None], w_pl[:, None], nrm_src], axis=1
                )  # (N, 5)
                ytab = jnp.concatenate(
                    [
                        y,
                        jnp.broadcast_to(
                            ptdata[:, None, :], (n, _k_anch, 5)
                        ),
                    ],
                    axis=-1,
                ).reshape(n * _k_anch, 8)
                ga = ytab[graph.ps_kkf]
                gb = ytab[graph.ps_llf]
                # Upper-triangle orientation: a swapped block is BlᵀBk =
                # (BkᵀBl)ᵀ — the same closed form with the two anchor
                # streams exchanged.
                sw = graph.ps_swap[:, None]
                ya = jnp.where(sw, gb[:, :3], ga[:, :3])
                yb = jnp.where(sw, ga[:, :3], gb[:, :3])
                xk = ya[:, 0]
                yk_ = ya[:, 1]
                zk = ya[:, 2]
                xl = yb[:, 0]
                yl_ = yb[:, 1]
                zl = yb[:, 2]
                wpt = ga[:, 3]
                wplt = ga[:, 4]
                dot_ = xk * xl + yk_ * yl_ + zk * zl
                one = jnp.ones_like(dot_)
                zero = jnp.zeros_like(dot_)
                # BkᵀBl = [(yk·yl)I − yl ykᵀ, [yk]× ; −[yl]×, I].
                tl = [
                    [dot_ - xl * xk, -xl * yk_, -xl * zk],
                    [-yl_ * xk, dot_ - yl_ * yk_, -yl_ * zk],
                    [-zl * xk, -zl * yk_, dot_ - zl * zk],
                ]
                tr_b = [
                    [zero, -zk, yk_],
                    [zk, zero, -xk],
                    [-yk_, xk, zero],
                ]
                bl_b = [
                    [zero, zl, -yl_],
                    [-zl, zero, xl],
                    [yl_, -xl, zero],
                ]
                br_b = [
                    [one, zero, zero],
                    [zero, one, zero],
                    [zero, zero, one],
                ]
                base = [[None] * 6 for _ in range(6)]
                for p_ in range(3):
                    for q_ in range(3):
                        base[p_][q_] = tl[p_][q_]
                        base[p_][q_ + 3] = tr_b[p_][q_]
                        base[p_ + 3][q_] = bl_b[p_][q_]
                        base[p_ + 3][q_ + 3] = br_b[p_][q_]
                if dst_normals is not None:
                    nx = ga[:, 5]
                    ny_ = ga[:, 6]
                    nz = ga[:, 7]
                    bnk = [
                        yk_ * nz - zk * ny_,
                        zk * nx - xk * nz,
                        xk * ny_ - yk_ * nx,
                        nx, ny_, nz,
                    ]
                    bnl = [
                        yl_ * nz - zl * ny_,
                        zl * nx - xl * nz,
                        xl * ny_ - yl_ * nx,
                        nx, ny_, nz,
                    ]
                    ent = [
                        wpt * base[p_][q_] + wplt * bnk[p_] * bnl[q_]
                        for p_ in range(6)
                        for q_ in range(6)
                    ]
                else:
                    ent = [
                        wpt * base[p_][q_]
                        for p_ in range(6)
                        for q_ in range(6)
                    ]
                vals_s = graph.ps_w2[:, None] * jnp.stack(ent, axis=1)
                compact = jax.ops.segment_sum(
                    vals_s, graph.ps_seg, num_segments=n_seg,
                    indices_are_sorted=True,
                )
                compact = compact + jax.ops.segment_sum(
                    arc_vals[graph.arc_sorted_order],
                    graph.arc_sorted_seg,
                    num_segments=n_seg,
                    indices_are_sorted=True,
                )
                acc = (
                    jnp.zeros((m * m, pp), rhs.dtype)
                    .at[graph.pair_uniq_keys]
                    .set(
                        compact,
                        mode="drop",
                        indices_are_sorted=True,
                        unique_indices=True,
                    )
                )
            elif have_pair_caches:
                # Static-key path: the scan only STACKS block values; the
                # duplicate-key reduction rides the precomputed sort as one
                # gather + SORTED segment_sum into the occupied node pairs,
                # then a unique sorted expand (2.7× the scatter's speed at
                # bench scale — tools/pairblock_probe.py).
                if not affine and d == 3:
                    def chunk_fn(_, args):
                        return jnp.int32(0), chunk_blocks_soa(args)
                else:
                    def chunk_fn(_, args):
                        pair, _keys = chunk_blocks(args)
                        return jnp.int32(0), pair

                _, pair_stacked = jax.lax.scan(
                    chunk_fn, jnp.int32(0), chunk_args
                )
                vals = jnp.concatenate(
                    [pair_stacked.reshape(-1, pp), arc_vals]
                )
                compact = jax.ops.segment_sum(
                    vals[graph.pair_order],
                    graph.pair_seg_ids,
                    num_segments=graph.pair_uniq_keys.shape[0],
                    indices_are_sorted=True,
                )
                acc = (
                    jnp.zeros((m * m, pp), rhs.dtype)
                    .at[graph.pair_uniq_keys]
                    .set(
                        compact,
                        mode="drop",
                        indices_are_sorted=True,
                        unique_indices=True,
                    )
                )
            else:
                # Fallback (traced graph build / sharded identity caches):
                # unordered scatter-add per chunk.
                def chunk_fn(acc, args):
                    pair, keys = chunk_blocks(args)
                    return acc.at[keys].add(pair), jnp.int32(0)

                acc, _ = jax.lax.scan(
                    chunk_fn, jnp.zeros((m * m, pp), rhs.dtype), chunk_args
                )
                arc_keys = jnp.concatenate(
                    [
                        graph.arc_i * m + graph.arc_i,
                        graph.arc_j * m + graph.arc_j,
                        jnp.minimum(graph.arc_i, graph.arc_j) * m
                        + jnp.maximum(graph.arc_i, graph.arc_j),
                    ]
                )
                acc = acc.at[arc_keys].add(arc_vals)

            # (M, M, P, P) → (M·P, M·P) via P lane-friendly slices (a naive
            # transpose materializes a (…, M, P) layout that pads P→128).
            acc4 = acc.reshape(m, m, p_par, p_par)
            h_mat = jnp.stack(
                [
                    acc4[:, :, q, :].reshape(m, m * p_par)
                    for q in range(p_par)
                ],
                axis=1,
            ).reshape(m * p_par, m * p_par)
            # Symmetrize (each unordered block was stored once, diagonals
            # halved), then damp + a unit diagonal on dead nodes (their rhs
            # is zero, so delta stays zero; without it the system would be
            # singular).
            h_mat = h_mat + h_mat.T
            diag = (levenberg + 1e-8) + jnp.where(
                graph.node_valid, 0.0, 1.0
            )
            h_mat = h_mat + jnp.diag(
                jnp.repeat(diag, p_par, total_repeat_length=m * p_par)
            )
            chol = jnp.linalg.cholesky(h_mat)
            delta = jax.scipy.linalg.cho_solve(
                (chol, True), rhs.reshape(-1)
            ).reshape(m, p_par)
            cg_k = jnp.int32(0)
        else:
            # Preconditioner. Rigid 3D gets the TRUE block-Jacobi: the exact
            # per-node (6,6) diagonal block of JᵀJ, assembled from per-row outer
            # products and inverted batched — near-free per CG iteration and
            # worth a large cut in iteration count. Other parameterizations keep
            # the lumped-diagonal estimate.
            use_block_precond = (not affine) and d == 3

            if use_block_precond:
                from ..core.transforms import skew3 as _skew_rows

                def _row_block(pts):
                    """B = [∂/∂ω | ∂/∂t] = [−[pts]× | I] with shape (..., 3, 6)."""
                    eye = jnp.broadcast_to(
                        jnp.eye(3, dtype=pts.dtype), pts.shape[:-1] + (3, 3)
                    )
                    return jnp.concatenate([-_skew_rows(pts), eye], axis=-1)

                b_anchor = _row_block(y)  # (N, K, 3, 6)
                blocks = w_pp[:, None, None, None] * jnp.einsum(
                    "nkdi,nkdj->nkij", b_anchor, b_anchor
                )
                if dst_normals is not None:
                    bn = jnp.einsum("nd,nkdi->nki", dst_normals, b_anchor)
                    blocks = blocks + w_pl[:, None, None, None] * jnp.einsum(
                        "nki,nkj->nkij", bn, bn
                    )
                blocks = blocks * (wa**2)[..., None, None]
                node_blocks = graph.segment_over_anchors(
                    blocks.reshape(n, -1, 36)
                ).reshape(m, 6, 6)
                sa = (stiffness * w_arc)[:, None, None]
                b_i = _row_block(y_jl)
                b_j = -_row_block(y_ll)
                node_blocks = node_blocks + jax.ops.segment_sum(
                    sa * jnp.einsum("adi,adj->aij", b_i, b_i),
                    graph.arc_i,
                    num_segments=m,
                    indices_are_sorted=True,
                )
                node_blocks = node_blocks + graph.segment_over_arc_j(
                    (sa * jnp.einsum("adi,adj->aij", b_j, b_j)).reshape(-1, 36)
                ).reshape(m, 6, 6)
                node_blocks = node_blocks + (levenberg + 1e-8) * jnp.eye(
                    6, dtype=rhs.dtype
                )
                prec_blocks = jnp.linalg.inv(node_blocks)

                def apply_precond(r):
                    return jnp.einsum("mij,mj->mi", prec_blocks, r)

            else:
                # Lumped-diagonal estimate — conditioning only, never
                # correctness.
                def diag_estimate():
                    w_data = w_pp + w_pl
                    ww = w_data[:, None] * wa**2  # (N, K)
                    y2 = jnp.sum(y * y, axis=-1)  # (N, K)
                    acc_w = graph.segment_over_anchors(ww * y2)
                    acc_t = graph.segment_over_anchors(ww)
                    sa = stiffness * w_arc
                    arc_w = jax.ops.segment_sum(
                        sa * jnp.sum(y_jl * y_jl, -1), graph.arc_i,
                        num_segments=m, indices_are_sorted=True,
                    ) + graph.segment_over_arc_j(sa * jnp.sum(y_ll * y_ll, -1))
                    arc_t = jax.ops.segment_sum(
                        sa, graph.arc_i, num_segments=m, indices_are_sorted=True
                    ) + graph.segment_over_arc_j(sa)
                    dw_diag = jnp.broadcast_to(
                        (acc_w + arc_w)[:, None], (m, n_lin)
                    )
                    dt_diag = jnp.broadcast_to((acc_t + arc_t)[:, None], (m, d))
                    return jnp.concatenate([dw_diag, dt_diag], axis=1) + levenberg

                precond_vec = 1.0 / jnp.maximum(diag_estimate(), _EPS)

                def apply_precond(r):
                    return precond_vec * r

            # Preconditioned CG on (JᵀJ + λI) δ = rhs, relative tolerance
            # (Eigen CG semantics, ``warp_field_estimation.hpp:188-192``).
            def cg(rhs):
                rhs_norm2 = jnp.sum(rhs * rhs)
                x0 = jnp.zeros_like(rhs)
                r0 = rhs
                z0 = apply_precond(r0)
                p0 = z0
                rz0 = jnp.sum(r0 * z0)

                def cg_body(carry):
                    xk, rk, pk, rzk, k = carry
                    ap = normal_matvec(pk)
                    alpha = rzk / jnp.maximum(jnp.sum(pk * ap), _EPS)
                    xk1 = xk + alpha * pk
                    rk1 = rk - alpha * ap
                    zk1 = apply_precond(rk1)
                    rzk1 = jnp.sum(rk1 * zk1)
                    beta = rzk1 / jnp.maximum(rzk, _EPS)
                    return xk1, rk1, zk1 + beta * pk, rzk1, k + 1

                def cg_cond(carry):
                    _, rk, _, _, k = carry
                    return (k < max_cg_iterations) & (
                        jnp.sum(rk * rk) > cg_tol * cg_tol * rhs_norm2
                    )

                xk, _, _, _, k = jax.lax.while_loop(
                    cg_cond, cg_body, (x0, r0, p0, rz0, jnp.array(0, jnp.int32))
                )
                return xk, k

            delta, cg_k = cg(rhs)

        # Apply per-node increments ΔT(δ) ∘ T (rotation re-projection keeps
        # rigid fields rigid; affine fields compose exactly).
        dw, dt = delta[:, :n_lin], delta[:, n_lin:]
        if affine:
            lin_inc = jnp.eye(d, dtype=delta.dtype) + dw.reshape(m, d, d)
        elif d == 3:
            lin_inc = axis_angle_to_rotation(dw)
        else:
            theta = dw[:, 0]
            c, s = jnp.cos(theta), jnp.sin(theta)
            lin_inc = jnp.stack(
                [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2
            )
        inc = Transform(lin_inc, dt)
        new_tf = compose(inc, node_tf)
        if not affine:
            new_tf = Transform(
                project_to_rotation(new_tf.linear), new_tf.translation
            )
        max_update = jnp.max(
            jnp.where(graph.node_valid, jnp.linalg.norm(delta, axis=1), 0.0)
        )
        return new_tf, max_update, it + 1, cg_total + cg_k

    def gn_cond(carry):
        _, upd, it, _ = carry
        return (it < max_gn_iterations) & (upd >= gn_tol)

    node_tf, upd, _, cg_total = jax.lax.while_loop(
        gn_cond,
        gn_body,
        (
            node_tf,
            jnp.array(jnp.inf, src_points.dtype),
            jnp.array(0, jnp.int32),
            jnp.array(0, jnp.int32),
        ),
    )
    return node_tf, upd < gn_tol, cg_total


# ---------------------------------------------------------------------------
# Non-rigid ICP outer loops (sparse EDG + dense warp fields).
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "max_iterations",
        "max_gn_iterations",
        "max_cg_iterations",
        "node_type",
        "solver",
    ),
)
def icp_warp_field(
    graph: DeformationGraph,
    src_points: jax.Array,
    dst_points: jax.Array,
    *,
    dst_normals: Optional[jax.Array] = None,
    src_valid: Optional[jax.Array] = None,
    dst_valid: Optional[jax.Array] = None,
    max_corr_dist_sq: float = 0.0025,
    point_weight: float = 0.1,
    plane_weight: float = 1.0,
    stiffness: float = 200.0,
    huber_delta: float = 1e-2,
    max_iterations: int = 15,
    convergence_tol: float = 2.5e-3,
    max_gn_iterations: int = 1,
    max_cg_iterations: int = 500,
    node_type: str = "rigid",
    solver: str = "auto",
) -> Tuple[Transform, jax.Array, jax.Array]:
    """Sparse (EDG) non-rigid ICP (``CombinedMetricSparseWarpFieldICP``,
    ``icp_warp_field_combined_metric_sparse.hpp:202-240``; example defaults
    ``non_rigid_icp.cpp:66-84``: 15 outer iterations, 1 GN iteration each).

    Each outer iteration: warp src by the blended field → NN correspondences
    → one GN step on the node transforms. Returns
    ``(node_transforms, iterations, converged)``. The dense per-point field is
    :func:`warp_points` / :func:`resample_transforms` applied to the result.
    """
    from ..correspondence.search import find_nn_correspondences

    n, d = src_points.shape
    if src_valid is None:
        src_valid = jnp.ones(n, bool)
    node_tf = identity_warp(graph.num_nodes, d)

    # Hoist the pruned-NN Morton sorts out of the outer loop (same reasoning
    # as rigid ICP: dst is fixed, the warp moves points gradually; per-
    # iteration AABBs keep the prune exact).
    from ..neighbors.pallas_nn import maybe_make_nn1_prune_plan

    prune_plan = maybe_make_nn1_prune_plan(
        dst_points,
        max_corr_dist_sq,
        src_points,
        key_valid=dst_valid,
        query_valid=src_valid,
    )

    def body(carry):
        node_tf, _, it = carry
        warped = warp_points(graph, node_tf, src_points)
        # The gate doubles as the box-prune bound: on large gated 3D
        # problems this takes the Morton-tile-pruned kernel (the same fast
        # path rigid ICP rides).
        corr = find_nn_correspondences(
            warped,
            dst_points,
            query_valid=src_valid,
            dst_valid=dst_valid,
            max_distance=max_corr_dist_sq,
            prune_plan=prune_plan,
        )
        mask, idx = corr.mask, corr.dst_idx
        w = mask.astype(src_points.dtype)
        dgt = dst_points[jnp.where(mask, idx, 0)]
        ngt = (
            dst_normals[jnp.where(mask, idx, 0)]
            if dst_normals is not None
            else None
        )
        new_tf, _, _ = estimate_warp_field(
            graph,
            src_points,
            dgt,
            ngt,
            w,
            init=node_tf,
            point_weight=point_weight,
            plane_weight=plane_weight,
            stiffness=stiffness,
            huber_delta=huber_delta,
            max_gn_iterations=max_gn_iterations,
            gn_tol=0.0,
            max_cg_iterations=max_cg_iterations,
            node_type=node_type,
            solver=solver,
        )
        # Convergence: max per-node motion between outer iterations
        # (icp_warp_field_combined_metric_sparse.hpp convergence norm).
        delta_lin = new_tf.linear - node_tf.linear
        delta_tr = new_tf.translation - node_tf.translation
        upd = jnp.max(
            jnp.where(
                graph.node_valid,
                jnp.sqrt(
                    jnp.sum(delta_lin**2, axis=(-2, -1))
                    + jnp.sum(delta_tr**2, axis=-1)
                ),
                0.0,
            )
        )
        return new_tf, upd, it + 1

    def cond(carry):
        _, upd, it = carry
        return (it < max_iterations) & (upd >= convergence_tol)

    node_tf, upd, it = jax.lax.while_loop(
        cond,
        body,
        (node_tf, jnp.array(jnp.inf, src_points.dtype), jnp.array(0, jnp.int32)),
    )
    return node_tf, it, upd < convergence_tol


def build_dense_graph(
    src_points: jax.Array,
    *,
    src_valid: Optional[jax.Array] = None,
    k_arcs: int = 8,
) -> DeformationGraph:
    """Dense warp field as a degenerate EDG: every point is its own node with
    weight 1 (maps the dense solvers, ``warp_field_estimation.hpp:92-995``);
    regularization arcs from the point k-NN graph."""
    n = src_points.shape[0]
    if src_valid is None:
        src_valid = jnp.ones(n, bool)
    arcs = knn_search(
        src_points,
        src_points,
        k_arcs,
        query_valid=src_valid,
        key_valid=src_valid,
        exclude_self=True,
    )
    return _with_sort_caches(
        DeformationGraph(
            node_positions=src_points,
            node_valid=src_valid,
            anchors=jnp.arange(n, dtype=jnp.int32)[:, None],
            anchor_weights=src_valid.astype(src_points.dtype)[:, None],
            arc_i=jnp.repeat(jnp.arange(n, dtype=jnp.int32), k_arcs),
            arc_j=arcs.indices.reshape(-1),
            arc_mask=arcs.mask.reshape(-1),
            anchor_order=jnp.zeros(0, jnp.int32),
            anchor_sorted_ids=jnp.zeros(0, jnp.int32),
            arc_j_order=jnp.zeros(0, jnp.int32),
            arc_j_sorted=jnp.zeros(0, jnp.int32),
        )
    )


@partial(
    jax.jit,
    static_argnames=(
        "height",
        "width",
        "max_iterations",
        "max_gn_iterations",
        "max_cg_iterations",
        "node_type",
        "solver",
    ),
)
def icp_warp_field_projective(
    graph: DeformationGraph,
    src_points: jax.Array,
    dst_points: jax.Array,
    intrinsics,
    *,
    height: int,
    width: int,
    index_map: Optional[jax.Array] = None,
    dst_normals: Optional[jax.Array] = None,
    src_valid: Optional[jax.Array] = None,
    dst_valid: Optional[jax.Array] = None,
    max_corr_dist_sq: float = 0.0025,
    point_weight: float = 0.1,
    plane_weight: float = 1.0,
    stiffness: float = 200.0,
    huber_delta: float = 1e-2,
    max_iterations: int = 15,
    convergence_tol: float = 2.5e-3,
    max_gn_iterations: int = 1,
    max_cg_iterations: int = 500,
    node_type: str = "rigid",
    solver: str = "auto",
) -> Tuple[Transform, jax.Array, jax.Array]:
    """Non-rigid ICP with **projective** correspondence search — the
    reference's projective warp-field instances
    (``icp_common_instances.hpp:246-335``: ``...WarpFieldProjectiveICP``
    wiring ``CorrespondenceSearchProjective`` into the warp-field solvers).

    Both clouds live in the dst camera frame; the dst index map is rendered
    once and resolved into a packed per-pixel target
    (:func:`..correspondence.projective.pack_projective_target`), so each
    outer iteration costs one warp + one projection + ONE gather — O(N) per
    iteration regardless of dst size, the same speedup the rigid fusion
    localizer gets.
    """
    from ..core.rgbd import points_to_index_map
    from ..correspondence.projective import (
        find_projective_correspondences_packed,
        pack_projective_target,
    )

    n, d = src_points.shape
    if src_valid is None:
        src_valid = jnp.ones(n, bool)
    if index_map is None:
        index_map = points_to_index_map(
            dst_points, intrinsics, height, width, valid=dst_valid
        )
    packed = pack_projective_target(
        dst_points, dst_normals, index_map, dst_valid=dst_valid
    )
    node_tf = identity_warp(graph.num_nodes, d)

    def body(carry):
        node_tf, _, it = carry
        warped = warp_points(graph, node_tf, src_points)
        _, dgt, ngt, w = find_projective_correspondences_packed(
            warped,
            packed,
            intrinsics,
            height,
            width,
            src_valid=src_valid,
            max_distance=max_corr_dist_sq,
        )
        new_tf, _, _ = estimate_warp_field(
            graph,
            src_points,
            dgt,
            ngt if dst_normals is not None else None,
            w,
            init=node_tf,
            point_weight=point_weight,
            plane_weight=plane_weight,
            stiffness=stiffness,
            huber_delta=huber_delta,
            max_gn_iterations=max_gn_iterations,
            gn_tol=0.0,
            max_cg_iterations=max_cg_iterations,
            node_type=node_type,
            solver=solver,
        )
        delta_lin = new_tf.linear - node_tf.linear
        delta_tr = new_tf.translation - node_tf.translation
        upd = jnp.max(
            jnp.where(
                graph.node_valid,
                jnp.sqrt(
                    jnp.sum(delta_lin**2, axis=(-2, -1))
                    + jnp.sum(delta_tr**2, axis=-1)
                ),
                0.0,
            )
        )
        return new_tf, upd, it + 1

    def cond(carry):
        _, upd, it = carry
        return (it < max_iterations) & (upd >= convergence_tol)

    node_tf, upd, it = jax.lax.while_loop(
        cond,
        body,
        (
            node_tf,
            jnp.array(jnp.inf, src_points.dtype),
            jnp.array(0, jnp.int32),
        ),
    )
    return node_tf, it, upd < convergence_tol
