"""Batched non-rigid warp-field solves — B targets against ONE shared EDG.

The reference solves one warp field per call (OpenMP inside one solve,
``warp_field_estimation.hpp:1387-1847``). The single-solve TPU port is
latency-bound: ~148 ns/row over ~1.7M indexed rows per outer iteration
(anchor gathers, pair-block permutation gather, segment sums), and a chip
cannot issue indexed rows faster — measured 2.48 s/solve vs 1.69-2.09 s for
one CPU core (BASELINE.md). This module is the TPU-honest answer for the
serving shape of the workload (one deformable template tracked against B
observed frames — the DynamicFusion-style batch): every graph-indexed op's
*indices* (anchors, arcs, precomputed pair-block runs) are SHARED across
streams, so B solves ride the SAME rank-1 gathers/segment-sums with B×
wider value rows. Indexed ops price ROWS, not bytes — the B-fold extra
work travels free until rows hit HBM bandwidth — and the per-stream dense
normal systems batch onto the MXU as one ``(B, 6M, 6M)`` Cholesky.

Scope (asserted): rigid 3-D nodes, the direct dense solver, a graph built
from concrete arrays (host-precomputed pair caches). That is exactly the
EDG bench configuration; other configurations take B independent
:func:`..registration.icp_warp_field` calls.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.transforms import (
    Transform,
    axis_angle_to_rotation,
    project_to_rotation,
    skew3,
)
from .warp_field import (
    _ASSEMBLY_CHUNK,
    DeformationGraph,
    _huber_weights,
)


def identity_warp_batched(bsz: int, num_nodes: int) -> Transform:
    return Transform(
        jnp.broadcast_to(jnp.eye(3), (bsz, num_nodes, 3, 3)),
        jnp.zeros((bsz, num_nodes, 3)),
    )


def _nodes_wide(node_tf: Transform):
    """(B, M, …) per-node transforms → ONE node-leading wide-row array
    ``(M, B·12)`` (linear then translation) so every graph gather is one
    rank-1 gather of wide rows — indexed ops price rows, not bytes."""
    bsz, m = node_tf.translation.shape[:2]
    lin = node_tf.linear.transpose(1, 0, 2, 3).reshape(m, bsz * 9)
    tr = node_tf.translation.transpose(1, 0, 2).reshape(m, bsz * 3)
    return jnp.concatenate([lin, tr], axis=1)


def _split_wide(pa, bsz):
    """Split a gathered ``(..., B·12)`` packed row back into
    ``lin (..., B, 3, 3)`` and ``tr (..., B, 3)``."""
    lead = pa.shape[:-1]
    lin = pa[..., : bsz * 9].reshape(lead + (bsz, 3, 3))
    tr = pa[..., bsz * 9:].reshape(lead + (bsz, 3))
    return lin, tr


def warp_points_batched(
    graph: DeformationGraph, node_tf: Transform, points: jax.Array
) -> jax.Array:
    """(B, M) transforms applied to the SHARED source points → (N, B, 3)
    (batch axis after the point axis: that is the layout every downstream
    consumer wants, and it keeps the anchor gather rank-1)."""
    bsz = node_tf.translation.shape[0]
    lin_a, tr_a = _split_wide(
        _nodes_wide(node_tf)[graph.anchors], bsz
    )
    y = jnp.einsum("nkbij,nj->nkbi", lin_a, points) + tr_a
    return jnp.einsum("nk,nkbi->nbi", graph.anchor_weights, y)


def _row_blocks_rigid(pts: jax.Array) -> jax.Array:
    """B = [−[pts]× | I] with shape (..., 3, 6)."""
    eye = jnp.broadcast_to(
        jnp.eye(3, dtype=pts.dtype), pts.shape[:-1] + (3, 3)
    )
    return jnp.concatenate([-skew3(pts), eye], axis=-1)


@partial(jax.jit, static_argnames=("max_gn_iterations",))
def estimate_warp_field_batched(
    graph: DeformationGraph,
    src_points: jax.Array,  # (N, 3) shared source
    dst_points: jax.Array,  # (N, B, 3) per-stream gathered targets
    dst_normals: Optional[jax.Array],  # (N, B, 3) or None
    corr_weights: jax.Array,  # (N, B), 0 = no correspondence
    *,
    init: Optional[Transform] = None,  # batched (B, M, …)
    point_weight: float = 0.0,
    plane_weight: float = 1.0,
    stiffness: float = 200.0,
    huber_delta: float = 1e-2,
    max_gn_iterations: int = 1,
    levenberg: float = 1e-6,
) -> Tuple[Transform, jax.Array]:
    """One-to-B twin of :func:`..registration.estimate_warp_field`
    (rigid 3-D, direct solver). Returns ``(node transforms (B, M, …),
    max per-stream GN update (B,))``.

    Per GN iteration: shared-index anchor/arc gathers with (B·…)-wide rows,
    ONE pair-block assembly pass over the precomputed sorted runs, and a
    batched (B, 6M, 6M) Cholesky on the MXU.
    """
    assert graph.pair_order is not None, (
        "estimate_warp_field_batched needs the host-precomputed pair "
        "caches (build the graph from concrete arrays)"
    )
    m = graph.num_nodes
    n, d = src_points.shape
    assert d == 3
    # The pair caches are laid out for a specific (N, K, A): a graph built
    # from a different/subsampled cloud would make the vals[pair_order]
    # gather read wrong rows (JAX clamps OOB gather indices under jit ->
    # a silently wrong Hessian). Mirror the single solver's length gate
    # (warp_field.py have_pair_caches) as a hard error (ADVICE r4 #1).
    _k_anch = graph.anchors.shape[1]
    _t_blocks = _k_anch * (_k_anch + 1) // 2
    _n_pad = max(1, -(-n // _ASSEMBLY_CHUNK)) * _ASSEMBLY_CHUNK
    _expect = _n_pad * _t_blocks + 3 * graph.arc_i.shape[0]
    assert graph.pair_order.shape[0] == _expect, (
        f"pair caches were built for a different cloud/graph shape: "
        f"pair_order has {graph.pair_order.shape[0]} rows, this problem "
        f"needs {_expect} (= {_n_pad}*{_t_blocks} pair rows + "
        f"3*{graph.arc_i.shape[0]} arc rows); rebuild the graph from the "
        f"source cloud passed here"
    )
    bsz = corr_weights.shape[1]
    k_anch = graph.anchors.shape[1]
    node_tf = (
        init if init is not None else identity_warp_batched(bsz, m)
    )
    w_pp = corr_weights * point_weight  # (N, B)
    w_pl = corr_weights * plane_weight
    p_par = 6
    pp = 36

    # Static anchor-pair index lists (upper triangle, assembly loop order).
    kk, ll = [], []
    for _k in range(k_anch):
        for _l in range(_k, k_anch):
            kk.append(_k)
            ll.append(_l)
    kk = jnp.array(kk, jnp.int32)
    ll = jnp.array(ll, jnp.int32)
    half_diag = jnp.where(kk == ll, 0.5, 1.0)[:, None, None, None]
    chunk = _ASSEMBLY_CHUNK
    n_chunks = max(1, -(-n // chunk))
    n_pad = n_chunks * chunk

    def _padc(a, fill=0.0):
        widths = ((0, n_pad - n),) + ((0, 0),) * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    def _chunked(a, fill=0.0):
        return _padc(a, fill).reshape((n_chunks, chunk) + a.shape[1:])

    nrm_t = (
        dst_normals
        if dst_normals is not None
        else jnp.zeros((n, bsz, d), src_points.dtype)
    )
    plane_terms = dst_normals is not None

    def gn_body(it, carry):
        node_tf, _ = carry
        wide = _nodes_wide(node_tf)  # (M, B·12): ONE gather per index set
        lin_a, tr_a = _split_wide(wide[graph.anchors], bsz)
        y = jnp.einsum("nkbij,nj->nkbi", lin_a, src_points) + tr_a
        wa = graph.anchor_weights  # (N, K) shared
        x = jnp.einsum("nk,nkbi->nbi", wa, y)

        # Arc geometry (A small: ~8·M rows).
        cl = graph.node_positions[graph.arc_j]  # (A, 3)
        li, ti = _split_wide(wide[graph.arc_i], bsz)
        lj, tj = _split_wide(wide[graph.arc_j], bsz)
        y_jl = jnp.einsum("abij,aj->abi", li, cl) + ti  # (A, B, 3)
        y_ll = jnp.einsum("abij,aj->abi", lj, cl) + tj
        r_arc0 = y_jl - y_ll
        h = _huber_weights(jnp.linalg.norm(r_arc0, axis=-1), huber_delta)
        w_arc = (
            graph.arc_mask
            * graph.node_valid[graph.arc_i]
            * graph.node_valid[graph.arc_j]
        )[:, None] * h  # (A, B)

        r_pp0 = x - dst_points  # (N, B, 3)
        r_pl0 = jnp.einsum("nbi,nbi->nb", nrm_t, r_pp0)

        # rhs = −Jᵀ r: data rows through ONE shared segment reduction.
        g = w_pp[..., None] * r_pp0 + (w_pl * r_pl0)[..., None] * nrm_t
        gk = wa[:, :, None, None] * g[:, None]  # (N, K, B, 3)
        gw = jnp.cross(y, gk)  # ∂/∂ω rows
        rows = jnp.concatenate([gw, gk], axis=-1)  # (N, K, B, 6)
        acc = graph.segment_over_anchors(
            rows.reshape(n, k_anch, bsz * p_par)
        )  # (M, B·6)
        ga = (stiffness * w_arc)[..., None] * r_arc0  # (A, B, 3)
        rows_i = jnp.concatenate([jnp.cross(y_jl, ga), ga], -1)
        rows_j = jnp.concatenate([-jnp.cross(y_ll, ga), -ga], -1)
        acc = acc + jax.ops.segment_sum(
            rows_i.reshape(-1, bsz * p_par), graph.arc_i,
            num_segments=m, indices_are_sorted=True,
        )
        acc = acc + graph.segment_over_arc_j(
            rows_j.reshape(-1, bsz * p_par)
        )
        rhs = -acc.reshape(m, bsz, p_par)  # (M, B, 6)

        # --- arc blocks (both assembly paths consume them) ---
        sa = (stiffness * w_arc)[..., None, None]  # (A, B, 1, 1)
        b_i = _row_blocks_rigid(y_jl)  # (A, B, 3, 6)
        b_j = -_row_blocks_rigid(y_ll)
        off = sa * jnp.einsum("abdp,abdq->abpq", b_i, b_j)
        a_swap = graph.arc_i > graph.arc_j
        off = jnp.where(
            a_swap[:, None, None, None], jnp.swapaxes(off, -1, -2), off
        )
        arc_vals = jnp.concatenate(
            [
                (0.5 * sa * jnp.einsum("abdp,abdq->abpq", b_i, b_i))
                .reshape(-1, bsz * pp),
                (0.5 * sa * jnp.einsum("abdp,abdq->abpq", b_j, b_j))
                .reshape(-1, bsz * pp),
                off.reshape(-1, bsz * pp),
            ]
        )
        n_seg = graph.pair_uniq_keys.shape[0]
        have_sorted = (
            graph.ps_kkf is not None
            and graph.ps_kkf.shape[0] == n * len(kk)
            and graph.arc_sorted_order is not None
            and graph.arc_sorted_order.shape[0] == arc_vals.shape[0]
        )
        if have_sorted:
            # r5 narrow-input SORTED assembly, batched twin of the single
            # solver's path (warp_field.py): gather (B·8)-wide input rows
            # in pair-key-sorted order and evaluate the closed-form
            # BkᵀBl entries after the permutation — replaces the chunked
            # SoA compute scan + the (B·36)-wide computed-row gather
            # (gather cost scales hard with row width; r5 probe).
            ptdata = jnp.concatenate(
                [w_pp[:, :, None], w_pl[:, :, None], nrm_t], axis=-1
            )  # (N, B, 5)
            ytab = jnp.concatenate(
                [
                    y,  # (N, K, B, 3)
                    jnp.broadcast_to(
                        ptdata[:, None], (n, k_anch, bsz, 5)
                    ),
                ],
                axis=-1,
            ).reshape(n * k_anch, bsz * 8)
            ga = ytab[graph.ps_kkf].reshape(-1, bsz, 8)
            gb = ytab[graph.ps_llf].reshape(-1, bsz, 8)
            sw = graph.ps_swap[:, None, None]
            ya = jnp.where(sw, gb[..., :3], ga[..., :3])
            yb = jnp.where(sw, ga[..., :3], gb[..., :3])
            xk, yk_, zk = ya[..., 0], ya[..., 1], ya[..., 2]  # (R1, B)
            xl, yl_, zl = yb[..., 0], yb[..., 1], yb[..., 2]
            wpt = ga[..., 3]
            wplt = ga[..., 4]
            dot_ = xk * xl + yk_ * yl_ + zk * zl
            one = jnp.ones_like(dot_)
            zero = jnp.zeros_like(dot_)
            tl = [
                [dot_ - xl * xk, -xl * yk_, -xl * zk],
                [-yl_ * xk, dot_ - yl_ * yk_, -yl_ * zk],
                [-zl * xk, -zl * yk_, dot_ - zl * zk],
            ]
            tr_b = [[zero, -zk, yk_], [zk, zero, -xk], [-yk_, xk, zero]]
            bl_b = [[zero, zl, -yl_], [-zl, zero, xl], [yl_, -xl, zero]]
            br_b = [
                [one, zero, zero], [zero, one, zero], [zero, zero, one],
            ]
            base = [[None] * 6 for _ in range(6)]
            for p_ in range(3):
                for q_ in range(3):
                    base[p_][q_] = tl[p_][q_]
                    base[p_][q_ + 3] = tr_b[p_][q_]
                    base[p_ + 3][q_] = bl_b[p_][q_]
                    base[p_ + 3][q_ + 3] = br_b[p_][q_]
            if plane_terms:
                nx = ga[..., 5]
                ny_ = ga[..., 6]
                nz = ga[..., 7]
                bnk = [
                    yk_ * nz - zk * ny_, zk * nx - xk * nz,
                    xk * ny_ - yk_ * nx, nx, ny_, nz,
                ]
                bnl = [
                    yl_ * nz - zl * ny_, zl * nx - xl * nz,
                    xl * ny_ - yl_ * nx, nx, ny_, nz,
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
            # (R1, B, 36) -> (R1, B·36): the wide-gather path's [b][pq]
            # row layout.
            vals_s = graph.ps_w2[:, None, None] * jnp.stack(ent, axis=2)
            compact = jax.ops.segment_sum(
                vals_s.reshape(-1, bsz * pp), graph.ps_seg,
                num_segments=n_seg, indices_are_sorted=True,
            )
            compact = compact + jax.ops.segment_sum(
                arc_vals[graph.arc_sorted_order],
                graph.arc_sorted_seg,
                num_segments=n_seg,
                indices_are_sorted=True,
            )
        else:
            chunk_args = (
                _chunked(y),
                _chunked(wa),
                _chunked(w_pp),
                _chunked(w_pl),
                _chunked(nrm_t),
                _chunked(graph.anchors, 0),
            )

            def chunk_blocks(args):
                """Pair blocks via the CLOSED FORM of BkᵀBl in structure-
                of-arrays layout (point-chunk axis = lanes); same
                arithmetic as the sorted path, materialized point-major
                for the precomputed pair_order gather."""
                y_k, wa_k, wpp_k, wpl_k, nrm_k, an_k = args
                yt = y_k.transpose(1, 2, 3, 0)  # (K, B, 3, C)
                ykk, yll = yt[kk], yt[ll]  # (T, B, 3, C)
                xk, yk_, zk = ykk[:, :, 0], ykk[:, :, 1], ykk[:, :, 2]
                xl, yl_, zl = yll[:, :, 0], yll[:, :, 1], yll[:, :, 2]
                waT = wa_k.T  # (K, C)
                ww = (waT[kk] * waT[ll])[:, None, :]  # (T, 1, C)
                wpt = wpp_k.T[None]  # (1, B, C)
                w_all = ww * wpt  # (T, B, C): wa_k·wa_l·w_pp per block
                dot = xk * xl + yk_ * yl_ + zk * zl
                one = jnp.ones_like(dot)
                zero = jnp.zeros_like(dot)
                tl = [
                    [dot - xl * xk, -xl * yk_, -xl * zk],
                    [-yl_ * xk, dot - yl_ * yk_, -yl_ * zk],
                    [-zl * xk, -zl * yk_, dot - zl * zk],
                ]
                tr = [
                    [zero, -zk, yk_],
                    [zk, zero, -xk],
                    [-yk_, xk, zero],
                ]
                bl_ = [
                    [zero, zl, -yl_],
                    [-zl, zero, xl],
                    [yl_, -xl, zero],
                ]
                br = [[one, zero, zero], [zero, one, zero],
                      [zero, zero, one]]
                ent = [[None] * 6 for _ in range(6)]
                for p in range(3):
                    for q in range(3):
                        ent[p][q] = w_all * tl[p][q]
                        ent[p][q + 3] = w_all * tr[p][q]
                        ent[p + 3][q] = w_all * bl_[p][q]
                        ent[p + 3][q + 3] = w_all * br[p][q]
                if plane_terms:
                    nt = nrm_k.transpose(1, 2, 0)  # (B, 3, C)
                    nx, ny, nz = nt[:, 0], nt[:, 1], nt[:, 2]

                    def cross_n(x, y, z):
                        return (y * nz - z * ny, z * nx - x * nz,
                                x * ny - y * nx)

                    bnk = list(cross_n(xk, yk_, zk)) + [
                        jnp.broadcast_to(v, xk.shape) for v in (nx, ny, nz)
                    ]
                    bnl = list(cross_n(xl, yl_, zl)) + [
                        jnp.broadcast_to(v, xl.shape) for v in (nx, ny, nz)
                    ]
                    wpl_all = ww * wpl_k.T[None]  # (T, B, C)
                    for p in range(6):
                        for q in range(6):
                            ent[p][q] = (
                                ent[p][q] + wpl_all * bnk[p] * bnl[q]
                            )
                a_n, b_n = an_k[:, kk], an_k[:, ll]  # (C, T)
                swap = (a_n > b_n).T[:, None, :]  # (T, 1, C)
                hd = half_diag.reshape(-1, 1, 1)  # (T, 1, 1)
                flat = [
                    hd * jnp.where(swap, ent[q][p], ent[p][q])
                    for p in range(6)
                    for q in range(6)
                ]
                soa = jnp.stack(flat, axis=2)  # (T, B, 36, C)
                return soa.transpose(3, 0, 1, 2).reshape(-1, bsz * pp)

            def chunk_fn(_, args):
                return jnp.int32(0), chunk_blocks(args)

            _, pair_stacked = jax.lax.scan(
                chunk_fn, jnp.int32(0), chunk_args
            )
            vals = jnp.concatenate(
                [pair_stacked.reshape(-1, bsz * pp), arc_vals]
            )
            compact = jax.ops.segment_sum(
                vals[graph.pair_order],
                graph.pair_seg_ids,
                num_segments=n_seg,
                indices_are_sorted=True,
            )
        acc_pairs = (
            jnp.zeros((m * m, bsz * pp), rhs.dtype)
            .at[graph.pair_uniq_keys]
            .set(
                compact,
                mode="drop",
                indices_are_sorted=True,
                unique_indices=True,
            )
        )

        # (M, M, B, P, P) → (B, M·P, M·P), P lane-friendly slices per q.
        acc5 = acc_pairs.reshape(m, m, bsz, p_par, p_par)
        h_mat = jnp.stack(
            [
                acc5[:, :, :, q, :].transpose(2, 0, 1, 3).reshape(
                    bsz, m, m * p_par
                )
                for q in range(p_par)
            ],
            axis=2,
        ).reshape(bsz, m * p_par, m * p_par)
        h_mat = h_mat + jnp.swapaxes(h_mat, -1, -2)
        diag = (levenberg + 1e-8) + jnp.where(graph.node_valid, 0.0, 1.0)
        h_mat = h_mat + jnp.diag(
            jnp.repeat(diag, p_par, total_repeat_length=m * p_par)
        )[None]
        chol = jnp.linalg.cholesky(h_mat)
        delta = jax.vmap(
            lambda c, r: jax.scipy.linalg.cho_solve((c, True), r)
        )(chol, rhs.transpose(1, 0, 2).reshape(bsz, m * p_par)).reshape(
            bsz, m, p_par
        )

        dw, dt = delta[..., :3], delta[..., 3:]
        lin_inc = axis_angle_to_rotation(dw.reshape(-1, 3)).reshape(
            bsz, m, 3, 3
        )
        new_lin = jnp.einsum("bmij,bmjk->bmik", lin_inc, node_tf.linear)
        new_tr = (
            jnp.einsum("bmij,bmj->bmi", lin_inc, node_tf.translation) + dt
        )
        new_tf = Transform(
            project_to_rotation(new_lin.reshape(-1, 3, 3)).reshape(
                bsz, m, 3, 3
            ),
            new_tr,
        )
        upd = jnp.max(
            jnp.where(
                graph.node_valid[None, :],
                jnp.linalg.norm(delta, axis=-1),
                0.0,
            ),
            axis=1,
        )  # (B,)
        return new_tf, upd

    node_tf, upd = jax.lax.fori_loop(
        0,
        max_gn_iterations,
        gn_body,
        (node_tf, jnp.full((bsz,), jnp.inf, src_points.dtype)),
    )
    return node_tf, upd


@partial(
    jax.jit,
    static_argnames=("max_iterations", "max_gn_iterations", "with_normals"),
)
def _icp_batched_impl(
    graph,
    src_points,
    dst_points_b,
    dst_normals_b,
    src_valid,
    dst_valid_b,
    point_weight,
    plane_weight,
    stiffness,
    huber_delta,
    convergence_tol,
    max_corr_dist_sq,
    *,
    max_iterations,
    max_gn_iterations,
    with_normals,
):
    from ..neighbors.pallas_nn import (
        INVALID_DIST, maybe_make_nn1_prune_plan, nn1_pruned_planned,
    )

    bsz, n, d = dst_points_b.shape
    m = graph.num_nodes
    # Per-stream prune plans, hoisted out of the outer loop (the sorts are
    # the O(N log N) part; AABB refresh per pass stays exact). Eligibility
    # is shape-static, so the trace picks ONE path for all streams.
    plans = [
        maybe_make_nn1_prune_plan(
            dst_points_b[b], max_corr_dist_sq, src_points,
            key_valid=None if dst_valid_b is None else dst_valid_b[b],
            query_valid=src_valid,
        )
        for b in range(bsz)
    ]
    use_planned = all(p is not None for p in plans)
    node_tf0 = identity_warp_batched(bsz, m)

    def body(carry):
        node_tf, _, it = carry
        warped = warp_points_batched(graph, node_tf, src_points)

        dgt, ngt, ws = [], [], []
        for b in range(bsz):  # unrolled: per-stream kernels/plans
            q = warped[:, b]
            if use_planned:
                # Per-stream key invalidation rides the plan (key_valid was
                # folded into the plan's augmented keys above).
                dist, idx = nn1_pruned_planned(q, plans[b])
            else:
                from ..neighbors import nn1

                dist, idx = nn1(
                    q, dst_points_b[b],
                    key_valid=(
                        None if dst_valid_b is None else dst_valid_b[b]
                    ),
                )
            mask = (
                (dist <= max_corr_dist_sq)
                & (dist < INVALID_DIST * 0.5)
                & src_valid
            )
            safe = jnp.where(mask, idx, 0)
            dgt.append(dst_points_b[b][safe])
            if with_normals:
                ngt.append(dst_normals_b[b][safe])
            ws.append(mask.astype(src_points.dtype))
        dgt = jnp.stack(dgt, axis=1)  # (N, B, 3)
        ngt = jnp.stack(ngt, axis=1) if with_normals else None
        w = jnp.stack(ws, axis=1)  # (N, B)

        new_tf, _ = estimate_warp_field_batched(
            graph, src_points, dgt, ngt, w,
            init=node_tf,
            point_weight=point_weight,
            plane_weight=plane_weight,
            stiffness=stiffness,
            huber_delta=huber_delta,
            max_gn_iterations=max_gn_iterations,
        )
        delta_lin = new_tf.linear - node_tf.linear
        delta_tr = new_tf.translation - node_tf.translation
        upd = jnp.max(
            jnp.where(
                graph.node_valid[None, :],
                jnp.sqrt(
                    jnp.sum(delta_lin**2, axis=(-2, -1))
                    + jnp.sum(delta_tr**2, axis=-1)
                ),
                0.0,
            ),
            axis=1,
        )  # (B,)
        return new_tf, upd, it + 1

    def cond(carry):
        _, upd, it = carry
        return (it < max_iterations) & jnp.any(upd >= convergence_tol)

    node_tf, upd, it = jax.lax.while_loop(
        cond,
        body,
        (
            node_tf0,
            jnp.full((bsz,), jnp.inf, src_points.dtype),
            jnp.array(0, jnp.int32),
        ),
    )
    return node_tf, it, upd < convergence_tol


def icp_warp_field_batched(
    graph: DeformationGraph,
    src_points: jax.Array,  # (N, 3) shared template
    dst_points_b: jax.Array,  # (B, N, 3) per-stream targets
    *,
    dst_normals_b: Optional[jax.Array] = None,
    src_valid: Optional[jax.Array] = None,
    dst_valid_b: Optional[jax.Array] = None,  # (B, N) per-stream key masks
    max_corr_dist_sq: float = 0.0025,
    point_weight: float = 0.1,
    plane_weight: float = 1.0,
    stiffness: float = 200.0,
    huber_delta: float = 1e-2,
    max_iterations: int = 15,
    convergence_tol: float = 2.5e-3,
    max_gn_iterations: int = 1,
) -> Tuple[Transform, jax.Array, jax.Array]:
    """B-stream twin of :func:`..registration.icp_warp_field`: one shared
    template + EDG graph registered to B target clouds in ONE program.

    ``dst_valid_b`` masks padded/invalid rows of each stream's target out
    of the NN search (ADVICE r4 #2): omitted, all target rows are treated
    as real keys. The per-stream NN searches cannot share work (each
    stream has its own key cloud and prune plan) and run unrolled inside
    the outer body; the
    GN solve is ONE batched :func:`estimate_warp_field_batched`. All
    streams iterate in lockstep until every stream's node-motion update
    drops below tolerance. Returns ``(transforms (B, M, …), iterations,
    converged (B,))``.
    """
    n = src_points.shape[0]
    if src_valid is None:
        src_valid = jnp.ones(n, bool)
    have_normals = dst_normals_b is not None
    if not have_normals:
        dst_normals_b = jnp.zeros_like(dst_points_b)  # unused when gated off
    return _icp_batched_impl(
        graph, src_points, dst_points_b, dst_normals_b, src_valid,
        dst_valid_b,
        point_weight, plane_weight, stiffness, huber_delta,
        convergence_tol, max_corr_dist_sq,
        max_iterations=max_iterations,
        max_gn_iterations=max_gn_iterations,
        # Plane terms need REAL normals: gating on plane_weight alone would
        # run the full rank-1 plane assembly against the zero placeholder
        # (same semantics as the single solver's dst_normals=None).
        with_normals=have_normals and plane_weight != 0.0,
    )
