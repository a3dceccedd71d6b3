"""Round-3 probe #8: honest (LICM-proof) split of the non-rigid solve.

Measures, one call each on the real chip:
  - pruned NN (planned) at bench scale
  - one direct GN step / one CG GN step (estimate_warp_field)
  - the direct solver's pieces in isolation: pair-block scatter assembly,
    the (M*M,PP) -> (MP, MP) layout dance, Cholesky + cho_solve
  - full icp_warp_field (10 outer) for reference

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/warp_split_probe.py \
    [nn gn cg pieces full]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from tools.honest_bench import op_time


def main(which):
    from cilantro_tpu.core.containers import PointCloud
    from cilantro_tpu.core.grid import grid_downsample
    from cilantro_tpu.correspondence.search import find_nn_correspondences
    from cilantro_tpu.neighbors.pallas_nn import (
        maybe_make_nn1_prune_plan, nn1_pruned_planned,
    )
    from cilantro_tpu.registration import (
        build_deformation_graph, icp_warp_field, warp_points,
    )
    from cilantro_tpu.registration.warp_field import estimate_warp_field
    from cilantro_tpu.utils import read_point_cloud

    src, _, _ = read_point_cloud(
        "/root/reference/examples/test_clouds/frame_1.ply"
    )
    dst = src.copy()
    dst[:, 2] += 0.02 * np.sin(8.0 * src[:, 0])
    dst[:, 1] += 0.01 * np.cos(6.0 * src[:, 0])
    srcj, dstj = jax.device_put((src, dst))
    ctrl = grid_downsample(PointCloud(points=srcj), 0.025, capacity=1024)
    graph = build_deformation_graph(
        srcj, ctrl.points, node_valid=ctrl.valid, k_anchors=4, k_arcs=8
    )
    plan = maybe_make_nn1_prune_plan(dstj, 0.0025, srcj)
    print(f"graph: m={graph.num_nodes} anchors K={graph.anchors.shape[1]} "
          f"arcs A={graph.arc_i.shape[0]}", flush=True)

    if "nn" in which:
        r = op_time(lambda q: nn1_pruned_planned(q, plan), (srcj,), lo=1, hi=5)
        print(f"NN  pruned_planned 120k:      {r}", flush=True)

    # fixed correspondences for the GN probes
    corr = find_nn_correspondences(srcj, dstj, max_distance=0.0025,
                                   prune_plan=plan)
    w = corr.mask.astype(jnp.float32)
    dgt = dstj[jnp.where(corr.mask, corr.dst_idx, 0)]

    # 2. one GN step, direct / cg
    def gn(solver):
        def f(s):
            tf, _, _ = estimate_warp_field(
                graph, s, dgt, None, w, point_weight=1.0, plane_weight=0.0,
                stiffness=50.0, max_gn_iterations=1, max_cg_iterations=200,
                solver=solver,
            )
            return tf.translation
        return f

    if "gn" in which:
        r = op_time(gn("direct"), (srcj,), lo=1, hi=3)
        print(f"GN  direct 1 step:            {r}", flush=True)
    if "cg" in which:
        r = op_time(gn("cg"), (srcj,), lo=1, hi=3)
        print(f"GN  cg(<=200) 1 step:         {r}", flush=True)
    if "pieces" not in which:
        if "full" in which:
            _full(icp_warp_field, graph, srcj, dstj)
        return

    # 3. direct pieces in isolation
    m, p_par = int(graph.num_nodes), 6
    pp = p_par * p_par
    key = jax.random.PRNGKey(0)
    n = srcj.shape[0]
    tpairs = 10  # K(K+1)/2
    keys_rows = jax.random.randint(key, (n * tpairs,), 0, m * m)
    vals_rows = jax.random.normal(key, (n * tpairs, pp), jnp.float32)

    def scatter_acc(v):
        acc = jnp.zeros((m * m, pp), jnp.float32)
        return acc.at[keys_rows].add(v)

    r = op_time(scatter_acc, (vals_rows,), lo=1, hi=5)
    print(f"ASM scatter-add 1.2M rows:    {r}", flush=True)

    # chunked-scan variant (what the solver actually does: 30 chunks)
    chunk = 4096 * tpairs
    n_chunks = (n * tpairs) // chunk

    def scatter_scan(v):
        kc = keys_rows[: n_chunks * chunk].reshape(n_chunks, chunk)
        vc = v[: n_chunks * chunk].reshape(n_chunks, chunk, pp)

        def body(acc, args):
            k_, v_ = args
            return acc.at[k_].add(v_), 0

        acc, _ = jax.lax.scan(body, jnp.zeros((m * m, pp), jnp.float32),
                              (kc, vc))
        return acc

    r = op_time(scatter_scan, (vals_rows,), lo=1, hi=5)
    print(f"ASM scatter-add scan x{n_chunks}:    {r}", flush=True)

    acc0 = jax.random.normal(key, (m * m, pp), jnp.float32)

    def layout(acc):
        acc4 = acc.reshape(m, m, p_par, p_par)
        h = jnp.stack(
            [acc4[:, :, q, :].reshape(m, m * p_par) for q in range(p_par)],
            axis=1,
        ).reshape(m * p_par, m * p_par)
        return h + h.T

    r = op_time(layout, (acc0,), lo=1, hi=5)
    print(f"ASM layout+symmetrize 6144^2: {r}", flush=True)

    h0 = layout(acc0)
    spd = h0 @ h0.T + 6144 * jnp.eye(m * p_par, dtype=jnp.float32)
    rhs = jax.random.normal(key, (m * p_par,), jnp.float32)

    def chol_solve(a):
        c = jnp.linalg.cholesky(a)
        return jax.scipy.linalg.cho_solve((c, True), rhs)

    r = op_time(chol_solve, (spd,), lo=1, hi=3)
    print(f"SOLVE cholesky+solve 6144:    {r}", flush=True)

    # dense matvec for a dense-PCG alternative
    x0 = jax.random.normal(key, (m * p_par,), jnp.float32)
    r = op_time(lambda a: a @ x0, (spd,), lo=2, hi=10)
    print(f"SOLVE dense matvec 6144:      {r}", flush=True)

    if "full" in which:
        _full(icp_warp_field, graph, srcj, dstj)


def _full(icp_warp_field, graph, srcj, dstj):
    kw = dict(max_corr_dist_sq=0.0025, point_weight=1.0, plane_weight=0.0,
              stiffness=50.0, max_iterations=10, max_cg_iterations=200)

    def full(s):
        tf, it, _ = icp_warp_field(graph, s, dstj, **kw)
        return tf.translation

    r = op_time(full, (srcj,), lo=1, hi=2)
    print(f"FULL icp_warp_field 10 outer: {r}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main(sys.argv[1:] or ["nn", "gn", "pieces"])
