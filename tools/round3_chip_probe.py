"""Round-3 probe #7: (a) public exact-kNN path timing after the dispatcher
fix, with a tile sweep; (b) non-rigid warp solve phase breakdown.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/round3_chip_probe.py [knn|warp]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def fetch_scalar(x):
    return np.asarray(x)


def probe_knn():
    from cilantro_tpu.neighbors import knn
    from cilantro_tpu.neighbors.pallas_nn import knn_pruned
    from cilantro_tpu.utils import read_point_cloud

    p1, _, _ = read_point_cloud(
        "/root/reference/examples/test_clouds/frame_1.ply"
    )
    p1j = jax.device_put(np.asarray(p1, np.float32))

    @jax.jit
    def pub(p):
        d, i = knn(p, p, 10, exclude_self=True)
        return jnp.sum(d) + jnp.sum(i)

    fetch_scalar(pub(p1j))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fetch_scalar(pub(p1j))
        best = min(best, time.perf_counter() - t0)
    print(f"public knn(exclude_self) k=10 120k self: {best*1e3:.0f} ms",
          flush=True)

    for tq, tm in [(512, 1024), (512, 2048), (1024, 2048), (1024, 4096),
                   (256, 2048)]:
        @jax.jit
        def bare(p, tq=tq, tm=tm):
            d, i = knn_pruned(p, p, 11, tile_q=tq, tile_m=tm)
            return jnp.sum(d) + jnp.sum(i)

        try:
            fetch_scalar(bare(p1j))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                fetch_scalar(bare(p1j))
                best = min(best, time.perf_counter() - t0)
            print(f"bare knn_pruned k=11 tiles {tq}/{tm}: {best*1e3:.0f} ms",
                  flush=True)
        except Exception as e:  # noqa
            print(f"tiles {tq}/{tm}: FAILED {type(e).__name__}", flush=True)


def probe_warp():
    from cilantro_tpu.core.containers import PointCloud
    from cilantro_tpu.core.grid import grid_downsample
    from cilantro_tpu.correspondence.search import find_nn_correspondences
    from cilantro_tpu.neighbors.pallas_nn import maybe_make_nn1_prune_plan
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
    kw = dict(
        max_corr_dist_sq=0.0025, point_weight=1.0, plane_weight=0.0,
        stiffness=50.0, max_iterations=10, max_cg_iterations=200,
    )

    def timeit(label, f, *a, reps=2):
        fetch_scalar(f(*a))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch_scalar(f(*a))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best*1e3:.0f} ms", flush=True)
        return best

    # V1: full solve (the bench row)
    @jax.jit
    def v1(g, s, d):
        tf, it, _ = icp_warp_field(g, s, d, **kw)
        return jnp.sum(tf.translation) + it

    timeit("V1 full icp_warp_field (10 outer, direct)", v1, graph, srcj,
           dstj)

    # V2: correspondence-only loop (warp + pruned NN), 10 rounds
    plan = maybe_make_nn1_prune_plan(dstj, 0.0025, srcj)

    @jax.jit
    def v2(g, s, d):
        from cilantro_tpu.registration.warp_field import identity_warp

        tf = identity_warp(g.num_nodes, 3)

        def body(i, acc):
            w = warp_points(g, tf, s)
            corr = find_nn_correspondences(
                w, d, max_distance=0.0025, prune_plan=plan
            )
            return acc + jnp.sum(corr.dst_idx)

        return jax.lax.fori_loop(0, 10, body, jnp.int32(0))

    timeit("V2 10x (warp + pruned NN)", v2, graph, srcj, dstj)

    # V3: GN only — 10 direct solves at fixed correspondences
    corr = find_nn_correspondences(srcj, dstj, max_distance=0.0025,
                                   prune_plan=plan)
    w = corr.mask.astype(jnp.float32)
    dgt = dstj[jnp.where(corr.mask, corr.dst_idx, 0)]

    @jax.jit
    def v3(g, s, dg, w_):
        def body(i, acc):
            tf, _, _ = estimate_warp_field(
                g, s, dg, None, w_, point_weight=1.0, plane_weight=0.0,
                stiffness=50.0, max_gn_iterations=1, max_cg_iterations=200,
                solver="direct",
            )
            return acc + jnp.sum(tf.translation)

        return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

    timeit("V3 10x direct GN (fixed corr)", v3, graph, srcj, dgt, w)

    @jax.jit
    def v3cg(g, s, dg, w_):
        def body(i, acc):
            tf, _, _ = estimate_warp_field(
                g, s, dg, None, w_, point_weight=1.0, plane_weight=0.0,
                stiffness=50.0, max_gn_iterations=1, max_cg_iterations=200,
                solver="cg",
            )
            return acc + jnp.sum(tf.translation)

        return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

    timeit("V3cg 10x CG GN (fixed corr)", v3cg, graph, srcj, dgt, w)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("knn", "both"):
        probe_knn()
    if which in ("warp", "both"):
        probe_warp()
