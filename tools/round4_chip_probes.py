"""Round-4 measurement probes (consolidated; run ONE part at a time on the
real chip):

  layout   — the decisive pair-block layout experiment: AoS einsum vs
             closed-form SoA (+stack, +transpose). Result 2026-08-20:
             331 / 39 / 38 / 89 ms for 30 chunks at (C=4096, T=10, B=8) —
             the basis of the closed-form assembly in warp_field*.py.
  gnsplit  — batched-GN stage bisect (y gathers / rhs / block scan):
             the block scan was 644 of the 808 ms GN before the fix.
  warp     — single + batched warp solves and recovery at bench scale.
  splatit  — splat ATE/throughput vs localize GN iteration cap (ATE was
             0.027 mm from 6 down to 2 iters -> convergence early exit).
  nnsweep  — knn_pruned / radius_search_pruned / nn1 plan tile sweeps
             (landed the 256/1024, 256/1024, and 512/1024 defaults).

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
     tools/round4_chip_probes.py <part>
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def _timed(label, fn, fetch=lambda o: np.asarray(
        jax.tree_util.tree_leaves(o)[0]).ravel()[:1], reps=3):
    out = fn()
    fetch(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)
    return out, best


def _cloud():
    from cilantro_tpu.utils import read_point_cloud

    pts, _, _ = read_point_cloud(
        "/root/reference/examples/test_clouds/frame_1.ply"
    )
    return pts


def _bench_graph(srcj):
    from cilantro_tpu.core.containers import PointCloud
    from cilantro_tpu.core.grid import grid_downsample
    from cilantro_tpu.registration import build_deformation_graph

    ctrl = grid_downsample(PointCloud(points=srcj), 0.025, capacity=1024)
    occ = np.asarray(ctrl.points)[np.asarray(ctrl.valid)]
    cap = -(-len(occ) // 32) * 32
    nodes = np.zeros((cap, 3), np.float32)
    nodes[: len(occ)] = occ
    nv = np.arange(cap) < len(occ)
    return build_deformation_graph(
        srcj, jnp.asarray(nodes), node_valid=jnp.asarray(nv),
        k_anchors=4, k_arcs=8,
    )


def part_layout():
    C, T, B, NCH = 4096, 10, 8, 30
    rng = np.random.default_rng(0)
    yk_all = jnp.asarray(
        rng.standard_normal((NCH, C, 4, 3)).astype(np.float32)
    )
    wa_all = jnp.asarray(rng.random((NCH, C, 4)).astype(np.float32))
    kkn, lln = [], []
    for k in range(4):
        for l in range(k, 4):
            kkn.append(k)
            lln.append(l)
    kk, ll = jnp.array(kkn), jnp.array(lln)

    def entries_soa(y_c, wa_c):
        yt = y_c.transpose(1, 2, 0)
        yb = yt[:, None] * (1.0 + 0.0 * jnp.arange(B)[None, :, None, None])
        w = wa_c.T[:, None, None, :]
        ykk, yll = (yb * w)[kk], (yb * w)[ll]
        xk, yk_, zk = ykk[:, :, 0], ykk[:, :, 1], ykk[:, :, 2]
        xl, yl_, zl = yll[:, :, 0], yll[:, :, 1], yll[:, :, 2]
        dot = xk * xl + yk_ * yl_ + zk * zl
        one, zero = jnp.ones_like(xk), jnp.zeros_like(xk)
        tl = [[dot - xl * xk, -xl * yk_, -xl * zk],
              [-yl_ * xk, dot - yl_ * yk_, -yl_ * zk],
              [-zl * xk, -zl * yk_, dot - zl * zk]]
        tr = [[zero, -zk, yk_], [zk, zero, -xk], [-yk_, xk, zero]]
        bl_ = [[zero, zl, -yl_], [-zl, zero, xl], [yl_, -xl, zero]]
        br = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]
        e = []
        for p in range(3):
            e += tl[p] + tr[p]
        for p in range(3):
            e += bl_[p] + br[p]
        return e

    def v_aos(yks, was):
        from cilantro_tpu.registration.warp_field_batched import (
            _row_blocks_rigid,
        )

        def step(c, args):
            y_c, wa_c = args
            yb = y_c[:, :, None, :] * (
                1.0 + 0.0 * jnp.arange(B)[None, None, :, None]
            )
            bw = wa_c[:, :, None, None, None] * _row_blocks_rigid(yb)
            pair = jnp.einsum("ntbdp,ntbdq->ntbpq", bw[:, kk], bw[:, ll])
            return c, pair.reshape(-1, B * 36)

        _, out = jax.lax.scan(step, 0.0, (yks, was))
        return jnp.sum(out[:, ::31, ::97])

    def v_soa(yks, was):
        def step(c, args):
            e = entries_soa(*args)
            s = jnp.stack(e, axis=2)  # (T, B, 36, C)
            rows = s.transpose(3, 0, 1, 2).reshape(C * T, B * 36)
            return c, rows

        _, out = jax.lax.scan(step, 0.0, (yks, was))
        return jnp.sum(out[:, ::31, ::97])

    _timed("AoS einsum blocks", lambda: jax.jit(v_aos)(yk_all, wa_all))
    _timed("SoA closed-form + stack + transpose",
           lambda: jax.jit(v_soa)(yk_all, wa_all))


def part_warp():
    from cilantro_tpu.registration import (
        icp_warp_field, icp_warp_field_batched, warp_points,
        warp_points_batched,
    )

    src = _cloud()
    B = 8
    dsts = []
    for b in range(B):
        d = src.copy()
        d[:, 2] += 0.02 * np.sin((8 + 0.5 * b) * src[:, 0] + 0.3 * b)
        d[:, 1] += 0.01 * np.cos((6 + 0.3 * b) * src[:, 0])
        dsts.append(d)
    srcj = jnp.asarray(src)
    graph = _bench_graph(srcj)
    kw = dict(max_corr_dist_sq=0.0025, point_weight=1.0, plane_weight=0.0,
              stiffness=50.0, max_iterations=10)
    out, _ = _timed(
        "single warp (10 outer)",
        lambda: icp_warp_field(graph, srcj, jnp.asarray(dsts[0]), **kw,
                               max_cg_iterations=200),
        lambda o: np.asarray(o[0].translation[:1]), reps=2,
    )
    err = np.median(np.linalg.norm(
        np.asarray(warp_points(graph, out[0], srcj)) - dsts[0], axis=1))
    print(f"  recovery {err*1e3:.2f} mm", flush=True)
    outb, tb = _timed(
        "batched warp B=8",
        lambda: icp_warp_field_batched(
            graph, srcj, jnp.asarray(np.stack(dsts)), **kw),
        lambda o: np.asarray(o[0].translation[:, :1]), reps=2,
    )
    wb = np.asarray(warp_points_batched(graph, outb[0], srcj))
    errs = [np.median(np.linalg.norm(wb[:, b] - dsts[b], axis=1))
            for b in range(B)]
    print(f"  {tb/B*1e3:.0f} ms/solve amortized, recovery "
          f"{min(errs)*1e3:.2f}-{max(errs)*1e3:.2f} mm", flush=True)


def part_splatit():
    from cilantro_tpu.core.rgbd import CameraIntrinsics
    from cilantro_tpu.slam import (
        SplatConfig, ate_rmse, run_splat_sequence_scanned,
        synthetic_sequence,
    )

    k = CameraIntrinsics.kinect_640()
    depths, gt = synthetic_sequence(
        16, 480, 640, k, seed=0, cache_dir="/root/repo/.bench_cache"
    )
    for iters in (6, 3, 2):
        _, poses, spf = run_splat_sequence_scanned(
            depths, k,
            cfg=SplatConfig(icp_iterations=iters, icp_convergence_tol=0.0),
        )
        print(f"fixed iters={iters}: {spf*1e3:.2f} ms/frame, "
              f"ATE {ate_rmse(poses, gt)*1e3:.3f} mm", flush=True)
    _, poses, spf = run_splat_sequence_scanned(depths, k, cfg=SplatConfig())
    print(f"early-exit default: {spf*1e3:.2f} ms/frame, "
          f"ATE {ate_rmse(poses, gt)*1e3:.3f} mm", flush=True)


def part_nnsweep():
    from cilantro_tpu.neighbors.pallas_nn import (
        knn_pruned, make_nn1_prune_plan, nn1_pruned_planned,
        radius_search_pruned,
    )

    p1 = _cloud()
    q = jnp.asarray(p1)
    for tq, tm in [(256, 2048), (256, 1024), (128, 1024)]:
        _timed(f"knn_pruned tq={tq} tm={tm}",
               lambda tq=tq, tm=tm: jax.jit(
                   lambda: knn_pruned(q, q, 10, exclude_self=True,
                                      tile_q=tq, tile_m=tm))(),
               lambda o: np.asarray(o[0][:1]))
    for tq, tm in [(512, 1024), (256, 1024)]:
        _timed(f"radius_pruned tq={tq} tm={tm}",
               lambda tq=tq, tm=tm: jax.jit(
                   lambda: radius_search_pruned(
                       q, q, 0.01, 10, exclude_self=True,
                       tile_q=tq, tile_m=tm))(),
               lambda o: np.asarray(o[0][:1]))
    dst = p1.copy()
    dst[:, 2] += 0.02 * np.sin(8.0 * p1[:, 0])
    for tq, tm in [(1024, 2048), (512, 1024)]:
        plan = make_nn1_prune_plan(jnp.asarray(dst), 0.05, q,
                                   tile_q=tq, tile_m=tm)
        jax.block_until_ready(plan.kp)
        _timed(f"nn1 planned tq={tq} tm={tm}",
               lambda plan=plan: jax.jit(
                   lambda: nn1_pruned_planned(q, plan))(),
               lambda o: np.asarray(o[0][:1]))


def part_gnsplit():
    """Batched-GN stage bisect (y gathers / rhs / full GN) at B=8 bench
    scale — the probe that located the 644-of-808-ms block-building wall
    (now fixed by the closed-form SoA assembly; re-running shows the
    post-fix budget)."""
    from cilantro_tpu.registration.warp_field_batched import (
        estimate_warp_field_batched, identity_warp_batched,
        warp_points_batched,
    )

    src = _cloud()
    B = 8
    srcj = jnp.asarray(src)
    n = len(src)
    graph = _bench_graph(srcj)
    node_tf = identity_warp_batched(B, graph.num_nodes)
    dgt = jnp.asarray(
        np.stack([src + np.float32([0, 0.001 * b, 0.002])
                  for b in range(B)]).transpose(1, 0, 2)
    )
    w = jnp.ones((n, B), jnp.float32)
    _timed(
        "y (warp_points_batched: anchor gather + blend)",
        lambda: jax.jit(warp_points_batched, static_argnums=())(
            graph, node_tf, srcj
        ),
        lambda o: np.asarray(o[:1, 0]),
    )
    _timed(
        "full batched GN (1 iter)",
        lambda: estimate_warp_field_batched(
            graph, srcj, dgt, None, w, point_weight=1.0, plane_weight=0.0,
            stiffness=50.0, max_gn_iterations=1,
        ),
        lambda o: np.asarray(o[0].translation[:, :1]),
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    part = sys.argv[1] if len(sys.argv) > 1 else "layout"
    {"layout": part_layout, "warp": part_warp, "gnsplit": part_gnsplit,
     "splatit": part_splatit, "nnsweep": part_nnsweep}[part]()
    print("DONE", flush=True)
