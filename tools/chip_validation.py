"""Consolidated chip validation for this session's changes. Parts:

  1. fusion re-verify on chip (simplify refactor: ATE + fps must match the
     committed 16-19 ms/frame @ ATE 0.049 mm numbers)
  2. coalesced-gather A/B on the fusion pipeline (flag currently default-off)
  3. NN A/B: ungated / masked-pruned / compact-pruned / planned
  4. rigid ICP 120k end-to-end with the hoisted plan
  5. kNN tile sweep (120k k=10 self-query)

Run ONE at a time via:  PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/chip_validation.py <part>     (part in 1..5, or 'all')
Writes progress lines to stdout (flush) — pipe to a file and poll.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

PART = sys.argv[1] if len(sys.argv) > 1 else "all"
print("devices:", jax.devices(), flush=True)

H, W = 480, 640


def fetch(x):
    return np.asarray(x)


def part1():
    from cilantro_tpu.core.rgbd import CameraIntrinsics
    from cilantro_tpu.slam import (
        ate_rmse, run_fusion_sequence_scanned, synthetic_sequence,
    )
    from cilantro_tpu.slam.fusion import FusionConfig

    k = CameraIntrinsics.kinect_640()
    depths, gt = synthetic_sequence(16, H, W, k, seed=0)
    t0 = time.perf_counter()
    fmap, m = run_fusion_sequence_scanned(
        depths, k, map_capacity=int(1.4 * H * W),
        cfg=FusionConfig(localize_stride=2),
    )
    ate = ate_rmse(m.poses, gt)
    print(
        f"[1] fusion: {m.seconds_per_frame*1e3:.1f} ms/frame "
        f"({1/m.seconds_per_frame:.1f} fps) ATE {ate*1e3:.3f} mm "
        f"map={m.num_map_points} (wall {time.perf_counter()-t0:.0f}s)",
        flush=True,
    )
    assert ate < 2e-4, f"ATE regression: {ate}"
    return depths, gt, k


def part2(depths=None, gt=None, k=None):
    from cilantro_tpu.core.rgbd import CameraIntrinsics
    from cilantro_tpu.slam import (
        ate_rmse, run_fusion_sequence_scanned, synthetic_sequence,
    )
    from cilantro_tpu.slam.fusion import FusionConfig

    if depths is None:
        k = CameraIntrinsics.kinect_640()
        depths, gt = synthetic_sequence(16, H, W, k, seed=0)
    fmap, m = run_fusion_sequence_scanned(
        depths, k, map_capacity=int(1.4 * H * W),
        cfg=FusionConfig(localize_stride=2, coalesced_gathers=True),
    )
    ate = ate_rmse(m.poses, gt)
    print(
        f"[2] fusion+coalesced: {m.seconds_per_frame*1e3:.1f} ms/frame "
        f"({1/m.seconds_per_frame:.1f} fps) ATE {ate*1e3:.3f} mm "
        f"map={m.num_map_points}",
        flush=True,
    )
    assert ate < 2e-4, f"coalesced ATE regression: {ate}"


def _cloud_pair():
    from cilantro_tpu.utils import read_point_cloud

    pts, nrm, _ = read_point_cloud(
        "/root/reference/examples/test_clouds/frame_1.ply"
    )
    pts = np.asarray(pts, np.float32)
    nrm = np.asarray(nrm, np.float32)
    ang = 0.03
    R = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    t = np.float32([0.01, -0.005, 0.008])
    dst = (pts @ R.T + t).astype(np.float32)
    return pts, nrm, dst, R, t


def timed(label, fn, reps=4):
    out = fn()
    fetch(jnp.sum(jnp.minimum(out[0], 1e9)))  # compile + settle
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        fetch(
            jnp.sum(jnp.minimum(out[0], 1e9))
            + jnp.sum(out[1].astype(jnp.int32) % 97)
        )
        best = min(best, time.perf_counter() - t0)
    print(f"    {label}: {best*1e3:.1f} ms", flush=True)
    return out, best


def part3():
    from cilantro_tpu.neighbors.pallas_nn import (
        INVALID_DIST, _augment_queries, _nn1_pallas_masked, _tile_aabbs,
        make_nn1_prune_plan, nn1_pallas, nn1_pruned, nn1_pruned_planned,
    )
    from cilantro_tpu.neighbors.gridhash import _aabb_dist2

    pts, nrm, dst, R, t = _cloud_pair()
    q, kk = jnp.asarray(pts), jnp.asarray(dst)
    RADIUS = 0.02
    print("[3] NN A/B at 120k x 120k:", flush=True)
    (d0, i0), t_un = timed("ungated nn1_pallas", jax.jit(lambda: nn1_pallas(q, kk)))
    # Step-overhead probe: fewer, bigger steps for the ungated pass.
    for tq, tm in [(1024, 4096), (1024, 8192), (2048, 4096)]:
        try:
            timed(
                f"ungated nn1 tile_q={tq} tile_m={tm}",
                jax.jit(
                    lambda tq=tq, tm=tm: nn1_pallas(
                        q, kk, tile_q=tq, tile_m=tm
                    )
                ),
                reps=3,
            )
        except Exception as e:  # noqa: BLE001
            print(f"    tile {tq}x{tm}: FAILED {type(e).__name__}: {e}", flush=True)
    plan = make_nn1_prune_plan(kk, RADIUS, q)
    jax.block_until_ready(plan.kp)

    def masked_call():
        qs = q[plan.qperm]
        qmin, qmax, q_occ = _tile_aabbs(qs, plan.qvs, plan.tile_q)
        r2 = plan.radius * plan.radius
        within = (
            (_aabb_dist2(qmin, qmax, plan.kmin, plan.kmax) <= r2)
            & q_occ[:, None]
            & plan.k_occ[None, :]
        )
        qp = _augment_queries(qs, plan.tile_q)
        d, i = _nn1_pallas_masked(
            qp, plan.kp, within.astype(jnp.int32),
            tile_q=plan.tile_q, tile_m=plan.tile_m,
        )
        return d.reshape(-1)[: q.shape[0]], i.reshape(-1)[: q.shape[0]]

    timed("masked pruned (visit-all) [old]", jax.jit(masked_call))
    (dp, ip), t_c = timed(
        "compact pruned incl. sorts [new]", jax.jit(lambda: nn1_pruned(q, kk, RADIUS))
    )
    (dq, iq), t_p = timed(
        "planned (per-ICP-iter) [new]",
        jax.jit(lambda: nn1_pruned_planned(q, plan)),
    )
    d0n, i0n, dpn, ipn, dqn = map(fetch, (d0, i0, dp, ip, dq))
    within = d0n <= RADIUS * RADIUS
    print(f"    within-radius: {within.sum()}/{len(d0n)}", flush=True)
    assert np.allclose(dpn[within], d0n[within], rtol=1e-5, atol=1e-6)
    assert (ipn[within] == i0n[within]).mean() > 0.999
    assert np.allclose(dqn[within], d0n[within], rtol=1e-5, atol=1e-6)
    print("    exactness OK", flush=True)


def part4():
    from cilantro_tpu.registration import icp

    pts, nrm, dst, R, t = _cloud_pair()
    q, kk = jnp.asarray(pts), jnp.asarray(dst)
    nj = jnp.asarray(nrm)
    dn = jnp.asarray((nrm @ R.T).astype(np.float32))

    def run():
        res = icp(
            q, kk, src_normals=nj, dst_normals=dn, metric="combined",
            max_corr_dist_sq=4e-4, max_iterations=15,
        )
        return res.transform.translation, res.iterations

    tr, it = run()
    fetch(tr)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        tr, it = run()
        fetch(tr), fetch(it)
        best = min(best, time.perf_counter() - t0)
    err = np.abs(fetch(tr) - t).max()
    print(
        f"[4] rigid ICP 120k pair: {best*1e3:.0f} ms iters={int(it)} "
        f"t_err={err:.2e}",
        flush=True,
    )
    assert err < 1e-3


def part5():
    from cilantro_tpu.neighbors.pallas_nn import knn_pallas, knn_pruned

    pts, _, _, _, _ = _cloud_pair()
    q = jnp.asarray(pts)
    print("[5] kNN k=10 self-query 120k:", flush=True)
    (d_ref, i_ref), _ = timed(
        "knn_pallas full (current default tiles)",
        jax.jit(lambda: knn_pallas(q, q, 10)),
        reps=3,
    )
    for tq, tm in [(512, 2048), (1024, 2048), (1024, 4096)]:
        try:
            timed(
                f"knn_pallas tile_q={tq} tile_m={tm}",
                jax.jit(
                    lambda tq=tq, tm=tm: knn_pallas(
                        q, q, 10, tile_q=tq, tile_m=tm
                    )
                ),
                reps=3,
            )
        except Exception as e:  # noqa: BLE001 — sweep survives compile fails
            print(f"    tile_q={tq} tile_m={tm}: FAILED {type(e).__name__}: {e}", flush=True)
    for tq, tm in [(512, 1024), (1024, 2048)]:
        try:
            (dp, ip), _ = timed(
                f"knn_PRUNED tile_q={tq} tile_m={tm}",
                jax.jit(
                    lambda tq=tq, tm=tm: knn_pruned(
                        q, q, 10, tile_q=tq, tile_m=tm
                    )
                ),
                reps=3,
            )
            ok = np.allclose(
                np.asarray(dp), np.asarray(d_ref), rtol=1e-5, atol=1e-6
            )
            print(f"      exact vs full: {ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"    PRUNED tile_q={tq} tile_m={tm}: FAILED {type(e).__name__}: {e}", flush=True)

    # radius search: gather-grid backend vs compacted-pair kernel backend
    from cilantro_tpu.neighbors.gridhash import radius_search_grid
    from cilantro_tpu.neighbors.pallas_nn import radius_search_pruned

    print("[5b] radius search 1 cm cap-10 120k self:", flush=True)
    (dg, ig), _ = timed(
        "grid (gather) backend",
        jax.jit(lambda: radius_search_grid(q, q, 0.01, 10, exclude_self=True)[:2]),
        reps=3,
    )
    (dp2, ip2), _ = timed(
        "pruned (compact kernel) backend",
        jax.jit(
            lambda: radius_search_pruned(q, q, 0.01, 10, exclude_self=True)[:2]
        ),
        reps=3,
    )


if __name__ == "__main__":
    state = (None, None, None)
    if PART in ("1", "all"):
        state = part1()
    if PART in ("2", "all"):
        part2(*state)
    if PART in ("3", "all"):
        part3()
    if PART in ("4", "all"):
        part4()
    if PART in ("5", "all"):
        part5()
    print("CHIP SESSION DONE", flush=True)
