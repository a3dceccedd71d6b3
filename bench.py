"""Headline benchmark: RGBD fusion frames/sec/chip (the BASELINE.json primary
metric) on a synthetic 640×480 sequence with ground-truth trajectory, plus
secondary rows (batched multi-stream fusion, rigid ICP, NN/kNN/radius,
non-rigid warp, estimation/clustering) logged to stderr.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Structure (VERDICT r3 weak #1: round 3's record was lost to a timeout):
  * the headline JSON is printed IMMEDIATELY after the fusion stage and its
    CPU denominator — a lost secondary stage can no longer cost the record;
  * the synthetic sequence is memoized to ``.bench_cache/*.npz`` (host-only
    render, no device contact — first contact over the axon tunnel has been
    observed to cost minutes and must not hide inside data generation);
  * every secondary stage runs under a wall budget (``BENCH_BUDGET_S``,
    default 520 s — sized for a ~10 min driver timeout with cold AOT
    compiles) and is skipped with a log line when the remaining budget
    cannot cover its estimate;
  * sub-50 ms rows are priced with the two-iteration-count LICM-proof
    method (``cilantro_tpu.utils.honest_timing``) so they measure the chip,
    not the ~25 ms tunnel round trip (VERDICT r3 weak #7).

``vs_baseline`` is the speedup over the strongest single-core CPU
implementation of the same pipeline (compiled C++ when the toolchain is
present, numpy otherwise — bench_baseline.py; the C++ reference itself
cannot be built here because Eigen is missing, see BASELINE.md).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np

H, W = 480, 640
FRAMES = 16
CPU_FRAMES = 6
BATCH_STREAMS = 8
BATCH_FRAMES = 12

T_START = time.perf_counter()
# Default sized for a ~10 min driver timeout with COLD axon AOT compiles
# (the cache never captures them): the full stage list needs ~920 s cold,
# so low-value stages self-skip; run with BENCH_BUDGET_S=3000 for the
# complete record (~15 min).
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "520"))
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining() -> float:
    return BUDGET_S - (time.perf_counter() - T_START)


def run_stage(name, fn, est_s, *args, **kwargs):
    """Run a secondary stage iff the remaining wall budget covers its
    estimate; never let a stage failure reach the caller."""
    if remaining() < est_s:
        log(f"[budget] SKIP {name}: needs ~{est_s:.0f}s, "
            f"{remaining():.0f}s left")
        return None
    t0 = time.perf_counter()
    try:
        out = fn(*args, **kwargs)
        log(f"[stage] {name}: {time.perf_counter()-t0:.0f}s "
            f"({remaining():.0f}s budget left)")
        return out
    except Exception as e:  # secondary stages must not kill the record
        log(f"[stage] {name} FAILED: {type(e).__name__}: {e}")
        return None


def kernel_smoke():
    """On-chip Mosaic lowering smoke: tiny nn1/kNN/radius through the REAL
    backend, asserted against brute force. Interpret-mode tests cannot catch
    lowering bugs (round 3's vreg-cast crash, fixed in 3ae8c6a, lowered
    wrong only on real Mosaic) — this closes that hole every bench run."""
    import jax
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import (
        knn_pruned, nn1_pallas, radius_search_pruned,
    )

    rng = np.random.default_rng(1)
    keys = rng.random((2048, 3)).astype(np.float32)
    qs = rng.random((1024, 3)).astype(np.float32)
    kj, qj = jnp.asarray(keys), jnp.asarray(qs)
    D = np.sum((qs[:, None, :] - keys[None, :, :]) ** 2, -1)

    d, i = jax.jit(nn1_pallas)(qj, kj)
    assert np.allclose(np.asarray(d), D.min(1), rtol=1e-4, atol=1e-6), \
        "nn1 smoke: distances"
    assert (np.asarray(i) == D.argmin(1)).mean() > 0.999, "nn1 smoke: indices"

    dk, ik = jax.jit(lambda a, b: knn_pruned(a, b, 5))(qj, kj)
    ref = np.sort(D, 1)[:, :5]
    assert np.allclose(np.sort(np.asarray(dk), 1), ref, rtol=1e-4,
                       atol=1e-6), "knn smoke: distances"

    r = 0.05  # plain radius; returned distances are squared-L2
    dr, ir, over = jax.jit(
        lambda a, b: radius_search_pruned(a, b, r, 8)
    )(qj, kj)
    want_counts = np.minimum((D <= r * r).sum(1), 8)
    got_counts = (np.asarray(dr) < 1e38).sum(1)
    assert (got_counts == want_counts).mean() > 0.999, "radius smoke: counts"

    # Splat argmin2 (the headline pipeline's election kernel) on a tiny
    # UNALIGNED width — the exact class of shape that crashed real Mosaic
    # in round 3 while interpret mode passed.
    from cilantro_tpu.slam.splat import pad_hw, splat_argmin2

    R2 = 2
    w2 = 2 * R2 + 1
    key = rng.random((2, 32, 48)).astype(np.float32)
    off = rng.integers(-1, w2 * w2, size=(2, 32, 48)).astype(np.int32)
    key[off < 0] = np.inf
    bk, bc, _, _ = splat_argmin2(
        jnp.asarray(pad_hw(key, R2, np.inf))[None],
        jnp.asarray(pad_hw(off, R2, -1))[None],
        radius=R2, interpret=False,
    )
    bk, bc = np.asarray(bk[0]), np.asarray(bc[0])
    # Brute reference election.
    best = np.full((32, 48), np.inf, np.float32)
    for li in range(2):
        for y in range(32):
            for x in range(48):
                oc = off[li, y, x]
                if oc < 0:
                    continue
                dv, du = divmod(int(oc), w2)
                ty, tx = y + dv - R2, x + du - R2
                if 0 <= ty < 32 and 0 <= tx < 48:
                    best[ty, tx] = min(best[ty, tx], key[li, y, x])
    assert np.allclose(bk, best), "splat argmin2 smoke"
    log("on-chip kernel smoke OK (nn1/knn/radius/splat vs brute force)")


def bench_fusion_tpu(depths, gt, k):
    from cilantro_tpu.slam import ate_rmse, run_fusion_sequence_scanned
    from cilantro_tpu.slam.fusion import FusionConfig

    # Capacity 1.4·H·W: the sequence's live map peaks at ~309k points
    # (1.006·H·W) and the tail-append allocator needs headroom for ~16
    # frames of augments; compact_map reclaims holes for longer runs. The
    # tighter pool keeps capacity-scaled phases (z-buffer, model transform,
    # inverse-gather rewrite) lean: measured 16.1 ms/frame vs 18.2 at
    # 2·H·W, identical ATE and map size.
    fmap, metrics = run_fusion_sequence_scanned(
        depths, k, map_capacity=int(1.4 * H * W),
        cfg=FusionConfig(localize_stride=2),
    )
    ate = ate_rmse(metrics.poses, gt)
    log(
        f"TPU fusion: {metrics.seconds_per_frame*1e3:.1f} ms/frame "
        f"({1.0/metrics.seconds_per_frame:.1f} fps), ATE {ate*1e3:.2f} mm, "
        f"{metrics.num_map_points} map points"
    )
    from cilantro_tpu.utils.roofline import roofline

    cap = int(1.4 * H * W)
    log(roofline(
        "fusion frame (~100 MFLOP; z-buffer + pool gather + update rows)",
        metrics.seconds_per_frame,
        flops=100e6,
        bytes_moved=cap * 16 * 4 * 3 + 2 * H * W * 16 * 4,
        rows=cap + 3 * H * W,
    ))
    return metrics.seconds_per_frame, ate, metrics.poses


def bench_fusion_cpu(depths):
    """Strongest available single-core CPU baseline of the same pipeline.

    Primary: the COMPILED C++ implementation (native/src/baseline_fusion.cpp,
    g++ -O3 single-thread, timed inside the library); the numpy pipeline
    (bench_baseline.py) doubles as a cross-check — the two produce identical
    trajectories — and as the fallback without a toolchain. vs_baseline uses
    the FASTER of the two, so the headline never rides a soft denominator."""
    from bench_baseline import fusion_cpu
    from cilantro_tpu.native import baseline_fusion_native

    # timing=True starts the numpy clock after frame-0 map init — the same
    # boundary the C++ library's out_ms uses, so both per-frame figures
    # divide the same tracked-frame span.
    best = float("inf")
    poses = None
    for _ in range(2):  # best-of-2 guards against host contention spikes
        poses, loop_s = fusion_cpu(
            depths[:CPU_FRAMES], 525.0, 525.0, 319.5, 239.5, timing=True
        )
        best = min(best, loop_s / (CPU_FRAMES - 1))
    log(f"CPU fusion baseline (numpy): {best*1e3:.0f} ms/frame "
        f"({1.0/best:.2f} fps)")
    stack = np.stack(depths[:CPU_FRAMES]).astype(np.float32)
    best_cpp = float("inf")
    for _ in range(2):  # best-of-2 guards against host contention spikes
        res = baseline_fusion_native(stack, 525.0, 525.0, 319.5, 239.5)
        if res is None:
            break
        poses_cpp, ms = res
        best_cpp = min(best_cpp, ms / 1e3 / (CPU_FRAMES - 1))
    if best_cpp < float("inf"):
        delta = max(
            np.abs(poses_cpp[i] - poses[i]).max() for i in range(CPU_FRAMES)
        )
        log(
            f"CPU fusion baseline (compiled C++): {best_cpp*1e3:.0f} ms/frame "
            f"({1.0/best_cpp:.2f} fps); max pose delta vs numpy {delta:.2e}"
        )
        best = min(best, best_cpp)
    return best, poses


def bench_batched_fusion(cpu_dt):
    """Aggregate multi-stream throughput: B independent 640×480 streams in
    ONE program via the flat-pool batched pipeline (VERDICT r3 task #3 —
    the reference serves one stream per machine, a chip serves many;
    ``/root/reference/examples/fusion.cpp:125-254``)."""
    from cilantro_tpu.core.rgbd import CameraIntrinsics
    from cilantro_tpu.slam import (
        ate_rmse, run_batched_fusion_sequences, synthetic_sequence,
    )
    from cilantro_tpu.slam.fusion import FusionConfig

    k = CameraIntrinsics.kinect_640()
    stacks, gts = [], []
    for b in range(BATCH_STREAMS):
        d, g = synthetic_sequence(
            BATCH_FRAMES, H, W, k, seed=100 + b, cache_dir=CACHE_DIR
        )
        stacks.append(np.stack(d))
        gts.append(g)
    stacks = np.stack(stacks)  # (B, F, H, W)

    _, m = run_batched_fusion_sequences(
        stacks, k, map_capacity=int(1.4 * H * W),
        cfg=FusionConfig(localize_stride=2),
    )
    ates = [
        ate_rmse([p for p in m.poses[b]], gts[b])
        for b in range(BATCH_STREAMS)
    ]
    vs = f", {m.aggregate_fps*cpu_dt:.1f}x the CPU single-core fps" \
        if cpu_dt else ""
    log(
        f"batched fusion B={BATCH_STREAMS}: {m.seconds_per_step*1e3:.1f} "
        f"ms/step ({m.seconds_per_step*1e3/BATCH_STREAMS:.2f} ms/frame "
        f"amortized), AGGREGATE {m.aggregate_fps:.1f} frames/s/chip{vs}, "
        f"per-stream ATE max {max(ates)*1e3:.3f} mm"
    )
    return m.aggregate_fps


def bench_splat_fusion(depths, gt, k, cpu_dt):
    """Single-stream splat fusion (dense bounded-window re-association —
    no z-buffer scatter, no pool gathers) on the same sequence as the
    headline: the pool pipeline's ATE/throughput twin through an entirely
    different compute shape. Returns ``(s/frame, ate)`` for the headline
    pipeline selection."""
    from cilantro_tpu.slam import (
        SplatConfig, ate_rmse, run_splat_sequence_scanned,
    )

    smap, poses, spf = run_splat_sequence_scanned(
        depths, k, cfg=SplatConfig(radius=4, margin=16)
    )
    ate = ate_rmse(poses, gt)
    vs = f", {cpu_dt/spf:.1f}x the CPU single-core" if cpu_dt else ""
    log(
        f"splat fusion (dense re-association): {spf*1e3:.1f} ms/frame "
        f"({1.0/spf:.1f} fps), ATE {ate*1e3:.3f} mm{vs}"
    )
    return spf, ate


def bench_rigid_icp():
    """Secondary: the frame-pair registration workload (stderr only).

    The CPU side is the COMPILED single-core C++ kd-tree point-to-plane ICP
    (native/src/baseline_icp.cpp) — a real registration loop, not an
    extrapolated query-pass count; its estimated transform also cross-checks
    the TPU result."""
    from cilantro_tpu.native import baseline_icp_native
    from cilantro_tpu.utils import read_point_cloud
    from cilantro_tpu.registration import icp_multires

    p1, _, _ = read_point_cloud("/root/reference/examples/test_clouds/frame_1.ply")
    p2, n2, _ = read_point_cloud("/root/reference/examples/test_clouds/frame_2.ply")
    import jax

    levels = ((0.02, 10, 32768, 0.0064), (None, 3, None, 0.01))
    p1j, p2j, n2j = jax.device_put((p1, p2, n2))  # stage once
    kw = dict(
        dst_normals=n2j,
        metric="combined",
        convergence_tol=1e-4,
        levels=levels,
    )
    res = icp_multires(p1j, p2j, **kw)
    np.asarray(res.transform.linear)
    t0 = time.perf_counter()
    for _ in range(3):
        res = icp_multires(p1j, p2j, **kw)
        np.asarray(res.transform.linear)
    tpu_dt = (time.perf_counter() - t0) / 3

    cpu = baseline_icp_native(
        p1, p2, n2, max_iterations=15, max_corr_dist_sq=0.01,
        convergence_tol=1e-4,
    )
    if cpu is not None:
        tf_cpu, it_cpu, ms_best = cpu
        _, _, ms2 = baseline_icp_native(
            p1, p2, n2, max_iterations=15, max_corr_dist_sq=0.01,
            convergence_tol=1e-4,
        )
        cpu_dt = min(ms_best, ms2) / 1e3
        rot_err = float(
            np.abs(np.asarray(res.transform.linear) - tf_cpu[:, :3]).max()
        )
        tr_err = float(
            np.abs(np.asarray(res.transform.translation) - tf_cpu[:, 3]).max()
        )
        log(
            f"rigid ICP (120k pair): TPU {tpu_dt*1e3:.0f} ms vs C++ "
            f"single-core {cpu_dt*1e3:.0f} ms ({it_cpu} iters) -> "
            f"{cpu_dt/tpu_dt:.1f}x; transform agreement rot {rot_err:.1e} "
            f"/ tr {tr_err:.1e}"
        )
    else:
        log("rigid ICP C++ baseline unavailable (no toolchain)")
    return p1, p1j, p2j


def bench_nn(p1, p1j, p2j):
    """Secondary: NN/kNN/radius throughput rows + C++ kd-tree denominators."""
    import jax as _jax
    import jax.numpy as jnp

    from cilantro_tpu.neighbors import knn, nn1
    from cilantro_tpu.neighbors.gridhash import radius_search_grid
    from cilantro_tpu.neighbors.pallas_nn import radius_search_pruned
    from cilantro_tpu.utils.roofline import roofline

    # NN throughput (BASELINE "NN queries/sec" row): exact 120k→120k.
    dist, _ = nn1(p1j, p2j)
    np.asarray(dist[:1])
    t0 = time.perf_counter()
    for _ in range(5):
        dist, _ = nn1(p1j, p2j)
        np.asarray(dist[:1])
    nn_dt = (time.perf_counter() - t0) / 5
    log(
        f"exact nn1 120k vs 120k: {nn_dt*1e3:.0f} ms "
        f"({len(p1)/nn_dt/1e6:.2f} M queries/s)"
    )
    n2 = int(p2j.shape[0])
    nm = float(len(p1)) * float(n2)
    log(roofline(
        "nn1 distance matmul (full-problem useful work)",
        nn_dt,
        flops=2.0 * nm * 8,  # (TQ,8)@(8,TM) augmented contraction
        bytes_moved=(len(p1) + n2) * 8 * 4 + len(p1) * 8,
    ))
    from cilantro_tpu.native import baseline_knn_native

    # Same workload as the TPU row: tree on p2 (keys), query p1.
    res1 = baseline_knn_native(np.asarray(p2j), np.asarray(p1j), 1)
    if res1 is not None:
        _, _, b1, q1 = res1
        log(
            f"  C++ kd-tree nn1 baseline: build {b1:.0f} ms + query "
            f"{q1:.0f} ms ({len(p1)/q1*1e3/1e6:.2f} M queries/s)"
        )

    # Radius-bounded NN (the kd-tree's radius queries): grid backend.
    @_jax.jit
    def _grid(q, kk):
        d, i, over = radius_search_grid(q, kk, 0.01, 10, exclude_self=True)
        return d[:, 0], jnp.sum(over)

    d0, _ = _grid(p1j, p1j)
    np.asarray(d0[:1])
    t0 = time.perf_counter()
    for _ in range(5):
        d0, _ = _grid(p1j, p1j)
        np.asarray(d0[:1])
    g_dt = (time.perf_counter() - t0) / 5
    log(
        f"radius NN (r=1 cm, k<=10) 120k self, grid backend: "
        f"{g_dt*1e3:.0f} ms ({len(p1)/g_dt/1e6:.2f} M queries/s)"
    )

    # Same query through the compacted-pair Pallas kernel backend.
    @_jax.jit
    def _pruned(q, kk):
        d, i, over = radius_search_pruned(q, kk, 0.01, 10, exclude_self=True)
        return d[:, 0], jnp.sum(over)

    d0, _ = _pruned(p1j, p1j)
    np.asarray(d0[:1])
    t0 = time.perf_counter()
    for _ in range(5):
        d0, _ = _pruned(p1j, p1j)
        np.asarray(d0[:1])
    p_dt = (time.perf_counter() - t0) / 5
    log(
        f"radius NN (r=1 cm, k<=10) 120k self, pruned backend: "
        f"{p_dt*1e3:.0f} ms ({len(p1)/p_dt/1e6:.2f} M queries/s)"
    )

    # Single-core C++ kd-tree radius denominator (VERDICT r4 #7: this row
    # shipped without a CPU number through round 4).
    from cilantro_tpu.native import baseline_radius_native

    rres = baseline_radius_native(
        np.asarray(p1j), np.asarray(p1j), 0.01, 10, exclude_self=True
    )
    if rres is not None:
        _, _, _, rb, rq = rres
        rres2 = baseline_radius_native(
            np.asarray(p1j), np.asarray(p1j), 0.01, 10, exclude_self=True
        )
        rb, rq = min(rb, rres2[3]), min(rq, rres2[4])
        log(
            f"  C++ kd-tree radius baseline: build {rb:.0f} ms + query "
            f"{rq:.0f} ms ({len(p1)/rq*1e3/1e6:.2f} M queries/s) -> "
            f"TPU pruned is {(rb+rq)/(p_dt*1e3):.1f}x"
        )

    # Exact kNN k=10 (the dispatcher routes large L2 3-D through the
    # radius-doubling pruned kernel).
    dk, _ = knn(p1j, p1j, 10, exclude_self=True)
    np.asarray(dk[:1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        dk, _ = knn(p1j, p1j, 10, exclude_self=True)
        np.asarray(dk[:1, :1])
    k_dt = (time.perf_counter() - t0) / 3
    log(
        f"exact kNN k=10 120k self: {k_dt*1e3:.0f} ms "
        f"({len(p1)/k_dt/1e6:.2f} M queries/s)"
    )
    log(roofline(
        "kNN distance matmul (full-problem useful work; VPU top-k folding "
        "dominates the kernel)",
        k_dt,
        flops=2.0 * float(len(p1)) ** 2 * 8,
        bytes_moved=2 * len(p1) * 8 * 4 + len(p1) * 11 * 8,
    ))

    # Single-core C++ kd-tree kNN baseline for the same query.
    res = baseline_knn_native(p1, p1, 10, exclude_self=True)
    if res is not None:
        _, _, b_ms, q_ms = res
        _, _, b2, q2 = baseline_knn_native(p1, p1, 10, exclude_self=True)
        b_ms, q_ms = min(b_ms, b2), min(q_ms, q2)
        log(
            f"  C++ kd-tree baseline: build {b_ms:.0f} ms + query "
            f"{q_ms:.0f} ms ({len(p1)/q_ms*1e3/1e6:.2f} M queries/s) -> "
            f"TPU is {(b_ms+q_ms)/(k_dt*1e3):.1f}x"
        )


def bench_estimation_clustering():
    """Secondary: BASELINE config #3 — RANSAC plane / RANSAC transform with
    noisy correspondences / k-means / PCA on the bundled 120k cloud
    (stderr only). Sub-50 ms rows are priced with the two-count LICM-proof
    method: a plain timed() fetch would charge them the ~25 ms tunnel round
    trip (VERDICT r3 weak #7a)."""
    import jax
    import jax.numpy as jnp

    from cilantro_tpu.clustering import kmeans
    from cilantro_tpu.core.pca import fit_pca
    from cilantro_tpu.model_estimation import ransac_plane, ransac_transform
    from cilantro_tpu.utils import read_point_cloud
    from cilantro_tpu.utils.honest_timing import op_time

    p1, _, _ = read_point_cloud(
        "/root/reference/examples/test_clouds/frame_1.ply"
    )
    pts = jax.device_put(np.asarray(p1, np.float32))
    key = jax.random.PRNGKey(0)

    def honest(label, fn, args, cpu_ms=None, lo=1, hi=5):
        r = op_time(fn, args, lo=lo, hi=hi, reps=2)
        ms = max(r.per_iter_ms, 0.05)  # noise floor: a ~0 slope means the
        # op is far below the dispatch cost, not negative-time
        vs = (
            f" | single-core numpy {cpu_ms:.0f} ms -> "
            f"{cpu_ms/ms:.1f}x" if cpu_ms else ""
        )
        warn = "" if r.linearity > 1.2 else "  [SUSPECT timing]"
        log(f"{label}: {ms:.2f} ms (on-chip; dispatch floor "
            f"{max(r.floor_ms, 0.0):.0f} ms){vs}{warn}")
        return ms

    from bench_baseline import kmeans_cpu, pca_cpu, ransac_plane_cpu

    p1np = np.asarray(p1, np.float32)
    t0 = time.perf_counter()
    ransac_plane_cpu(p1np, 0.01, num_hypotheses=1024)
    plane_cpu_ms = (time.perf_counter() - t0) * 1e3

    honest(
        "RANSAC plane 120k (1024 hypotheses)",
        lambda p: ransac_plane(key, p, 0.01, num_hypotheses=1024)[1].num_inliers,
        (pts,),
        cpu_ms=plane_cpu_ms,
    )
    rng = np.random.default_rng(0)
    sub = np.asarray(p1[:20000], np.float32)
    ang = 0.2
    R = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    dst = sub @ R.T + np.float32([0.05, -0.02, 0.03])
    out = rng.random(20000) < 0.3  # 30% gross outlier correspondences
    dst[out] = rng.uniform(-2, 2, (int(out.sum()), 3)).astype(np.float32)
    subj, dstj = jax.device_put((sub, dst))
    honest(
        "RANSAC rigid transform 20k corrs / 30% outliers (1024 hyp)",
        lambda s, d: ransac_transform(
            key, s, d, 0.02, num_hypotheses=1024
        )[1].num_inliers,
        (subj, dstj),
    )
    t0 = time.perf_counter()
    kmeans_cpu(p1np, 16, iters=20)
    kmeans_cpu_ms = (time.perf_counter() - t0) * 1e3

    # k-means is >50 ms: plain warm timing is honest enough, and the SAME
    # measured wall feeds the roofline line (r3 printed a fresh-jit compile
    # there — weak #7b).
    km_fn = jax.jit(lambda p: kmeans(key, p, 16))
    km = km_fn(pts)
    np.asarray(km.centroids[0, 0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        km = km_fn(pts)
        np.asarray(km.centroids[0, 0])
        best = min(best, time.perf_counter() - t0)
    log(f"k-means k=16 on 120k (k-means++ init): {best*1e3:.1f} ms | "
        f"single-core numpy {kmeans_cpu_ms:.0f} ms -> "
        f"{kmeans_cpu_ms/(best*1e3):.1f}x")
    from cilantro_tpu.utils.roofline import roofline

    km_iters = max(int(np.asarray(km.iterations)), 1)
    log(roofline(
        f"k-means assignment matmuls ({km_iters} Lloyd iters)",
        best,
        flops=2.0 * len(p1) * 16 * 3 * km_iters,
        bytes_moved=float(len(p1)) * 3 * 4 * km_iters,
    ))
    t0 = time.perf_counter()
    for _ in range(5):
        pca_cpu(p1np)
    pca_cpu_ms = (time.perf_counter() - t0) / 5 * 1e3
    honest(
        "PCA on 120k",
        lambda p: fit_pca(p).eigenvectors,
        (pts,),
        cpu_ms=pca_cpu_ms,
        # ~50 µs op: the r4 32/256 counts left t_hi within noise of t_lo
        # and the row shipped [SUSPECT] — 64/1024 puts ~50 ms of real work
        # between the two samples (VERDICT r4 #7).
        lo=64,
        hi=1024,
    )


def _bench_edg_graph(srcj):
    """2.5 cm EDG control graph with nodes COMPACTED to occupancy (837
    occupied voxels → capacity 864): the C++ baseline solves its exact
    ~835-node system, so padding ours to 1024 would hand the dense
    Cholesky/layout phases a 1.65× m³ handicap the algorithm doesn't
    require."""
    import jax.numpy as jnp

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


def bench_warp_field():
    """Secondary: non-rigid EDG warp-field ICP (stderr only) — recover a
    ~20 mm synthetic bend of frame_1 (the examples/non_rigid_icp.cpp
    workload at the bench scale: 120k points, 2.5 cm control grid)."""
    import jax
    import jax.numpy as jnp

    from cilantro_tpu.registration import icp_warp_field, warp_points
    from cilantro_tpu.utils import read_point_cloud

    src, _, _ = read_point_cloud(
        "/root/reference/examples/test_clouds/frame_1.ply"
    )
    dst = src.copy()
    dst[:, 2] += 0.02 * np.sin(8.0 * src[:, 0])
    dst[:, 1] += 0.01 * np.cos(6.0 * src[:, 0])
    srcj, dstj = jax.device_put((src, dst))
    graph = _bench_edg_graph(srcj)
    kw = dict(
        max_corr_dist_sq=0.0025, point_weight=1.0, plane_weight=0.0,
        stiffness=50.0, max_iterations=10, max_cg_iterations=200,
    )
    node_tf, iters, _ = icp_warp_field(graph, srcj, dstj, **kw)
    np.asarray(node_tf.translation[:1])  # compile + settle
    t0 = time.perf_counter()
    node_tf, iters, _ = icp_warp_field(graph, srcj, dstj, **kw)
    np.asarray(node_tf.translation[:1])
    dt = time.perf_counter() - t0
    warped = np.asarray(warp_points(graph, node_tf, srcj))
    err = np.median(np.linalg.norm(warped - dst, axis=1))
    log(
        f"non-rigid EDG warp ICP (120k pts, "
        f"{int(np.asarray(jnp.sum(graph.node_valid)))} nodes / "
        f"{graph.num_nodes} capacity): {dt:.2f} s/solve, "
        f"{int(iters)} outer iters, median error {err*1e3:.2f} mm "
        f"vs ~20 mm deformation"
    )
    from cilantro_tpu.utils.roofline import roofline

    m_cap = graph.num_nodes
    n_pts = len(src)
    it_n = max(int(iters), 1)
    # Per outer iteration: dense Cholesky of the (6M, 6M) system + the
    # pair-block assembly (10 blocks/point, 36 f32 each) + the pruned NN.
    chol_flops = ((6 * m_cap) ** 3) / 3.0
    asm_flops = n_pts * 10 * (2 * 3 * 6 * 6)
    log(roofline(
        "warp direct solve (Cholesky + pair-block assembly + pruned NN)",
        dt,
        flops=(chol_flops + asm_flops) * it_n,
        bytes_moved=(n_pts * 10 * 36 * 4 + (6 * m_cap) ** 2 * 4) * it_n,
        rows=(n_pts * 10 + n_pts * 4) * it_n,
    ))
    # Single-core C++ denominator: same EDG pipeline (voxel nodes, kd-tree
    # graph, block-Jacobi PCG), compiled -O3 (native/src/baseline_warp.cpp).
    from cilantro_tpu.native import baseline_warp_native

    cw = baseline_warp_native(
        src, dst, ctrl_res=0.025, k_anchors=4, k_arcs=8, max_outer=10,
        max_cg=200, point_weight=1.0, stiffness=50.0,
        max_corr_dist_sq=0.0025,
    )
    if cw is not None:
        w_cpp, it_cpp, nodes_cpp, ms_cpp = cw
        err_cpp = np.median(np.linalg.norm(w_cpp - dst, axis=1))
        log(
            f"  C++ single-core EDG baseline: {ms_cpp/1e3:.2f} s "
            f"({it_cpp} outer, {nodes_cpp} nodes, median "
            f"{err_cpp*1e3:.2f} mm) -> TPU is {ms_cpp/1e3/dt:.2f}x"
        )
        return ms_cpp / 1e3
    return None


def bench_warp_batched(cpp_s):
    """Aggregate non-rigid throughput: B bent targets against ONE shared
    template/EDG in one program (VERDICT r3 task #2's TPU-honest answer to
    the latency-floored single solve: graph-indexed ops share their index
    streams, so B solves ride the same rank-1 gathers with B× wider rows,
    and the B dense systems batch onto the MXU as one Cholesky)."""
    import jax

    from cilantro_tpu.registration import (
        icp_warp_field_batched,
        warp_points_batched,
    )
    from cilantro_tpu.utils import read_point_cloud

    B = 8
    src, _, _ = read_point_cloud(
        "/root/reference/examples/test_clouds/frame_1.ply"
    )
    dsts = []
    for b in range(B):
        d = src.copy()
        d[:, 2] += 0.02 * np.sin((8 + 0.5 * b) * src[:, 0] + 0.3 * b)
        d[:, 1] += 0.01 * np.cos((6 + 0.3 * b) * src[:, 0])
        dsts.append(d)
    import jax.numpy as jnp

    srcj = jax.device_put(src)
    dstj = jax.device_put(np.stack(dsts))
    graph = _bench_edg_graph(srcj)
    if cpp_s is None:
        # Running before the single-solve stage (tight-budget ordering):
        # measure the C++ denominator here once (~1.7 s; the single-solve
        # stage re-measures with its own recovery cross-check when it runs).
        from cilantro_tpu.native import baseline_warp_native

        cw = baseline_warp_native(
            src, dsts[0], ctrl_res=0.025, k_anchors=4, k_arcs=8,
            max_outer=10, max_cg=200, point_weight=1.0, stiffness=50.0,
            max_corr_dist_sq=0.0025,
        )
        if cw is not None:
            cpp_s = cw[3] / 1e3
    kw = dict(
        max_corr_dist_sq=0.0025, point_weight=1.0, plane_weight=0.0,
        stiffness=50.0, max_iterations=10,
    )
    tfb, it, _ = icp_warp_field_batched(graph, srcj, dstj, **kw)
    np.asarray(tfb.translation[:, :1])  # compile + settle
    t0 = time.perf_counter()
    tfb, it, _ = icp_warp_field_batched(graph, srcj, dstj, **kw)
    np.asarray(tfb.translation[:, :1])
    dt = time.perf_counter() - t0
    wb = np.asarray(warp_points_batched(graph, tfb, srcj))
    errs = [
        float(np.median(np.linalg.norm(wb[:, b] - dsts[b], axis=1)))
        for b in range(B)
    ]
    vs = f" = {cpp_s/(dt/B):.1f}x the C++ single-core solve rate" \
        if cpp_s else ""
    log(
        f"batched non-rigid EDG warp B={B} (shared template): {dt:.2f} s "
        f"= {dt/B*1e3:.0f} ms/solve amortized ({B/dt:.2f} solves/s){vs}; "
        f"{int(it)} outer, median err {min(errs)*1e3:.2f}-"
        f"{max(errs)*1e3:.2f} mm"
    )


def main():
    from cilantro_tpu.core import CameraIntrinsics
    from cilantro_tpu.slam import synthetic_sequence

    k = CameraIntrinsics.kinect_640()
    log(f"bench budget {BUDGET_S:.0f}s; rendering/loading synthetic "
        f"sequence (host-only)...")
    depths, gt = synthetic_sequence(
        FRAMES, H, W, k, seed=0, cache_dir=CACHE_DIR
    )
    log(f"sequence ready at {time.perf_counter()-T_START:.0f}s")

    # The smoke is the lowering-correctness gate: a failure must MARK the
    # record (run_stage's blanket except would silently continue and the
    # headline would come from a backend known to miscompile).
    t_smoke = time.perf_counter()
    try:
        kernel_smoke()
        smoke_suffix = ""
        log(f"[stage] kernel smoke: {time.perf_counter()-t_smoke:.0f}s "
            f"({remaining():.0f}s budget left)")
    except Exception as e:
        smoke_suffix = "; KERNEL SMOKE FAILED"
        log(f"[stage] kernel smoke FAILED — record suspect: "
            f"{type(e).__name__}: {e}")

    tpu_dt, ate, tpu_poses = bench_fusion_tpu(depths, gt, k)
    cpu_dt, cpu_poses = bench_fusion_cpu(depths)

    # Splat pipeline runs BEFORE the headline (budget-gated): it is the
    # faster, more accurate fusion path (measured 10.6 ms/frame @ 0.027 mm
    # vs the pool's 15.8 ms @ 0.049 mm) and the headline reports the best
    # available pipeline. A failure/skip here falls back to the pool row.
    splat_out = run_stage(
        "splat fusion", bench_splat_fusion, 60, depths, gt, k, cpu_dt
    )
    pipeline = "pool"
    best_dt, best_ate = tpu_dt, ate
    if splat_out is not None and splat_out[0] < tpu_dt:
        best_dt, best_ate = splat_out
        pipeline = "splat"
        # The denominator is the pool-algorithm C++ pipeline; when the splat
        # pipeline wins the headline, also log the same-algorithm (pool vs
        # pool) ratio so the cross-algorithm headline ratio is never the
        # only number on record (ADVICE r4 #4).
        log(f"pool-pipeline vs_baseline (same algorithm as the CPU "
            f"denominator): {cpu_dt/tpu_dt:.2f}x")

    # HEADLINE — printed before the remaining stages so a lost secondary
    # cannot cost the round's record.
    print(
        json.dumps(
            {
                "metric": "fusion_frames_per_sec_per_chip",
                "value": round(1.0 / best_dt, 2),
                "unit": (
                    f"frames/s (640x480 RGBD frame-to-model fusion, "
                    f"{pipeline} pipeline, ATE {best_ate*1e3:.2f} mm over "
                    f"{FRAMES} frames{smoke_suffix})"
                ),
                "vs_baseline": round(cpu_dt / best_dt, 2),
                # Which pipeline the numerator came from: "splat" means the
                # ratio compares the faster splat pipeline against the
                # pool-algorithm CPU denominator (ADVICE r4 #4).
                "pipeline": pipeline,
            }
        ),
        flush=True,
    )

    # ATE cross-reference: the TPU trajectory checked against the INDEPENDENT
    # single-core implementation's trajectory on the shared frame prefix (not
    # just against the generator's ground truth).
    if cpu_poses is not None:
        from cilantro_tpu.slam import ate_rmse

        cross = ate_rmse(tpu_poses[: len(cpu_poses)], cpu_poses)
        log(f"cross-implementation ATE (TPU vs CPU pipeline): {cross*1e3:.3f} mm")

    # Stage estimates are COLD figures (compile included): the axon backend
    # re-AOT-compiles every process, so a fresh driver run pays them all.
    # Order = value-per-second under a tight budget: the aggregate rows
    # (this round's claims) come before the slow-compiling singles.
    run_stage("batched fusion aggregate", bench_batched_fusion, 40, cpu_dt)
    run_stage("warp batched aggregate", bench_warp_batched, 330, None)
    run_stage("warp field", bench_warp_field, 280)
    icp_out = run_stage("rigid ICP", bench_rigid_icp, 75)
    if icp_out is not None:
        run_stage("NN/kNN/radius", bench_nn, 105, *icp_out)
    run_stage("estimation/clustering", bench_estimation_clustering, 190)
    log(f"bench done in {time.perf_counter()-T_START:.0f}s")


if __name__ == "__main__":
    main()
