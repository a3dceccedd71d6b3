"""Round-5 probe: where the single-stream non-rigid solve's 1.95 s goes,
and whether the three candidate levers pay (VERDICT r4 next-round #1):

  1 full   — current icp_warp_field 10-outer reference number
  2 nn     — planned NN pass: current static budget (n_qt*29 steps) vs the
             same kernel at smaller budgets (the compact grid runs its
             STATIC budget of steps — pad steps repeat the last pair — so
             per-pass cost should be ~linear in budget, making an
             adaptive-radius small-budget pass the lever)
  3 chol   — XLA cholesky across sizes, a hand-blocked right-looking
             prototype (explicit diag-block inverse -> all-MXU panels),
             cho_solve cost
  4 pieces — pair-value gather width (36 vs 12 vs 8 wide rows at 1.2M),
             sorted segment_sum, the (M*M,36)->(6M,6M) layout dance
  5 par    — do two XLA compiles overlap when issued from two threads?
             (decides the bench prewarm design, VERDICT r4 #2)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/round5_warp_probe.py 1 2 ...
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from tools.honest_bench import op_time


def _graph_and_clouds():
    from cilantro_tpu.core.containers import PointCloud
    from cilantro_tpu.core.grid import grid_downsample
    from cilantro_tpu.registration import build_deformation_graph
    from cilantro_tpu.utils import read_point_cloud

    src, _, _ = read_point_cloud(
        "/root/reference/examples/test_clouds/frame_1.ply"
    )
    dst = src.copy()
    dst[:, 2] += 0.02 * np.sin(8.0 * src[:, 0])
    dst[:, 1] += 0.01 * np.cos(6.0 * src[:, 0])
    srcj, dstj = jax.device_put((src, dst))
    ctrl = grid_downsample(PointCloud(points=srcj), 0.025, capacity=1024)
    occ = np.asarray(ctrl.points)[np.asarray(ctrl.valid)]
    cap = -(-len(occ) // 32) * 32
    nodes = np.zeros((cap, 3), np.float32)
    nodes[: len(occ)] = occ
    nv = np.arange(cap) < len(occ)
    graph = build_deformation_graph(
        srcj, jnp.asarray(nodes), node_valid=jnp.asarray(nv),
        k_anchors=4, k_arcs=8,
    )
    return graph, srcj, dstj


def part_full():
    from cilantro_tpu.registration import icp_warp_field

    graph, srcj, dstj = _graph_and_clouds()
    kw = dict(max_corr_dist_sq=0.0025, point_weight=1.0, plane_weight=0.0,
              stiffness=50.0, max_iterations=10, max_cg_iterations=200)

    t0 = time.perf_counter()
    tf, it, _ = icp_warp_field(graph, srcj, dstj, **kw)
    np.asarray(tf.translation[:1])
    print(f"FULL compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    for _ in range(2):
        t0 = time.perf_counter()
        tf, it, _ = icp_warp_field(graph, srcj, dstj, **kw)
        np.asarray(tf.translation[:1])
        print(f"FULL warm: {time.perf_counter()-t0:.2f}s ({int(it)} outer)",
              flush=True)


def part_nn():
    from cilantro_tpu.neighbors.pallas_nn import (
        _augment_queries, _nn1_pallas_compact,
        _tile_aabbs, maybe_make_nn1_prune_plan, nn1_pruned_planned,
    )

    graph, srcj, dstj = _graph_and_clouds()
    plan = maybe_make_nn1_prune_plan(dstj, 0.0025, srcj)
    assert plan is not None

    r = op_time(lambda q: nn1_pruned_planned(q, plan), (srcj,), lo=1, hi=5)
    print(f"NN planned pass (current):      {r}", flush=True)

    # Pair-count telemetry + budget-scaling of the compact kernel.
    tile_q, tile_m = plan.tile_q, plan.tile_m
    qs = srcj[plan.qperm]
    qmin, qmax, q_occ = _tile_aabbs(qs, plan.qvs, tile_q)
    from cilantro_tpu.neighbors.gridhash import _aabb_dist2

    aabb_d2 = _aabb_dist2(qmin, qmax, plan.kmin, plan.kmax)
    n_qt = qmin.shape[0]
    n_mt = plan.kp.shape[0] // tile_m
    for rr, label in ((0.05, "gate 5cm"), (0.01, "1cm"), (0.004, "4mm")):
        within = (aabb_d2 <= rr * rr) & q_occ[:, None] & plan.k_occ[None, :]
        nearest = jnp.argmin(
            jnp.where(plan.k_occ[None, :], aabb_d2, jnp.float32(3e38)), axis=1
        )
        within = within.at[jnp.arange(n_qt), nearest].set(True)
        cnt = int(jnp.sum(within.astype(jnp.int32)))
        print(f"  within pairs at {label}: {cnt} "
              f"(n_qt={n_qt} n_mt={n_mt}, current budget="
              f"{n_qt * min(max(n_mt // 4, 8), max(n_mt, 1))})", flush=True)

    qp = _augment_queries(qs, tile_q)
    within_gate = (aabb_d2 <= 0.0025) & q_occ[:, None] & plan.k_occ[None, :]
    nearest = jnp.argmin(
        jnp.where(plan.k_occ[None, :], aabb_d2, jnp.float32(3e38)), axis=1
    )
    within_gate = within_gate.at[jnp.arange(n_qt), nearest].set(True)
    for mult in (4, 8, 29):
        budget = n_qt * mult

        def run(q, w):
            d, i = _nn1_pallas_compact(
                q, plan.kp, w, budget=budget,
                tile_q=tile_q, tile_m=tile_m,
            )
            return jnp.minimum(d, 1e30)  # full output (op_time sums it)

        r = op_time(run, (qp, within_gate), lo=1, hi=5)
        print(f"NN compact budget n_qt*{mult} ({budget} steps): {r}",
              flush=True)


def _blocked_cholesky(a, nb):
    n = a.shape[0]
    nblk = n // nb
    eye = jnp.eye(nb, dtype=a.dtype)
    rows = jnp.arange(n)

    def body(j, st):
        a_cur, l_acc = st
        j0 = j * nb
        d = jax.lax.dynamic_slice(a_cur, (j0, j0), (nb, nb))
        ld = jnp.linalg.cholesky(d)
        ldinv = jax.scipy.linalg.solve_triangular(ld, eye, lower=True)
        col = jax.lax.dynamic_slice(a_cur, (0, j0), (n, nb))
        lcol = col @ ldinv.T
        below = (rows[:, None] >= j0 + nb)
        lcol = jnp.where(below, lcol, 0.0)
        lcol = jax.lax.dynamic_update_slice(lcol, ld, (j0, 0))
        a_cur = a_cur - lcol @ lcol.T
        l_acc = jax.lax.dynamic_update_slice(l_acc, lcol, (0, j0))
        return a_cur, l_acc

    _, l = jax.lax.fori_loop(0, nblk, body, (a, jnp.zeros_like(a)))
    return l


def part_chol():
    key = jax.random.PRNGKey(0)
    for n in (512, 1024, 2048, 5184):
        g = jax.random.normal(key, (n, n), jnp.float32)
        spd = g @ g.T + n * jnp.eye(n, dtype=jnp.float32)
        r = op_time(jnp.linalg.cholesky, (spd,), lo=1, hi=5)
        print(f"CHOL xla n={n}: {r}", flush=True)
    n = 5184
    g = jax.random.normal(key, (n, n), jnp.float32)
    spd = g @ g.T + n * jnp.eye(n, dtype=jnp.float32)
    rhs = jax.random.normal(key, (n,), jnp.float32)
    chol = jnp.linalg.cholesky(spd)
    chol = jax.block_until_ready(chol)
    r = op_time(
        lambda c: jax.scipy.linalg.cho_solve((c, True), rhs), (chol,),
        lo=1, hi=5,
    )
    print(f"CHO_SOLVE xla n={n} (1 rhs): {r}", flush=True)
    # Blocked prototypes (pad 5184 -> multiple of nb with unit diagonal).
    for nb in (256, 512):
        npad = -(-n // nb) * nb
        a = jnp.eye(npad, dtype=jnp.float32)
        a = a.at[:n, :n].set(spd)
        r = op_time(lambda x: _blocked_cholesky(x, nb), (a,), lo=1, hi=5)
        # correctness
        l = _blocked_cholesky(a, nb)
        err = float(jnp.max(jnp.abs(l[:n, :n] - chol)) /
                    jnp.max(jnp.abs(chol)))
        print(f"CHOL blocked nb={nb} npad={npad}: {r}  relerr={err:.1e}",
              flush=True)
    # solve via explicit inv(L): one triangular inverse + two matvecs
    r = op_time(
        lambda c: jax.scipy.linalg.solve_triangular(
            c, jnp.eye(n, dtype=jnp.float32), lower=True
        ),
        (chol,), lo=1, hi=3,
    )
    print(f"TRI-INV xla n={n}: {r}", flush=True)


def part_pieces():
    graph, srcj, dstj = _graph_and_clouds()
    m = graph.num_nodes
    n = srcj.shape[0]
    key = jax.random.PRNGKey(0)
    rorder = graph.pair_order
    nrows = rorder.shape[0]
    print(f"pair rows R={nrows} segments U={graph.pair_uniq_keys.shape[0]} "
          f"m={m}", flush=True)
    for width in (36, 12, 8):
        vals = jax.random.normal(key, (nrows, width), jnp.float32)
        r = op_time(lambda v: v[rorder], (vals,), lo=1, hi=5)
        print(f"GATHER {nrows}x{width}: {r}", flush=True)
    vals = jax.random.normal(key, (nrows, 36), jnp.float32)

    def gather_seg_expand(v):
        compact = jax.ops.segment_sum(
            v[rorder], graph.pair_seg_ids,
            num_segments=graph.pair_uniq_keys.shape[0],
            indices_are_sorted=True,
        )
        acc = (
            jnp.zeros((m * m, 36), jnp.float32)
            .at[graph.pair_uniq_keys]
            .set(compact, mode="drop", indices_are_sorted=True,
                 unique_indices=True)
        )
        return acc

    r = op_time(gather_seg_expand, (vals,), lo=1, hi=5)
    print(f"GATHER+SEGSUM+EXPAND 36w: {r}", flush=True)

    acc0 = jax.random.normal(key, (m * m, 36), jnp.float32)
    p_par = 6

    def layout(acc):
        acc4 = acc.reshape(m, m, p_par, p_par)
        h = jnp.stack(
            [acc4[:, :, q, :].reshape(m, m * p_par) for q in range(p_par)],
            axis=1,
        ).reshape(m * p_par, m * p_par)
        h = h + h.T
        # The layout's cost is the materialization cholesky forces; summing
        # h alone would let XLA fold the whole dance into sum(acc). Feed it
        # to cholesky and compare against part 3's bare-cholesky number.
        h = h + jnp.float32(1e4) * jnp.eye(m * p_par, dtype=jnp.float32)
        return jnp.linalg.cholesky(h)

    r = op_time(layout, (acc0,), lo=1, hi=5)
    print(f"LAYOUT+SYM+CHOL {m*6}^2 (subtract part-3 chol): {r}", flush=True)

    # One direct GN step with fixed correspondences (NN excluded).
    from cilantro_tpu.correspondence.search import find_nn_correspondences
    from cilantro_tpu.registration.warp_field import estimate_warp_field

    corr = find_nn_correspondences(srcj, dstj, max_distance=0.0025)
    w = corr.mask.astype(jnp.float32)
    dgt = dstj[jnp.where(corr.mask, corr.dst_idx, 0)]

    def gn1(s):
        tf, _, _ = estimate_warp_field(
            graph, s, dgt, None, w, point_weight=1.0, plane_weight=0.0,
            stiffness=50.0, max_gn_iterations=1, solver="direct",
        )
        return tf.translation

    r = op_time(gn1, (srcj,), lo=1, hi=3)
    print(f"GN direct 1 step (no NN): {r}", flush=True)


def _compile_heavy(seed, n_ops=160, size=640):
    """A deliberately large HLO graph (distinct per seed) to time compiles."""
    def f(x):
        y = x
        for i in range(n_ops):
            y = jnp.tanh(y @ y.T * (1e-3 * (i + seed))) + x
        return jnp.sum(y)

    x = jnp.ones((size + seed, size + seed), jnp.float32)
    t0 = time.perf_counter()
    jax.jit(f).lower(x).compile()
    return time.perf_counter() - t0


def part_par():
    import threading

    t0 = time.perf_counter()
    s1 = _compile_heavy(1)
    s2 = _compile_heavy(2)
    serial = time.perf_counter() - t0
    print(f"PAR serial compiles: {s1:.1f}s + {s2:.1f}s = {serial:.1f}s",
          flush=True)
    out = {}
    t0 = time.perf_counter()
    ths = [
        threading.Thread(target=lambda i=i: out.update({i: _compile_heavy(i)}))
        for i in (3, 4)
    ]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    par = time.perf_counter() - t0
    print(f"PAR threaded compiles: {out.get(3, -1):.1f}s / "
          f"{out.get(4, -1):.1f}s, wall {par:.1f}s "
          f"-> overlap {'YES' if par < 0.75 * serial else 'NO'}", flush=True)


def part_sorted():
    """Prototype the narrow-input SORTED pair assembly (candidate VERDICT
    r4 #1 design) against the current chunked-SoA + wide-gather path, plus
    the GN's remaining pieces (y compute, rhs path) so the 180 ms GN step
    is fully accounted for."""
    graph, srcj, dstj = _graph_and_clouds()
    m = graph.num_nodes
    n, K = graph.anchors.shape
    key = jax.random.PRNGKey(0)

    anchors = np.asarray(graph.anchors).astype(np.int64)
    wa = np.asarray(graph.anchor_weights)
    kk, ll = np.triu_indices(K)
    T = len(kk)
    chunk = 4096
    n_pad = max(1, -(-n // chunk)) * chunk
    a_pad = np.zeros((n_pad, K), np.int64)
    a_pad[:n] = anchors
    an, bn_ = a_pad[:, kk], a_pad[:, ll]
    pair_keys = (np.minimum(an, bn_) * m + np.maximum(an, bn_)).reshape(-1)
    order1 = np.argsort(pair_keys, kind="stable")
    uniq = np.asarray(graph.pair_uniq_keys)
    seg1 = np.searchsorted(uniq, pair_keys[order1]).astype(np.int32)
    pt = (order1 // T).astype(np.int64)
    t = (order1 % T).astype(np.int64)
    ps_kkf = (pt * K + kk[t]).astype(np.int32)
    ps_llf = (pt * K + ll[t]).astype(np.int32)
    ps_pt = pt.astype(np.int32)
    wa_pad = np.zeros((n_pad, K), np.float32)
    wa_pad[:n] = wa
    hd = np.where(kk == ll, 0.5, 1.0).astype(np.float32)
    ps_w2 = (wa_pad[pt, kk[t]] * wa_pad[pt, ll[t]] * hd[t]).astype(np.float32)
    ps_w2[pt >= n] = 0.0
    ps_swap = (a_pad[pt, kk[t]] > a_pad[pt, ll[t]])

    dev = jax.device_put
    ps_kkf, ps_llf, ps_pt = dev(ps_kkf), dev(ps_llf), dev(ps_pt)
    ps_w2 = dev(ps_w2)
    ps_swap = dev(ps_swap)
    seg1 = dev(seg1)
    u_pad = uniq.shape[0]
    uniq_j = dev(uniq.astype(np.int32))

    yflat = jax.random.normal(key, (n * K, 3), jnp.float32)
    ptab = jax.random.normal(key, (n, 5), jnp.float32)  # wpp, wpl, n(3)

    def sorted_assembly(yflat, ptab):
        a = yflat[ps_kkf]
        b = yflat[ps_llf]
        p = ptab[ps_pt]
        sw = ps_swap[:, None]
        ya = jnp.where(sw, b, a)
        yb = jnp.where(sw, a, b)
        xk, yk, zk = ya[:, 0], ya[:, 1], ya[:, 2]
        xl, yl, zl = yb[:, 0], yb[:, 1], yb[:, 2]
        wpt, wpl = p[:, 0], p[:, 1]
        nx, ny, nz = p[:, 2], p[:, 3], p[:, 4]
        dot = xk * xl + yk * yl + zk * zl
        one = jnp.ones_like(dot)
        zero = jnp.zeros_like(dot)
        tl = [
            [dot - xl * xk, -xl * yk, -xl * zk],
            [-yl * xk, dot - yl * yk, -yl * zk],
            [-zl * xk, -zl * yk, dot - zl * zk],
        ]
        tr = [[zero, -zk, yk], [zk, zero, -xk], [-yk, xk, zero]]
        bl = [[zero, zl, -yl], [-zl, zero, xl], [yl, -xl, zero]]
        br = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]
        bnk = [yk * nz - zk * ny, zk * nx - xk * nz, xk * ny - yk * nx,
               nx, ny, nz]
        bnl = [yl * nz - zl * ny, zl * nx - xl * nz, xl * ny - yl * nx,
               nx, ny, nz]
        ent = []
        for pp_ in range(3):
            for qq in range(3):
                ent.append(wpt * tl[pp_][qq] + wpl * bnk[pp_] * bnl[qq])
            for qq in range(3):
                ent.append(wpt * tr[pp_][qq] + wpl * bnk[pp_] * bnl[qq + 3])
        for pp_ in range(3):
            for qq in range(3):
                ent.append(wpt * bl[pp_][qq] + wpl * bnk[pp_ + 3] * bnl[qq])
            for qq in range(3):
                ent.append(
                    wpt * br[pp_][qq] + wpl * bnk[pp_ + 3] * bnl[qq + 3]
                )
        vals = ps_w2[:, None] * jnp.stack(ent, axis=1)  # (R1, 36)
        compact = jax.ops.segment_sum(
            vals, seg1, num_segments=u_pad, indices_are_sorted=True
        )
        acc = (
            jnp.zeros((m * m, 36), jnp.float32)
            .at[uniq_j]
            .set(compact, mode="drop", indices_are_sorted=True,
                 unique_indices=True)
        )
        return acc

    r = op_time(sorted_assembly, (yflat, ptab), lo=1, hi=5)
    print(f"SORTED narrow assembly (gather12 + compute + segsum + expand): "
          f"{r}", flush=True)

    # The three gathers alone.
    def gathers_only(yflat, ptab):
        return yflat[ps_kkf], yflat[ps_llf], ptab[ps_pt]

    r = op_time(gathers_only, (yflat, ptab), lo=1, hi=5)
    print(f"SORTED gathers only (2x3w + 1x5w at 1.25M rows): {r}",
          flush=True)

    # y compute: packed node gather + einsum (the GN's first stage).
    packed = jax.random.normal(key, (m, 12), jnp.float32)

    def y_compute(packed):
        pa = packed[graph.anchors]  # (N, K, 12)
        lin = pa[..., :9].reshape(n, K, 3, 3)
        tr_ = pa[..., 9:]
        return jnp.einsum("nkij,nj->nki", lin, srcj) + tr_

    r = op_time(y_compute, (packed,), lo=1, hi=5)
    print(f"Y anchor gather + warp (480k rows, 12w): {r}", flush=True)

    # rhs path: segment_over_anchors on (N,K,6) + arc segment sums.
    rows6 = jax.random.normal(key, (n, K, 6), jnp.float32)

    def rhs_path(rows6):
        return graph.segment_over_anchors(rows6.reshape(n, K, 6))

    r = op_time(rhs_path, (rows6,), lo=1, hi=5)
    print(f"RHS segment_over_anchors (480k rows, 6w): {r}", flush=True)


def part_cache():
    """Does jit(f).lower(x).compile() make the later plain call
    compile-free? Decides the bench prewarm design (VERDICT r4 #2)."""
    f = jax.jit(_heavy_fn(11))
    x = jnp.ones((523, 523), jnp.float32)
    t0 = time.perf_counter()
    f.lower(x).compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(f(x))
    t_call = time.perf_counter() - t0
    print(f"CACHE lower+compile {t_compile:.1f}s; first plain call "
          f"{t_call:.2f}s -> {'SHARED' if t_call < 0.25 * t_compile else 'NOT shared'}",
          flush=True)


def part_overlap():
    """Is a timed execution loop disturbed by a concurrent background
    compile? Decides whether prewarm threads may run during timed
    stages."""
    import threading

    g = jax.jit(lambda a: jnp.sum(a @ a))
    x = jnp.ones((2048, 2048), jnp.float32)
    np.asarray(g(x))

    def timed_loop(label):
        best = 1e9
        for _ in range(8):
            t0 = time.perf_counter()
            np.asarray(g(x))
            best = min(best, time.perf_counter() - t0)
        print(f"OVERLAP {label}: best timed matmul {best*1e3:.1f} ms",
              flush=True)

    timed_loop("quiet")
    th = threading.Thread(
        target=lambda: jax.jit(_heavy_fn(23)).lower(
            jnp.ones((529, 529), jnp.float32)
        ).compile()
    )
    th.start()
    time.sleep(2.0)
    timed_loop("with background compile")
    th.join()
    timed_loop("quiet again")


def _heavy_fn(seed, n_ops=120, size=512):
    def f(x):
        y = x
        for i in range(n_ops):
            y = jnp.tanh(y @ y.T * (1e-3 * (i + seed))) + x
        return jnp.sum(y)
    return f




def part_knn():
    """VERDICT r4 #4: decompose the 120k kNN cost by k. t(k=1) is the
    distance+prune+bookkeeping floor with a trivial fold; the gap to
    t(k=10) is what ANY better top-k fold could recover. If the k=1 floor
    already exceeds ~65 ms, the self-set bar is physically out of reach
    for fold-side work alone."""
    import jax

    from cilantro_tpu.neighbors.pallas_nn import knn_pruned
    from cilantro_tpu.utils import read_point_cloud

    p1, _, _ = read_point_cloud(
        "/root/reference/examples/test_clouds/frame_1.ply"
    )
    p1j = jax.device_put(p1)
    for k in (2, 3, 5, 10):
        fn = jax.jit(lambda q, kk=k: knn_pruned(q, q, kk, exclude_self=True))
        d, i = fn(p1j)
        np.asarray(d[:1, :1])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            d, i = fn(p1j)
            np.asarray(d[:1, :1])
            best = min(best, time.perf_counter() - t0)
        print(f"KNN pruned k={k}: {best*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1:] or ["2"]
    t_all = time.perf_counter()
    for w in which:
        {"1": part_full, "2": part_nn, "3": part_chol,
         "4": part_pieces, "5": part_par, "6": part_sorted,
         "7": part_cache, "8": part_overlap, "9": part_knn}[w]()
        print(f"-- part {w} done at {time.perf_counter()-t_all:.0f}s",
              flush=True)






