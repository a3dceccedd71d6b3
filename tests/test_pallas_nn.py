"""Pallas NN kernel correctness in interpreter mode (tiny sizes — the real
kernels are exercised on the TPU chip by bench.py / verification drivers)."""

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.neighbors.pallas_nn import nn1_pallas, knn_pallas


def brute_nn(q, k):
    d = ((q[:, None, :] - k[None, :, :]) ** 2).sum(-1)
    return d.min(1), d.argmin(1)


def test_nn1_matches_numpy(rng):
    q = rng.standard_normal((100, 3)).astype(np.float32)
    k = rng.standard_normal((150, 3)).astype(np.float32)
    d_ref, i_ref = brute_nn(q, k)
    d, i = nn1_pallas(
        jnp.asarray(q), jnp.asarray(k), tile_q=8, tile_m=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-4, atol=1e-5)
    assert (np.asarray(i) == i_ref).mean() > 0.99  # ties may differ


def test_nn1_key_valid_mask(rng):
    q = rng.standard_normal((32, 3)).astype(np.float32)
    k = np.concatenate([q + 100.0, q + 0.001]).astype(np.float32)
    kv = np.zeros(64, bool)
    kv[:32] = True  # only the far copies are valid
    d, i = nn1_pallas(
        jnp.asarray(q),
        jnp.asarray(k),
        key_valid=jnp.asarray(kv),
        tile_q=8,
        tile_m=64,
        interpret=True,
    )
    assert np.all(np.asarray(i) < 32)
    assert np.all(np.asarray(d) > 1000.0)


def test_knn_matches_numpy(rng):
    q = rng.standard_normal((64, 3)).astype(np.float32)
    k = rng.standard_normal((200, 3)).astype(np.float32)
    d = ((q[:, None, :] - k[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d, axis=1)[:, :5]
    d_ref = np.take_along_axis(d, order, axis=1)
    dk, ik = knn_pallas(
        jnp.asarray(q), jnp.asarray(k), 5, tile_q=8, tile_m=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dk), d_ref, rtol=1e-4, atol=1e-5)
    assert (np.asarray(ik) == order).mean() > 0.98


def test_knn_exclude_self(rng):
    pts = rng.standard_normal((48, 3)).astype(np.float32)
    dk, ik = knn_pallas(
        jnp.asarray(pts),
        jnp.asarray(pts),
        4,
        exclude_self=True,
        tile_q=8,
        tile_m=64,
        interpret=True,
    )
    rows = np.arange(48)[:, None]
    assert not np.any(np.asarray(ik) == rows)
    assert np.all(np.asarray(dk) > 0)


def test_nn1_pruned_interpret(rng):
    """Tile-pruned nn1 (interpret mode) matches brute force within radius."""
    import numpy as np
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import nn1_pruned, INVALID_DIST
    from cilantro_tpu.neighbors.bruteforce import _nn1_xla

    n = 3000
    g = np.linspace(-0.2, 0.2, 55)
    gx, gy = np.meshgrid(g, g)
    gz = 1.5 + 0.05 * np.sin(10 * gx) * np.cos(8 * gy)
    pts = np.column_stack([gx.ravel(), gy.ravel(), gz.ravel()])[:n]
    pts = (pts + rng.normal(0, 5e-4, pts.shape)).astype(np.float32)
    q = (pts[::3] + rng.normal(0, 2e-3, pts[::3].shape)).astype(np.float32)

    radius = 0.01
    d_p, i_p = nn1_pruned(
        jnp.asarray(q), jnp.asarray(pts), radius,
        tile_q=256, tile_m=512, interpret=True,
    )
    d_b, i_b = _nn1_xla(jnp.asarray(q), jnp.asarray(pts))
    d_p, i_p, d_b, i_b = map(np.asarray, (d_p, i_p, d_b, i_b))
    within = d_b <= radius * radius
    # Inside the radius: exact agreement (distance; index up to ties).
    np.testing.assert_allclose(d_p[within], d_b[within], rtol=1e-5, atol=5e-7)
    same = i_p[within] == i_b[within]
    assert same.mean() > 0.95  # f32 cancellation noise can flip near-ties
    # Outside the radius: flagged invalid.
    assert (d_p[~within] >= INVALID_DIST * 0.5).all()


def test_nn1_pruned_with_invalid_keys(rng):
    import numpy as np
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import nn1_pruned, INVALID_DIST

    pts = rng.uniform(-0.1, 0.1, (1000, 3)).astype(np.float32)
    kv = np.ones(1000, bool)
    kv[::2] = False
    d, i = nn1_pruned(
        jnp.asarray(pts[:200]), jnp.asarray(pts), 0.05,
        key_valid=jnp.asarray(kv), tile_q=128, tile_m=256, interpret=True,
    )
    d, i = np.asarray(d), np.asarray(i)
    hit = d < INVALID_DIST * 0.5
    assert hit.sum() > 100
    assert (i[hit] % 2 == 1).all()  # only valid (odd) keys matched


def test_nn1_compact_matches_masked_and_fallback(rng):
    """Compacted-pair kernel == masked kernel; budget overflow falls back."""
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import (
        _augment, _nn1_pallas_compact, _nn1_pallas_masked,
    )

    tq, tm = 128, 256
    q = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    k = rng.uniform(-1, 1, (700, 3)).astype(np.float32)
    qp, kp = _augment(jnp.asarray(q), jnp.asarray(k), None, tq, tm)
    n_qt, n_mt = qp.shape[0] // tq, kp.shape[0] // tm
    # Random mask with every row visited at least once.
    mask = rng.random((n_qt, n_mt)) < 0.5
    mask[:, 0] = True
    mask = jnp.asarray(mask)

    d_m, i_m = _nn1_pallas_masked(
        qp, kp, mask.astype(jnp.int32), tile_q=tq, tile_m=tm, interpret=True
    )
    for budget in (n_qt * n_mt, 2):  # roomy, and overflow → fallback
        d_c, i_c = _nn1_pallas_compact(
            qp, kp, mask, budget=budget, tile_q=tq, tile_m=tm, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(d_c), np.asarray(d_m))
        np.testing.assert_array_equal(np.asarray(i_c), np.asarray(i_m))


def test_nn1_pruned_no_neighbor_rows(rng):
    """Query tiles with nothing in radius still return INVALID (their rows
    are force-visited via the nearest-chunk rule, then gated)."""
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import nn1_pruned, INVALID_DIST

    k = rng.uniform(-0.05, 0.05, (600, 3)).astype(np.float32)
    far = rng.uniform(10.0, 10.1, (400, 3)).astype(np.float32)
    near = k[:200] + rng.normal(0, 1e-3, (200, 3)).astype(np.float32)
    q = np.concatenate([far, near]).astype(np.float32)
    d, i = nn1_pruned(
        jnp.asarray(q), jnp.asarray(k), 0.02,
        tile_q=128, tile_m=128, interpret=True,
    )
    d = np.asarray(d)
    assert (d[:400] >= INVALID_DIST * 0.5).all()
    assert (d[400:] < 0.02 * 0.02).all()


def test_nn1_prune_plan_reuse_under_motion(rng):
    """A plan built from initial query positions stays EXACT after the
    queries move (the ICP loop situation): AABBs are recomputed from actual
    positions each call, only the sort permutation is stale."""
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import (
        INVALID_DIST, make_nn1_prune_plan, nn1_pruned_planned,
    )
    from cilantro_tpu.neighbors.bruteforce import _nn1_xla

    k = rng.uniform(-0.3, 0.3, (2000, 3)).astype(np.float32)
    q0 = (k[::2] + rng.normal(0, 2e-3, (1000, 3))).astype(np.float32)
    radius = 0.02
    plan = make_nn1_prune_plan(
        jnp.asarray(k), radius, jnp.asarray(q0), tile_q=128, tile_m=256
    )
    # Three "iterations", each moving the queries a fraction of the gate.
    q = q0
    for _ in range(3):
        q = q + rng.normal(0, 3e-3, q.shape).astype(np.float32)
        d_p, i_p = nn1_pruned_planned(jnp.asarray(q), plan, interpret=True)
        d_b, i_b = map(np.asarray, _nn1_xla(jnp.asarray(q), jnp.asarray(k)))
        d_p, i_p = np.asarray(d_p), np.asarray(i_p)
        within = d_b <= radius * radius
        np.testing.assert_allclose(
            d_p[within], d_b[within], rtol=1e-5, atol=5e-7
        )
        assert (i_p[within] == i_b[within]).mean() > 0.95
        assert (d_p[~within] >= INVALID_DIST * 0.5).all()


def test_knn_pruned_matches_brute(rng):
    """Radius-doubling pruned kNN is exact vs the numpy answer."""
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import knn_pruned

    # Surface-like cloud (the density heuristic's home turf)...
    g = np.linspace(-0.2, 0.2, 45)
    gx, gy = np.meshgrid(g, g)
    gz = 1.5 + 0.05 * np.sin(10 * gx) * np.cos(8 * gy)
    pts = np.column_stack([gx.ravel(), gy.ravel(), gz.ravel()]).astype(
        np.float32
    )
    q = (pts[::2] + rng.normal(0, 1e-3, pts[::2].shape)).astype(np.float32)

    d = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d, axis=1)[:, :5]
    d_ref = np.take_along_axis(d, order, axis=1)

    dk, ik = knn_pruned(
        jnp.asarray(q), jnp.asarray(pts), 5,
        tile_q=128, tile_m=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dk), d_ref, rtol=1e-4, atol=1e-5)
    assert (np.asarray(ik) == order).mean() > 0.98  # ties may differ


def test_knn_pruned_uniform_and_small_k(rng):
    # ...and a volumetric cloud where the surface guess under-shoots, plus
    # fewer valid keys than k (covered-tile exactness path).
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import knn_pruned, INVALID_DIST

    pts = rng.uniform(-1, 1, (1500, 3)).astype(np.float32)
    q = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
    d = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d, axis=1)[:, :8]
    d_ref = np.take_along_axis(d, order, axis=1)
    dk, ik = knn_pruned(
        jnp.asarray(q), jnp.asarray(pts), 8,
        tile_q=128, tile_m=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dk), d_ref, rtol=1e-4, atol=1e-5)

    # Only 3 valid keys, k=8: real slots exact, rest INVALID.
    kv = np.zeros(1500, bool)
    kv[[10, 700, 1200]] = True
    dk, ik = knn_pruned(
        jnp.asarray(q), jnp.asarray(pts), 8, key_valid=jnp.asarray(kv),
        tile_q=128, tile_m=256, interpret=True,
    )
    dk, ik = np.asarray(dk), np.asarray(ik)
    dm = np.where(kv[None, :], d, np.inf)
    order3 = np.argsort(dm, axis=1)[:, :3]
    d3 = np.take_along_axis(dm, order3, axis=1)
    np.testing.assert_allclose(dk[:, :3], d3, rtol=1e-4, atol=1e-5)
    assert (dk[:, 3:] >= INVALID_DIST * 0.5).all()
    assert set(np.unique(ik[:, :3])) <= {10, 700, 1200}


def test_knn_pruned_exclude_self(rng):
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import knn_pruned

    pts = rng.uniform(-0.5, 0.5, (600, 3)).astype(np.float32)
    dk, ik = knn_pruned(
        jnp.asarray(pts), jnp.asarray(pts), 4, exclude_self=True,
        tile_q=128, tile_m=128, interpret=True,
    )
    rows = np.arange(600)[:, None]
    assert not np.any(np.asarray(ik) == rows)
    assert np.all(np.asarray(dk) > 0)


def test_knn_pruned_exclude_self_mismatched_masks(rng):
    """exclude_self with query_valid != key_valid (ADVICE r3 #1: divergent
    Morton permutations silently returned 254/300 self-matches): the shared
    permutation must keep results exact and self-free."""
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import INVALID_DIST, knn_pruned

    n, k = 300, 4
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    qv = rng.random(n) < 0.7
    kv = rng.random(n) < 0.6
    qv[:5] = True  # a few guaranteed-live queries
    kv[:5] = True
    dk, ik = knn_pruned(
        jnp.asarray(pts), jnp.asarray(pts), k,
        query_valid=jnp.asarray(qv), key_valid=jnp.asarray(kv),
        exclude_self=True, tile_q=128, tile_m=128, interpret=True,
    )
    dk, ik = np.asarray(dk), np.asarray(ik)
    d2 = np.sum((pts[:, None] - pts[None, :]) ** 2, -1)
    d2[:, ~kv] = np.inf
    np.fill_diagonal(d2, np.inf)  # self excluded
    ref = np.sort(d2, axis=1)[:, :k]
    for i in np.flatnonzero(qv):
        hit = dk[i] < INVALID_DIST * 0.5
        want = ref[i][np.isfinite(ref[i])]
        assert hit.sum() == len(want), f"query {i}: count"
        np.testing.assert_allclose(dk[i][hit], want, rtol=1e-5, atol=1e-7)
        assert not np.any(ik[i][hit] == i), f"query {i}: self returned"
        assert kv[ik[i][hit]].all(), f"query {i}: invalid key returned"


def test_knn_pruned_exclude_self_shape_mismatch_raises():
    import jax.numpy as jnp
    import pytest

    from cilantro_tpu.neighbors.pallas_nn import knn_pruned

    a = jnp.zeros((128, 3))
    b = jnp.zeros((256, 3))
    with pytest.raises(ValueError, match="exclude_self"):
        knn_pruned(a, b, 3, exclude_self=True, interpret=True)


def test_radius_search_pruned_matches_brute(rng):
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import (
        INVALID_DIST, radius_search_pruned,
    )

    pts = rng.uniform(-0.2, 0.2, (1200, 3)).astype(np.float32)
    q = rng.uniform(-0.2, 0.2, (500, 3)).astype(np.float32)
    radius, cap = 0.04, 8
    d, i, over = radius_search_pruned(
        jnp.asarray(q), jnp.asarray(pts), radius, cap,
        tile_q=128, tile_m=128, interpret=True,
    )
    d, i, over = map(np.asarray, (d, i, over))
    db = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    r2 = radius * radius
    for qi in range(0, 500, 7):
        true = np.sort(db[qi][db[qi] <= r2])
        got = d[qi][d[qi] < INVALID_DIST * 0.5]
        n_keep = min(len(true), cap)
        np.testing.assert_allclose(
            got, true[:n_keep], rtol=1e-4, atol=1e-6
        )
        assert over[qi] == (len(true) > cap), (qi, len(true), over[qi])


def test_radius_search_pruned_exclude_self(rng):
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import (
        INVALID_DIST, radius_search_pruned,
    )

    pts = rng.uniform(-0.1, 0.1, (800, 3)).astype(np.float32)
    d, i, over = radius_search_pruned(
        jnp.asarray(pts), jnp.asarray(pts), 0.03, 6, exclude_self=True,
        tile_q=128, tile_m=128, interpret=True,
    )
    d, i = np.asarray(d), np.asarray(i)
    hit = d < INVALID_DIST * 0.5
    rows = np.arange(800)[:, None]
    assert not np.any((i == rows) & hit)
    assert np.all(d[hit] > 0)
    # Overflow exactness under self-exclusion.
    db = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(db, np.inf)
    true_counts = (db <= 0.03 * 0.03).sum(1)
    np.testing.assert_array_equal(np.asarray(over), true_counts > 6)


def test_nn1_compact_fuzz_masks_and_budgets(rng):
    """Property fuzz: random occupancy masks x budgets, compact == masked."""
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import (
        _augment, _nn1_pallas_compact, _nn1_pallas_masked,
    )

    tq, tm = 64, 128
    for trial in range(4):
        qn = int(rng.integers(100, 400))
        mn = int(rng.integers(150, 500))
        q = rng.uniform(-1, 1, (qn, 3)).astype(np.float32)
        k = rng.uniform(-1, 1, (mn, 3)).astype(np.float32)
        qp, kp = _augment(jnp.asarray(q), jnp.asarray(k), None, tq, tm)
        n_qt, n_mt = qp.shape[0] // tq, kp.shape[0] // tm
        density = rng.uniform(0.1, 0.9)
        mask = rng.random((n_qt, n_mt)) < density
        mask[np.arange(n_qt), rng.integers(0, n_mt, n_qt)] = True
        mask = jnp.asarray(mask)
        d_m, i_m = _nn1_pallas_masked(
            qp, kp, mask.astype(jnp.int32), tile_q=tq, tile_m=tm,
            interpret=True,
        )
        budget = int(rng.integers(1, n_qt * n_mt + 2))
        d_c, i_c = _nn1_pallas_compact(
            qp, kp, mask, budget=budget, tile_q=tq, tile_m=tm,
            interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(d_c), np.asarray(d_m), err_msg=f"trial {trial}"
        )
        np.testing.assert_array_equal(np.asarray(i_c), np.asarray(i_m))


def test_icp_plan_path_end_to_end(rng, monkeypatch):
    """Run the REAL icp() entry through the prune-plan path (TPU-only in
    production) with interpret-mode kernels: catches wiring bugs between
    icp's plan build, find_nn_correspondences' plan dispatch, and the
    compact kernel that no other CPU test reaches."""
    import jax.numpy as jnp

    import cilantro_tpu.neighbors.pallas_nn as pnn
    from cilantro_tpu.registration import icp

    monkeypatch.setattr(
        pnn, "prune_eligible",
        lambda q_shape, k_shape, max_distance, metric="l2": (
            max_distance is not None and metric == "l2" and q_shape[1] == 3
        ),
    )
    orig = pnn.nn1_pruned_planned
    calls = []

    def traced(q, p, **kw):
        calls.append(1)
        return orig(q, p, interpret=True)

    monkeypatch.setattr(pnn, "nn1_pruned_planned", traced)

    n = 3000
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    pts[:, 2] = 0.2 * np.sin(4 * pts[:, 0]) * np.cos(3 * pts[:, 1])
    ang = 0.03
    R = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    t = np.float32([0.01, -0.008, 0.012])
    dst = (pts @ R.T + t).astype(np.float32)
    nrm = np.zeros_like(dst)
    nrm[:, 2] = 1.0

    res = icp(
        jnp.asarray(pts), jnp.asarray(dst), dst_normals=jnp.asarray(nrm),
        metric="combined", point_weight=0.3, max_corr_dist_sq=0.25,
        max_iterations=20, convergence_tol=1e-7,
    )
    assert calls, "prune-plan path was not taken"
    assert np.abs(np.asarray(res.transform.translation) - t).max() < 2e-3
    assert np.abs(np.asarray(res.transform.linear) - R).max() < 2e-3


def test_warp_icp_plan_path_end_to_end(rng, monkeypatch):
    """Same as test_icp_plan_path_end_to_end but for the EDG warp-field
    outer loop's hoisted plan (also TPU-only in production)."""
    import jax.numpy as jnp

    import cilantro_tpu.neighbors.pallas_nn as pnn
    from cilantro_tpu.registration import (
        build_deformation_graph, icp_warp_field, warp_points,
    )

    monkeypatch.setattr(
        pnn, "prune_eligible",
        lambda q_shape, k_shape, max_distance, metric="l2": (
            max_distance is not None and metric == "l2" and q_shape[1] == 3
        ),
    )
    orig = pnn.nn1_pruned_planned
    calls = []

    def traced(q, p, **kw):
        calls.append(1)
        return orig(q, p, interpret=True)

    monkeypatch.setattr(pnn, "nn1_pruned_planned", traced)

    g = np.linspace(-0.5, 0.5, 45)
    gx, gy = np.meshgrid(g, g)
    src = np.column_stack(
        [gx.ravel(), gy.ravel(), np.zeros(gx.size)]
    ).astype(np.float32)
    dst = src.copy()
    dst[:, 2] += 0.04 * np.sin(4 * dst[:, 0])  # smooth bend
    keys = np.round(src[:, :2] / 0.25).astype(np.int64)
    _, first = np.unique(keys[:, 0] * 10000 + keys[:, 1], return_index=True)
    nodes = src[np.sort(first)]
    graph = build_deformation_graph(
        jnp.asarray(src), jnp.asarray(nodes), k_anchors=4, k_arcs=6
    )
    node_tf, _, _ = icp_warp_field(
        graph, jnp.asarray(src), jnp.asarray(dst),
        max_corr_dist_sq=0.04, point_weight=1.0, plane_weight=0.0,
        stiffness=10.0, max_iterations=10, convergence_tol=1e-4,
        max_cg_iterations=60,
    )
    assert calls, "warp prune-plan path was not taken"
    warped = np.asarray(warp_points(graph, node_tf, jnp.asarray(src)))
    err = np.linalg.norm(warped - dst, axis=1)
    assert np.median(err) < 0.01
