"""Non-rigid warp-field tests: smooth-deformation recovery (the distort-and-
recover recipe of ``examples/non_rigid_icp.cpp`` on synthetic surfaces)."""

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.registration import (
    build_deformation_graph,
    build_dense_graph,
    icp_warp_field,
    identity_warp,
    resample_transforms,
    warp_points,
)


def surface(rng, n=1500):
    xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    z = (0.2 * np.sin(1.5 * xy[:, 0]) * np.cos(1.5 * xy[:, 1])).astype(
        np.float32
    )
    return np.column_stack([xy, z])


def smooth_bend(pts, amp=0.06):
    """A smooth non-rigid deformation: x-dependent lift + slight twist."""
    out = pts.copy()
    out[:, 2] += amp * np.sin(1.2 * pts[:, 0] + 0.4)
    out[:, 1] += 0.5 * amp * np.cos(1.0 * pts[:, 0])
    return out


def control_nodes(pts, step=0.25):
    """Grid-subsampled control nodes."""
    keys = np.round(pts[:, :2] / step).astype(np.int64)
    _, first = np.unique(keys[:, 0] * 10000 + keys[:, 1], return_index=True)
    return pts[np.sort(first)]


class TestSparseWarpField:
    def test_edg_recovers_smooth_deformation(self, rng):
        src = surface(rng)
        dst = smooth_bend(src)
        nodes = control_nodes(src)
        graph = build_deformation_graph(
            jnp.asarray(src), jnp.asarray(nodes), k_anchors=4, k_arcs=6
        )
        node_tf, iters, converged = icp_warp_field(
            graph,
            jnp.asarray(src),
            jnp.asarray(dst),
            max_corr_dist_sq=0.04,
            point_weight=1.0,
            plane_weight=0.0,
            stiffness=10.0,
            max_iterations=12,
            convergence_tol=1e-4,
            max_cg_iterations=60,
        )
        warped = np.asarray(warp_points(graph, node_tf, jnp.asarray(src)))
        err = np.linalg.norm(warped - dst, axis=1)
        # Non-rigid residual well below the deformation magnitude (~0.06).
        assert np.median(err) < 0.01
        assert np.mean(err) < 0.015

    def test_identity_when_aligned(self, rng):
        src = surface(rng, n=800)
        nodes = control_nodes(src)
        graph = build_deformation_graph(jnp.asarray(src), jnp.asarray(nodes))
        node_tf, _, _ = icp_warp_field(
            graph,
            jnp.asarray(src),
            jnp.asarray(src),
            max_corr_dist_sq=0.04,
            point_weight=1.0,
            plane_weight=0.0,
            stiffness=10.0,
            max_iterations=5,
            max_cg_iterations=60,
        )
        lin = np.asarray(node_tf.linear)
        tr = np.asarray(node_tf.translation)
        eye = np.eye(3)[None]
        assert np.abs(lin - eye).max() < 1e-3
        assert np.abs(tr).max() < 1e-3


class TestDenseWarpField:
    def test_dense_recovers_translation_field(self, rng):
        src = surface(rng, n=600)
        dst = src + np.float32([0.0, 0.0, 0.03])  # constant lift
        graph = build_dense_graph(jnp.asarray(src), k_arcs=6)
        node_tf, _, _ = icp_warp_field(
            graph,
            jnp.asarray(src),
            jnp.asarray(dst),
            max_corr_dist_sq=0.04,
            point_weight=1.0,
            plane_weight=0.0,
            stiffness=5.0,
            max_iterations=10,
            max_cg_iterations=60,
        )
        warped = np.asarray(warp_points(graph, node_tf, jnp.asarray(src)))
        err = np.linalg.norm(warped - dst, axis=1)
        assert np.median(err) < 0.005


class TestResample:
    def test_blend_of_identical_transforms(self, rng):
        tf = identity_warp(10)
        ang = 0.3
        r = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
            np.float32,
        )
        tf = tf.__class__(
            jnp.broadcast_to(jnp.asarray(r), (10, 3, 3)),
            jnp.broadcast_to(jnp.asarray(np.float32([1, 2, 3])), (10, 3)),
        )
        idx = jnp.asarray(rng.integers(0, 10, (5, 4)).astype(np.int32))
        w = jnp.full((5, 4), 0.25)
        out = resample_transforms(tf, idx, w)
        np.testing.assert_allclose(np.asarray(out.linear), np.tile(r, (5, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.translation), np.tile([1, 2, 3], (5, 1)), atol=1e-5
        )


class TestAffineWarpField:
    def test_affine_nodes_recover_local_scaling(self, rng):
        # A deformation with local stretch (not representable exactly by
        # blended rigid nodes): x-dependent scaling of y.
        src = surface(rng, n=1000)
        dst = src.copy()
        dst[:, 1] *= 1.0 + 0.08 * np.clip(src[:, 0], 0, 1)
        nodes = control_nodes(src)
        graph = build_deformation_graph(
            jnp.asarray(src), jnp.asarray(nodes), k_anchors=4, k_arcs=6
        )
        node_tf, _, _ = icp_warp_field(
            graph,
            jnp.asarray(src),
            jnp.asarray(dst),
            max_corr_dist_sq=0.04,
            point_weight=1.0,
            plane_weight=0.0,
            stiffness=5.0,
            max_iterations=12,
            max_cg_iterations=60,
            node_type="affine",
        )
        warped = np.asarray(warp_points(graph, node_tf, jnp.asarray(src)))
        err = np.linalg.norm(warped - dst, axis=1)
        assert np.median(err) < 0.01
        # Affine linear parts are NOT rotations (local scaling captured).
        lin = np.asarray(node_tf.linear)
        dets = np.linalg.det(lin)
        assert np.abs(dets - 1.0).max() > 1e-3


class TestProjectiveWarpField:
    def test_projective_recovers_deformation(self, rng):
        """Recover a smooth bend through PROJECTIVE correspondences on an
        organized frame (reference icp_common_instances.hpp:246-335)."""
        from cilantro_tpu.core.rgbd import (
            CameraIntrinsics,
            depth_to_points_normals,
        )
        from cilantro_tpu.registration import icp_warp_field_projective

        K = CameraIntrinsics.make(80.0, 80.0, 31.5, 23.5)
        H, W = 48, 64
        v, u = np.mgrid[0:H, 0:W].astype(np.float32)
        depth = 1.2 + 0.04 * np.sin(0.25 * u) + 0.03 * np.cos(0.2 * v)
        src, src_nrm, src_ok = depth_to_points_normals(
            jnp.asarray(depth.astype(np.float32)), K
        )
        src_np = np.asarray(src)
        # Smooth deformation in camera space (z-bend along x).
        dst_np = src_np.copy()
        dst_np[:, 2] += 0.03 * np.sin(2.5 * src_np[:, 0])
        nodes = control_nodes(src_np[np.asarray(src_ok)], step=0.15)
        graph = build_deformation_graph(
            jnp.asarray(src_np), jnp.asarray(nodes), k_anchors=4, k_arcs=6
        )
        node_tf, iters, converged = icp_warp_field_projective(
            graph,
            src,
            jnp.asarray(dst_np),
            K,
            height=H,
            width=W,
            src_valid=src_ok,
            dst_valid=src_ok,
            max_corr_dist_sq=0.01,
            point_weight=1.0,
            plane_weight=0.0,
            stiffness=5.0,
            max_iterations=12,
            convergence_tol=1e-4,
            max_cg_iterations=60,
        )
        warped = np.asarray(warp_points(graph, node_tf, src))
        ok = np.asarray(src_ok)
        err = np.linalg.norm(warped[ok] - dst_np[ok], axis=1)
        base = np.linalg.norm(src_np[ok] - dst_np[ok], axis=1)
        assert np.median(err) < 0.25 * np.median(base)
        assert np.median(err) < 5e-3


def test_direct_solver_matches_cg():
    """The dense-assembly direct solver and matrix-free CG solve the same
    damped normal equations: one GN step must agree to CG tolerance, for
    rigid and affine node types."""
    import numpy as np
    import jax.numpy as jnp

    from cilantro_tpu.registration.warp_field import (
        build_deformation_graph,
        estimate_warp_field,
    )

    rng = np.random.default_rng(11)
    src = rng.uniform(-0.5, 0.5, (600, 3)).astype(np.float32)
    dst = src + 0.01 * np.sin(4.0 * src[:, :1]) * np.array(
        [0.0, 0.0, 1.0], np.float32
    )
    nodes = rng.uniform(-0.5, 0.5, (40, 3)).astype(np.float32)
    graph = build_deformation_graph(
        jnp.asarray(src), jnp.asarray(nodes), k_anchors=4, k_arcs=6
    )
    w = jnp.ones(len(src), jnp.float32)
    for node_type in ("rigid", "affine"):
        tf_d, _, cg_d = estimate_warp_field(
            graph, jnp.asarray(src), jnp.asarray(dst), None, w,
            point_weight=1.0, plane_weight=0.0, stiffness=10.0,
            max_gn_iterations=1, solver="direct", node_type=node_type,
        )
        tf_c, _, cg_c = estimate_warp_field(
            graph, jnp.asarray(src), jnp.asarray(dst), None, w,
            point_weight=1.0, plane_weight=0.0, stiffness=10.0,
            max_gn_iterations=1, solver="cg", cg_tol=1e-7,
            node_type=node_type,
        )
        assert int(cg_d) == 0 and int(cg_c) > 0
        np.testing.assert_allclose(
            np.asarray(tf_d.translation), np.asarray(tf_c.translation),
            atol=5e-5, err_msg=node_type,
        )
        np.testing.assert_allclose(
            np.asarray(tf_d.linear), np.asarray(tf_c.linear), atol=5e-5,
            err_msg=node_type,
        )


def test_direct_solver_plane_metric_matches_cg():
    import numpy as np
    import jax.numpy as jnp

    from cilantro_tpu.registration.warp_field import (
        build_deformation_graph,
        estimate_warp_field,
    )

    rng = np.random.default_rng(12)
    src = rng.uniform(-0.5, 0.5, (500, 3)).astype(np.float32)
    src[:, 2] = 0.1 * np.sin(3 * src[:, 0])
    dst = src + np.array([0.0, 0.0, 0.005], np.float32)
    nrm = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (500, 1))
    nodes = rng.uniform(-0.5, 0.5, (32, 3)).astype(np.float32)
    nodes[:, 2] = 0.0
    graph = build_deformation_graph(
        jnp.asarray(src), jnp.asarray(nodes), k_anchors=4, k_arcs=6
    )
    w = jnp.ones(len(src), jnp.float32)
    kw = dict(point_weight=0.1, plane_weight=1.0, stiffness=10.0,
              max_gn_iterations=1)
    tf_d, _, _ = estimate_warp_field(
        graph, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(nrm), w,
        solver="direct", **kw)
    tf_c, _, _ = estimate_warp_field(
        graph, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(nrm), w,
        solver="cg", cg_tol=1e-7, **kw)
    np.testing.assert_allclose(
        np.asarray(tf_d.translation), np.asarray(tf_c.translation), atol=5e-5
    )


def test_batched_warp_matches_single_streams(rng):
    """icp_warp_field_batched (shared template/EDG, B targets, one batched
    direct GN) must match B independent icp_warp_field solves (VERDICT r3
    task #2's aggregate path)."""
    from cilantro_tpu.core.containers import PointCloud
    from cilantro_tpu.core.grid import grid_downsample
    from cilantro_tpu.registration import (
        build_deformation_graph,
        icp_warp_field,
        icp_warp_field_batched,
        warp_points,
        warp_points_batched,
    )

    n, bsz = 4000, 3
    src = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    src[:, 2] *= 0.1
    dsts = []
    for b in range(bsz):
        d = src.copy()
        d[:, 2] += 0.015 * np.sin((4 + b) * src[:, 0])
        d[:, 1] += 0.008 * np.cos((3 + b) * src[:, 0])
        dsts.append(d)
    srcj = jnp.asarray(src)
    dstj = jnp.asarray(np.stack(dsts))
    ctrl = grid_downsample(PointCloud(points=srcj), 0.1, capacity=128)
    graph = build_deformation_graph(
        srcj, ctrl.points, node_valid=ctrl.valid, k_anchors=4, k_arcs=8
    )
    kw = dict(
        max_corr_dist_sq=0.0025, point_weight=1.0, plane_weight=0.0,
        stiffness=50.0, max_iterations=6,
    )
    tfb, _, conv = icp_warp_field_batched(graph, srcj, dstj, **kw)
    wb = np.asarray(warp_points_batched(graph, tfb, srcj))
    assert np.asarray(conv).all()
    for b in range(bsz):
        tf_s, _, _ = icp_warp_field(
            graph, srcj, jnp.asarray(dsts[b]), solver="direct", **kw
        )
        ws = np.asarray(warp_points(graph, tf_s, srcj))
        agree = np.median(np.linalg.norm(ws - wb[:, b], axis=1))
        err = np.median(np.linalg.norm(wb[:, b] - dsts[b], axis=1))
        assert agree < 1e-4, f"stream {b}: {agree}"
        assert err < 5e-3, f"stream {b}: recovery {err}"


def test_batched_gn_matches_single_plane_metric(rng):
    """One batched GN step with NORMALS (plane + point weights, closed-form
    assembly incl. the bn_k bn_l^T rank-1 term) equals B single GN steps."""
    from cilantro_tpu.core.containers import PointCloud
    from cilantro_tpu.core.grid import grid_downsample
    from cilantro_tpu.registration import build_deformation_graph
    from cilantro_tpu.registration.warp_field import estimate_warp_field
    from cilantro_tpu.registration.warp_field_batched import (
        estimate_warp_field_batched,
    )

    n, bsz = 3000, 2
    src = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    src[:, 2] *= 0.2
    dst = np.stack(
        [src + 0.01 * rng.standard_normal((n, 3)).astype(np.float32)
         for _ in range(bsz)]
    )
    nrm = rng.standard_normal((bsz, n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    w = (rng.random((bsz, n)) > 0.2).astype(np.float32)
    srcj = jnp.asarray(src)
    ctrl = grid_downsample(PointCloud(points=srcj), 0.12, capacity=128)
    graph = build_deformation_graph(
        srcj, ctrl.points, node_valid=ctrl.valid, k_anchors=4, k_arcs=8
    )
    kw = dict(point_weight=0.3, plane_weight=1.0, stiffness=20.0,
              max_gn_iterations=1)
    tfb, _ = estimate_warp_field_batched(
        graph, srcj,
        jnp.asarray(dst.transpose(1, 0, 2)),
        jnp.asarray(nrm.transpose(1, 0, 2)),
        jnp.asarray(w.T),
        **kw,
    )
    for b in range(bsz):
        tfs, _, _ = estimate_warp_field(
            graph, srcj, jnp.asarray(dst[b]), jnp.asarray(nrm[b]),
            jnp.asarray(w[b]), solver="direct", **kw,
        )
        np.testing.assert_allclose(
            np.asarray(tfb.translation[b]), np.asarray(tfs.translation),
            atol=2e-5, err_msg=f"stream {b} translation",
        )
        np.testing.assert_allclose(
            np.asarray(tfb.linear[b]), np.asarray(tfs.linear),
            atol=2e-5, err_msg=f"stream {b} rotation",
        )


def test_sorted_assembly_matches_wide_gather_path(rng):
    """r5 narrow-input sorted assembly vs the r4 wide-gather path: same
    graph, same correspondences, same direct GN -> near-identical node
    transforms (reduction order differs only within segments)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from cilantro_tpu.registration import build_deformation_graph
    from cilantro_tpu.registration.warp_field import estimate_warp_field

    n, m_nodes = 4000, 64
    src = rng.random((n, 3)).astype(np.float32)
    nodes = rng.random((m_nodes, 3)).astype(np.float32)
    graph = build_deformation_graph(
        src, jnp.asarray(nodes), k_anchors=4, k_arcs=6
    )
    assert graph.ps_kkf is not None  # sorted caches built
    dst = src + 0.01 * rng.standard_normal((n, 3)).astype(np.float32)
    nrm = rng.standard_normal((n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    w = (rng.random(n) > 0.1).astype(np.float32)
    stripped = dataclasses.replace(
        graph, ps_kkf=None, ps_llf=None, ps_w2=None, ps_swap=None,
        ps_seg=None, arc_sorted_order=None, arc_sorted_seg=None,
    )
    kw = dict(point_weight=0.3, plane_weight=1.0, stiffness=20.0,
              max_gn_iterations=2, solver="direct")
    tf_new, _, _ = estimate_warp_field(
        graph, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(nrm),
        jnp.asarray(w), **kw
    )
    tf_old, _, _ = estimate_warp_field(
        stripped, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(nrm),
        jnp.asarray(w), **kw
    )
    np.testing.assert_allclose(
        np.asarray(tf_new.translation), np.asarray(tf_old.translation),
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tf_new.linear), np.asarray(tf_old.linear), atol=5e-5
    )
    # Point-weight-only variant (no normals) exercises the plane-free
    # entry list.
    kw2 = dict(point_weight=1.0, plane_weight=0.0, stiffness=20.0,
               max_gn_iterations=1, solver="direct")
    t1, _, _ = estimate_warp_field(
        graph, jnp.asarray(src), jnp.asarray(dst), None, jnp.asarray(w),
        **kw2
    )
    t2, _, _ = estimate_warp_field(
        stripped, jnp.asarray(src), jnp.asarray(dst), None,
        jnp.asarray(w), **kw2
    )
    np.testing.assert_allclose(
        np.asarray(t1.translation), np.asarray(t2.translation), atol=5e-5
    )


def test_affine_warp_general_dimension(rng):
    """VERDICT r4 missing #2: the reference's warp templates are general-
    Dim for the locally-affine parameterization
    (warp_field_estimation.hpp:717-995); so are ours — only the RIGID
    parameterization is inherently 2-D/3-D (rotations). Recover a smooth
    4-D deformation with both solvers."""
    import jax.numpy as jnp

    from cilantro_tpu.registration import build_deformation_graph
    from cilantro_tpu.registration.warp_field import (
        estimate_warp_field, warp_points,
    )

    d, n, m_nodes = 4, 3000, 48
    src = rng.random((n, d)).astype(np.float32)
    nodes = rng.random((m_nodes, d)).astype(np.float32)
    graph = build_deformation_graph(
        jnp.asarray(src), jnp.asarray(nodes), k_anchors=4, k_arcs=6
    )
    a_mat = np.eye(d, dtype=np.float32) + 0.05 * rng.standard_normal(
        (d, d)
    ).astype(np.float32)
    dst = src @ a_mat.T + 0.02 * np.sin(3.0 * src[:, :1])
    w = jnp.ones(n, jnp.float32)
    scale = np.median(np.linalg.norm(dst - src, axis=1))
    for solver in ("cg", "direct"):
        tf, _, _ = estimate_warp_field(
            graph, jnp.asarray(src), jnp.asarray(dst), None, w,
            point_weight=1.0, plane_weight=0.0, stiffness=5.0,
            max_gn_iterations=8, node_type="affine", solver=solver,
        )
        warped = np.asarray(warp_points(graph, tf, jnp.asarray(src)))
        err = np.median(np.linalg.norm(warped - dst, axis=1))
        assert err < 0.05 * scale, (solver, err, scale)


def test_bench_host_graph_matches_device_build():
    """The bench's numpy EDG graph builder must stay semantically
    identical to build_deformation_graph (it feeds the C++-comparison
    rows; a silent divergence would corrupt the denominators)."""
    import sys

    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import _bench_edg_graph_host

    from cilantro_tpu.utils import read_point_cloud

    src, _, _ = read_point_cloud(
        "/root/reference/examples/test_clouds/frame_1.ply"
    )
    src = src[::8]  # 15k points: keep the brute-force matrices small
    gh = _bench_edg_graph_host(src)
    # Device twin on the same voxel nodes (so anchor sets are comparable).
    from cilantro_tpu.registration import build_deformation_graph

    gd = build_deformation_graph(
        jnp.asarray(src), gh.node_positions, node_valid=gh.node_valid,
        k_anchors=4, k_arcs=8,
    )
    assert int(jnp.sum(gh.node_valid)) == int(jnp.sum(gd.node_valid))
    # Anchor sets agree point-wise (ordering may differ on exact ties).
    ah = np.sort(np.asarray(gh.anchors), axis=1)
    ad = np.sort(np.asarray(gd.anchors), axis=1)
    same = (ah == ad).all(axis=1)
    assert same.mean() > 0.999
    # Weights agree wherever the anchor sets do (exact-tie rows excluded).
    np.testing.assert_allclose(
        np.sort(np.asarray(gh.anchor_weights), axis=1)[same],
        np.sort(np.asarray(gd.anchor_weights), axis=1)[same],
        atol=2e-4,
    )
