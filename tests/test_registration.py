"""Registration tests: golden closed-form fits + ground-truth recovery,
mirroring the reference's distort-transform-recover recipe
(``examples/rigid_icp.cpp:57-64,132-133``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cilantro_tpu.core.transforms import Transform
from cilantro_tpu.registration import (
    estimate_affine_combined_metric,
    estimate_affine_point_to_point,
    estimate_rigid_combined_metric,
    estimate_rigid_point_to_point,
    estimate_rigid_symmetric_metric,
    icp,
)


def random_rotation(rng, dim=3):
    a = rng.standard_normal((dim, dim))
    q, r = np.linalg.qr(a)
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, -1] *= -1
    return q


def make_pair(rng, n=500, dim=3, angle_scale=1.0, noise=0.0):
    src = rng.standard_normal((n, dim)).astype(np.float32)
    r = random_rotation(rng, dim)
    if angle_scale != 1.0:
        # Shrink toward identity for GN small-angle tests.
        from scipy.linalg import logm, expm

        r = np.real(expm(angle_scale * logm(r)))
    t = rng.standard_normal(dim).astype(np.float32) * 0.5
    dst = src @ r.T + t + noise * rng.standard_normal((n, dim)).astype(np.float32)
    return src, dst, r.astype(np.float32), t.astype(np.float32)


def rot_err(r_est, r_true):
    return np.linalg.norm(np.asarray(r_est) - r_true)


class TestClosedForm:
    def test_rigid_p2p_exact(self, rng):
        src, dst, r, t = make_pair(rng)
        tf, valid = estimate_rigid_point_to_point(jnp.asarray(src), jnp.asarray(dst))
        assert bool(valid)
        assert rot_err(tf.linear, r) < 1e-4
        assert np.linalg.norm(np.asarray(tf.translation) - t) < 1e-4

    def test_rigid_p2p_weighted_ignores_outliers(self, rng):
        src, dst, r, t = make_pair(rng, n=400)
        dst_bad = dst.copy()
        dst_bad[:50] += 100.0  # gross outliers
        w = np.ones(400, np.float32)
        w[:50] = 0.0
        tf, _ = estimate_rigid_point_to_point(
            jnp.asarray(src), jnp.asarray(dst_bad), jnp.asarray(w)
        )
        assert rot_err(tf.linear, r) < 1e-4

    def test_affine_p2p_exact(self, rng):
        n, d = 300, 3
        src = rng.standard_normal((n, d)).astype(np.float32)
        a = (np.eye(d) + 0.2 * rng.standard_normal((d, d))).astype(np.float32)
        t = rng.standard_normal(d).astype(np.float32)
        dst = src @ a.T + t
        tf, valid = estimate_affine_point_to_point(jnp.asarray(src), jnp.asarray(dst))
        assert bool(valid)
        assert np.abs(np.asarray(tf.linear) - a).max() < 1e-3
        assert np.abs(np.asarray(tf.translation) - t).max() < 1e-3

    def test_degenerate_invalid(self):
        src = jnp.zeros((10, 3))
        dst = jnp.zeros((10, 3))
        w = jnp.zeros(10)
        _, valid = estimate_rigid_point_to_point(src, dst, w)
        assert not bool(valid)


class TestGaussNewton:
    def _small_pair(self, rng, dim=3):
        src, dst, r, t = make_pair(rng, n=800, dim=dim, angle_scale=0.15)
        # Surface-like data conditions point-to-plane better: squash one axis.
        src[:, -1] *= 0.1
        dst = src @ r.T + t
        normals = np.zeros((800, dim), np.float32)
        normals[:, -1] = 1.0
        nrm = normals @ r.T  # true dst normals
        return src, dst, nrm, r, t

    def test_combined_metric_3d_recovers(self, rng):
        src, dst, nrm, r, t = self._small_pair(rng)
        tf, valid = estimate_rigid_combined_metric(
            jnp.asarray(src),
            jnp.asarray(dst),
            jnp.asarray(nrm),
            point_weights=jnp.full(len(src), 0.1),
            plane_weights=jnp.ones(len(src)),
            max_iterations=20,
            convergence_tol=1e-9,
        )
        assert bool(valid)
        assert rot_err(tf.linear, r) < 1e-3
        assert np.linalg.norm(np.asarray(tf.translation) - t) < 1e-3

    def test_combined_metric_2d_recovers(self, rng):
        theta, tx, ty = 0.3, 0.5, -0.2
        r = np.array(
            [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
            np.float32,
        )
        t = np.array([tx, ty], np.float32)
        src = rng.standard_normal((500, 2)).astype(np.float32)
        dst = src @ r.T + t
        nrm = rng.standard_normal((500, 2)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        tf, _ = estimate_rigid_combined_metric(
            jnp.asarray(src),
            jnp.asarray(dst),
            jnp.asarray(nrm),
            point_weights=jnp.ones(500),
            plane_weights=jnp.ones(500),
            max_iterations=20,
            convergence_tol=1e-9,
        )
        assert rot_err(tf.linear, r) < 1e-3
        assert np.linalg.norm(np.asarray(tf.translation) - t) < 1e-3

    def test_symmetric_metric_recovers(self, rng):
        src, dst, nrm_dst, r, t = self._small_pair(rng)
        nrm_src = np.zeros_like(src)
        nrm_src[:, -1] = 1.0
        tf, _ = estimate_rigid_symmetric_metric(
            jnp.asarray(src),
            jnp.asarray(dst),
            jnp.asarray(nrm_src),
            jnp.asarray(nrm_dst),
            point_weights=jnp.full(len(src), 0.1),
            plane_weights=jnp.ones(len(src)),
            max_iterations=20,
            convergence_tol=1e-9,
        )
        assert rot_err(tf.linear, r) < 1e-3
        assert np.linalg.norm(np.asarray(tf.translation) - t) < 1e-3

    def test_affine_combined_exact(self, rng):
        n, d = 600, 3
        src = rng.standard_normal((n, d)).astype(np.float32)
        a = (np.eye(d) + 0.1 * rng.standard_normal((d, d))).astype(np.float32)
        t = rng.standard_normal(d).astype(np.float32) * 0.3
        dst = src @ a.T + t
        nrm = rng.standard_normal((n, d)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        tf, _ = estimate_affine_combined_metric(
            jnp.asarray(src),
            jnp.asarray(dst),
            jnp.asarray(nrm),
            point_weights=jnp.ones(n),
            plane_weights=jnp.ones(n),
        )
        assert np.abs(np.asarray(tf.linear) - a).max() < 1e-3
        assert np.abs(np.asarray(tf.translation) - t).max() < 1e-3


class TestICP:
    def _cloud(self, rng, n=2000):
        # Smooth-ish surface: grid + height field, so NN matching is meaningful.
        xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
        z = (0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])).astype(np.float32)
        return np.column_stack([xy, z])

    def test_point_to_point_icp_recovers(self, rng):
        pts = self._cloud(rng)
        angle = 0.05
        r = np.array(
            [
                [np.cos(angle), -np.sin(angle), 0],
                [np.sin(angle), np.cos(angle), 0],
                [0, 0, 1],
            ],
            np.float32,
        )
        t = np.array([0.02, -0.01, 0.015], np.float32)
        dst = pts @ r.T + t
        res = icp(
            jnp.asarray(pts),
            jnp.asarray(dst),
            metric="point_to_point",
            max_corr_dist_sq=0.25,
            max_iterations=30,
            convergence_tol=1e-7,
        )
        assert rot_err(res.transform.linear, r) < 1e-3
        assert np.linalg.norm(np.asarray(res.transform.translation) - t) < 1e-3
        assert int(res.num_correspondences) > 1500

    def test_combined_icp_with_normals_recovers(self, rng):
        from cilantro_tpu.core.normals import estimate_normals_knn

        pts = self._cloud(rng)
        angle = 0.04
        r = np.array(
            [
                [1, 0, 0],
                [0, np.cos(angle), -np.sin(angle)],
                [0, np.sin(angle), np.cos(angle)],
            ],
            np.float32,
        )
        t = np.array([-0.01, 0.02, 0.01], np.float32)
        dst = pts @ r.T + t
        dn, _, _ = estimate_normals_knn(jnp.asarray(dst), k=10, view_point=jnp.array([0.0, 0.0, 5.0]))
        res = icp(
            jnp.asarray(pts),
            jnp.asarray(dst),
            dst_normals=dn,
            metric="combined",
            max_corr_dist_sq=0.25,
            max_iterations=30,
            convergence_tol=1e-7,
        )
        assert rot_err(res.transform.linear, r) < 2e-3
        assert np.linalg.norm(np.asarray(res.transform.translation) - t) < 2e-3

    def test_icp_trimming_survives_outliers(self, rng):
        pts = self._cloud(rng, n=1500)
        dst = pts + np.float32([0.01, 0.0, -0.01])
        # Corrupt 20% of dst with junk far away.
        junk = rng.uniform(5, 6, (300, 3)).astype(np.float32)
        dst_all = np.vstack([dst, junk])
        res = icp(
            jnp.asarray(pts),
            jnp.asarray(dst_all),
            metric="point_to_point",
            max_corr_dist_sq=0.25,
            inlier_fraction=0.8,
            max_iterations=20,
        )
        assert np.linalg.norm(
            np.asarray(res.transform.translation) - [0.01, 0.0, -0.01]
        ) < 1e-3


class TestCorrespondences:
    def test_one_to_one(self, rng):
        from cilantro_tpu.correspondence import find_nn_correspondences

        dst = np.array([[0.0, 0, 0], [10, 0, 0]], np.float32)
        src = np.array([[0.1, 0, 0], [0.2, 0, 0], [10.1, 0, 0]], np.float32)
        corr = find_nn_correspondences(
            jnp.asarray(src), jnp.asarray(dst), one_to_one=True, max_distance=None
        )
        mask = np.asarray(corr.mask)
        # src0 (closest to dst0) and src2 kept; src1 dropped.
        assert mask.tolist() == [True, False, True]

    def test_reciprocal(self, rng):
        from cilantro_tpu.correspondence import (
            find_nn_correspondences_bidirectional,
        )

        src = np.array([[0.0, 0, 0], [1.0, 0, 0]], np.float32)
        dst = np.array([[0.1, 0, 0], [0.9, 0, 0], [0.95, 0, 0]], np.float32)
        corr = find_nn_correspondences_bidirectional(
            jnp.asarray(src), jnp.asarray(dst), require_reciprocal=True,
            max_distance=None,
        )
        m = np.asarray(corr.mask)
        idx = np.asarray(corr.dst_idx)
        assert m[0] and idx[0] == 0
        # src1's NN is dst2 (0.95) and dst2's NN is src1 → reciprocal.
        assert m[1] and idx[1] == 2

    def test_oracle_gates_distance(self):
        from cilantro_tpu.correspondence import oracle_correspondences

        src = jnp.asarray(np.array([[0.0, 0, 0], [1, 0, 0]], np.float32))
        dst = jnp.asarray(np.array([[0.05, 0, 0], [5, 0, 0]], np.float32))
        corr = oracle_correspondences(
            src, dst, jnp.array([0, 1]), jnp.array([True, True]), max_distance=0.1
        )
        assert np.asarray(corr.mask).tolist() == [True, False]


class TestMultiresICP:
    def test_multires_recovers(self, rng):
        # Dense surface; coarse level at 0.1 voxels then full-res polish.
        xy = rng.uniform(-1, 1, (3000, 2)).astype(np.float32)
        z = (0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])).astype(np.float32)
        pts = np.column_stack([xy, z])
        ang = 0.04
        r = np.array(
            [
                [np.cos(ang), -np.sin(ang), 0],
                [np.sin(ang), np.cos(ang), 0],
                [0, 0, 1],
            ],
            np.float32,
        )
        t = np.array([0.02, -0.01, 0.01], np.float32)
        dst = pts @ r.T + t
        from cilantro_tpu.registration import icp_multires

        res = icp_multires(
            jnp.asarray(pts),
            jnp.asarray(dst),
            metric="point_to_point",
            levels=((0.1, 8, 2048, 0.09), (None, 15, None, 0.01)),
            convergence_tol=1e-7,
        )
        assert rot_err(res.transform.linear, r) < 1e-3
        assert np.linalg.norm(np.asarray(res.transform.translation) - t) < 1e-3


def test_two_engine_combined_correspondences(rng):
    """Combiner parity (correspondence_search_combined_metric_combiner.hpp):
    p2p matches from point features, p2plane from point+normal features, fed
    jointly to the combined-metric GN — recovers a known small transform."""
    import numpy as np
    import jax.numpy as jnp

    from cilantro_tpu.correspondence.search import (
        combine_metric_correspondences,
        find_nn_correspondences,
        point_features,
        point_normal_features,
    )
    from cilantro_tpu.registration.transform_estimation import (
        estimate_rigid_combined_metric,
    )
    from cilantro_tpu.core.transforms import Transform

    n = 3000
    xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    z = (0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])).astype(np.float32)
    dst = np.column_stack([xy, z])
    dzdx = 0.6 * np.cos(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
    dzdy = -0.6 * np.sin(2 * xy[:, 0]) * np.sin(2 * xy[:, 1])
    nrm = np.column_stack([-dzdx, -dzdy, np.ones(n)]).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

    ang = 0.01
    r = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    t = np.array([0.004, -0.002, 0.003], np.float32)
    src = (dst - t) @ r
    src_n = nrm @ r

    sj, dj, nj, snj = map(jnp.asarray, (src, dst, nrm, src_n))
    # Engine 1: plain point features for the p2p metric.
    c_pp = find_nn_correspondences(point_features(sj), point_features(dj))
    # Engine 2: point+normal features for the p2plane metric.
    c_pl = find_nn_correspondences(
        point_normal_features(sj, snj, 0.3),
        point_normal_features(dj, nj, 0.3),
    )
    d_pts, d_nrm, w_pp, w_pl = combine_metric_correspondences(
        c_pp, c_pl, dj, nj, point_weight=0.1, plane_weight=1.0
    )
    sj2 = jnp.concatenate([sj, sj])
    tf = Transform(jnp.eye(3), jnp.zeros(3))
    for _ in range(8):
        delta, ok = estimate_rigid_combined_metric(
            tf.apply(sj2), d_pts, d_nrm,
            point_weights=w_pp, plane_weights=w_pl,
        )
        from cilantro_tpu.core.transforms import compose, reproject_rigid

        tf = reproject_rigid(compose(delta, tf))
    assert np.abs(np.asarray(tf.linear) - r).max() < 2e-3
    assert np.abs(np.asarray(tf.translation) - t).max() < 2e-3
