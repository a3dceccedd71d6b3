"""RANSAC + clustering tests (golden recoveries on synthetic data)."""

import numpy as np
import jax
import jax.numpy as jnp

from cilantro_tpu.model_estimation import ransac_plane, ransac_transform
from cilantro_tpu.clustering import (
    connected_components,
    kmeans,
    mean_shift,
    edge_mask_from_evaluator,
)
from cilantro_tpu.neighbors import knn_search


class TestRANSAC:
    def test_plane_recovery(self, rng):
        # Plane z = 0.5 with 30% outliers.
        n = 1000
        pts = np.zeros((n, 3), np.float32)
        pts[:, :2] = rng.uniform(-1, 1, (n, 2))
        pts[:, 2] = 0.5 + rng.normal(0, 0.002, n)
        outliers = rng.uniform(-2, 2, (300, 3)).astype(np.float32)
        all_pts = np.vstack([pts, outliers])
        plane, res = ransac_plane(
            jax.random.PRNGKey(0), jnp.asarray(all_pts), 0.01,
            num_hypotheses=200,
        )
        nrm = np.asarray(plane.normal)
        off = float(plane.offset)
        assert abs(abs(nrm[2]) - 1.0) < 1e-2
        assert abs(off * np.sign(nrm[2]) + 0.5) < 1e-2
        assert int(res.num_inliers) > 900

    def test_transform_recovery_with_outlier_corrs(self, rng):
        n = 400
        src = rng.standard_normal((n, 3)).astype(np.float32)
        ang = 0.4
        r = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
            np.float32,
        )
        t = np.array([0.3, -0.2, 0.5], np.float32)
        dst = src @ r.T + t
        dst[:100] = rng.uniform(-3, 3, (100, 3))  # 25% wrong correspondences
        tf, res = ransac_transform(
            jax.random.PRNGKey(1), jnp.asarray(src), jnp.asarray(dst), 0.02,
            num_hypotheses=200,
        )
        assert np.linalg.norm(np.asarray(tf.linear) - r) < 1e-3
        assert np.linalg.norm(np.asarray(tf.translation) - t) < 1e-3
        assert int(res.num_inliers) >= 295


class TestKMeans:
    def test_three_blobs(self, rng):
        centers = np.array([[0, 0, 0], [5, 0, 0], [0, 5, 0]], np.float32)
        pts = np.concatenate(
            [c + 0.2 * rng.standard_normal((100, 3)) for c in centers]
        ).astype(np.float32)
        res = kmeans(jax.random.PRNGKey(0), jnp.asarray(pts), 3)
        labels = np.asarray(res.labels)
        # Each blob is one pure cluster.
        for b in range(3):
            blob = labels[b * 100 : (b + 1) * 100]
            assert (blob == blob[0]).all()
        assert len({labels[0], labels[100], labels[200]}) == 3
        # Centroids near blob centers (order-free).
        cents = np.asarray(res.centroids)
        for c in centers:
            assert np.min(np.linalg.norm(cents - c, axis=1)) < 0.1

    def test_masked_points_ignored(self, rng):
        pts = np.vstack(
            [
                rng.standard_normal((50, 2)).astype(np.float32) * 0.1,
                np.full((10, 2), 100.0, np.float32),
            ]
        )
        valid = np.arange(60) < 50
        res = kmeans(
            jax.random.PRNGKey(0), jnp.asarray(pts), 2, valid=jnp.asarray(valid)
        )
        cents = np.asarray(res.centroids)
        assert np.all(np.abs(cents) < 5.0)  # no centroid at the junk points


class TestMeanShift:
    def test_two_modes(self, rng):
        pts = np.concatenate(
            [
                0.05 * rng.standard_normal((80, 2)),
                [[3.0, 3.0]] + 0.05 * rng.standard_normal((80, 2)),
            ]
        ).astype(np.float32)
        res = mean_shift(jnp.asarray(pts), radius=1.0)
        assert int(res.num_clusters) == 2
        labels = np.asarray(res.labels)
        assert (labels[:80] == labels[0]).all()
        assert (labels[80:] == labels[80]).all()
        assert labels[0] != labels[80]


class TestConnectedComponents:
    def test_two_strips(self, rng):
        # Two parallel line strips, separated by 1.0, point spacing 0.1.
        a = np.column_stack([np.arange(50) * 0.1, np.zeros(50)]).astype(np.float32)
        b = np.column_stack([np.arange(50) * 0.1, np.ones(50) * 1.0]).astype(
            np.float32
        )
        pts = jnp.asarray(np.vstack([a, b]))
        nb = knn_search(pts, pts, 4, exclude_self=True)
        em = edge_mask_from_evaluator(nb, pts, max_distance=0.3)
        cc = connected_components(nb, edge_mask=em)
        assert int(cc.num_components) == 2
        labels = np.asarray(cc.labels)
        assert (labels[:50] == labels[0]).all()
        assert (labels[50:] == labels[50]).all()
        assert labels[0] != labels[50]
        sizes = np.asarray(cc.sizes)
        assert sizes[0] == 50 and sizes[1] == 50 and sizes[2] == 0

    def test_min_size_filter(self, rng):
        big = rng.standard_normal((60, 3)).astype(np.float32) * 0.01
        small = (big[:3] + 50.0).astype(np.float32)
        pts = jnp.asarray(np.vstack([big, small]))
        nb = knn_search(pts, pts, 5, exclude_self=True)
        em = edge_mask_from_evaluator(nb, pts, max_distance=1.0)
        cc = connected_components(nb, edge_mask=em, min_size=10)
        labels = np.asarray(cc.labels)
        assert int(cc.num_components) == 1
        assert (labels[60:] == -1).all()
        assert (labels[:60] == 0).all()

    def test_normal_gate_splits_surfaces(self, rng):
        # An L: floor + wall meeting at a corner; normal gate splits them.
        floor = np.column_stack(
            [np.linspace(0, 1, 40), np.zeros(40)]
        ).astype(np.float32)
        wall = np.column_stack(
            [np.ones(40), np.linspace(0, 1, 40)]
        ).astype(np.float32)
        pts = jnp.asarray(np.vstack([floor, wall]))
        normals = np.zeros((80, 2), np.float32)
        normals[:40, 1] = 1.0
        normals[40:, 0] = 1.0
        nb = knn_search(pts, pts, 4, exclude_self=True)
        em = edge_mask_from_evaluator(
            nb, pts, jnp.asarray(normals),
            max_distance=0.2, max_normal_angle=0.3,
        )
        cc = connected_components(nb, edge_mask=em)
        assert int(cc.num_components) == 2


def test_kmeans_custom_metric(rng):
    """k-means with the L1 and SO2 metrics (reference kmeans.hpp:9-13)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cilantro_tpu.clustering import kmeans

    blobs = np.concatenate(
        [c + rng.normal(0, 0.05, (100, 2)) for c in ([0, 0], [2, 0], [0, 2])]
    ).astype(np.float32)
    res = kmeans(jax.random.PRNGKey(0), jnp.asarray(blobs), 3, metric="l1")
    labels = np.asarray(res.labels)
    true = np.repeat(np.arange(3), 100)
    purity = sum(
        np.unique(labels[true == t], return_counts=True)[1].max()
        for t in range(3)
    )
    assert purity >= 295

    # SO2: angles on a circle, three angular clusters incl. wraparound.
    angs = np.concatenate(
        [c + rng.normal(0, 0.1, 80) for c in (0.0, 2.0, -2.0)]
    ).astype(np.float32)[:, None]
    res2 = kmeans(jax.random.PRNGKey(1), jnp.asarray(angs), 3, metric="so2")
    labels2 = np.asarray(res2.labels)
    true2 = np.repeat(np.arange(3), 80)
    purity2 = sum(
        np.unique(labels2[true2 == t], return_counts=True)[1].max()
        for t in range(3)
    )
    assert purity2 >= 230


def test_mean_shift_capped_matches_dense(rng):
    """max_neighbors path agrees with the dense path when caps suffice."""
    import jax.numpy as jnp

    from cilantro_tpu.clustering.mean_shift import mean_shift

    centers = np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.2, 0.0]], np.float32
    )
    pts = np.concatenate(
        [c + 0.05 * rng.standard_normal((120, 3)) for c in centers]
    ).astype(np.float32)
    dense = mean_shift(jnp.asarray(pts), 0.25)
    capped = mean_shift(jnp.asarray(pts), 0.25, max_neighbors=256)
    assert int(dense.num_clusters) == 3
    assert int(capped.num_clusters) == 3
    # Same partition (labels up to renumbering — both use min-index reps,
    # so they should be identical here).
    np.testing.assert_array_equal(
        np.asarray(dense.labels), np.asarray(capped.labels)
    )
    # Modes agree.
    md = np.asarray(dense.modes)[:3]
    mc = np.asarray(capped.modes)[:3]
    assert np.abs(md - mc).max() < 1e-3


def test_mean_shift_capped_overflow_flag(rng):
    # Dense ball with more in-radius neighbors than the cap trips the flag.
    import jax.numpy as jnp

    from cilantro_tpu.clustering.mean_shift import mean_shift

    pts = (0.01 * rng.standard_normal((400, 3))).astype(np.float32)
    res = mean_shift(jnp.asarray(pts), 0.25, max_neighbors=16)
    assert bool(res.overflowed)
    assert int(res.num_clusters) == 1
    # Ample cap on the same data: exact, flag clear.
    res2 = mean_shift(jnp.asarray(pts), 0.25, max_neighbors=512)
    assert not bool(res2.overflowed)
