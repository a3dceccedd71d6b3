import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilantro_tpu.core import from_numpy
from cilantro_tpu.core.covariance import (
    mean_and_covariance,
    mcd_mean_cov,
    neighborhood_mean_cov,
)
from cilantro_tpu.core.grid import grid_downsample, build_grid_bins
from cilantro_tpu.core.normals import estimate_normals_knn
from cilantro_tpu.core.pca import fit_pca


def test_mean_cov_matches_numpy(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    mean, cov, valid = mean_and_covariance(jnp.asarray(pts))
    np.testing.assert_allclose(mean, pts.mean(0), atol=1e-5)
    np.testing.assert_allclose(cov, np.cov(pts.T), atol=1e-4)
    assert bool(valid)


def test_mean_cov_masked(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    mask = np.arange(100) < 40
    mean, cov, valid = mean_and_covariance(jnp.asarray(pts), jnp.asarray(mask))
    np.testing.assert_allclose(mean, pts[:40].mean(0), atol=1e-5)
    np.testing.assert_allclose(cov, np.cov(pts[:40].T), atol=1e-4)


def test_mean_cov_too_few():
    pts = jnp.zeros((10, 3))
    mask = jnp.arange(10) < 2
    _, _, valid = mean_and_covariance(pts, mask)
    assert not bool(valid)


def test_mcd_rejects_outliers(rng):
    inliers = rng.normal(size=(80, 3)).astype(np.float32) * 0.1
    outliers = rng.normal(size=(20, 3)).astype(np.float32) * 10 + 5
    pts = np.concatenate([inliers, outliers])
    mean, cov, valid = mcd_mean_cov(jax.random.PRNGKey(0), jnp.asarray(pts))
    assert bool(valid)
    # Robust mean should be near the inlier center, not dragged to ~1.
    assert np.linalg.norm(np.asarray(mean)) < 0.3
    assert np.all(np.linalg.eigvalsh(np.asarray(cov)) < 0.1)


def test_normals_on_plane(rng):
    # Points on z=0 plane with small noise: normal should be ±z, curvature ~0.
    pts = np.zeros((500, 3), np.float32)
    pts[:, :2] = rng.uniform(-1, 1, size=(500, 2))
    pts[:, 2] = rng.normal(scale=1e-4, size=500)
    normals, curvature, valid = estimate_normals_knn(
        jnp.asarray(pts), k=10, view_point=jnp.asarray([0.0, 0.0, 5.0])
    )
    n = np.asarray(normals)
    assert np.all(np.asarray(valid))
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
    assert np.all(n[:, 2] > 0)  # flipped toward the view point
    assert np.asarray(curvature).max() < 1e-3


def test_normals_on_sphere(rng):
    v = rng.normal(size=(2000, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    normals, curvature, valid = estimate_normals_knn(
        jnp.asarray(v), k=12, view_point=jnp.asarray([0.0, 0.0, 0.0])
    )
    n = np.asarray(normals)
    # Normal should be radial (inward, toward origin view point).
    dots = np.abs(np.sum(n * v, axis=1))
    assert np.percentile(dots, 5) > 0.95


def test_grid_downsample_means(rng):
    pts = rng.uniform(0, 1, size=(1000, 3)).astype(np.float32)
    cloud = from_numpy(pts)
    ds = grid_downsample(cloud, 0.25)
    nb = int(np.asarray(ds.num_valid()))
    # Brute-force reference groupby.
    keys = np.floor(pts / 0.25).astype(int)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    assert nb == len(uniq)
    ref_means = np.zeros((len(uniq), 3))
    for i in range(len(uniq)):
        ref_means[i] = pts[inv == i].mean(0)
    got = np.asarray(ds.points)[np.asarray(ds.valid_mask())]
    got_sorted = got[np.lexsort(got.T)]
    ref_sorted = ref_means[np.lexsort(ref_means.T)]
    np.testing.assert_allclose(got_sorted, ref_sorted, atol=1e-5)


def test_grid_downsample_normals_sign_consistent(rng):
    # Two clusters of opposite-sign normals in the same voxel should average
    # to a unit normal, not cancel.
    pts = np.tile([[0.1, 0.1, 0.1]], (10, 1)).astype(np.float32)
    normals = np.tile([[0, 0, 1.0]], (10, 1)).astype(np.float32)
    normals[::2] *= -1
    cloud = from_numpy(pts, normals=normals)
    ds = grid_downsample(cloud, 1.0)
    mask = np.asarray(ds.valid_mask())
    assert mask.sum() == 1
    n = np.asarray(ds.normals)[mask][0]
    np.testing.assert_allclose(np.abs(n[2]), 1.0, atol=1e-5)


def test_grid_downsample_min_points(rng):
    pts = np.array([[0.1, 0.1, 0.1]] * 5 + [[3.0, 3.0, 3.0]], np.float32)
    ds = grid_downsample(from_numpy(pts), 1.0, min_points_in_bin=2)
    assert int(np.asarray(ds.num_valid())) == 1


def test_grid_bins_respect_validity(rng):
    pts = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
    valid = np.arange(50) < 30
    bins = build_grid_bins(jnp.asarray(pts), 0.2, jnp.asarray(valid))
    assert int(np.asarray(bins.counts).sum()) == 30


def test_pca_recovers_axes(rng):
    d = np.array([5.0, 1.0, 0.1])
    pts = (rng.normal(size=(5000, 3)) * d).astype(np.float32)
    pca = fit_pca(jnp.asarray(pts))
    ev = np.asarray(pca.eigenvalues)
    assert ev[0] > ev[1] > ev[2]
    np.testing.assert_allclose(np.sqrt(ev), d, rtol=0.1)
    v = np.asarray(pca.eigenvectors)
    np.testing.assert_allclose(np.abs(v), np.eye(3), atol=0.05)
    assert np.linalg.det(v) > 0
    # project/reconstruct roundtrip in full dim.
    proj = pca.project(jnp.asarray(pts[:10]), 3)
    rec = pca.reconstruct(proj)
    np.testing.assert_allclose(rec, pts[:10], atol=1e-3)


def test_neighborhood_cov_masked(rng):
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    idx = np.stack([np.arange(10), np.arange(10) + 5, np.arange(10) + 10], 1)
    mask = np.ones((10, 3), bool)
    mask[0, 2] = False
    mean, cov, valid = neighborhood_mean_cov(
        jnp.asarray(pts), jnp.asarray(idx), jnp.asarray(mask)
    )
    np.testing.assert_allclose(mean[0], pts[[0, 5]].mean(0), atol=1e-5)
    np.testing.assert_allclose(mean[1], pts[[1, 6, 11]].mean(0), atol=1e-5)


class TestPointCloudConvenience:
    def test_chained_ops(self, tmp_path, rng):
        import numpy as np
        import jax.numpy as jnp
        from cilantro_tpu.core.containers import PointCloud, from_numpy

        pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        cloud = from_numpy(pts)
        down = cloud.grid_downsampled(0.25)
        assert int(down.num_valid()) < 500
        with_n = down.with_normals_knn(k=8)
        assert with_n.normals is not None
        p = str(tmp_path / "c.ply")
        with_n.to_ply(p)
        back = PointCloud.from_ply(p)
        assert int(back.num_valid()) == int(with_n.num_valid())


def test_mcd_chi_square_gate(rng):
    """Chi-square inlier gate (covariance.hpp:352-359): a query point far
    outside the robust ellipse flips valid to False; an inlier query passes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    cloud = rng.standard_normal((100, 3)).astype(np.float32) * 0.1
    # Inlier query leads the set.
    pts_in = np.concatenate([cloud[:1], cloud[1:]], 0)
    _, _, valid_in = mcd_mean_cov(
        jax.random.PRNGKey(0), jnp.asarray(pts_in), chi_square_threshold=7.81
    )
    assert bool(valid_in)
    # Outlier query leads the set.
    pts_out = pts_in.copy()
    pts_out[0] = [5.0, 5.0, 5.0]
    _, _, valid_out = mcd_mean_cov(
        jax.random.PRNGKey(0), jnp.asarray(pts_out), chi_square_threshold=7.81
    )
    assert not bool(valid_out)


def test_grid_downsample_capacity_unbiased(rng):
    """Capacity overflow must not drop a spatial corner: with capacity for
    half the bins, kept bins must span the full extent of the cloud."""
    import jax.numpy as jnp
    import numpy as np

    from cilantro_tpu.core.containers import PointCloud
    from cilantro_tpu.core.grid import grid_downsample

    # 1D line of 64 voxels along x, equally occupied.
    pts = np.zeros((640, 3), np.float32)
    pts[:, 0] = np.repeat(np.arange(64), 10) * 0.1 + 0.05
    pts[:, 0] += rng.uniform(-0.03, 0.03, 640)
    out = grid_downsample(
        PointCloud(points=jnp.asarray(pts)), 0.1, capacity=32
    )
    kept = np.asarray(out.points)[np.asarray(out.valid)]
    # A lexicographic prefix would span only [0, 3.2); occupancy-based
    # selection keeps bins across the whole [0, 6.4) extent.
    assert kept[:, 0].max() > 4.0
    assert kept[:, 0].min() < 2.0


def test_pair_evaluators(rng):
    """Vectorized functor library vs hand-computed gates
    (common_pair_evaluators.hpp:14-259)."""
    import numpy as np
    import jax.numpy as jnp

    from cilantro_tpu.core import pair_evaluators as pe

    n = 50
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    nrm = rng.standard_normal((n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    i = jnp.asarray(rng.integers(0, n, 30))
    j = jnp.asarray(rng.integers(0, n, 30))
    d = jnp.sum((jnp.asarray(pts)[i] - jnp.asarray(pts)[j]) ** 2, axis=-1)

    w = pe.rbf_kernel_weight(0.5)(i, j, d)
    np.testing.assert_allclose(
        np.asarray(w), np.exp(-np.asarray(d) / (2 * 0.25)), rtol=1e-5
    )
    assert np.array_equal(
        np.asarray(pe.points_proximity(0.5)(i, j, d)), np.asarray(d) < 0.5
    )
    ang = np.arccos(
        np.clip((nrm[np.asarray(i)] * nrm[np.asarray(j)]).sum(-1), -1, 1)
    )
    got = np.asarray(pe.normals_proximity(jnp.asarray(nrm), 0.5)(i, j, d))
    assert np.array_equal(got, ang < 0.5)
    # Two-sided (negative threshold): orientation-invariant.
    got2 = np.asarray(pe.normals_proximity(jnp.asarray(nrm), -0.5)(i, j, d))
    assert np.array_equal(got2, np.minimum(ang, np.pi - ang) < 0.5)
    full = pe.points_normals_colors_proximity(
        jnp.asarray(nrm), jnp.asarray(cols), 0.5, 0.5, 0.2
    )
    cd = ((cols[np.asarray(i)] - cols[np.asarray(j)]) ** 2).sum(-1)
    expect = (np.asarray(d) < 0.5) & (ang < 0.5) & (cd < 0.04)
    assert np.array_equal(np.asarray(full(i, j, d)), expect)
