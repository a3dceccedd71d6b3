"""Offline visualization artifacts + SO2/SO3 metrics + robust normals."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from cilantro_tpu.core.containers import PointCloud, from_numpy
from cilantro_tpu.core.normals import estimate_normals_robust
from cilantro_tpu.neighbors import knn_search
from cilantro_tpu.viz import dump_artifacts, render_cloud_image


class TestMetrics:
    def test_so2_wraps(self):
        q = jnp.asarray(np.array([[0.1]], np.float32))
        keys = jnp.asarray(np.array([[6.2], [3.0]], np.float32))  # 6.2 ≈ −0.083
        nb = knn_search(q, keys, 1, metric="so2")
        assert int(nb.indices[0, 0]) == 0  # wrapped distance beats 3.0 rad

    def test_so3_sign_invariant(self):
        q = jnp.asarray(np.array([[1.0, 0, 0, 0]], np.float32))
        keys = jnp.asarray(
            np.array([[-1.0, 0, 0, 0], [0.0, 1.0, 0, 0]], np.float32)
        )
        nb = knn_search(q, keys, 2, metric="so3")
        # −q is the same rotation: distance 0, ranked first.
        assert int(nb.indices[0, 0]) == 0
        assert float(nb.distances[0, 0]) < 1e-6
        assert float(nb.distances[0, 1]) > 0.9


class TestRobustNormals:
    def test_outliers_do_not_tilt(self, rng):
        # A flat plane with 20% gross outliers mixed into neighborhoods.
        n = 400
        pts = np.zeros((n, 3), np.float32)
        pts[:, :2] = rng.uniform(-1, 1, (n, 2))
        out_idx = rng.choice(n, n // 5, replace=False)
        pts[out_idx, 2] = rng.uniform(0.5, 1.0, len(out_idx))
        inlier = np.ones(n, bool)
        inlier[out_idx] = False
        nrm, _, ok = estimate_normals_robust(
            jax.random.PRNGKey(0), jnp.asarray(pts), k=16,
            view_point=jnp.asarray(np.float32([0, 0, 10.0])),
        )
        nz = np.abs(np.asarray(nrm)[inlier & np.asarray(ok)][:, 2])
        # Robust fit keeps inlier normals on the plane normal.
        assert np.median(nz) > 0.99


class TestViz:
    def test_render_and_artifacts(self, tmp_path, rng):
        pts = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
        nrm = np.zeros_like(pts)
        nrm[:, 2] = 1.0
        cloud = from_numpy(pts, normals=nrm)
        img = render_cloud_image(cloud, h=120, w=160, color_by="normal")
        assert img.shape == (120, 160, 3)
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert (img != 1.0).any()  # something was rendered

        poses = []
        for i in range(5):
            p = np.eye(4, dtype=np.float32)
            p[:3, 3] = [i * 0.1, 0, 0]
            poses.append(p)
        dump_artifacts(str(tmp_path), cloud, poses, prefix="t")
        for name in ("t_map.ply", "t_map.png", "t_trajectory.png", "t_poses.npy"):
            assert os.path.exists(tmp_path / name), name


def test_correspondence_and_mesh_artifacts(tmp_path, rng):
    import numpy as np
    import jax.numpy as jnp

    from cilantro_tpu.correspondence.search import find_nn_correspondences
    from cilantro_tpu.spatial import ConvexPolytope
    from cilantro_tpu.viz.offline import (
        save_correspondences_png,
        save_mesh_png,
    )

    pts = rng.standard_normal((400, 3)).astype(np.float32)
    dst = pts + 0.01
    corr = find_nn_correspondences(jnp.asarray(pts), jnp.asarray(dst))
    p1 = str(tmp_path / "corr.png")
    save_correspondences_png(p1, pts, dst, corr, max_lines=50)
    assert (tmp_path / "corr.png").stat().st_size > 1000

    hull = ConvexPolytope.from_points(pts)
    p2 = str(tmp_path / "mesh.png")
    save_mesh_png(p2, hull.vertices, hull.faces)
    assert (tmp_path / "mesh.png").stat().st_size > 1000
