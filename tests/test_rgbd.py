"""RGBD conversion + projective correspondence/ICP tests."""

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.core import (
    CameraIntrinsics,
    cloud_to_rgbd,
    depth_to_points,
    depth_to_points_normals,
    points_to_depth_image,
    points_to_index_map,
    rgbd_to_cloud,
)
from cilantro_tpu.core.containers import PointCloud


K = CameraIntrinsics.make(100.0, 100.0, 31.5, 23.5)
H, W = 48, 64


def synth_depth():
    """A slanted plane z = 1 + 0.002·u (valid everywhere)."""
    u = np.arange(W, dtype=np.float32)[None, :].repeat(H, 0)
    return 1.0 + 0.002 * u


class TestBackProjection:
    def test_roundtrip_project(self):
        depth = jnp.asarray(synth_depth())
        pts, valid = depth_to_points(depth, K)
        assert bool(jnp.all(valid))
        # Reproject: u = fx·x/z + cx must recover the pixel grid.
        p = np.asarray(pts).reshape(H, W, 3)
        u_re = 100.0 * p[..., 0] / p[..., 2] + 31.5
        v_re = 100.0 * p[..., 1] / p[..., 2] + 23.5
        uu, vv = np.meshgrid(np.arange(W), np.arange(H))
        np.testing.assert_allclose(u_re, uu, atol=1e-3)
        np.testing.assert_allclose(v_re, vv, atol=1e-3)

    def test_invalid_depth_masked(self):
        d = synth_depth()
        d[10:20, 10:20] = 0.0
        pts, valid = depth_to_points(jnp.asarray(d), K)
        v = np.asarray(valid).reshape(H, W)
        assert not v[15, 15]
        assert v[0, 0]

    def test_normals_of_plane(self):
        # Flat fronto-parallel plane: normals = (0, 0, -1) (toward camera).
        depth = jnp.asarray(np.full((H, W), 2.0, np.float32))
        pts, nrm, valid = depth_to_points_normals(depth, K)
        v = np.asarray(valid).reshape(H, W)
        assert v[5:-5, 5:-5].all()
        n = np.asarray(nrm).reshape(H, W, 3)[v.reshape(H, W)]
        np.testing.assert_allclose(n[:, 2], -1.0, atol=1e-5)

    def test_discontinuity_invalidates_normals(self):
        d = np.full((H, W), 2.0, np.float32)
        d[:, W // 2 :] = 1.0  # depth step
        _, _, valid = depth_to_points_normals(jnp.asarray(d), K)
        v = np.asarray(valid).reshape(H, W)
        assert not v[H // 2, W // 2]
        assert not v[H // 2, W // 2 - 1]
        assert v[H // 2, 5]


class TestRendering:
    def test_depth_roundtrip(self):
        depth = jnp.asarray(synth_depth())
        pts, valid = depth_to_points(depth, K)
        d2 = points_to_depth_image(pts, K, H, W, valid=valid)
        np.testing.assert_allclose(
            np.asarray(d2), np.asarray(depth), atol=1e-3
        )

    def test_zbuffer_keeps_closest(self):
        # Two points on the same pixel ray, different depths.
        pts = jnp.asarray(
            np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 1.0]], np.float32)
        )
        imap = points_to_index_map(pts, K, H, W)
        u, v = 31, 23  # ray through (cx, cy) rounds to this pixel
        hit = int(np.asarray(imap)[v + 1, u + 1]) if False else None
        m = np.asarray(imap)
        winners = m[m >= 0]
        assert len(winners) == 1 and winners[0] == 1  # closer point wins

    def test_rgbd_roundtrip_colors(self):
        depth = jnp.asarray(synth_depth())
        cols = np.zeros((H * W, 3), np.float32)
        cols[:, 0] = np.linspace(0, 1, H * W)
        pts, valid = depth_to_points(depth, K)
        cloud = PointCloud(points=pts, colors=jnp.asarray(cols), valid=valid)
        d_img, rgb = cloud_to_rgbd(cloud, K, H, W)
        np.testing.assert_allclose(
            np.asarray(rgb).reshape(-1, 3), cols, atol=1e-5
        )


class TestProjectiveICP:
    def test_recovers_small_motion(self):
        from cilantro_tpu.registration import icp_projective

        d = synth_depth() + 0.1 * np.sin(
            np.arange(H)[:, None] * 0.2
        ).astype(np.float32)
        depth = jnp.asarray(d)
        pts, nrm, valid = depth_to_points_normals(depth, K)
        ang = 0.01
        r = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
            np.float32,
        )
        t = np.array([0.005, -0.003, 0.004], np.float32)
        src = jnp.asarray(np.asarray(pts) @ r.T + t)
        # Recover the inverse motion mapping src back onto the rendered cloud.
        res = icp_projective(
            src,
            pts,
            K,
            height=H,
            width=W,
            src_normals=jnp.asarray(np.asarray(nrm) @ r.T),
            dst_normals=nrm,
            src_valid=valid,
            dst_valid=valid,
            max_iterations=10,
            convergence_tol=1e-7,
            max_corr_dist_sq=0.25,
            point_weight=0.1,
        )
        r_inv, t_inv = r.T, -r.T @ t
        assert np.linalg.norm(np.asarray(res.transform.linear) - r_inv) < 1e-3
        assert np.linalg.norm(np.asarray(res.transform.translation) - t_inv) < 1e-3


def test_zbuffer_grouped_large_capacity(rng):
    """Grouped scatter-min path (capacity > 2^20): winners must match the
    per-pixel minimum depth within one quantization bucket."""
    import jax.numpy as jnp
    import numpy as np

    from cilantro_tpu.core.rgbd import CameraIntrinsics, _zbuffer_winner

    n = (1 << 20) + 4096  # forces two groups
    pts = np.column_stack(
        [
            rng.uniform(-1, 1, n),
            rng.uniform(-0.7, 0.7, n),
            rng.uniform(1.0, 3.0, n),
        ]
    ).astype(np.float32)
    K = CameraIntrinsics.make(60.0, 60.0, 47.5, 35.5)
    h, w = 72, 96
    imap, dep = _zbuffer_winner(jnp.asarray(pts), jnp.ones(n, bool), K, h, w)
    im = np.asarray(imap).reshape(-1)
    dp = np.asarray(dep).reshape(-1)
    hit = im >= 0
    assert hit.sum() == h * w  # dense random cloud covers every pixel
    assert (im[hit] >= 0).all() and (im[hit] < n).all()
    u = np.round(pts[:, 0] * 60.0 / pts[:, 2] + 47.5).astype(int)
    v = np.round(pts[:, 1] * 60.0 / pts[:, 2] + 35.5).astype(int)
    ok = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    zmin = np.full(h * w, np.inf)
    np.minimum.at(zmin, (v[ok] * w + u[ok]), pts[ok, 2])
    bucket = 3.0 / (1 << 11)  # z_max / 2^z_bits
    assert np.abs(dp[hit] - zmin[hit]).max() < bucket + 1e-5
    # Winner index consistency: the returned depth is the winner's depth.
    np.testing.assert_allclose(dp[hit], pts[im[hit], 2], rtol=0, atol=1e-6)
