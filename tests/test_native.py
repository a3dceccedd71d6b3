"""Native C++ component tests (PLY codec vs the Python parser)."""

import numpy as np
import pytest

from cilantro_tpu.native import (
    native_available,
    ply_read_native,
    ply_write_native,
)
from cilantro_tpu.utils.ply_io import read_ply


needs_native = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


@needs_native
def test_native_roundtrip(tmp_path, rng):
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    nrm = rng.standard_normal((500, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    col = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    p = str(tmp_path / "t.ply")
    assert ply_write_native(p, pts, nrm, col, binary=True)
    r_pts, r_nrm, r_col = ply_read_native(p)
    np.testing.assert_array_equal(r_pts, pts)
    np.testing.assert_array_equal(r_nrm, nrm)
    assert np.abs(r_col - col).max() < 1.0 / 255.0 + 1e-6


@needs_native
def test_native_matches_python_on_fixture(tmp_path):
    import os.path

    fixture = "/root/reference/examples/test_clouds/frame_1.ply"
    if not os.path.exists(fixture):
        pytest.skip("fixture unavailable")
    n_pts, n_nrm, n_col = ply_read_native(fixture)
    elements = read_ply(fixture)
    v = elements["vertex"].data
    py_pts = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32)
    np.testing.assert_array_equal(n_pts, py_pts)
    assert n_nrm is not None and n_nrm.shape == n_pts.shape
    assert n_col is not None


@needs_native
def test_native_ascii(tmp_path, rng):
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    p = str(tmp_path / "a.ply")
    assert ply_write_native(p, pts, binary=False)
    with open(p) as f:
        assert "format ascii" in f.read(100)
    r_pts, r_nrm, r_col = ply_read_native(p)
    np.testing.assert_allclose(r_pts, pts, rtol=1e-5)
    assert r_nrm is None and r_col is None


@needs_native
def test_native_rejects_hostile_vertex_count(tmp_path):
    """A header claiming far more vertices than the file holds must error,
    not crash (bounds-check before malloc)."""
    p = str(tmp_path / "hostile.ply")
    with open(p, "w") as f:
        f.write(
            "ply\nformat binary_little_endian 1.0\n"
            "element vertex 99999999999\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n"
        )
    with pytest.raises(ValueError):
        ply_read_native(p)


@needs_native
def test_native_ascii_truncated_mid_number(tmp_path):
    """ASCII file ending mid-number must error cleanly (NUL-terminated
    buffer, no heap over-read)."""
    p = str(tmp_path / "trunc.ply")
    with open(p, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n1.0 2.0 3.0\n4.0 5."
        )
    with pytest.raises(ValueError):
        ply_read_native(p)


@needs_native
def test_native_binary_truncated(tmp_path, rng):
    """Binary payload shorter than stride*n must error."""
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    p = str(tmp_path / "cut.ply")
    assert ply_write_native(p, pts, binary=True)
    data = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(data[:-20])
    with pytest.raises(ValueError):
        ply_read_native(p)


def test_baseline_icp_recovers_transform(rng):
    """Compiled single-core ICP recovers a known small rigid transform on a
    synthetic surface (the distort-and-recover recipe of rigid_icp.cpp)."""
    from cilantro_tpu.native import baseline_icp_native

    if baseline_icp_native(
        np.zeros((10, 3), np.float32),
        np.zeros((10, 3), np.float32),
        np.zeros((10, 3), np.float32),
        max_iterations=0,
    ) is None:
        pytest.skip("no C++ toolchain")

    n = 5000
    xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    z = 0.3 * np.sin(2.0 * xy[:, 0]) * np.cos(1.5 * xy[:, 1])
    dst = np.column_stack([xy, z]).astype(np.float32)
    # Analytic normals of z = f(x, y): (-df/dx, -df/dy, 1)/norm.
    dzdx = 0.6 * np.cos(2.0 * xy[:, 0]) * np.cos(1.5 * xy[:, 1])
    dzdy = -0.45 * np.sin(2.0 * xy[:, 0]) * np.sin(1.5 * xy[:, 1])
    nrm = np.column_stack([-dzdx, -dzdy, np.ones(n)]).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

    ang = 0.02
    r_true = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    t_true = np.array([0.008, -0.005, 0.004], np.float32)
    src = (dst - t_true) @ r_true  # inverse transform applied to dst

    tf, iters, ms = baseline_icp_native(
        src, dst, nrm, max_iterations=30, max_corr_dist_sq=0.01,
        convergence_tol=1e-6,
    )
    assert iters > 0 and ms > 0
    assert np.abs(tf[:, :3] - r_true).max() < 2e-3
    assert np.abs(tf[:, 3] - t_true).max() < 2e-3


def test_baseline_fusion_matches_numpy_pipeline():
    """The compiled C++ fusion baseline and the numpy pipeline
    (bench_baseline.fusion_cpu) implement the same algorithm — their
    trajectories must agree to float precision."""
    import pytest

    from cilantro_tpu.core import CameraIntrinsics
    from cilantro_tpu.native import baseline_fusion_native
    from cilantro_tpu.slam import synthetic_sequence

    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from bench_baseline import fusion_cpu

    h, w = 120, 160
    k = CameraIntrinsics.make(131.25, 131.25, 79.5, 59.5)
    depths, gt = synthetic_sequence(5, h, w, k, seed=3)
    stack = np.stack(depths).astype(np.float32)
    res = baseline_fusion_native(stack, 131.25, 131.25, 79.5, 59.5)
    if res is None:
        pytest.skip("no C++ toolchain")
    poses_cpp, ms = res
    assert ms > 0
    poses_np = fusion_cpu(depths, 131.25, 131.25, 79.5, 59.5)
    for a, b in zip(poses_cpp, poses_np):
        np.testing.assert_allclose(a, b, atol=1e-4)
    # and the trajectory tracks ground truth
    for a, g in zip(poses_cpp, gt):
        np.testing.assert_allclose(a, g, atol=2e-3)


def test_baseline_knn_matches_brute(rng):
    from cilantro_tpu.native import baseline_knn_native

    pts = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
    q = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    res = baseline_knn_native(pts, q, 5)
    if res is None:
        import pytest

        pytest.skip("no toolchain")
    idx, d2, b_ms, q_ms = res
    d = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d, axis=1)[:, :5]
    d_ref = np.take_along_axis(d, order, axis=1)
    np.testing.assert_allclose(d2, d_ref, rtol=1e-5, atol=1e-7)
    assert (idx == order).mean() > 0.99

    # exclude_self on a self-query.
    idx, d2, _, _ = baseline_knn_native(pts, pts, 4, exclude_self=True)
    assert not np.any(idx == np.arange(2000)[:, None])


@needs_native
def test_baseline_warp_recovers_deformation(rng):
    """The single-core C++ EDG baseline recovers a smooth synthetic bend to
    well under the deformation magnitude (the non-rigid bench denominator,
    native/src/baseline_warp.cpp)."""
    from cilantro_tpu.native import baseline_warp_native

    n = 8000
    src = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    src[:, 2] = 0.1 * np.sin(4.0 * src[:, 0])  # a surface, not a volume
    dst = src.copy()
    dst[:, 2] += 0.02 * np.sin(8.0 * src[:, 0])
    out = baseline_warp_native(
        src, dst, ctrl_res=0.1, max_outer=10, max_cg=100,
        point_weight=1.0, stiffness=20.0, max_corr_dist_sq=0.01,
    )
    if out is None:
        import pytest

        pytest.skip("no C++ toolchain")
    warped, iters, nodes, ms = out
    assert nodes > 20 and iters >= 1
    raw = np.median(np.linalg.norm(src - dst, axis=1))
    err = np.median(np.linalg.norm(warped - dst, axis=1))
    assert err < 0.35 * raw, (err, raw)


def test_baseline_radius_matches_bruteforce(rng):
    from cilantro_tpu.native import baseline_radius_native

    pts = rng.random((3000, 3)).astype(np.float32)
    r, cap = 0.06, 8
    res = baseline_radius_native(pts, pts, r, cap, exclude_self=True)
    if res is None:
        import pytest

        pytest.skip("no toolchain")
    idx, d2, cnt, b_ms, q_ms = res
    d = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, -1)
    np.fill_diagonal(d, np.inf)
    want_cnt = (d <= r * r).sum(1)
    np.testing.assert_array_equal(cnt, want_cnt)
    # Returned lists: the min(cap, count) nearest within r, ascending.
    for i in rng.integers(0, 3000, 64):
        kci = min(cap, want_cnt[i])
        want = np.sort(d[i][d[i] <= r * r])[:kci]
        np.testing.assert_allclose(d2[i, :kci], want, rtol=1e-5)
        assert np.all(idx[i, kci:] == -1)
    assert b_ms >= 0 and q_ms >= 0
