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
