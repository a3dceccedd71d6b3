import numpy as np

from cilantro_tpu.utils import read_point_cloud, write_point_cloud


def test_roundtrip_binary(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    col = rng.uniform(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "c.ply")
    write_point_cloud(p, pts, nrm, col)
    rp, rn, rc = read_point_cloud(p)
    np.testing.assert_allclose(rp, pts, atol=1e-6)
    np.testing.assert_allclose(rn, nrm, atol=1e-6)
    np.testing.assert_allclose(rc, col, atol=1 / 255.0)


def test_roundtrip_ascii(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    p = str(tmp_path / "a.ply")
    write_point_cloud(p, pts, binary=False)
    rp, rn, rc = read_point_cloud(p)
    np.testing.assert_allclose(rp, pts, atol=1e-5)
    assert rn is None and rc is None


def test_read_reference_fixture(frame_pair):
    (p1, n1, c1), (p2, n2, c2) = frame_pair
    assert p1.shape == (120111, 3)
    assert n1.shape == (120111, 3)
    assert c1.shape == (120111, 3)
    # Normals are unit length.
    np.testing.assert_allclose(np.linalg.norm(n1, axis=1), 1.0, atol=1e-3)
    assert 0.0 <= c1.min() and c1.max() <= 1.0


def test_containers_roundtrip(rng):
    import jax.numpy as jnp

    from cilantro_tpu.core import from_numpy, compact

    pts = rng.normal(size=(10, 3)).astype(np.float32)
    cloud = from_numpy(pts, capacity=16)
    assert cloud.capacity == 16
    assert int(cloud.num_valid()) == 10
    cloud2 = cloud.remove(jnp.asarray([0, 5]))
    assert int(cloud2.num_valid()) == 8
    packed = compact(cloud2)
    assert packed.capacity == 8
    np.testing.assert_allclose(packed.points, pts[[1, 2, 3, 4, 6, 7, 8, 9]])
