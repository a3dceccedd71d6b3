import jax.numpy as jnp
import numpy as np
import pytest

from cilantro_tpu.core import transforms as T


def random_rotation(rng, d=3):
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q.astype(np.float32)


def test_compose_inverse_roundtrip(rng):
    r = random_rotation(rng)
    tf = T.Transform(jnp.asarray(r), jnp.asarray(rng.normal(size=3).astype(np.float32)))
    eye = T.compose(tf, T.inverse(tf))
    np.testing.assert_allclose(eye.linear, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(eye.translation, 0, atol=1e-5)


def test_transform_points_matches_numpy(rng):
    r = random_rotation(rng)
    t = rng.normal(size=3).astype(np.float32)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    got = T.transform_points(T.Transform(jnp.asarray(r), jnp.asarray(t)), jnp.asarray(pts))
    np.testing.assert_allclose(got, pts @ r.T + t, atol=1e-5)


def test_transform_set_per_point(rng):
    """A batched transform applies row-wise (reference TransformSet)."""
    n = 16
    rs = np.stack([random_rotation(rng) for _ in range(n)])
    ts = rng.normal(size=(n, 3)).astype(np.float32)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    got = T.transform_points(T.Transform(jnp.asarray(rs), jnp.asarray(ts)), jnp.asarray(pts))
    want = np.einsum("nij,nj->ni", rs, pts) + ts
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_affine_normal_matrix(rng):
    a = rng.normal(size=(3, 3)).astype(np.float32) + 2 * np.eye(3, dtype=np.float32)
    tf = T.Transform(jnp.asarray(a), jnp.zeros(3))
    n = np.array([[0.0, 0.0, 1.0]], np.float32)
    got = np.asarray(T.transform_normals(tf, jnp.asarray(n), rigid=False))[0]
    want = np.linalg.inv(a).T @ n[0]
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_project_to_rotation_fixes_reflection(rng):
    r = random_rotation(rng)
    noisy = r + 0.05 * rng.normal(size=(3, 3)).astype(np.float32)
    p = np.asarray(T.project_to_rotation(jnp.asarray(noisy)))
    np.testing.assert_allclose(p @ p.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(p) > 0
    # A reflection is projected to a proper rotation.
    refl = r.copy()
    refl[:, 0] = -refl[:, 0]
    p2 = np.asarray(T.project_to_rotation(jnp.asarray(refl)))
    assert np.linalg.det(p2) > 0


def test_axis_angle_small_and_large():
    r0 = np.asarray(T.axis_angle_to_rotation(jnp.zeros(3)))
    np.testing.assert_allclose(r0, np.eye(3), atol=1e-7)
    omega = jnp.asarray([0.0, 0.0, np.pi / 2], jnp.float32)
    r = np.asarray(T.axis_angle_to_rotation(omega))
    np.testing.assert_allclose(r @ np.array([1, 0, 0.0]), [0, 1, 0], atol=1e-6)


def test_matrix_roundtrip(rng):
    r = random_rotation(rng)
    tf = T.Transform(jnp.asarray(r), jnp.asarray(rng.normal(size=3).astype(np.float32)))
    back = T.from_matrix(tf.matrix())
    np.testing.assert_allclose(back.linear, tf.linear, atol=1e-6)
    np.testing.assert_allclose(back.translation, tf.translation, atol=1e-6)
