"""Pallas NN kernel correctness in interpreter mode (tiny sizes — the real
kernels are exercised on the TPU chip by bench.py / verification drivers)."""

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.neighbors.pallas_nn import nn1_pallas, knn_pallas


def brute_nn(q, k):
    d = ((q[:, None, :] - k[None, :, :]) ** 2).sum(-1)
    return d.min(1), d.argmin(1)


def test_nn1_matches_numpy(rng):
    q = rng.standard_normal((100, 3)).astype(np.float32)
    k = rng.standard_normal((150, 3)).astype(np.float32)
    d_ref, i_ref = brute_nn(q, k)
    d, i = nn1_pallas(
        jnp.asarray(q), jnp.asarray(k), tile_q=8, tile_m=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-4, atol=1e-5)
    assert (np.asarray(i) == i_ref).mean() > 0.99  # ties may differ


def test_nn1_key_valid_mask(rng):
    q = rng.standard_normal((32, 3)).astype(np.float32)
    k = np.concatenate([q + 100.0, q + 0.001]).astype(np.float32)
    kv = np.zeros(64, bool)
    kv[:32] = True  # only the far copies are valid
    d, i = nn1_pallas(
        jnp.asarray(q),
        jnp.asarray(k),
        key_valid=jnp.asarray(kv),
        tile_q=8,
        tile_m=64,
        interpret=True,
    )
    assert np.all(np.asarray(i) < 32)
    assert np.all(np.asarray(d) > 1000.0)


def test_knn_matches_numpy(rng):
    q = rng.standard_normal((64, 3)).astype(np.float32)
    k = rng.standard_normal((200, 3)).astype(np.float32)
    d = ((q[:, None, :] - k[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d, axis=1)[:, :5]
    d_ref = np.take_along_axis(d, order, axis=1)
    dk, ik = knn_pallas(
        jnp.asarray(q), jnp.asarray(k), 5, tile_q=8, tile_m=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dk), d_ref, rtol=1e-4, atol=1e-5)
    assert (np.asarray(ik) == order).mean() > 0.98


def test_knn_exclude_self(rng):
    pts = rng.standard_normal((48, 3)).astype(np.float32)
    dk, ik = knn_pallas(
        jnp.asarray(pts),
        jnp.asarray(pts),
        4,
        exclude_self=True,
        tile_q=8,
        tile_m=64,
        interpret=True,
    )
    rows = np.arange(48)[:, None]
    assert not np.any(np.asarray(ik) == rows)
    assert np.all(np.asarray(dk) > 0)


def test_nn1_pruned_interpret(rng):
    """Tile-pruned nn1 (interpret mode) matches brute force within radius."""
    import numpy as np
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import nn1_pruned, INVALID_DIST
    from cilantro_tpu.neighbors.bruteforce import _nn1_xla

    n = 3000
    g = np.linspace(-0.2, 0.2, 55)
    gx, gy = np.meshgrid(g, g)
    gz = 1.5 + 0.05 * np.sin(10 * gx) * np.cos(8 * gy)
    pts = np.column_stack([gx.ravel(), gy.ravel(), gz.ravel()])[:n]
    pts = (pts + rng.normal(0, 5e-4, pts.shape)).astype(np.float32)
    q = (pts[::3] + rng.normal(0, 2e-3, pts[::3].shape)).astype(np.float32)

    radius = 0.01
    d_p, i_p = nn1_pruned(
        jnp.asarray(q), jnp.asarray(pts), radius,
        tile_q=256, tile_m=512, interpret=True,
    )
    d_b, i_b = _nn1_xla(jnp.asarray(q), jnp.asarray(pts))
    d_p, i_p, d_b, i_b = map(np.asarray, (d_p, i_p, d_b, i_b))
    within = d_b <= radius * radius
    # Inside the radius: exact agreement (distance; index up to ties).
    np.testing.assert_allclose(d_p[within], d_b[within], rtol=1e-5, atol=5e-7)
    same = i_p[within] == i_b[within]
    assert same.mean() > 0.95  # f32 cancellation noise can flip near-ties
    # Outside the radius: flagged invalid.
    assert (d_p[~within] >= INVALID_DIST * 0.5).all()


def test_nn1_pruned_with_invalid_keys(rng):
    import numpy as np
    import jax.numpy as jnp

    from cilantro_tpu.neighbors.pallas_nn import nn1_pruned, INVALID_DIST

    pts = rng.uniform(-0.1, 0.1, (1000, 3)).astype(np.float32)
    kv = np.ones(1000, bool)
    kv[::2] = False
    d, i = nn1_pruned(
        jnp.asarray(pts[:200]), jnp.asarray(pts), 0.05,
        key_valid=jnp.asarray(kv), tile_q=128, tile_m=256, interpret=True,
    )
    d, i = np.asarray(d), np.asarray(i)
    hit = d < INVALID_DIST * 0.5
    assert hit.sum() > 100
    assert (i[hit] % 2 == 1).all()  # only valid (odd) keys matched
