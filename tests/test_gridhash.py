"""Grid-bucketed radius NN: exactness vs brute force + overflow honesty."""

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.neighbors import radius_search
from cilantro_tpu.neighbors.gridhash import radius_search_grid
from cilantro_tpu.neighbors.bruteforce import INVALID_DIST


def surface_cloud(n_side=120, noise=0.001, seed=0):
    """RGBD-density wavy surface (~point spacing 2.5 mm at 0.3 m extent)."""
    rng = np.random.default_rng(seed)
    g = np.linspace(-0.15, 0.15, n_side)
    gx, gy = np.meshgrid(g, g)
    gz = 1.5 + 0.03 * np.sin(20 * gx) * np.cos(15 * gy)
    pts = np.column_stack([gx.ravel(), gy.ravel(), gz.ravel()])
    pts += rng.standard_normal(pts.shape) * noise
    return pts.astype(np.float32)


def as_sets(dist, idx, mask):
    out = []
    for i in range(dist.shape[0]):
        out.append(set(np.asarray(idx[i])[np.asarray(mask[i])].tolist()))
    return out


class TestGridRadius:
    def test_matches_brute_on_surface(self):
        pts = surface_cloud(64)
        q = pts[::7]
        radius, cap = 0.012, 48
        d_g, i_g, over = radius_search_grid(
            jnp.asarray(q), jnp.asarray(pts), radius, cap, max_key_tiles=32
        )
        nb_b = radius_search(
            jnp.asarray(q), jnp.asarray(pts), radius, cap, backend="brute"
        )
        over = np.asarray(over)
        m_g = np.asarray(d_g) < INVALID_DIST
        sets_g = as_sets(d_g, i_g, m_g)
        sets_b = as_sets(nb_b.distances, nb_b.indices, np.asarray(nb_b.mask))
        mismatches = 0
        for i in range(len(sets_g)):
            if over[i] or (nb_b.overflowed is not None and bool(nb_b.overflowed[i])):
                continue  # truncated results only promise a subset
            if sets_g[i] != sets_b[i]:
                mismatches += 1
        assert mismatches == 0
        # Un-overflowed queries must dominate at this capacity.
        assert over.mean() < 0.05

    def test_overflow_flag_trips_on_dense_ball(self):
        rng = np.random.default_rng(1)
        # 500 points inside a 5 mm ball; radius 20 mm catches all of them.
        ball = (rng.standard_normal((500, 3)) * 0.002).astype(np.float32)
        spread = (rng.uniform(-1, 1, (500, 3))).astype(np.float32)
        pts = np.concatenate([ball, spread])
        q = np.zeros((4, 3), np.float32)
        q[1:] = spread[:3]
        d, i, over = radius_search_grid(
            jnp.asarray(q), jnp.asarray(pts), 0.02, 16, max_key_tiles=8
        )
        over = np.asarray(over)
        assert over[0]  # 500 in-radius hits truncated to 16 → flagged
        # The kept 16 must still be the closest ones (all from the ball).
        m = np.asarray(d[0]) < INVALID_DIST
        assert m.sum() == 16
        assert np.asarray(d[0])[m].max() < (0.02) ** 2

    def test_brute_path_overflow_flag(self):
        rng = np.random.default_rng(2)
        ball = (rng.standard_normal((100, 3)) * 0.002).astype(np.float32)
        q = np.zeros((1, 3), np.float32)
        nb = radius_search(
            jnp.asarray(q), jnp.asarray(ball), 0.02, 8, backend="brute"
        )
        assert nb.overflowed is not None and bool(nb.overflowed[0])
        nb2 = radius_search(
            jnp.asarray(q), jnp.asarray(ball), 0.02, 128, backend="brute"
        )
        assert not bool(nb2.overflowed[0])

    def test_grid_backend_via_api(self):
        pts = surface_cloud(48)
        nb = radius_search(
            jnp.asarray(pts[::5]), jnp.asarray(pts), 0.01, 32, backend="grid"
        )
        assert nb.overflowed is not None
        assert int(nb.counts().sum()) > 0

    def test_validity_masks(self):
        pts = surface_cloud(32)
        kv = np.ones(len(pts), bool)
        kv[::2] = False
        d, i, over = radius_search_grid(
            jnp.asarray(pts[:64]),
            jnp.asarray(pts),
            0.015,
            32,
            key_valid=jnp.asarray(kv),
            max_key_tiles=32,
        )
        m = np.asarray(d) < INVALID_DIST
        hit_idx = np.asarray(i)[m]
        assert (hit_idx % 2 == 1).all()  # only odd (valid) keys returned

    def test_exclude_self(self):
        pts = surface_cloud(32)
        d, i, over = radius_search_grid(
            jnp.asarray(pts),
            jnp.asarray(pts),
            0.015,
            8,
            exclude_self=True,
            max_key_tiles=32,
        )
        m = np.asarray(d) < INVALID_DIST
        ii = np.asarray(i)
        self_hits = sum(
            int((ii[r][m[r]] == r).any()) for r in range(len(pts))
        )
        assert self_hits == 0

    def test_2d(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 1, (2000, 2)).astype(np.float32)
        q = pts[:100]
        d_g, i_g, over = radius_search_grid(
            jnp.asarray(q), jnp.asarray(pts), 0.03, 32, max_key_tiles=32
        )
        nb_b = radius_search(
            jnp.asarray(q), jnp.asarray(pts), 0.03, 32, backend="brute"
        )
        sets_g = as_sets(d_g, i_g, np.asarray(d_g) < INVALID_DIST)
        sets_b = as_sets(nb_b.distances, nb_b.indices, np.asarray(nb_b.mask))
        for i in range(100):
            if bool(over[i]) or bool(nb_b.overflowed[i]):
                continue
            assert sets_g[i] == sets_b[i]
