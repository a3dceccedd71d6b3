"""Multi-device sharded ICP on the virtual 8-device mesh."""

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.parallel import (
    make_mesh,
    shard_cloud_arrays,
    sharded_combined_icp,
)


def test_sharded_icp_recovers(rng):
    n = 4096
    xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    z = (0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])).astype(np.float32)
    pts = np.column_stack([xy, z])
    ang = 0.05
    r = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    t = np.array([0.02, -0.01, 0.015], np.float32)
    dst = pts @ r.T + t
    nrm = np.zeros_like(dst)
    nrm[:, 2] = 1.0

    mesh = make_mesh(4, 2)
    src_s, sv = shard_cloud_arrays(mesh, "points", pts, np.ones(n, bool))
    dst_s, dn, dv = shard_cloud_arrays(mesh, "map", dst, nrm, np.ones(n, bool))
    tf, iters = sharded_combined_icp(
        src_s, sv, dst_s, dn, dv,
        mesh=mesh,
        max_corr_dist_sq=0.25,
        max_iterations=30,
        convergence_tol=1e-7,
        point_weight=0.3,
    )
    assert np.linalg.norm(np.asarray(tf.linear) - r) < 1e-4
    assert np.linalg.norm(np.asarray(tf.translation) - t) < 1e-4
    assert int(iters) < 30


def test_sharded_icp_mesh_shape_sweep(rng):
    """The registration must not depend on the mesh factorization: 2x4 and
    1x8 meshes (4 and 8 map shards, beyond the usual 2) must agree with the
    4x2 result and with single-device ICP."""
    import pytest
    from cilantro_tpu.registration import icp

    n = 4096
    xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    z = (0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])).astype(np.float32)
    pts = np.column_stack([xy, z])
    ang = 0.05
    r = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    t = np.array([0.02, -0.01, 0.015], np.float32)
    dst = pts @ r.T + t
    nrm = np.zeros_like(dst)
    nrm[:, 2] = 1.0
    kw = dict(
        max_corr_dist_sq=0.25,
        max_iterations=30,
        convergence_tol=1e-7,
        point_weight=0.3,
    )

    ref = icp(
        jnp.asarray(pts), jnp.asarray(dst), dst_normals=jnp.asarray(nrm),
        metric="combined", **kw,
    )
    for np_shards, nm_shards in ((4, 2), (2, 4), (1, 8)):
        mesh = make_mesh(np_shards, nm_shards)
        src_s, sv = shard_cloud_arrays(mesh, "points", pts, np.ones(n, bool))
        dst_s, dn, dv = shard_cloud_arrays(
            mesh, "map", dst, nrm, np.ones(n, bool)
        )
        tf, iters = sharded_combined_icp(
            src_s, sv, dst_s, dn, dv, mesh=mesh, **kw
        )
        np.testing.assert_allclose(
            np.asarray(tf.linear), np.asarray(ref.transform.linear),
            atol=1e-5, err_msg=f"mesh {np_shards}x{nm_shards}",
        )
        np.testing.assert_allclose(
            np.asarray(tf.translation),
            np.asarray(ref.transform.translation),
            atol=1e-5, err_msg=f"mesh {np_shards}x{nm_shards}",
        )


def test_ring_nn1_matches_local(rng):
    from cilantro_tpu.parallel import ring_nn1
    from cilantro_tpu.neighbors import nn1

    import jax.numpy as jnp

    n, m = 1024, 2048
    q = rng.standard_normal((n, 3)).astype(np.float32)
    keys = rng.standard_normal((m, 3)).astype(np.float32)
    payload = np.concatenate([keys, keys * 2.0], axis=1).astype(np.float32)

    mesh = make_mesh(8, 1)
    q_s, qv = shard_cloud_arrays(mesh, "points", q, np.ones(n, bool))
    k_s, p_s, kv = shard_cloud_arrays(
        mesh, "points", keys, payload, np.ones(m, bool)
    )
    d_ring, p_ring = ring_nn1(q_s, qv, k_s, p_s, kv, mesh=mesh)

    d_ref, i_ref = nn1(jnp.asarray(q), jnp.asarray(keys))
    np.testing.assert_allclose(
        np.asarray(d_ring), np.asarray(d_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p_ring)[:, :3], keys[np.asarray(i_ref)], atol=1e-6
    )


def test_ring_icp_matches_tournament(rng):
    """Large-map ring mode (ppermute rotation, no all_gather) must find the
    same registration as the tournament mode."""
    from cilantro_tpu.parallel import sharded_combined_icp_ring

    n = 4096
    xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    z = (0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])).astype(np.float32)
    pts = np.column_stack([xy, z])
    ang = 0.05
    r = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    t = np.array([0.02, -0.01, 0.015], np.float32)
    dst = pts @ r.T + t
    nrm = np.zeros_like(dst)
    nrm[:, 2] = 1.0

    mesh = make_mesh(8, 1)
    src_s, sv, dst_s, dn, dv = shard_cloud_arrays(
        mesh, "points", pts, np.ones(n, bool), dst, nrm, np.ones(n, bool)
    )
    tf, iters = sharded_combined_icp_ring(
        src_s, sv, dst_s, dn, dv,
        mesh=mesh,
        max_corr_dist_sq=0.25,
        max_iterations=30,
        convergence_tol=1e-7,
        point_weight=0.3,
    )
    assert np.abs(np.asarray(tf.linear) - r).max() < 2e-3
    assert np.abs(np.asarray(tf.translation) - t).max() < 2e-3
