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
