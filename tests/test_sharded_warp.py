"""Point-sharded EDG warp-field estimation on the 8-virtual-device CPU
mesh: numerical agreement with the single-device solver."""

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.parallel import make_mesh, sharded_estimate_warp_field
from cilantro_tpu.registration import (
    build_deformation_graph,
    estimate_warp_field,
    warp_points,
)


def test_sharded_warp_matches_single_device(rng):
    n = 2048  # divides the 8-device axis
    xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    src = np.column_stack(
        [xy, 0.1 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])]
    ).astype(np.float32)
    dst = src.copy()
    dst[:, 2] += 0.05 * np.sin(1.5 * src[:, 0])  # smooth bend

    keys = np.round(src[:, :2] / 0.3).astype(np.int64)
    _, first = np.unique(keys[:, 0] * 10000 + keys[:, 1], return_index=True)
    nodes = src[np.sort(first)]
    graph = build_deformation_graph(
        jnp.asarray(src), jnp.asarray(nodes), k_anchors=4, k_arcs=6
    )
    w = jnp.ones((n,), jnp.float32)

    kw = dict(
        point_weight=1.0, plane_weight=0.0, stiffness=10.0,
        max_gn_iterations=4, max_cg_iterations=80, solver="cg",
    )
    tf_ref, conv_ref, _ = estimate_warp_field(
        graph, jnp.asarray(src), jnp.asarray(dst), None, w, **kw
    )

    mesh = make_mesh(8, 1)
    tf_sh, conv_sh, _ = sharded_estimate_warp_field(
        graph, jnp.asarray(src), jnp.asarray(dst), None, w,
        mesh=mesh, **kw,
    )

    np.testing.assert_allclose(
        np.asarray(tf_sh.translation),
        np.asarray(tf_ref.translation),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tf_sh.linear), np.asarray(tf_ref.linear), atol=1e-5
    )

    # And the field actually recovers the bend.
    warped = np.asarray(warp_points(graph, tf_sh, jnp.asarray(src)))
    err = np.linalg.norm(warped - dst, axis=1)
    assert np.median(err) < 0.01


def test_sharded_full_icp_warp_field_matches(rng):
    from cilantro_tpu.parallel import sharded_icp_warp_field
    from cilantro_tpu.registration import icp_warp_field

    n = 2048
    xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    src = np.column_stack(
        [xy, 0.1 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])]
    ).astype(np.float32)
    dst = src.copy()
    dst[:, 2] += 0.05 * np.sin(1.5 * src[:, 0])
    keys = np.round(src[:, :2] / 0.3).astype(np.int64)
    _, first = np.unique(keys[:, 0] * 10000 + keys[:, 1], return_index=True)
    nodes = src[np.sort(first)]
    graph = build_deformation_graph(
        jnp.asarray(src), jnp.asarray(nodes), k_anchors=4, k_arcs=6
    )
    kw = dict(
        max_corr_dist_sq=0.04, point_weight=1.0, plane_weight=0.0,
        stiffness=10.0, max_iterations=6, convergence_tol=1e-4,
        max_cg_iterations=60, solver="cg",
    )
    tf_ref, _, _ = icp_warp_field(
        graph, jnp.asarray(src), jnp.asarray(dst), **kw
    )
    mesh = make_mesh(8, 1)
    tf_sh, _, _ = sharded_icp_warp_field(
        graph, jnp.asarray(src), jnp.asarray(dst), mesh=mesh, **kw
    )
    np.testing.assert_allclose(
        np.asarray(tf_sh.translation), np.asarray(tf_ref.translation),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tf_sh.linear), np.asarray(tf_ref.linear), atol=1e-5
    )
    warped = np.asarray(warp_points(graph, tf_sh, jnp.asarray(src)))
    assert np.median(np.linalg.norm(warped - dst, axis=1)) < 0.01
