"""Pose-graph + Schur-complement BA tests (single-device and 8-device
sharded): ground-truth recovery from perturbed initializations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cilantro_tpu.core.transforms import Transform
from cilantro_tpu.slam import (
    bundle_adjust,
    bundle_adjust_sharded,
    optimize_pose_graph,
)
from cilantro_tpu.parallel import make_mesh


def rand_rot(rng, scale=0.05):
    w = rng.standard_normal(3) * scale
    th = np.linalg.norm(w)
    ax = w / max(th, 1e-9)
    k = np.array(
        [[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]]
    )
    return np.eye(3) + np.sin(th) * k + (1 - np.cos(th)) * k @ k


@pytest.fixture()
def ba_problem(rng):
    k_, l = 4, 64
    true_r = [np.eye(3)] + [rand_rot(rng, 0.3) for _ in range(k_ - 1)]
    true_t = [np.zeros(3)] + [
        rng.standard_normal(3) * 0.5 for _ in range(k_ - 1)
    ]
    x = rng.standard_normal((l, 3)) + np.array([0, 0, 5.0])
    cam_idx = np.repeat(np.arange(k_), l)
    lmk_idx = np.tile(np.arange(l), k_)
    obs = np.concatenate([(x - t) @ r for r, t in zip(true_r, true_t)])
    init_r = [true_r[0]] + [rand_rot(rng, 0.05) @ r for r in true_r[1:]]
    init_t = [true_t[0]] + [
        t + rng.standard_normal(3) * 0.05 for t in true_t[1:]
    ]
    x0 = x + rng.standard_normal((l, 3)) * 0.05
    poses0 = Transform(
        jnp.asarray(np.stack(init_r), jnp.float32),
        jnp.asarray(np.stack(init_t), jnp.float32),
    )
    return (
        poses0,
        x0,
        cam_idx,
        lmk_idx,
        obs,
        true_r,
        true_t,
        k_,
        l,
    )


class TestBundleAdjustment:
    def test_recovers_poses_and_landmarks(self, ba_problem):
        poses0, x0, cam_idx, lmk_idx, obs, true_r, true_t, k_, _ = ba_problem
        poses, lmk, resid = bundle_adjust(
            poses0,
            jnp.asarray(x0, jnp.float32),
            jnp.asarray(cam_idx, jnp.int32),
            jnp.asarray(lmk_idx, jnp.int32),
            jnp.asarray(obs, jnp.float32),
            max_iterations=15,
        )
        assert float(resid) < 1e-6
        for i in range(k_):
            assert np.linalg.norm(np.asarray(poses.linear[i]) - true_r[i]) < 1e-2
            assert (
                np.linalg.norm(np.asarray(poses.translation[i]) - true_t[i])
                < 1e-2
            )

    def test_sharded_matches(self, ba_problem):
        poses0, x0, cam_idx, lmk_idx, obs, *_, l = ba_problem
        mesh = make_mesh(8, 1)
        lp = l // 8
        order = np.argsort(lmk_idx // lp, kind="stable")
        poses, lmk, resid = bundle_adjust_sharded(
            poses0,
            jnp.asarray(x0, jnp.float32),
            jnp.asarray(cam_idx[order], jnp.int32),
            jnp.asarray(lmk_idx[order] % lp, jnp.int32),
            jnp.asarray(obs[order], jnp.float32),
            jnp.ones(len(order), bool),
            mesh=mesh,
            max_iterations=15,
        )
        assert float(resid) < 1e-6


class TestPoseGraph:
    def test_loop_closure_chain(self, rng):
        kp = 6
        true = [np.eye(4)]
        for _ in range(1, kp):
            t4 = np.eye(4)
            t4[:3, :3] = rand_rot(rng, 0.2)
            t4[:3, 3] = rng.standard_normal(3) * 0.3
            true.append(true[-1] @ t4)
        edges = [(i, i + 1) for i in range(kp - 1)] + [(0, kp - 1)]
        ei = np.array([e[0] for e in edges], np.int32)
        ej = np.array([e[1] for e in edges], np.int32)
        z = [np.linalg.inv(true[a]) @ true[b] for a, b in edges]
        init = [true[0]] + [t.copy() for t in true[1:]]
        for t4 in init[1:]:
            t4[:3, :3] = rand_rot(rng, 0.04) @ t4[:3, :3]
            t4[:3, 3] += rng.standard_normal(3) * 0.04
        poses0 = Transform(
            jnp.asarray(np.stack([t[:3, :3] for t in init]), jnp.float32),
            jnp.asarray(np.stack([t[:3, 3] for t in init]), jnp.float32),
        )
        meas = Transform(
            jnp.asarray(np.stack([m[:3, :3] for m in z]), jnp.float32),
            jnp.asarray(np.stack([m[:3, 3] for m in z]), jnp.float32),
        )
        opt, _ = optimize_pose_graph(
            poses0, jnp.asarray(ei), jnp.asarray(ej), meas, max_iterations=20
        )
        for i in range(kp):
            err = np.linalg.norm(
                np.asarray(opt.linear[i]) - true[i][:3, :3]
            ) + np.linalg.norm(np.asarray(opt.translation[i]) - true[i][:3, 3])
            assert err < 1e-2


def test_ba_mapping_scale():
    """K=64 cameras, L=100k landmarks, O=300k observations — the problem the
    naive (L,K,6,3) Schur assembly could not hold in memory. The matrix-free
    PCG reduced solve must run it and reduce the residual."""
    import time

    import numpy as np
    import jax.numpy as jnp

    from cilantro_tpu.core.transforms import Transform, axis_angle_to_rotation
    from cilantro_tpu.slam import bundle_adjust

    rng = np.random.default_rng(0)
    K, L, O = 64, 100_000, 300_000
    lmk = rng.uniform(-2, 2, (L, 3)).astype(np.float32)
    # Cameras on a ring, looking inward-ish.
    angles = np.linspace(0, 0.5, K).astype(np.float32)
    r_true = np.stack(
        [np.asarray(axis_angle_to_rotation(jnp.array([0.0, a, 0.0]))) for a in angles]
    )
    t_true = rng.uniform(-0.5, 0.5, (K, 3)).astype(np.float32)

    cam_idx = rng.integers(0, K, O).astype(np.int32)
    lmk_idx = rng.integers(0, L, O).astype(np.int32)
    x_w = lmk[lmk_idx]
    x_c = np.einsum(
        "oji,oj->oi", r_true[cam_idx], x_w - t_true[cam_idx]
    )  # Rᵀ(X − t)
    obs = (x_c + rng.standard_normal((O, 3)) * 1e-3).astype(np.float32)

    # Perturb initial poses + landmarks.
    poses0 = Transform(
        jnp.asarray(r_true),
        jnp.asarray(t_true + rng.standard_normal((K, 3)) * 0.01),
    )
    lmk0 = jnp.asarray(lmk + rng.standard_normal((L, 3)) * 0.01)

    t0 = time.perf_counter()
    poses, lmks, resid = bundle_adjust(
        poses0,
        lmk0,
        jnp.asarray(cam_idx),
        jnp.asarray(lmk_idx),
        jnp.asarray(obs),
        max_iterations=3,
        max_cg=30,
    )
    resid = float(resid)
    dt = time.perf_counter() - t0
    # Initial residual with 1cm perturbations is O(O * 1e-4) ≈ 30; solved
    # residual must approach the noise floor O * 3e-6 ≈ 0.9.
    assert resid < 3.0, resid
    assert dt < 120.0, dt  # ran in seconds, not minutes
