"""Bundle adjustment with Schur-complement landmark elimination — single-chip
and multi-device (sharded landmarks) versions.

Beyond-reference subsystem (the BASELINE north star: "map blocks and
keyframes partitioned across a multi-host pod slice, the reduced camera
system solved via Schur-complement reduction over psum/all_gather").

Problem: keyframe poses ``T_c`` (camera-to-world) and landmarks ``X_l``
(world); 3D point observations ``Y_o`` of landmark ``lmk[o]`` in camera
``cam[o]``'s frame (the point-cloud analogue of reprojection error):

    r_o = T_{cam[o]}⁻¹ (X_{lmk[o]}) − Y_o                (3-vector)

Gauss-Newton blocks (``δc`` = per-camera [δω; δt] in the camera's local
frame, ``δx`` = per-landmark world increment):

    J_c = [ [x_c]×  | −I ]   (x_c = landmark in camera frame)
    J_x = Rᵀ                  (camera rotation transpose)

Schur complement: ``H_ll`` is 3×3 block-diagonal per landmark → eliminated in
closed form; the reduced camera system ``S δc = g`` is (6K × 6K) dense and
tiny (K = #keyframes). **S and g are sums over landmarks**, so sharding
landmarks+observations across devices makes the whole reduction one ``psum``
— the multi-device path is the single-chip path plus one collective.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.transforms import (
    Transform,
    axis_angle_to_rotation,
    project_to_rotation,
)

_EPS = 1e-12


def _skew(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


def _ba_accumulate(poses, landmarks, cam_idx, lmk_idx, obs, w, num_landmarks):
    """Per-shard partial Schur pieces.

    Returns (s_partial (K,K,6,6), g_partial (K,6), h_ll (L,3,3),
    b_l (L,3), h_cl_by_obs (O,6,3), resid_norm). Everything except the two
    camera-indexed outputs is local to the shard's landmarks.
    """
    k = poses.translation.shape[0]
    r_wc = poses.linear  # camera-to-world rotations
    t_wc = poses.translation
    # x_c = Rᵀ(X − t): landmark in camera frame.
    rt = jnp.swapaxes(r_wc, -1, -2)
    x_w = landmarks[lmk_idx]  # (O, 3)
    rt_o = rt[cam_idx]  # (O, 3, 3)
    x_c = jnp.einsum("oij,oj->oi", rt_o, x_w - t_wc[cam_idx])
    r = x_c - obs  # (O, 3) residuals
    ww = w[:, None]

    # Jacobians. Local pose increment: T ← T·Exp(δ); then
    # x_c(δ) = Exp(δ)⁻¹ (x_c) ≈ x_c − δω×x_c − δt  ⇒ J_c = [[x_c]× | −I].
    j_rot = _skew(x_c)  # (O, 3, 3) — ∂r/∂δω
    # J_x = ∂r/∂X = Rᵀ.
    j_x = rt_o

    # Blocks.
    j_c = jnp.concatenate(
        [j_rot, -jnp.broadcast_to(jnp.eye(3), j_rot.shape)], axis=2
    )  # (O, 3, 6)
    h_cc = jnp.einsum("o,oki,okj->oij", w, j_c, j_c)  # (O, 6, 6)
    h_cl = jnp.einsum("o,oki,okj->oij", w, j_c, j_x)  # (O, 6, 3)
    h_ll_o = jnp.einsum("o,oki,okj->oij", w, j_x, j_x)  # (O, 3, 3)
    b_c_o = -jnp.einsum("o,oki,ok->oi", w, j_c, r)  # (O, 6)
    b_l_o = -jnp.einsum("o,oki,ok->oi", w, j_x, r)  # (O, 3)

    h_ll = jax.ops.segment_sum(h_ll_o, lmk_idx, num_segments=num_landmarks)
    b_l = jax.ops.segment_sum(b_l_o, lmk_idx, num_segments=num_landmarks)
    h_ll_inv = jnp.linalg.inv(
        h_ll + 1e-8 * jnp.broadcast_to(jnp.eye(3), h_ll.shape)
    )

    # Reduced system: S = Σ_c H_cc − Σ_l A_l H_ll⁻¹ A_lᵀ with
    # A_l (K, 6, 3) = per-landmark camera-coupling blocks
    # (A_l[c] = Σ_{o: lmk=l, cam=c} H_cl_o). Materialized as (L, K, 6, 3) —
    # fine for keyframe-scale K; for very large K switch to a
    # (cam,lmk)-pair segment reduction.
    scat = jnp.zeros((cam_idx.shape[0], k, 6, 3))
    scat = scat.at[jnp.arange(cam_idx.shape[0]), cam_idx].set(h_cl)
    a = jax.ops.segment_sum(scat, lmk_idx, num_segments=num_landmarks)
    # (L, K, 6, 3)
    s_corr = jnp.einsum("lkim,lmn,lqjn->kiqj", a, h_ll_inv, a)  # (K,6,K,6)
    s_corr = jnp.swapaxes(s_corr, 1, 2)  # (K, K, 6, 6)

    s_cc = jnp.zeros((k, k, 6, 6)).at[cam_idx, cam_idx].add(h_cc)
    g_c = jnp.zeros((k, 6)).at[cam_idx].add(b_c_o)
    g_corr = jnp.einsum("lkim,lmn,ln->ki", a, h_ll_inv, b_l)

    s_partial = s_cc - s_corr
    g_partial = g_c - g_corr
    resid = jnp.sum(w * jnp.sum(r * r, axis=-1))
    return s_partial, g_partial, h_ll_inv, b_l, a, resid


def _apply_camera_update(poses, delta, fixed_mask):
    delta = delta * (~fixed_mask)[:, None]
    rot = axis_angle_to_rotation(delta[:, :3])
    inc = Transform(rot, delta[:, 3:])
    lin = jnp.einsum("kij,kjl->kil", poses.linear, inc.linear)
    tr = (
        jnp.einsum("kij,kj->ki", poses.linear, inc.translation)
        + poses.translation
    )
    return Transform(project_to_rotation(lin), tr)


@partial(jax.jit, static_argnames=("max_iterations",))
def bundle_adjust(
    poses: Transform,  # batched (K,)
    landmarks: jax.Array,  # (L, 3) world points
    cam_idx: jax.Array,  # (O,) int32
    lmk_idx: jax.Array,  # (O,) int32
    observations: jax.Array,  # (O, 3) points in camera frame
    *,
    obs_weights: Optional[jax.Array] = None,
    fixed_mask: Optional[jax.Array] = None,
    max_iterations: int = 10,
    damping: float = 1e-6,
    tol: float = 1e-8,
) -> Tuple[Transform, jax.Array, jax.Array]:
    """Single-device Schur-complement BA.

    Returns ``(poses, landmarks, final_residual)``; pose 0 gauge-fixed by
    default.
    """
    k = poses.translation.shape[0]
    l = landmarks.shape[0]
    if obs_weights is None:
        obs_weights = jnp.ones(cam_idx.shape[0])
    if fixed_mask is None:
        fixed_mask = jnp.zeros(k, bool).at[0].set(True)

    def body(carry):
        poses, landmarks, _, it = carry
        s, g, h_ll_inv, b_l, a, resid = _ba_accumulate(
            poses, landmarks, cam_idx, lmk_idx, observations, obs_weights, l
        )
        # Gauge fixing.
        fix = fixed_mask.astype(s.dtype)
        keep = 1.0 - fix
        s = s * keep[:, None, None, None] * keep[None, :, None, None]
        s = s.at[jnp.arange(k), jnp.arange(k)].add(
            fix[:, None, None] * jnp.eye(6)
        )
        g = g * keep[:, None]
        s_full = s.transpose(0, 2, 1, 3).reshape(6 * k, 6 * k)
        s_full = s_full + damping * jnp.eye(6 * k)
        dc = jnp.linalg.solve(s_full, g.reshape(-1)).reshape(k, 6)
        # Back-substitute landmarks: δx_l = H_ll⁻¹ (b_l − A_lᵀ δc).
        at_dc = jnp.einsum("lkim,ki->lm", a, dc)
        dx = jnp.einsum("lmn,ln->lm", h_ll_inv, b_l - at_dc)
        new_poses = _apply_camera_update(poses, dc, fixed_mask)
        new_landmarks = landmarks + dx
        step = jnp.linalg.norm(dc) + jnp.linalg.norm(dx)
        return new_poses, new_landmarks, step, it + 1

    def cond(carry):
        _, _, step, it = carry
        return (it < max_iterations) & (step >= tol)

    poses, landmarks, _, _ = jax.lax.while_loop(
        cond,
        body,
        (poses, landmarks, jnp.array(jnp.inf), jnp.array(0, jnp.int32)),
    )
    _, _, _, _, _, resid = _ba_accumulate(
        poses, landmarks, cam_idx, lmk_idx, observations, obs_weights, l
    )
    return poses, landmarks, resid


@partial(jax.jit, static_argnames=("mesh", "max_iterations"))
def bundle_adjust_sharded(
    poses: Transform,  # replicated (K,)
    landmarks: jax.Array,  # (L, 3) sharded over 'points' (L divisible)
    cam_idx: jax.Array,  # (O,) sharded over 'points'
    lmk_idx: jax.Array,  # (O,) LOCAL landmark ids within the shard
    observations: jax.Array,  # (O, 3) sharded
    obs_valid: jax.Array,  # (O,) sharded
    *,
    mesh: Mesh,
    fixed_mask: Optional[jax.Array] = None,
    max_iterations: int = 10,
    damping: float = 1e-6,
) -> Tuple[Transform, jax.Array, jax.Array]:
    """Multi-device Schur BA: landmarks + observations sharded over the
    ``points`` mesh axis (observations of a landmark must live on its shard —
    partition by landmark). The reduced camera system is formed with ONE
    ``psum`` and solved replicated; landmark back-substitution is local.

    This is the direct SPMD translation of the per-thread partial normal
    equations + merge pattern (SURVEY §2.10) to ICI collectives.
    """
    k = poses.translation.shape[0]
    if fixed_mask is None:
        fixed_mask = jnp.zeros(k, bool).at[0].set(True)

    def program(poses, landmarks, cam_idx, lmk_idx, obs, ow):
        l_local = landmarks.shape[0]

        def body(carry):
            poses, landmarks, it = carry
            s, g, h_ll_inv, b_l, a, _ = _ba_accumulate(
                poses, landmarks, cam_idx, lmk_idx, obs, ow, l_local
            )
            s = jax.lax.psum(s, "points")
            g = jax.lax.psum(g, "points")
            fix = fixed_mask.astype(s.dtype)
            keep = 1.0 - fix
            s = s * keep[:, None, None, None] * keep[None, :, None, None]
            s = s.at[jnp.arange(k), jnp.arange(k)].add(
                fix[:, None, None] * jnp.eye(6)
            )
            g = g * keep[:, None]
            s_full = s.transpose(0, 2, 1, 3).reshape(6 * k, 6 * k)
            s_full = s_full + damping * jnp.eye(6 * k)
            dc = jnp.linalg.solve(s_full, g.reshape(-1)).reshape(k, 6)
            at_dc = jnp.einsum("lkim,ki->lm", a, dc)
            dx = jnp.einsum("lmn,ln->lm", h_ll_inv, b_l - at_dc)
            return (
                _apply_camera_update(poses, dc, fixed_mask),
                landmarks + dx,
                it + 1,
            )

        def cond(carry):
            return carry[2] < max_iterations

        poses, landmarks, _ = jax.lax.while_loop(
            cond, body, (poses, landmarks, jnp.array(0, jnp.int32))
        )
        _, _, _, _, _, resid = _ba_accumulate(
            poses, landmarks, cam_idx, lmk_idx, obs, ow, l_local
        )
        return poses, landmarks, jax.lax.psum(resid, "points")

    rep = jax.tree_util.tree_map(lambda _: P(), poses)
    shard = jax.shard_map(
        program,
        mesh=mesh,
        in_specs=(
            rep,
            P("points", None),
            P("points"),
            P("points"),
            P("points", None),
            P("points"),
        ),
        out_specs=(rep, P("points", None), P()),
        check_vma=False,
    )
    return shard(
        poses,
        landmarks,
        cam_idx,
        lmk_idx,
        observations,
        obs_valid.astype(jnp.float32),
    )
