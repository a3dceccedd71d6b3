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

``H_ll`` is 3×3 block-diagonal per landmark → eliminated in closed form. The
reduced camera system ``S δc = g`` with ``S = H_cc − A H_ll⁻¹ Aᵀ`` is solved
**matrix-free**: each PCG matvec evaluates ``S v`` through per-observation
gathers + segment-sums (O(O) work, nothing camera×landmark is ever
materialized — the explicit ``(L, K, 6, 3)`` coupling tensor of the naive
assembly is quadratic-in-K death at mapping scale). Block-Jacobi
``H_cc⁻¹`` preconditioning keeps PCG iteration counts low. Sharding
landmarks+observations across devices turns each matvec's camera-side
segment-sum into one ``psum`` — the multi-device path is the single-chip
path plus one collective per CG step.
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
    skew3 as _skew,
)

_EPS = 1e-12


def _ba_blocks(poses, landmarks, cam_idx, lmk_idx, obs, w, num_landmarks):
    """Per-observation GN blocks + per-landmark/per-camera reductions.

    Returns ``(h_cc (K,6,6) block-diagonal of H_cc, h_cl (O,6,3),
    h_ll_inv (L,3,3), b_l (L,3), g (K,6) = b_c − A H_ll⁻¹ b_l,
    resid)`` — all linear-size; no (L,K) or (O,K) tensors.
    """
    k = poses.translation.shape[0]
    r_wc = poses.linear  # camera-to-world rotations
    t_wc = poses.translation
    rt = jnp.swapaxes(r_wc, -1, -2)
    x_w = landmarks[lmk_idx]  # (O, 3)
    rt_o = rt[cam_idx]  # (O, 3, 3)
    x_c = jnp.einsum("oij,oj->oi", rt_o, x_w - t_wc[cam_idx])
    r = x_c - obs  # (O, 3) residuals

    # Local pose increment: T ← T·Exp(δ); then
    # x_c(δ) = Exp(δ)⁻¹ (x_c) ≈ x_c − δω×x_c − δt  ⇒ J_c = [[x_c]× | −I].
    j_rot = _skew(x_c)  # (O, 3, 3)
    j_x = rt_o  # ∂r/∂X = Rᵀ
    j_c = jnp.concatenate(
        [j_rot, -jnp.broadcast_to(jnp.eye(3), j_rot.shape)], axis=2
    )  # (O, 3, 6)

    h_cc_o = jnp.einsum("o,oki,okj->oij", w, j_c, j_c)  # (O, 6, 6)
    h_cl = jnp.einsum("o,oki,okj->oij", w, j_c, j_x)  # (O, 6, 3)
    h_ll_o = jnp.einsum("o,oki,okj->oij", w, j_x, j_x)  # (O, 3, 3)
    b_c_o = -jnp.einsum("o,oki,ok->oi", w, j_c, r)  # (O, 6)
    b_l_o = -jnp.einsum("o,oki,ok->oi", w, j_x, r)  # (O, 3)

    h_cc = jax.ops.segment_sum(h_cc_o, cam_idx, num_segments=k)
    h_ll = jax.ops.segment_sum(h_ll_o, lmk_idx, num_segments=num_landmarks)
    b_l = jax.ops.segment_sum(b_l_o, lmk_idx, num_segments=num_landmarks)
    h_ll_inv = jnp.linalg.inv(
        h_ll + 1e-8 * jnp.broadcast_to(jnp.eye(3), h_ll.shape)
    )

    # g = b_c − A H_ll⁻¹ b_l, evaluated per observation.
    y_l = jnp.einsum("lmn,ln->lm", h_ll_inv, b_l)  # (L, 3)
    g_corr_o = jnp.einsum("oim,om->oi", h_cl, y_l[lmk_idx])  # (O, 6)
    g = jax.ops.segment_sum(
        b_c_o - g_corr_o, cam_idx, num_segments=k
    )
    resid = jnp.sum(w * jnp.sum(r * r, axis=-1))
    return h_cc, h_cl, h_ll_inv, b_l, g, resid


def _schur_matvec(
    v, h_cc, h_cl, h_ll_inv, cam_idx, lmk_idx, num_landmarks, damping, psum
):
    """``(S + λI) v`` with ``S = H_cc − A H_ll⁻¹ Aᵀ`` — matrix-free.

    ``psum`` reduces camera-indexed partials across landmark shards (identity
    on a single device).
    """
    k = h_cc.shape[0]
    u_o = jnp.einsum("oim,oi->om", h_cl, v[cam_idx])  # Aᵀv pieces (O, 3)
    av_l = jax.ops.segment_sum(u_o, lmk_idx, num_segments=num_landmarks)
    y_l = jnp.einsum("lmn,ln->lm", h_ll_inv, av_l)
    w_o = jnp.einsum("oim,om->oi", h_cl, y_l[lmk_idx])  # A·y pieces (O, 6)
    corr = jax.ops.segment_sum(w_o, cam_idx, num_segments=k)
    main = jnp.einsum("kij,kj->ki", h_cc, v)
    return psum(main - corr) + damping * v


def _pcg_schur(
    g,
    h_cc,
    h_cl,
    h_ll_inv,
    cam_idx,
    lmk_idx,
    num_landmarks,
    keep,
    damping,
    psum=lambda x: x,
    max_cg: int = 60,
    cg_tol: float = 1e-10,
):
    """Preconditioned CG on the gauge-fixed reduced camera system.

    ``keep (K,)`` zeroes fixed cameras (their δ stays 0). Preconditioner =
    block-Jacobi ``(H_cc + λI)⁻¹``.
    """
    k = h_cc.shape[0]
    keep6 = keep[:, None]
    prec = jnp.linalg.inv(
        psum(h_cc) + (damping + 1e-8) * jnp.broadcast_to(jnp.eye(6), h_cc.shape)
    )

    def mv(v):
        v = v * keep6
        out = _schur_matvec(
            v, h_cc, h_cl, h_ll_inv, cam_idx, lmk_idx, num_landmarks,
            damping, psum,
        )
        return out * keep6 + v * (1.0 - keep6)

    def apply_prec(r):
        return jnp.einsum("kij,kj->ki", prec, r) * keep6

    b = g * keep6
    x = jnp.zeros_like(b)
    r = b  # x0 = 0
    z = apply_prec(r)
    p = z
    rz = jnp.sum(r * z)

    def body(carry):
        x, r, p, rz, it = carry
        ap = mv(p)
        alpha = rz / jnp.maximum(jnp.sum(p * ap), _EPS)
        x = x + alpha * p
        r = r - alpha * ap
        z = apply_prec(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, _EPS)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    def cond(carry):
        _, r, _, _, it = carry
        return (it < max_cg) & (jnp.sum(r * r) > cg_tol)

    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x, r, p, rz, jnp.array(0, jnp.int32))
    )
    return x


def _back_substitute(dc, h_cl, h_ll_inv, b_l, cam_idx, lmk_idx, num_landmarks):
    """δx_l = H_ll⁻¹ (b_l − Aᵀ δc), per-observation."""
    u_o = jnp.einsum("oim,oi->om", h_cl, dc[cam_idx])
    at_dc = jax.ops.segment_sum(u_o, lmk_idx, num_segments=num_landmarks)
    return jnp.einsum("lmn,ln->lm", h_ll_inv, b_l - at_dc)


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


@partial(jax.jit, static_argnames=("max_iterations", "max_cg"))
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
    max_cg: int = 60,
) -> Tuple[Transform, jax.Array, jax.Array]:
    """Single-device Schur-complement BA (matrix-free PCG reduced solve).

    Returns ``(poses, landmarks, final_residual)``; pose 0 gauge-fixed by
    default. Scales to mapping-size problems: memory is O(O + L + K), never
    O(L·K).
    """
    k = poses.translation.shape[0]
    l = landmarks.shape[0]
    if obs_weights is None:
        obs_weights = jnp.ones(cam_idx.shape[0])
    if fixed_mask is None:
        fixed_mask = jnp.zeros(k, bool).at[0].set(True)
    keep = 1.0 - fixed_mask.astype(jnp.float32)

    def body(carry):
        poses, landmarks, _, it = carry
        h_cc, h_cl, h_ll_inv, b_l, g, _ = _ba_blocks(
            poses, landmarks, cam_idx, lmk_idx, observations, obs_weights, l
        )
        dc = _pcg_schur(
            g, h_cc, h_cl, h_ll_inv, cam_idx, lmk_idx, l, keep, damping,
            max_cg=max_cg,
        )
        dx = _back_substitute(dc, h_cl, h_ll_inv, b_l, cam_idx, lmk_idx, l)
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
    _, _, _, _, _, resid = _ba_blocks(
        poses, landmarks, cam_idx, lmk_idx, observations, obs_weights, l
    )
    return poses, landmarks, resid


@partial(jax.jit, static_argnames=("mesh", "max_iterations", "max_cg"))
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
    max_cg: int = 60,
) -> Tuple[Transform, jax.Array, jax.Array]:
    """Multi-device Schur BA: landmarks + observations sharded over the
    ``points`` mesh axis (observations of a landmark must live on its shard —
    partition by landmark). Camera-side reductions (the PCG matvec partials,
    the gradient, the preconditioner blocks) each ride ONE ``psum``; landmark
    elimination and back-substitution stay shard-local.

    This is the direct SPMD translation of the per-thread partial normal
    equations + merge pattern (SURVEY §2.10) to ICI collectives.
    """
    k = poses.translation.shape[0]
    if fixed_mask is None:
        fixed_mask = jnp.zeros(k, bool).at[0].set(True)
    keep = 1.0 - fixed_mask.astype(jnp.float32)

    def program(poses, landmarks, cam_idx, lmk_idx, obs, ow):
        l_local = landmarks.shape[0]
        psum = lambda x: jax.lax.psum(x, "points")  # noqa: E731

        def body(carry):
            poses, landmarks, it = carry
            h_cc, h_cl, h_ll_inv, b_l, g, _ = _ba_blocks(
                poses, landmarks, cam_idx, lmk_idx, obs, ow, l_local
            )
            g = psum(g)
            dc = _pcg_schur(
                g, h_cc, h_cl, h_ll_inv, cam_idx, lmk_idx, l_local, keep,
                damping, psum=psum, max_cg=max_cg,
            )
            dx = _back_substitute(
                dc, h_cl, h_ll_inv, b_l, cam_idx, lmk_idx, l_local
            )
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
        _, _, _, _, _, resid = _ba_blocks(
            poses, landmarks, cam_idx, lmk_idx, obs, ow, l_local
        )
        return poses, landmarks, psum(resid)

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
        check_vma=True,
    )
    return shard(
        poses,
        landmarks,
        cam_idx,
        lmk_idx,
        observations,
        obs_valid.astype(jnp.float32),
    )
