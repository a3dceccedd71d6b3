"""Keyframe pose-graph optimization.

Beyond-reference subsystem (the reference has no pose graph — its fusion app
tracks a single frame-to-model pose, ``examples/fusion.cpp:131-141``; this is
the keyframe backend required by the BASELINE north star).

Graph: nodes = keyframe poses T_i (camera-to-world, SE(3)); edges = relative
measurements Z_ij ≈ T_i⁻¹ T_j from registration. Gauss-Newton minimizes

    Σ_ij  ‖ log( Z_ij⁻¹ · T_i⁻¹ · T_j ) ‖²_Λ

with small-angle increments ``T_i ← T_i · Exp(δ_i)`` and the chordal
approximation for the residual (rotation part via the skew of R − Rᵀ), which
is exact to first order and keeps every operation dense-batched. The normal
equations are 6K × 6K (K = #keyframes, small) and solve replicated — the
landmark-scale part of the backend lives in ``bundle_adjustment.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.transforms import (
    Transform,
    axis_angle_to_rotation,
    compose,
    inverse,
    project_to_rotation,
)

_EPS = 1e-12


def _log_so3(r: jax.Array) -> jax.Array:
    """Rotation log via the skew part (chordal, exact to first order)."""
    skew = 0.5 * jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    # Scale by θ/sin(θ) for accuracy at larger angles.
    cos_t = jnp.clip((jnp.trace(r, axis1=-2, axis2=-1) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    scale = jnp.where(theta > 1e-6, theta / jnp.maximum(jnp.sin(theta), _EPS), 1.0)
    return skew * scale[..., None]


def pose_error(t_i: Transform, t_j: Transform, z_ij: Transform) -> jax.Array:
    """6-vector edge residual [rot; trans] of Z⁻¹ T_i⁻¹ T_j."""
    rel = compose(inverse(t_i), t_j)
    err = compose(inverse(z_ij), rel)
    return jnp.concatenate([_log_so3(err.linear), err.translation], axis=-1)


@partial(jax.jit, static_argnames=("max_iterations",))
def optimize_pose_graph(
    poses: Transform,  # batched (K,)
    edge_i: jax.Array,  # (E,) int32
    edge_j: jax.Array,  # (E,)
    measurements: Transform,  # batched (E,) relative transforms Z_ij
    *,
    edge_weights: Optional[jax.Array] = None,
    fixed_mask: Optional[jax.Array] = None,  # (K,) True = gauge-fixed pose
    max_iterations: int = 20,
    damping: float = 1e-6,
    tol: float = 1e-8,
) -> Tuple[Transform, jax.Array]:
    """Batched GN pose-graph optimization; pose 0 is fixed by default.

    Jacobians are numeric (forward differences on the 6 local coordinates per
    pose) — E and K are small (keyframes), so 12 extra residual evaluations
    per edge are cheap and keep the math transparently correct.
    """
    k = poses.translation.shape[0]
    e = edge_i.shape[0]
    if edge_weights is None:
        edge_weights = jnp.ones(e)
    if fixed_mask is None:
        fixed_mask = jnp.zeros(k, bool).at[0].set(True)
    free = ~fixed_mask

    def retract(poses_flat, delta):
        """Apply per-pose local increments δ (K, 6)."""
        rot = axis_angle_to_rotation(delta[:, :3])
        inc = Transform(rot, delta[:, 3:])
        lin = jnp.einsum("kij,kjl->kil", poses_flat.linear, inc.linear)
        tr = (
            jnp.einsum("kij,kj->ki", poses_flat.linear, inc.translation)
            + poses_flat.translation
        )
        return Transform(lin, tr)

    def residuals(p: Transform) -> jax.Array:
        t_i = Transform(p.linear[edge_i], p.translation[edge_i])
        t_j = Transform(p.linear[edge_j], p.translation[edge_j])
        return pose_error(t_i, t_j, measurements)  # (E, 6)

    def gn_body(carry):
        p, _, it = carry
        r0 = residuals(p)  # (E, 6)
        eps = 1e-5

        # Numeric Jacobians per edge endpoint: perturb local coordinate
        # ``col`` of ALL poses, but use the perturbed poses only on one side
        # of the edge — each edge then sees exactly its own endpoint's
        # perturbation, so the column is that endpoint's partial derivative.
        def jac_side(side):
            cols = []
            for col in range(6):
                basis = jnp.zeros((k, 6)).at[:, col].set(eps)
                p_pert = retract(p, basis * free[:, None])
                pi = p_pert if side == 0 else p
                pj = p_pert if side == 1 else p
                t_i = Transform(pi.linear[edge_i], pi.translation[edge_i])
                t_j = Transform(pj.linear[edge_j], pj.translation[edge_j])
                r1 = pose_error(t_i, t_j, measurements)
                cols.append((r1 - r0) / eps)
            return jnp.stack(cols, axis=-1)  # (E, 6 residual, 6 coord)

        j_i = jac_side(0)
        j_j = jac_side(1)

        # Assemble H (K, K, 6, 6) and b (K, 6) with scatter-adds.
        w = edge_weights[:, None, None]
        h_ii = jnp.einsum("eri,erj->eij", j_i * w, j_i)
        h_jj = jnp.einsum("eri,erj->eij", j_j * w, j_j)
        h_ij = jnp.einsum("eri,erj->eij", j_i * w, j_j)
        b_i = -jnp.einsum("eri,er->ei", j_i * w, r0)
        b_j = -jnp.einsum("eri,er->ei", j_j * w, r0)

        h = jnp.zeros((k, k, 6, 6))
        h = h.at[edge_i, edge_i].add(h_ii)
        h = h.at[edge_j, edge_j].add(h_jj)
        h = h.at[edge_i, edge_j].add(h_ij)
        h = h.at[edge_j, edge_i].add(jnp.swapaxes(h_ij, -1, -2))
        b = jnp.zeros((k, 6))
        b = b.at[edge_i].add(b_i)
        b = b.at[edge_j].add(b_j)

        # Gauge fixing: zero rows/cols of fixed poses, identity diagonal.
        fix = fixed_mask.astype(h.dtype)
        keep = 1.0 - fix
        h = h * keep[:, None, None, None] * keep[None, :, None, None]
        h = h.at[jnp.arange(k), jnp.arange(k)].add(
            fix[:, None, None] * jnp.eye(6)
        )
        b = b * keep[:, None]

        h_full = h.transpose(0, 2, 1, 3).reshape(6 * k, 6 * k)
        h_full = h_full + damping * jnp.eye(6 * k)
        delta = jnp.linalg.solve(h_full, b.reshape(-1)).reshape(k, 6)
        delta = delta * free[:, None]
        new_p = retract(p, delta)
        new_p = Transform(project_to_rotation(new_p.linear), new_p.translation)
        return new_p, jnp.linalg.norm(delta), it + 1

    def cond(carry):
        _, dn, it = carry
        return (it < max_iterations) & (dn >= tol)

    p, dn, _ = jax.lax.while_loop(
        cond, gn_body, (poses, jnp.array(jnp.inf), jnp.array(0, jnp.int32))
    )
    return p, dn
