"""Closed-form and Gauss-Newton transform estimators.

TPU-native redesign of ``include/cilantro/registration/transform_estimation.hpp``:

* every estimator consumes *gathered, masked, weighted* correspondence arrays
  (``src (N, D)``, ``dst (N, D)``, ``weights (N,)`` with 0-weight = filtered
  out) instead of dynamic ``CorrespondenceSet`` vectors — the fixed-shape
  analogue of the reference's pluggable weight evaluators
  (``transform_estimation.hpp:116-137``);
* the OpenMP matrix-sum reductions over correspondences
  (``transform_estimation.hpp:285-344``) become masked einsums — one fused
  XLA reduction per normal-equation block, and a direct ``psum`` target when
  sharded (SURVEY §2.10);
* mean-centering for conditioning follows ``transform_estimation.hpp:134-137``;
* the GN update convention ``R(atan‖ω‖, ω̂)·t`` follows
  ``transform_estimation.hpp:349-357``; the symmetric metric (Rusinkiewicz
  SIGGRAPH'19, cited at ``transform_estimation.hpp:479-481``) applies the
  rotation on both sides of the translation (``R·t·R``).

All functions return ``(Transform, valid)`` where ``valid`` mirrors the
reference's ``bool`` return (degenerate inputs → ``False``; outputs are then
identity-ish rather than NaN, keeping jit-safety).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.vma import match_vma
from ..core.transforms import (
    Transform,
    axis_angle_to_rotation,
    compose,
    rot2d,
    skew3,
)

_EPS = 1e-12


def _weighted_means(src, dst, w):
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    mu_s = jnp.einsum("n,ni->i", w, src) / wsum
    mu_d = jnp.einsum("n,ni->i", w, dst) / wsum
    return mu_s, mu_d, wsum


def estimate_rigid_point_to_point(
    src: jax.Array,
    dst: jax.Array,
    weights: Optional[jax.Array] = None,
) -> Tuple[Transform, jax.Array]:
    """Closed-form weighted Kabsch/Umeyama rigid fit ``R src + t ≈ dst``.

    General-dimension, mirrors ``estimateTransformPointToPointMetric``
    (``transform_estimation.hpp:12-48``). Needs ≥ D valid correspondences.
    """
    n, d = src.shape
    w = jnp.ones(n, src.dtype) if weights is None else weights
    mu_s, mu_d, wsum = _weighted_means(src, dst, w)
    cs = src - mu_s
    cd = dst - mu_d
    # Cross-covariance C = Σ w d̃ s̃ᵀ  → R = U diag(1..det) Vᵀ.
    c = jnp.einsum("n,ni,nj->ij", w, cd, cs)
    u, _, vt = jnp.linalg.svd(c)
    det = jnp.linalg.det(u @ vt)
    u_fix = u.at[:, -1].multiply(jnp.where(det < 0, -1.0, 1.0))
    r = u_fix @ vt
    t = mu_d - r @ mu_s
    valid = jnp.sum(w > 0) >= d
    return Transform(r, t), valid


def estimate_affine_point_to_point(
    src: jax.Array,
    dst: jax.Array,
    weights: Optional[jax.Array] = None,
) -> Tuple[Transform, jax.Array]:
    """Closed-form weighted affine LS fit (reference
    ``transform_estimation.hpp:51-102``: D(D+1) unknowns via ``AtA.ldlt()``).

    Solved per output dimension on the homogeneous design matrix, with
    mean-centering for conditioning.
    """
    n, d = src.shape
    w = jnp.ones(n, src.dtype) if weights is None else weights
    mu_s, mu_d, _ = _weighted_means(src, dst, w)
    cs = src - mu_s
    cd = dst - mu_d
    x = jnp.concatenate([cs, jnp.ones((n, 1), src.dtype)], axis=1)  # (N, D+1)
    xtx = jnp.einsum("n,ni,nj->ij", w, x, x)
    xtd = jnp.einsum("n,ni,nj->ij", w, x, cd)  # (D+1, D)
    xtx = xtx + _EPS * jnp.eye(d + 1, dtype=src.dtype)
    beta = jnp.linalg.solve(xtx, xtd)  # (D+1, D)
    a = beta[:d].T  # (D, D)
    t0 = beta[d]
    # Undo centering: A (s - mu_s) + t0 + mu_d = A s + (t0 + mu_d - A mu_s).
    t = t0 + mu_d - a @ mu_s
    valid = jnp.sum(w > 0) >= d + 1
    return Transform(a, t), valid


# ---------------------------------------------------------------------------
# Combined point-to-point + point-to-plane Gauss-Newton (rigid, 2D/3D) and the
# symmetric metric.
# ---------------------------------------------------------------------------


def _solve_normal_equations(jtj, jtr, dof, damping=0.0):
    jtj = jtj + (damping + _EPS) * jnp.eye(dof, dtype=jtj.dtype)
    return jnp.linalg.solve(jtj, jtr)


def _gn_accumulate_3d(
    src,
    dst,
    dst_normals,
    w_pp,
    w_pl,
    omega_points=None,
):
    """One fused JᵀJ/Jᵀr accumulation for the 3D combined metric.

    Unknowns ``x = [ω; t]`` (small-angle). Point-to-point rows: residual
    ``s − d``, ``J = [−[p]× | I]``. Point-to-plane rows: residual
    ``nᵀ(s − d)``, ``J = [(p × n)ᵀ | nᵀ]``. (Maps the OpenMP reduction at
    ``transform_estimation.hpp:285-344``.)

    ``omega_points p`` defaults to ``src`` (plain update ``R s + t``); the
    symmetric metric passes ``src + dst`` (update ``R·T(t)·R``, Rusinkiewicz
    linearization).
    """
    n = src.shape[0]
    dt = src.dtype
    p = src if omega_points is None else omega_points

    jtj = jnp.zeros((6, 6), dt)
    jtr = jnp.zeros((6,), dt)

    # --- point-to-plane block (rank-1 rows, cheap closed form) -------------
    sxn = jnp.cross(p, dst_normals)  # (N, 3)
    j_pl = jnp.concatenate([sxn, dst_normals], axis=1)  # (N, 6)
    r_pl = jnp.einsum("ni,ni->n", dst_normals, src - dst)  # (N,)
    jtj = jtj + jnp.einsum("n,ni,nj->ij", w_pl, j_pl, j_pl)
    jtr = jtr - jnp.einsum("n,ni,n->i", w_pl, j_pl, r_pl)

    # --- point-to-point block ---------------------------------------------
    # J = [−[s]× | I]; accumulate blockwise instead of materializing (N,3,6).
    # JᵀJ = [[ SᵀS_xx,  S_x ], [ S_xᵀ, Σw I ]] with S_x = Σ w (−[s]×)ᵀ = Σ w [s]×.
    sk = skew3(p)  # (N, 3, 3); J_ω = −sk
    r_pp = src - dst  # (N, 3)
    # ω-ω block: Σ w skᵀ sk
    jtj_ww = jnp.einsum("n,nki,nkj->ij", w_pp, sk, sk)
    # ω-t block: J_ωᵀ J_t = (−sk)ᵀ = sk (skew-symmetry), summed with weights.
    jtj_wt = jnp.einsum("n,nij->ij", w_pp, sk)
    jtj_tt = jnp.sum(w_pp) * jnp.eye(3, dtype=dt)
    jtr_w = -jnp.einsum("n,nki,nk->i", w_pp, -sk, r_pp)
    jtr_t = -jnp.einsum("n,ni->i", w_pp, r_pp)

    jtj = jtj + jnp.block([[jtj_ww, jtj_wt], [jtj_wt.T, jtj_tt]])
    jtr = jtr + jnp.concatenate([jtr_w, jtr_t])
    return jtj, jtr


def _gn_accumulate_2d(src, dst, dst_normals, w_pp, w_pl, omega_points=None):
    """2D combined metric: unknowns ``x = [θ; t]`` (3-DoF,
    ``transform_estimation.hpp:116-235``). ``dR/dθ|₀ p = (−p_y, p_x)``."""
    dt = src.dtype
    p = src if omega_points is None else omega_points
    ds = jnp.stack([-p[:, 1], p[:, 0]], axis=1)  # (N, 2)

    j_pl = jnp.concatenate(
        [jnp.einsum("ni,ni->n", ds, dst_normals)[:, None], dst_normals], axis=1
    )  # (N, 3)
    r_pl = jnp.einsum("ni,ni->n", dst_normals, src - dst)
    jtj = jnp.einsum("n,ni,nj->ij", w_pl, j_pl, j_pl)
    jtr = -jnp.einsum("n,ni,n->i", w_pl, j_pl, r_pl)

    r_pp = src - dst
    # J_pp = [ds | I] (2 rows per corr).
    jtj_tt = jnp.sum(w_pp) * jnp.eye(2, dtype=dt)
    jtj_θθ = jnp.einsum("n,ni,ni->", w_pp, ds, ds)[None, None]
    jtj_θt = jnp.einsum("n,ni->i", w_pp, ds)[None, :]
    jtr_θ = -jnp.einsum("n,ni,ni->", w_pp, ds, r_pp)[None]
    jtr_t = -jnp.einsum("n,ni->i", w_pp, r_pp)
    jtj = jtj + jnp.block([[jtj_θθ, jtj_θt], [jtj_θt.T, jtj_tt]])
    jtr = jtr + jnp.concatenate([jtr_θ, jtr_t])
    return jtj, jtr


def _two_sided_update_3d(step):
    """Reference GN update ``Ra · T(cos θ · t) · Ra`` with
    ``θ = atan‖ω‖`` (``transform_estimation.hpp:349-357``) — the rotation is
    applied on both sides of the cos-scaled translation (Rusinkiewicz
    parameterization, shared by the combined and symmetric metrics)."""
    omega, t = step[:3], step[3:]
    na = jnp.linalg.norm(omega)
    theta = jnp.arctan(na)
    scale = jnp.where(na > _EPS, theta / jnp.maximum(na, _EPS), 1.0)
    half_r = axis_angle_to_rotation(omega * scale)
    ta = jnp.cos(theta) * t
    return compose(
        Transform(half_r, jnp.zeros(3, step.dtype)),
        compose(
            Transform(jnp.eye(3, dtype=step.dtype), ta),
            Transform(half_r, jnp.zeros(3, step.dtype)),
        ),
    )


def _two_sided_update_2d(step):
    """2D analogue: ``Ra · T(cos θ · t) · Ra`` with ``θ = atan(step₀)``
    (``transform_estimation.hpp:588-592``)."""
    theta = jnp.arctan(step[0])
    half_r = rot2d(theta, dtype=step.dtype)
    ta = jnp.cos(theta) * step[1:]
    return compose(
        Transform(half_r, jnp.zeros(2, step.dtype)),
        compose(
            Transform(jnp.eye(2, dtype=step.dtype), ta),
            Transform(half_r, jnp.zeros(2, step.dtype)),
        ),
    )


def estimate_rigid_combined_metric(
    src: jax.Array,
    dst: jax.Array,
    dst_normals: jax.Array,
    *,
    point_weights: Optional[jax.Array] = None,
    plane_weights: Optional[jax.Array] = None,
    max_iterations: int = 1,
    convergence_tol: float = 1e-5,
) -> Tuple[Transform, jax.Array]:
    """Rigid combined point-to-point + point-to-plane GN
    (``estimateTransformCombinedMetric``, ``transform_estimation.hpp:238-367``;
    2D variant ``:116-235``): (d+s)-coupled rotation rows, mean-centered
    coordinates, and the two-sided ``Ra·T(cos θ·t)·Ra`` update — exactly the
    reference's per-iteration behavior. Default 1 inner iteration as the
    reference (``transform_estimation.hpp:44``). Weights of 0 drop a
    correspondence from the respective metric (the reference uses two
    independent correspondence sets; a shared gather with two weight channels
    is equivalent and fuses)."""
    n, d = src.shape
    w_pp = jnp.zeros(n, src.dtype) if point_weights is None else point_weights
    w_pl = jnp.ones(n, src.dtype) if plane_weights is None else plane_weights
    acc = _gn_accumulate_3d if d == 3 else _gn_accumulate_2d
    delta_of = _two_sided_update_3d if d == 3 else _two_sided_update_2d
    dof = 6 if d == 3 else 3

    # Mean-centering for conditioning (transform_estimation.hpp:134-137,
    # 256-262): solve in centered coordinates, un-center at the end.
    mu_s, mu_d, _ = _weighted_means(src, dst, w_pp + w_pl)
    src_c = src - mu_s
    dst_c = dst - mu_d

    def body(carry):
        tf, _, it = carry
        s = tf.apply(src_c)
        # Rotation rows couple (d + s) — the same two-sided linearization as
        # the symmetric metric (transform_estimation.hpp:306-341).
        jtj, jtr = acc(s, dst_c, dst_normals, w_pp, w_pl, omega_points=s + dst_c)
        step = _solve_normal_equations(jtj, jtr, dof)
        delta = delta_of(step)
        return compose(delta, tf), jnp.linalg.norm(step), it + 1

    def cond(carry):
        _, dn, it = carry
        return (it < max_iterations) & (dn >= convergence_tol)

    init = match_vma(
        (
            Transform(jnp.eye(d, dtype=src.dtype), jnp.zeros(d, src.dtype)),
            jnp.array(jnp.inf, src.dtype),
            jnp.array(0, jnp.int32),
        ),
        src, dst,
    )
    tf, _, _ = jax.lax.while_loop(cond, body, init)
    # Un-center: T(μ_d) ∘ tf ∘ T(−μ_s) (transform_estimation.hpp:361-364).
    eye = jnp.eye(d, dtype=src.dtype)
    tf = compose(
        Transform(eye, mu_d), compose(tf, Transform(eye, -mu_s))
    )
    valid = jnp.sum((w_pp + w_pl) > 0) >= d
    return tf, valid


def estimate_rigid_symmetric_metric(
    src: jax.Array,
    dst: jax.Array,
    src_normals: jax.Array,
    dst_normals: jax.Array,
    *,
    point_weights: Optional[jax.Array] = None,
    plane_weights: Optional[jax.Array] = None,
    max_iterations: int = 1,
    convergence_tol: float = 1e-5,
) -> Tuple[Transform, jax.Array]:
    """Symmetric-metric rigid GN (Rusinkiewicz SIGGRAPH'19; reference
    ``transform_estimation.hpp:479-739``).

    Plane rows use ``n = n_dst + R n_src`` (``:705-706``) with
    ``J = [((d+s)×n)ᵀ | nᵀ]`` and residual ``nᵀ(s − d)``; the recovered
    incremental transform applies the rotation on both sides:
    ``Δ = R(ω)·T(t)·R(ω)`` (``:349-357`` analog).
    """
    n, d = src.shape
    w_pp = jnp.zeros(n, src.dtype) if point_weights is None else point_weights
    w_pl = jnp.ones(n, src.dtype) if plane_weights is None else plane_weights

    acc = _gn_accumulate_3d if d == 3 else _gn_accumulate_2d
    delta_of = _two_sided_update_3d if d == 3 else _two_sided_update_2d
    dof = 6 if d == 3 else 3

    # Mean-centering for conditioning (transform_estimation.hpp:499-503).
    mu_s, mu_d, _ = _weighted_means(src, dst, w_pp + w_pl)
    src_c = src - mu_s
    dst_c = dst - mu_d

    def body(carry):
        tf, _, it = carry
        s = tf.apply(src_c)
        ns = tf.apply_normals(src_normals)
        nrm = dst_normals + ns  # un-normalized, as the reference (:705-706)
        # Both metrics linearized in the symmetric R·T(t)·R parameterization:
        # J_ω uses (s + d) (point-to-point rows r = s−d with J_ω = −[(s+d)]×,
        # plane rows [( (s+d)×n )ᵀ | nᵀ] with the symmetric normal n).
        jtj, jtr = acc(s, dst_c, nrm, w_pp, w_pl, omega_points=s + dst_c)
        step = _solve_normal_equations(jtj, jtr, dof)
        # Two-sided update with cos(θ)-scaled translation
        # (transform_estimation.hpp:725-731).
        delta = delta_of(step)
        return compose(delta, tf), jnp.linalg.norm(step), it + 1

    def cond(carry):
        _, dn, it = carry
        return (it < max_iterations) & (dn >= convergence_tol)

    init = match_vma(
        (
            Transform(jnp.eye(d, dtype=src.dtype), jnp.zeros(d, src.dtype)),
            jnp.array(jnp.inf, src.dtype),
            jnp.array(0, jnp.int32),
        ),
        src, dst,
    )
    tf, _, _ = jax.lax.while_loop(cond, body, init)
    eye = jnp.eye(d, dtype=src.dtype)
    tf = compose(
        Transform(eye, mu_d), compose(tf, Transform(eye, -mu_s))
    )
    valid = jnp.sum((w_pp + w_pl) > 0) >= d
    return tf, valid


def estimate_affine_combined_metric(
    src: jax.Array,
    dst: jax.Array,
    dst_normals: jax.Array,
    *,
    point_weights: Optional[jax.Array] = None,
    plane_weights: Optional[jax.Array] = None,
) -> Tuple[Transform, jax.Array]:
    """Affine combined-metric closed form (reference
    ``transform_estimation.hpp:369-476``): the objective is linear in the
    D(D+1) affine unknowns, so one LS solve suffices.

    Unknown layout ``x = vec_rows(A) ++ t``. Point rows: ``A s + t − d``;
    plane rows: ``nᵀ(A s + t − d)``.
    """
    n, d = src.shape
    w_pp = jnp.zeros(n, src.dtype) if point_weights is None else point_weights
    w_pl = jnp.ones(n, src.dtype) if plane_weights is None else plane_weights
    dof = d * d + d

    mu_s, mu_d, _ = _weighted_means(src, dst, w_pp + w_pl)
    cs = src - mu_s
    cd = dst - mu_d

    # Plane rows: J_n = [n_0·s, n_1·s, ..., n] flattened row-major blocks.
    j_pl = jnp.concatenate(
        [jnp.einsum("ni,nj->nij", dst_normals, cs).reshape(n, d * d), dst_normals],
        axis=1,
    )  # (N, dof)
    r_pl = jnp.einsum("ni,ni->n", dst_normals, cs - cd)
    jtj = jnp.einsum("n,ni,nj->ij", w_pl, j_pl, j_pl)
    jtr = -jnp.einsum("n,ni,n->i", w_pl, j_pl, r_pl)

    # Point rows, accumulated blockwise: residual rows e_k: A row k ⋅ s + t_k − d_k.
    ss = jnp.einsum("n,ni,nj->ij", w_pp, cs, cs)  # (D, D)
    s1 = jnp.einsum("n,ni->i", w_pp, cs)  # (D,)
    wsum = jnp.sum(w_pp)
    sd = jnp.einsum("n,ni,nj->ij", w_pp, cs, cd)  # Σ w s dᵀ
    d1 = jnp.einsum("n,ni->i", w_pp, cd)
    for k in range(d):
        rows = slice(k * d, (k + 1) * d)
        jtj = jtj.at[rows, rows].add(ss)
        jtj = jtj.at[rows, d * d + k].add(s1)
        jtj = jtj.at[d * d + k, rows].add(s1)
        jtj = jtj.at[d * d + k, d * d + k].add(wsum)
        # Jᵀr for A-row k at x=0 (A=I, t=0): residual e_k = s̃_k − d̃_k, so
        # −Jᵀe = Σ w s̃ (d̃_k − s̃_k).
        jtr = jtr.at[rows].add(sd[:, k] - ss[:, k])
        jtr = jtr.at[d * d + k].add(d1[k] - s1[k])

    x = _solve_normal_equations(jtj, jtr, dof)
    # The objective is linear in (A−I, t) on centered coordinates, so one
    # solve is exact (no GN iteration needed).
    a = jnp.eye(d, dtype=src.dtype) + x[: d * d].reshape(d, d)
    t0 = x[d * d :]
    t = t0 + mu_d - a @ mu_s
    valid = jnp.sum((w_pp + w_pl) > 0) >= d + 1
    return Transform(a, t), valid


def residuals_combined_metric(
    tf: Transform,
    src: jax.Array,
    dst: jax.Array,
    dst_normals: Optional[jax.Array],
    point_weight: float = 0.0,
    plane_weight: float = 1.0,
) -> jax.Array:
    """Per-correspondence residual ``w_p‖d−s‖² + w_n (n·(d−s))²`` (reference
    ``icp_single_transform_combined_metric.hpp:220-243``)."""
    s = tf.apply(src)
    diff = dst - s
    r = point_weight * jnp.sum(diff * diff, axis=-1)
    if dst_normals is not None and plane_weight != 0.0:
        dn = jnp.einsum("ni,ni->n", dst_normals, diff)
        r = r + plane_weight * dn * dn
    return r
