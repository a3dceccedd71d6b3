"""Multi-device SPMD registration over a 2D device mesh.

The reference's only parallelism is OpenMP threads over points
(SURVEY §2.10; e.g. ``core/kd_tree.hpp:199``, ``transform_estimation.hpp:285-344``).
The TPU-native equivalent is SPMD over a ``jax.sharding.Mesh`` with two axes:

* ``points`` — data parallelism over source/query points (the OpenMP loop);
* ``map``   — spatial/model parallelism over the destination ("map") cloud,
  so maps larger than one device's HBM still get exact NN search.

Collective structure per ICP iteration:

1. each (points, map) block computes its local best-NN candidate per query
   against its map shard (tiled brute force, MXU);
2. candidates (distance + gathered payload) are ``all_gather``-ed along
   ``map`` and the winner selected — a k=1 tournament instead of moving
   indices across shards;
3. per-device partial ``JᵀJ / Jᵀr`` (6×6 / 6) are ``psum``-med over BOTH axes
   — the direct translation of the reference's OpenMP matrix-sum reduction
   (``core/openmp_reductions.hpp:3-33``) to XLA collectives over ICI;
4. the tiny 6-DoF solve runs replicated on every device.

Everything is a single jitted ``shard_map`` program; the ICP outer loop is a
``lax.while_loop`` inside it, so a full multi-device registration is one XLA
computation with no host round-trips.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.transforms import Transform, compose, identity, reproject_rigid
from ..core.vma import match_vma
from ..neighbors.bruteforce import INVALID_DIST, _TILE_DISTS
from ..registration.transform_estimation import (
    _gn_accumulate_3d,
    _solve_normal_equations,
)
from ..registration.icp import _delta_norm
from ..core.transforms import axis_angle_to_rotation

_EPS = 1e-12


def make_mesh(
    n_points_shards: Optional[int] = None, n_map_shards: int = 1, devices=None
) -> Mesh:
    """Build a ``(points, map)`` mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_points_shards is None:
        n_points_shards = devices.size // n_map_shards
    return Mesh(
        devices.reshape(n_points_shards, n_map_shards), ("points", "map")
    )


def _local_nn_payload(q, keys, payload, key_valid, tile_m=2048):
    """Best key per query within this shard: returns (dist, payload_row).

    ``payload`` carries whatever the winner must contribute downstream
    (dst point ‖ dst normal), so no cross-shard index gather is ever needed.
    """
    mn = keys.shape[0]
    pad = (-mn) % tile_m
    if pad:
        keys = jnp.pad(keys, ((0, pad), (0, 0)))
        payload = jnp.pad(payload, ((0, pad), (0, 0)))
        key_valid = jnp.pad(key_valid, (0, pad))
    n_mt = keys.shape[0] // tile_m
    key_tiles = keys.reshape(n_mt, tile_m, -1)
    pay_tiles = payload.reshape(n_mt, tile_m, -1)
    val_tiles = key_valid.reshape(n_mt, tile_m)
    dist_fn = _TILE_DISTS["l2"]

    def scan_tile(carry, inp):
        best_d, best_p = carry
        m_tile, p_tile, v_tile = inp
        dist = dist_fn(q, m_tile)
        dist = jnp.where(v_tile[None, :], dist, INVALID_DIST)
        tile_best = jnp.min(dist, axis=1)
        arg = jnp.argmin(dist, axis=1)
        tile_pay = p_tile[arg]
        better = tile_best < best_d
        return (
            jnp.where(better, tile_best, best_d),
            jnp.where(better[:, None], tile_pay, best_p),
        ), None

    init = match_vma(
        (
            jnp.full((q.shape[0],), INVALID_DIST),
            jnp.zeros((q.shape[0], payload.shape[1]), payload.dtype),
        ),
        q, keys,
    )
    (best_d, best_p), _ = jax.lax.scan(
        scan_tile, init, (key_tiles, pay_tiles, val_tiles)
    )
    return best_d, best_p


def _icp_gn_loop(
    src, sv, nn_fn, psum_axes, *, max_iterations, convergence_tol,
    max_corr_dist_sq, point_weight, plane_weight,
):
    """Shared shard_map-body ICP Gauss-Newton loop: per-iteration NN via
    ``nn_fn(s) -> (best_d, payload[dst|dst_normal])``, psum'd normal
    equations over ``psum_axes``, arctan-damped axis-angle update, SO(3)
    re-projection, masked convergence test. Both the all_gather-tournament
    and the ring entry points wrap this one body."""

    def body(carry):
        tf, _, it = carry
        s = tf.apply(src)
        best_d, best_p = nn_fn(s)
        w = (sv & (best_d <= max_corr_dist_sq)).astype(s.dtype)
        jtj, jtr = _gn_accumulate_3d(
            s,
            best_p[:, :3],
            best_p[:, 3:],
            w * point_weight,
            w * plane_weight,
        )
        jtj = jax.lax.psum(jtj, psum_axes)
        jtr = jax.lax.psum(jtr, psum_axes)
        step = _solve_normal_equations(jtj, jtr, 6)
        omega, t = step[:3], step[3:]
        theta = jnp.linalg.norm(omega)
        scale = jnp.where(
            theta > _EPS, jnp.arctan(theta) / jnp.maximum(theta, _EPS), 1.0
        )
        delta = Transform(axis_angle_to_rotation(omega * scale), t)
        new_tf = reproject_rigid(compose(delta, tf))
        return new_tf, _delta_norm(delta), it + 1

    def cond(carry):
        _, dn_, it = carry
        return (it < max_iterations) & (dn_ >= convergence_tol)

    init = (
        identity(3, dtype=src.dtype),
        jnp.array(jnp.inf, src.dtype),
        jnp.array(0, jnp.int32),
    )
    tf, _, iters = jax.lax.while_loop(cond, body, init)
    return tf, iters


@partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "max_iterations",
        "max_corr_dist_sq",
        "point_weight",
        "plane_weight",
        "convergence_tol",
    ),
)
def sharded_combined_icp(
    src_points: jax.Array,
    src_valid: jax.Array,
    dst_points: jax.Array,
    dst_normals: jax.Array,
    dst_valid: jax.Array,
    *,
    mesh: Mesh,
    max_iterations: int = 15,
    convergence_tol: float = 1e-5,
    max_corr_dist_sq: float = 0.0001,
    point_weight: float = 0.0,
    plane_weight: float = 1.0,
) -> Tuple[Transform, jax.Array]:
    """Fully-sharded rigid combined-metric ICP (3D).

    ``src_points (N, 3)`` is sharded over ``points``; ``dst_* (M, 3)`` over
    ``map``. Returns the replicated final ``Transform`` and iteration count.
    """

    def step_program(src, sv, dst, dn, dv):
        # Inside shard_map: src (N/P, 3); dst (M/Q, 3) etc.
        payload = jnp.concatenate([dst, dn], axis=1)  # (M/Q, 6)

        def nn_fn(s):
            d_loc, p_loc = _local_nn_payload(s, dst, payload, dv)
            # k=1 tournament across the map axis.
            d_all = jax.lax.all_gather(d_loc, "map")  # (Q, N/P)
            p_all = jax.lax.all_gather(p_loc, "map")  # (Q, N/P, 6)
            win = jnp.argmin(d_all, axis=0)  # (N/P,)
            rows = jnp.arange(s.shape[0])
            return d_all[win, rows], p_all[win, rows]

        # OpenMP matrix-sum reduction → psum over both mesh axes.
        return _icp_gn_loop(
            src, sv, nn_fn, ("points", "map"),
            max_iterations=max_iterations,
            convergence_tol=convergence_tol,
            max_corr_dist_sq=max_corr_dist_sq,
            point_weight=point_weight,
            plane_weight=plane_weight,
        )

    shard = jax.shard_map(
        step_program,
        mesh=mesh,
        in_specs=(
            P("points", None),
            P("points"),
            P("map", None),
            P("map", None),
            P("map"),
        ),
        out_specs=(
            jax.tree_util.tree_map(lambda _: P(), Transform(jnp.eye(3), jnp.zeros(3))),
            P(),
        ),
        check_vma=True,
    )
    return shard(src_points, src_valid, dst_points, dst_normals, dst_valid)


@partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "max_iterations",
        "max_corr_dist_sq",
        "point_weight",
        "plane_weight",
        "convergence_tol",
    ),
)
def sharded_combined_icp_ring(
    src_points: jax.Array,  # (N, 3) sharded over 'points'
    src_valid: jax.Array,
    dst_points: jax.Array,  # (M, 3) sharded over 'points'
    dst_normals: jax.Array,
    dst_valid: jax.Array,
    *,
    mesh: Mesh,
    max_iterations: int = 15,
    convergence_tol: float = 1e-5,
    max_corr_dist_sq: float = 0.0001,
    point_weight: float = 0.0,
    plane_weight: float = 1.0,
) -> Tuple[Transform, jax.Array]:
    """Large-map rigid ICP: BOTH clouds shard over the ``points`` axis and no
    device ever materializes more than one shard of either — the
    :func:`ring_nn1` rotation replaces the all_gather k=1 tournament of
    :func:`sharded_combined_icp` (whose gathered candidate block grows with
    the mesh). Memory per device: O(N/D + M/D); communication per iteration:
    D ``ppermute`` hops of the query block + one 6×6 ``psum``.
    """
    axis = "points"
    nshards = mesh.shape[axis]

    def step_program(src, sv, dst, dn, dv):
        payload = jnp.concatenate([dst, dn], axis=1)  # (M/D, 6)

        def nn_fn(s):
            return _ring_nn1_program(s, sv, dst, payload, dv, axis, nshards)

        return _icp_gn_loop(
            src, sv, nn_fn, (axis,),
            max_iterations=max_iterations,
            convergence_tol=convergence_tol,
            max_corr_dist_sq=max_corr_dist_sq,
            point_weight=point_weight,
            plane_weight=plane_weight,
        )

    shard = jax.shard_map(
        step_program,
        mesh=mesh,
        in_specs=(
            P(axis, None),
            P(axis),
            P(axis, None),
            P(axis, None),
            P(axis),
        ),
        out_specs=(
            jax.tree_util.tree_map(
                lambda _: P(), Transform(jnp.eye(3), jnp.zeros(3))
            ),
            P(),
        ),
        check_vma=True,
    )
    return shard(src_points, src_valid, dst_points, dst_normals, dst_valid)


def shard_cloud_arrays(mesh: Mesh, axis: str, *arrays):
    """Place arrays with their leading dim sharded over ``axis`` (pads are the
    caller's responsibility; capacities must divide the axis size)."""
    out = []
    for a in arrays:
        spec = P(axis, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


# ---------------------------------------------------------------------------
# Ring-rotation NN: the ring-attention analogue for neighbor search.
# ---------------------------------------------------------------------------


def _ring_nn1_program(q, qv, mp, pay, mv, axis: str, nshards: int):
    """Ring NN body, usable inside any ``shard_map`` over ``axis`` (the ICP
    large-map mode embeds it in its iteration loop)."""
    best_d = jnp.full((q.shape[0],), INVALID_DIST)
    best_p = jnp.zeros((q.shape[0], pay.shape[1]), pay.dtype)
    carry = (q, best_d, best_p)
    perm = [(i, (i + 1) % nshards) for i in range(nshards)]
    for _ in range(nshards):
        qb, bd, bp = carry
        d_loc, p_loc = _local_nn_payload(qb, mp, pay, mv)
        better = d_loc < bd
        bd = jnp.where(better, d_loc, bd)
        bp = jnp.where(better[:, None], p_loc, bp)
        carry = jax.lax.ppermute((qb, bd, bp), axis, perm)
    _, bd, bp = carry
    bd = jnp.where(qv, bd, INVALID_DIST)
    return bd, bp


@partial(jax.jit, static_argnames=("mesh",))
def ring_nn1(
    queries: jax.Array,  # (Q, 3) sharded over 'points'
    query_valid: jax.Array,
    map_points: jax.Array,  # (M, 3) sharded over 'points'
    map_payload: jax.Array,  # (M, P) sharded — carried to the winner
    map_valid: jax.Array,
    *,
    mesh: Mesh,
) -> Tuple[jax.Array, jax.Array]:
    """Exact sharded NN without replication: query blocks ROTATE around the
    device ring (``ppermute`` over ICI) while map shards stay resident; each
    block's running best travels with it and is home after a full lap.

    This is the memory-scaling alternative to the all_gather tournament in
    :func:`sharded_combined_icp`: no array ever holds more than one shard of
    either cloud per device (SURVEY §5's ring-exchange plan). Returns
    ``(dist (Q,), payload (Q, P))`` with INVALID_DIST where nothing matched.
    """
    axis = "points"
    nshards = mesh.shape[axis]

    def program(q, qv, mp, pay, mv):
        return _ring_nn1_program(q, qv, mp, pay, mv, axis, nshards)

    return jax.shard_map(
        program,
        mesh=mesh,
        in_specs=(
            P("points", None),
            P("points"),
            P("points", None),
            P("points", None),
            P("points"),
        ),
        out_specs=(P("points"), P("points", None)),
        check_vma=True,
    )(queries, query_valid, map_points, map_payload, map_valid)
