"""Round-3 probe: does batching B independent fusion streams in ONE jitted
program raise aggregate frames/s/chip?

Measures, on the real chip:
  1. single-stream scanned fusion (the committed bench config) — reference
  2. vmap'd fusion over B in {2, 4, 8} streams, per-step and aggregate fps
  3. isolated op scaling under vmap: z-buffer scatter-min, wide-row gather

Run:  PYTHONPATH=/root/repo python tools/batched_fusion_probe.py [B ...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

H, W = 480, 640
CAP = int(1.4 * H * W)
F = 12  # frames per stream (scan length F-1)


def fetch(x):
    return np.asarray(x)


def make_batched_inputs(B):
    from cilantro_tpu.core.rgbd import CameraIntrinsics
    from cilantro_tpu.slam import synthetic_sequence

    k = CameraIntrinsics.kinect_640()
    all_depths, all_gt = [], []
    for b in range(B):
        d, g = synthetic_sequence(F, H, W, k, seed=b)
        all_depths.append(np.stack(d))
        all_gt.append(g)
    return np.stack(all_depths), all_gt, k  # (B, F, H, W)


def run_batched(B):
    from cilantro_tpu.core.rgbd import depth_to_points_normals
    from cilantro_tpu.core.transforms import identity
    from cilantro_tpu.slam.driver import ate_rmse
    from cilantro_tpu.slam.fusion import (
        FusionConfig, fusion_step, init_map_from_frame, seed_localize_target,
    )

    depths, gts, k = make_batched_inputs(B)
    cfg = FusionConfig(localize_stride=2)

    d0 = jnp.asarray(depths[:, 0])  # (B, H, W)

    def init_one(d):
        pts, nrm, valid = depth_to_points_normals(d, k)
        return init_map_from_frame(CAP, pts, nrm, None, valid)

    fmap0 = jax.vmap(init_one)(d0)
    rest = jnp.asarray(depths[:, 1:]).transpose(1, 0, 2, 3)  # (F-1, B, H, W)

    @jax.jit
    def run(fmap0, rest):
        pose0 = identity(3, batch_shape=(B,))

        def seed_one(fmap, pose):
            return seed_localize_target(fmap, pose, k, H, W)

        imap0, packed0 = jax.vmap(seed_one)(fmap0, pose0)

        def step_one(fmap, pose, imap, packed, depth):
            p, n, v = depth_to_points_normals(depth, k)
            fmap, pose, res, imap, packed = fusion_step(
                fmap, p, n, None, v, pose, k,
                cached_index_map=imap, cached_packed_target=packed,
                height=H, width=W, cfg=cfg,
            )
            return fmap, pose, imap, packed, res.iterations

        def step(carry, depth_b):
            fmap, pose, imap, packed = carry
            fmap, pose, imap, packed, iters = jax.vmap(step_one)(
                fmap, pose, imap, packed, depth_b
            )
            return (fmap, pose, imap, packed), (pose.matrix(), iters)

        (fmap, pose, _, _), (mats, iters) = jax.lax.scan(
            step, (fmap0, pose0, imap0, packed0), rest
        )
        return fmap, mats, iters

    t0 = time.perf_counter()
    fmap, mats, iters = run(fmap0, rest)
    fetch(mats[-1])
    print(f"  B={B}: compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fmap, mats, iters = run(fmap0, rest)
        fetch(mats[-1])
        best = min(best, time.perf_counter() - t0)
    per_step = best / (F - 1)
    agg_fps = B / per_step
    # ATE per stream
    mats_np = np.asarray(mats)  # (F-1, B, 4, 4)
    ates = []
    for b in range(B):
        poses = [np.eye(4, dtype=np.float32)] + [m for m in mats_np[:, b]]
        ates.append(ate_rmse(poses, gts[b]))
    print(
        f"  B={B}: {per_step*1e3:.1f} ms/step ({per_step*1e3/B:.1f} ms/frame"
        f" amortized), aggregate {agg_fps:.1f} fps, "
        f"ATE max {max(ates)*1e3:.3f} mm",
        flush=True,
    )
    return per_step, agg_fps


def op_scaling(B):
    """Isolated vmap scaling of the two dominant indexed ops."""
    from cilantro_tpu.core.rgbd import CameraIntrinsics, _zbuffer_winner

    k = CameraIntrinsics.kinect_640()
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((B, CAP, 3)).astype(np.float32) * 0.5
    pts[..., 2] = np.abs(pts[..., 2]) + 1.0
    pts_j = jnp.asarray(pts)
    valid = jnp.ones((B, CAP), bool)

    zb = jax.jit(jax.vmap(lambda p, v: _zbuffer_winner(p, v, k, H, W)))
    out = zb(pts_j, valid)
    fetch(out[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = zb(pts_j, valid)
        fetch(out[0][:, 0, 0])
        best = min(best, time.perf_counter() - t0)
    print(
        f"  zbuffer vmap B={B}: {best*1e3:.1f} ms "
        f"({best/B*1e3:.2f} ms/stream, {best/(B*CAP)*1e9:.1f} ns/row)",
        flush=True,
    )

    # wide-row gather: (B, C, 16) pool, (B, H*W) indices
    pool = jnp.asarray(rng.standard_normal((B, CAP, 16)).astype(np.float32))
    idx = jnp.asarray(
        rng.integers(0, CAP, size=(B, H * W)).astype(np.int32)
    )
    g = jax.jit(jax.vmap(lambda p, i: p[i]))
    out = g(pool, idx)
    fetch(out[:, 0, 0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = g(pool, idx)
        fetch(out[:, 0, 0])
        best = min(best, time.perf_counter() - t0)
    print(
        f"  row-gather vmap B={B}: {best*1e3:.1f} ms "
        f"({best/B*1e3:.2f} ms/stream, {best/(B*H*W)*1e9:.1f} ns/row)",
        flush=True,
    )


if __name__ == "__main__":
    bs = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    print("== op scaling ==", flush=True)
    for b in [1, 8]:
        op_scaling(b)
    print("== end-to-end batched fusion ==", flush=True)
    for b in bs:
        run_batched(b)
