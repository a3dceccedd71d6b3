"""Round-3 probe #4: flat-batched fusion (slam/batched_fusion.py) aggregate
throughput at B streams, whole sequence in one jit+scan.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/batched_flat_probe.py 1 4 8 16
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W = 480, 640
CAP = int(1.4 * H * W)
F = 12


def run(B, cfg_kw=None):
    from cilantro_tpu.core.rgbd import CameraIntrinsics, depth_to_points_normals
    from cilantro_tpu.core.transforms import identity
    from cilantro_tpu.slam import synthetic_sequence
    from cilantro_tpu.slam.driver import ate_rmse
    from cilantro_tpu.slam.batched_fusion import (
        batched_fusion_step, batched_seed_localize_target, stack_maps,
    )
    from cilantro_tpu.slam.fusion import FusionConfig, init_map_from_frame

    k = CameraIntrinsics.kinect_640()
    cfg = FusionConfig(localize_stride=2, **(cfg_kw or {}))

    depths, gts = [], []
    for b in range(B):
        d, g = synthetic_sequence(F, H, W, k, seed=b)
        depths.append(np.stack(d))
        gts.append(g)
    depths = jnp.asarray(np.stack(depths))  # (B, F, H, W)

    maps = []
    for b in range(B):
        pts, nrm, val = depth_to_points_normals(depths[b, 0], k)
        maps.append(init_map_from_frame(CAP, pts, nrm, None, val))
    data0 = stack_maps(maps)
    rest = depths[:, 1:].transpose(1, 0, 2, 3)  # (F-1, B, H, W)

    @jax.jit
    def drive(data, rest):
        poses0 = identity(3, batch_shape=(B,))
        _, packed0 = batched_seed_localize_target(data, poses0, k, H, W)

        def step(carry, depth_b):
            data, poses, packed = carry
            p, n, v = jax.vmap(lambda d: depth_to_points_normals(d, k))(
                depth_b
            )
            data, poses, res, _, packed = batched_fusion_step(
                data, p, n, None, v, poses, k, packed,
                height=H, width=W, cfg=cfg,
            )
            return (data, poses, packed), poses.matrix()

        (data, poses, _), mats = jax.lax.scan(
            step, (data, poses0, packed0), rest
        )
        return data, mats

    t0 = time.perf_counter()
    data, mats = drive(data0, rest)
    np.asarray(mats[-1, 0])
    print(f"  B={B}: compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        data, mats = drive(data0, rest)
        np.asarray(mats[-1, 0])
        best = min(best, time.perf_counter() - t0)
    per_step = best / (F - 1)
    mats_np = np.asarray(mats)
    ates = []
    for b in range(B):
        poses = [np.eye(4, dtype=np.float32)] + [m for m in mats_np[:, b]]
        ates.append(ate_rmse(poses, gts[b]))
    print(
        f"  B={B}: {per_step*1e3:.1f} ms/step, {per_step/B*1e3:.2f} ms/frame"
        f" amortized, aggregate {B/per_step:.1f} fps, "
        f"ATE max {max(ates)*1e3:.3f} mm",
        flush=True,
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for b in [int(a) for a in sys.argv[1:]] or [1, 4, 8]:
        run(b)
