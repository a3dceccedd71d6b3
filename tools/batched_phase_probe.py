"""Round-3 probe #2: per-phase timing of vmapped fusion at B streams.

Times, on the real chip, for B in argv (default 1, 8):
  - batched localize only (cached packed target, the steady-state path)
  - batched integrate only (row_scatter vs inverse_gather update modes)
  - the ICP while_loop iteration count distribution (joint convergence cost)

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/batched_phase_probe.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W = 480, 640
CAP = int(1.4 * H * W)


def bench(fn, *args, n=3, fetch=None):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from cilantro_tpu.core.rgbd import CameraIntrinsics, depth_to_points_normals
    from cilantro_tpu.core.transforms import identity
    from cilantro_tpu.slam import synthetic_sequence
    from cilantro_tpu.slam.fusion import (
        FusionConfig, init_map_from_frame, integrate_frame_with_imap,
        localize, seed_localize_target,
    )
    import dataclasses

    k = CameraIntrinsics.kinect_640()
    bs = [int(a) for a in sys.argv[1:]] or [1, 8]

    for B in bs:
        depths = []
        for b in range(B):
            d, _ = synthetic_sequence(3, H, W, k, seed=b)
            depths.append(np.stack(d))
        depths = jnp.asarray(np.stack(depths))  # (B, 3, H, W)

        def init_one(d):
            pts, nrm, valid = depth_to_points_normals(d, k)
            return init_map_from_frame(CAP, pts, nrm, None, valid)

        fmap = jax.vmap(init_one)(depths[:, 0])
        pose0 = identity(3, batch_shape=(B,))
        imap, packed = jax.vmap(
            lambda m, p: seed_localize_target(m, p, k, H, W)
        )(fmap, pose0)

        pts1, nrm1, val1 = jax.vmap(
            lambda d: depth_to_points_normals(d, k)
        )(depths[:, 1])

        cfg = FusionConfig(localize_stride=2)

        # --- batched localize (packed target warm path, stride 2) ----------
        s = cfg.localize_stride
        rows = jnp.arange(0, H, s)
        cols = jnp.arange(0, W, s)
        sub = (rows[:, None] * W + cols[None, :]).reshape(-1)

        @jax.jit
        def loc(fmap, pts, nrm, val, pose, packed):
            def one(m, p, n, v, po, pk):
                return localize(
                    m, p[sub], n[sub], v[sub], po, k,
                    height=H, width=W, cfg=cfg, packed_target=pk,
                )
            return jax.vmap(one)(fmap, pts, nrm, val, pose, packed)

        t, (pose1, res) = bench(loc, fmap, pts1, nrm1, val1, pose0, packed)
        print(
            f"B={B} localize(packed,stride2): {t*1e3:.1f} ms "
            f"({t/B*1e3:.2f}/stream), iters={np.asarray(res.iterations)}",
            flush=True,
        )

        # --- batched integrate, both update modes ---------------------------
        for mode in ("row_scatter", "inverse_gather"):
            cfgm = dataclasses.replace(cfg, update_mode=mode)

            @jax.jit
            def integ(fmap, pts, nrm, val, pose):
                def one(m, p, n, v, po):
                    return integrate_frame_with_imap(
                        m, p, n, None, v, po, k, height=H, width=W, cfg=cfgm
                    )
                return jax.vmap(one)(fmap, pts, nrm, val, pose)

            t, _ = bench(integ, fmap, pts1, nrm1, val1, pose1)
            print(
                f"B={B} integrate[{mode}]: {t*1e3:.1f} ms "
                f"({t/B*1e3:.2f}/stream)",
                flush=True,
            )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
