"""Round-3 probe #3: bisect the vmapped integrate into stages and time each
at B=1 vs B=8 to find which op defeats batching.

Stages: A transform+zbuffer | B pool row gather | C classify+build rows |
D cumsum+alloc | E apply_pool_update (both modes) | F pack target.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/batched_integrate_bisect.py
"""
import sys
import time
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

H, W = 480, 640
CAP = int(1.4 * H * W)
HW = H * W


def bench(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from cilantro_tpu.core.rgbd import (
        CameraIntrinsics, depth_to_points_normals, _zbuffer_winner,
    )
    from cilantro_tpu.core.transforms import identity, inverse
    from cilantro_tpu.slam import synthetic_sequence
    from cilantro_tpu.slam.fusion import (
        FusionConfig, _classify_and_build_rows, apply_pool_update,
        free_slot_table, init_map_from_frame, pack_camera_target,
    )

    k = CameraIntrinsics.kinect_640()
    cfg = FusionConfig()

    for B in [int(a) for a in sys.argv[1:]] or [1, 8]:
        depths = []
        for b in range(B):
            d, _ = synthetic_sequence(2, H, W, k, seed=b)
            depths.append(np.stack(d))
        depths = jnp.asarray(np.stack(depths))
        fmap = jax.vmap(
            lambda d: init_map_from_frame(
                CAP, *depth_to_points_normals(d, k)[:2], None,
                depth_to_points_normals(d, k)[2],
            )
        )(depths[:, 0])
        pts1, nrm1, val1 = jax.vmap(
            lambda d: depth_to_points_normals(d, k)
        )(depths[:, 1])
        pose = identity(3, batch_shape=(B,))
        cam = inverse(pose)

        # A: transform + zbuffer
        @jax.jit
        def stage_a(fmap, cam):
            def one(m, c):
                mc = c.apply(m.points)
                return _zbuffer_winner(mc, m.valid, k, H, W)
            return jax.vmap(one)(fmap, cam)

        t = bench(stage_a, fmap, cam)
        imap, mdepth = stage_a(fmap, cam)
        print(f"B={B} A zbuffer:        {t*1e3:7.1f} ms ({t/B*1e3:6.2f}/stream)", flush=True)

        imap_flat = imap.reshape(B, -1)
        m_ok = imap_flat >= 0
        m_idx = jnp.where(m_ok, imap_flat, 0)

        # B: pool row gather
        @jax.jit
        def stage_b(fmap, m_ok, m_idx):
            def one(m, ok, idx):
                return jnp.where(ok[:, None], m.data[idx], 0.0)
            return jax.vmap(one)(fmap, m_ok, m_idx)

        t = bench(stage_b, fmap, m_ok, m_idx)
        mrows = stage_b(fmap, m_ok, m_idx)
        print(f"B={B} B pool gather:    {t*1e3:7.1f} ms ({t/B*1e3:6.2f}/stream)", flush=True)

        # C: classify + build rows
        @jax.jit
        def stage_c(mrows, m_ok, mdepth, pts, nrm, val, pose, cam):
            def one(mr, ok, md, p, n, v, po, c):
                return _classify_and_build_rows(
                    mr, ok, md.reshape(-1), p, n, v, None, po, c, k, H, W, cfg
                )
            return jax.vmap(one)(mrows, m_ok, mdepth, pts, nrm, val, pose, cam)

        t = bench(stage_c, mrows, m_ok, mdepth, pts1, nrm1, val1, pose, cam)
        do_fuse, do_aug, do_carve, fuse_rows, aug_rows, carve_row = stage_c(
            mrows, m_ok, mdepth, pts1, nrm1, val1, pose, cam
        )
        print(f"B={B} C classify:       {t*1e3:7.1f} ms ({t/B*1e3:6.2f}/stream)", flush=True)

        # D: cumsum + tail alloc + target/row select
        @jax.jit
        def stage_d(fmap, do_fuse, do_aug, do_carve, m_idx, fuse_rows,
                    aug_rows):
            def one(m, df, da, dc, mi, fr, ar):
                aug_rank = jnp.cumsum(da.astype(jnp.int32)) - 1
                cap_ids = jnp.arange(m.capacity, dtype=jnp.int32)
                tail = (jnp.max(jnp.where(m.valid, cap_ids, -1)) + 1).astype(
                    jnp.int32
                )
                aug_slot = tail + aug_rank
                aug_ok = da & (aug_slot < m.capacity)
                aug_slot = jnp.clip(aug_slot, 0, m.capacity - 1)
                oob = m.capacity + jnp.arange(HW, dtype=jnp.int32)
                tgt = jnp.where(
                    df | dc, mi, jnp.where(aug_ok, aug_slot, oob)
                )
                cr = jnp.zeros((fr.shape[1],), jnp.float32).at[0:3].set(1e30)
                rows_out = jnp.where(
                    df[:, None], fr, jnp.where(dc[:, None], cr[None, :], ar)
                )
                return tgt, rows_out
            return jax.vmap(one)(
                fmap, do_fuse, do_aug, do_carve, m_idx, fuse_rows, aug_rows
            )

        t = bench(stage_d, fmap, do_fuse, do_aug, do_carve, m_idx, fuse_rows,
                  aug_rows)
        tgt, rows_out = stage_d(
            fmap, do_fuse, do_aug, do_carve, m_idx, fuse_rows, aug_rows
        )
        print(f"B={B} D alloc+select:   {t*1e3:7.1f} ms ({t/B*1e3:6.2f}/stream)", flush=True)

        # E: pool update, both modes
        for mode in ("row_scatter", "inverse_gather"):
            cfgm = dataclasses.replace(cfg, update_mode=mode)

            @jax.jit
            def stage_e(fmap, tgt, rows_out):
                def one(m, tg, ro):
                    return apply_pool_update(m.data, tg, ro, cfgm)
                return jax.vmap(one)(fmap, tgt, rows_out)

            t = bench(stage_e, fmap, tgt, rows_out)
            print(f"B={B} E update[{mode:>14}]: {t*1e3:7.1f} ms ({t/B*1e3:6.2f}/stream)", flush=True)

        # F: pack target
        @jax.jit
        def stage_f(mrows, do_fuse, fuse_rows, m_ok, do_carve, cam):
            def one(mr, df, fr, ok, dc, c):
                post = jnp.where(df[:, None], fr, mr)
                alive = ok & ~dc & (post[:, 10] > 0.5)
                return pack_camera_target(post, alive, c)
            return jax.vmap(one)(mrows, do_fuse, fuse_rows, m_ok, do_carve, cam)

        t = bench(stage_f, mrows, do_fuse, fuse_rows, m_ok, do_carve, cam)
        print(f"B={B} F pack target:    {t*1e3:7.1f} ms ({t/B*1e3:6.2f}/stream)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
