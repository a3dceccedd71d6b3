"""Round-3 probe #5: per-stage timing of the FLAT batched integrate at
B in {2,4,8,16} to find the superlinear op. Stages run on synthetic data
shaped like the real pipeline (no pipeline coupling).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/flat_stage_bisect.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W = 480, 640
CAP = int(1.4 * H * W)
HW = H * W


def bench(fn, *args, n=3):
    # axon: block_until_ready returns early; reduce to a scalar and fetch.
    def reduce_leaves(*a):
        out = fn(*a)
        # Sum EVERYTHING so no operand column can be sliced away pre-gather.
        return sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(out)
        )

    f = jax.jit(reduce_leaves)
    np.asarray(f(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from cilantro_tpu.core.rgbd import CameraIntrinsics, _zbuffer_winner_batched

    k = CameraIntrinsics.kinect_640()
    rng = np.random.default_rng(0)

    for B in [int(a) for a in sys.argv[1:]] or [2, 4, 8, 16]:
        # plausible camera-frame points: in front, mostly in frustum
        pts = rng.standard_normal((B, CAP, 3)).astype(np.float32) * 0.3
        pts[..., 2] = np.abs(pts[..., 2]) + 1.2
        pts_j = jnp.asarray(pts)
        valid = jnp.ones((B, CAP), bool)

        zb = jax.jit(
            lambda p, v: _zbuffer_winner_batched(p, v, k, H, W)
        )
        t = bench(zb, pts_j, valid)
        print(
            f"B={B:2d} flat zbuffer: {t*1e3:7.1f} ms ({t/B*1e3:6.2f}/stream,"
            f" {t/(B*CAP)*1e9:5.1f} ns/row)", flush=True,
        )

        # flat gather: (B*CAP, 16) pool, B*HW mostly-sequential indices
        pool = jnp.asarray(
            rng.standard_normal((B * CAP, 16)).astype(np.float32)
        )
        # near-sequential indices with jitter (image-ordered pool)
        base = np.arange(HW, dtype=np.int64)[None, :] * CAP // HW
        idx = base + rng.integers(-8, 8, size=(B, HW))
        idx = np.clip(idx, 0, CAP - 1) + (np.arange(B) * CAP)[:, None]
        idx_j = jnp.asarray(idx.reshape(-1).astype(np.int32))

        g = jax.jit(lambda p, i: p[i])
        t = bench(g, pool, idx_j)
        print(
            f"B={B:2d} flat gather seq: {t*1e3:6.1f} ms ({t/B*1e3:6.2f}/stream,"
            f" {t/(B*HW)*1e9:5.1f} ns/row)", flush=True,
        )

        # flat 1-ch scatter (inverse map build)
        tgt = idx_j  # unique-ish; use arange scatter semantics anyway
        sc = jax.jit(
            lambda t_, v: jnp.full((B * CAP,), -1, jnp.int32)
            .at[t_]
            .set(v, mode="drop", unique_indices=True)
        )
        vals = jnp.arange(B * HW, dtype=jnp.int32)
        t = bench(sc, tgt, vals)
        print(
            f"B={B:2d} flat 1ch scatter: {t*1e3:5.1f} ms ({t/B*1e3:6.2f}/stream,"
            f" {t/(B*HW)*1e9:5.1f} ns/row)", flush=True,
        )

        # full-pool select rewrite (inverse_gather tail): gather rows_out by
        # pix_of_slot + where
        rows_out = jnp.asarray(
            rng.standard_normal((B * HW, 16)).astype(np.float32)
        )
        pix_of_slot = sc(tgt, vals)

        def rewrite(pool, rows_out, pix_of_slot):
            touched = pix_of_slot >= 0
            return jnp.where(
                touched[:, None],
                rows_out[jnp.where(touched, pix_of_slot, 0)],
                pool,
            )

        rw = jax.jit(rewrite)
        t = bench(rw, pool, rows_out, pix_of_slot)
        print(
            f"B={B:2d} flat rewrite:    {t*1e3:6.1f} ms ({t/B*1e3:6.2f}/stream,"
            f" {t/(B*CAP)*1e9:5.1f} ns/row)", flush=True,
        )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
