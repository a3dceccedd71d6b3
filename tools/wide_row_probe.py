"""Round-3 probe #8: (1,128)-tile "software cache-line" pool ops vs the
per-row XLA ops they would replace, at fusion shapes, plus a minimal
Mosaic compile-time check.

Hypothesis: XLA indexed ops pay ~10-20 ns per ROW regardless of width, and
fusion's index streams are 97-100% aligned consecutive 8-runs — so gathering
the pool as (C/8, 128) tiles cuts descriptor count 8x.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/wide_row_probe.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W = 480, 640
HW = H * W
CAP = int(1.4 * HW)
N = HW  # gather size (model rows per frame)


def bench(fn, *args, n=5, reduce=True):
    if reduce:
        f = jax.jit(
            lambda *a: sum(
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(fn(*a))
            )
        )
    else:
        f = jax.jit(fn)
    np.asarray(f(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def loop_bench(fn, *args, iters=8, n=3):
    """Amortize dispatch: run fn iters times inside one jit, serialized by a
    data dependency folded into the carried accumulator."""

    def body(c, _):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        # Sum the FULL output: a partial slice (e.g. x[:8]) lets XLA fold
        # the slice through the gather and skip most of the work.
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return c + s, None

    f = jax.jit(
        lambda: jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]
    )
    np.asarray(f())
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f())
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    rng = np.random.default_rng(0)
    pool = jnp.asarray(rng.standard_normal((CAP, 16)).astype(np.float32))
    pool128 = pool.reshape(CAP // 8, 128)

    # Run-structured narrow indices: aligned 8-runs, mean run 64 rows.
    nseg = N // 8
    starts = np.maximum(
        0, np.minimum(CAP // 8 - 9, np.sort(rng.integers(0, CAP // 8, nseg)))
    )
    seg_base = starts.astype(np.int32)  # aligned segment -> pool tile
    idx = (seg_base[:, None] * 8 + np.arange(8)[None, :]).reshape(-1)
    idx_j = jnp.asarray(idx.astype(np.int32))
    base_j = jnp.asarray(seg_base)

    t = loop_bench(lambda: pool[idx_j])
    print(f"narrow gather {N} rows x 64B:        {t*1e3:6.2f} ms"
          f" ({t/N*1e9:5.1f} ns/row)", flush=True)

    t = loop_bench(lambda: pool128[base_j])
    print(f"wide   gather {nseg} tiles x 512B:    {t*1e3:6.2f} ms"
          f" ({t/N*1e9:5.1f} ns/orig-row)", flush=True)

    win_j = jnp.stack([base_j, base_j + 1], axis=1)
    t = loop_bench(lambda: pool128[win_j])
    print(f"wide window gather {nseg}x2 tiles:    {t*1e3:6.2f} ms"
          f" ({t/N*1e9:5.1f} ns/orig-row)", flush=True)

    # 16-way lane-block select realign on a (nseg, 256) window.
    def realign(wins, code):
        w16 = wins.reshape(nseg, 16, 16)
        out = jnp.zeros((nseg, 8, 16), jnp.float32)
        for d in range(16):
            out = out + jnp.where(
                (code == d)[..., None], w16[:, d][:, None, :], 0.0
            )
        return out

    code_j = jnp.asarray(rng.integers(0, 16, (nseg, 8)).astype(np.int32))
    wins_flat = jnp.asarray(
        rng.standard_normal((nseg, 256)).astype(np.float32)
    )
    t = loop_bench(lambda: realign(wins_flat, code_j))
    print(f"16-way select realign {nseg} segs:    {t*1e3:6.2f} ms", flush=True)

    # Scatters: narrow 16-col row scatter vs wide tile scatter.
    rows = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
    rows128 = rows.reshape(nseg, 128)
    t = loop_bench(
        lambda: pool.at[idx_j].set(rows, mode="drop", unique_indices=True)
    )
    print(f"narrow row scatter {N} x 64B:        {t*1e3:6.2f} ms"
          f" ({t/N*1e9:5.1f} ns/row)", flush=True)
    t = loop_bench(
        lambda: pool128.at[base_j].set(
            rows128, mode="drop", unique_indices=True
        )
    )
    print(f"wide  tile scatter {nseg} x 512B:     {t*1e3:6.2f} ms"
          f" ({t/N*1e9:5.1f} ns/orig-row)", flush=True)

    # 1-channel int scatter (inverse-map build) for reference.
    vals = jnp.arange(N, dtype=jnp.int32)
    t = loop_bench(
        lambda: jnp.full((CAP,), -1, jnp.int32).at[idx_j].set(
            vals, mode="drop", unique_indices=True
        )
    )
    print(f"1ch int scatter {N}:                 {t*1e3:6.2f} ms"
          f" ({t/N*1e9:5.1f} ns/row)", flush=True)

    # z-buffer style duplicate-target scatter-min, CAP keys -> HW pixels.
    keys = jnp.asarray(
        rng.integers(0, 2**30, CAP).astype(np.int32)
    )
    tgt = jnp.asarray(rng.integers(0, HW, CAP).astype(np.int32))
    t = loop_bench(
        lambda: jnp.full((HW,), 2**31 - 1, jnp.int32).at[tgt].min(
            keys, mode="drop"
        )
    )
    print(f"scatter-min {CAP} keys -> {HW}:   {t*1e3:6.2f} ms"
          f" ({t/CAP*1e9:5.1f} ns/row)", flush=True)

    # Minimal Mosaic kernel compile time (DMA copy grid) — gauges whether
    # the Pallas route is viable on this tunnel.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    x = pool128
    t0 = time.perf_counter()
    out = pl.pallas_call(
        copy_kernel,
        grid=(CAP // 8 // 840,),
        in_specs=[pl.BlockSpec((840, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((840, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((CAP // 8, 128), jnp.float32),
    )(x)
    np.asarray(out[0, 0])
    print(f"tiny pallas copy kernel compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
