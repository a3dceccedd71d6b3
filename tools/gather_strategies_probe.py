"""Round-3 probe #6: wide-row gather strategies at fusion shapes.

Compares, on the real chip:
  1. plain XLA gather, single stream (430k,16)[307k run-structured idx]
  2. coalesced_gather (run-coalescing DMA kernel), same
  3. flat B=8 plain gather (3.4M,16)[2.46M]   <- the observed 2x cliff
  4. B=8 chunked per-stream gathers (8 rank-1 gathers on slices)
  5. B=8 chunked coalesced gathers

Indices are run-structured like real fusion maps (97-100% consecutive
aligned 8-blocks): long consecutive runs with occasional jumps.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/gather_strategies_probe.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W = 480, 640
HW = H * W
CAP = int(1.4 * HW)
B = 8


def bench(fn, *args, n=5):
    # axon: block_until_ready returns early; fetch a SCALAR to time honestly.
    # Sum the FULL output so no operand column can be sliced away pre-gather.
    f = jax.jit(lambda *a: jnp.sum(fn(*a)))
    np.asarray(f(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def run_structured_indices(rng, n_idx, cap):
    """Mostly-consecutive runs (mean length ~64) with random jump starts."""
    n_jumps = n_idx // 64
    starts = np.sort(rng.integers(0, cap - 64, size=n_jumps))
    idx = np.empty(n_idx, np.int64)
    pos = 0
    j = 0
    while pos < n_idx:
        run = min(64, n_idx - pos)
        s = starts[j % n_jumps]
        idx[pos:pos + run] = np.arange(s, s + run)
        pos += run
        j += 1
    return np.clip(idx, 0, cap - 1)


def main():
    from cilantro_tpu.core.coalesced import coalesced_gather

    rng = np.random.default_rng(0)
    pool1 = jnp.asarray(rng.standard_normal((CAP, 16)).astype(np.float32))
    idx1 = jnp.asarray(
        run_structured_indices(rng, HW, CAP).astype(np.int32)
    )

    g1 = jax.jit(lambda p, i: p[i])
    t = bench(g1, pool1, idx1)
    print(f"1-stream plain gather:      {t*1e3:6.1f} ms ({t/HW*1e9:5.1f} ns/row)",
          flush=True)

    gc = jax.jit(lambda p, i: coalesced_gather(p, i))
    t = bench(gc, pool1, idx1)
    print(f"1-stream coalesced gather:  {t*1e3:6.1f} ms ({t/HW*1e9:5.1f} ns/row)",
          flush=True)

    poolB = jnp.asarray(
        rng.standard_normal((B * CAP, 16)).astype(np.float32)
    )
    idxB_local = np.stack(
        [run_structured_indices(rng, HW, CAP) for _ in range(B)]
    )
    idxB_flat = jnp.asarray(
        (idxB_local + (np.arange(B) * CAP)[:, None]).reshape(-1).astype(
            np.int32
        )
    )
    idxB = jnp.asarray(idxB_local.astype(np.int32))  # (B, HW) local

    gf = jax.jit(lambda p, i: p[i])
    t = bench(gf, poolB, idxB_flat)
    print(f"B=8 flat plain gather:      {t*1e3:6.1f} ms ({t/(B*HW)*1e9:5.1f} ns/row)",
          flush=True)

    def chunked(p, i):
        outs = []
        for b in range(B):
            outs.append(jax.lax.dynamic_slice_in_dim(p, b * CAP, CAP)[i[b]])
        return jnp.stack(outs)

    gch = jax.jit(chunked)
    t = bench(gch, poolB, idxB)
    print(f"B=8 chunked plain gathers:  {t*1e3:6.1f} ms ({t/(B*HW)*1e9:5.1f} ns/row)",
          flush=True)

    def chunked_co(p, i):
        outs = []
        for b in range(B):
            outs.append(
                coalesced_gather(
                    jax.lax.dynamic_slice_in_dim(p, b * CAP, CAP), i[b]
                )
            )
        return jnp.stack(outs)

    gcc = jax.jit(chunked_co)
    t = bench(gcc, poolB, idxB)
    print(f"B=8 chunked coalesced:      {t*1e3:6.1f} ms ({t/(B*HW)*1e9:5.1f} ns/row)",
          flush=True)

    # correctness spot check
    a = np.asarray(gch(poolB, idxB))
    b_ = np.asarray(gcc(poolB, idxB))
    c_ = np.asarray(gf(poolB, idxB_flat)).reshape(B, HW, 16)
    print("chunked == flat:", np.array_equal(a, c_),
          "| coalesced == flat:", np.array_equal(b_, c_), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
