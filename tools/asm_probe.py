"""Round-3 probe #9: primitive costs for the sorted warp-assembly redesign.

The direct GN's 176 ms is a 1.2M-row 36-wide random scatter-add. Candidate
replacement: plan-time argsort of the (fixed per graph) pair keys, then per
GN step: build pair rows -> permutation gather to sorted order -> two-level
cumsum -> boundary gathers -> small unique-block scatter. This probe prices
each primitive (and the plan-time argsort) honestly.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/asm_probe.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from tools.honest_bench import op_time

R = 1_201_110  # 120111 points x 10 pair classes
PP = 36
M2 = 1024 * 1024
UCAP = 131_072
CH = 1024


def main():
    key = jax.random.PRNGKey(0)
    rc = (R // CH) * CH
    vals = jax.random.normal(key, (R, PP), jnp.float32)
    # realistic keys: clustered (nearby points share node pairs)
    base = jnp.repeat(
        jax.random.randint(key, (R // 10 + 1,), 0, 60_000)[: R // 10], 10,
        total_repeat_length=R,
    )
    keys = base * 17 % M2
    perm = jnp.argsort(keys)
    sk = keys[perm]
    first = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    starts = jnp.nonzero(first, size=UCAP, fill_value=R - 1)[0]
    uk = sk[starts]
    n_u = jnp.sum(first.astype(jnp.int32))
    print(f"unique keys: {int(n_u)}", flush=True)

    r = op_time(lambda k_: jnp.argsort(k_ + 0 * k_), (keys.astype(jnp.float32),),
                lo=1, hi=3)
    print(f"PLAN argsort 1.2M:          {r}", flush=True)

    r = op_time(lambda v: v[perm], (vals,), lo=1, hi=5)
    print(f"STEP perm gather (R,36):    {r}", flush=True)

    def two_level_cumsum(v):
        vc = v[:rc].reshape(-1, CH, PP)
        cs = jnp.cumsum(vc, axis=1)
        tot = cs[:, -1]
        offs = jnp.cumsum(tot, axis=0) - tot
        e_in = cs + offs[:, None, :]
        return e_in.reshape(-1, PP)

    r = op_time(two_level_cumsum, (vals,), lo=1, hi=5)
    print(f"STEP 2-level cumsum (R,36): {r}", flush=True)

    e = two_level_cumsum(vals)

    def boundaries(e_):
        ends = jnp.concatenate([starts[1:], jnp.array([rc - 1])])
        hi_ = e_[jnp.clip(ends - 1, 0, rc - 1)]
        lo_ = e_[jnp.clip(starts - 1, 0, rc - 1)]
        z = jnp.where((starts == 0)[:, None], 0.0, lo_)
        return hi_ - z

    r = op_time(boundaries, (e,), lo=1, hi=5)
    print(f"STEP boundary gathers 131k: {r}", flush=True)

    sums = boundaries(e)

    def small_scatter(s_):
        acc = jnp.zeros((M2, PP), jnp.float32)
        return acc.at[uk].add(s_)

    r = op_time(small_scatter, (sums,), lo=1, hi=5)
    print(f"STEP scatter 131k -> (1M,36): {r}", flush=True)

    # matmul segment-reduce alternative: per-chunk one-hot matmul
    li = jnp.cumsum(first.astype(jnp.int32)[:rc].reshape(-1, CH), axis=1) - \
        first[:rc].reshape(-1, CH).astype(jnp.int32)

    def matmul_reduce(v):
        vc = v[:rc].reshape(-1, CH, PP)
        onehot = (
            li[:, None, :] == jnp.arange(CH, dtype=jnp.int32)[None, :, None]
        ).astype(jnp.float32)
        return jnp.einsum("cur,crp->cup", onehot, vc)

    r = op_time(matmul_reduce, (vals,), lo=1, hi=3)
    print(f"ALT matmul seg-reduce:      {r}", flush=True)

    # pair-row build in point order, unchunked, flat (N, 360) layout
    n_pts = 120_111
    y = jax.random.normal(key, (n_pts, 4, 3), jnp.float32)
    wa = jax.random.uniform(key, (n_pts, 4), jnp.float32)
    wpp = jax.random.uniform(key, (n_pts,), jnp.float32)
    kk = jnp.array([k for k in range(4) for _ in range(k, 4)], jnp.int32)
    ll = jnp.array([x for k in range(4) for x in range(k, 4)], jnp.int32)

    def build(y_):
        from cilantro_tpu.core.transforms import skew3

        eye_b = jnp.broadcast_to(
            jnp.eye(3, dtype=y_.dtype), y_.shape[:-1] + (3, 3)
        )
        bw = wa[..., None, None] * jnp.concatenate(
            [-skew3(y_), eye_b], axis=-1
        )  # (N,4,3,6)
        pair = wpp[:, None, None, None] * jnp.einsum(
            "ntdp,ntdq->ntpq", bw[:, kk], bw[:, ll]
        )
        return pair.reshape(n_pts, 360)

    r = op_time(build, (y,), lo=1, hi=5)
    print(f"STEP pair build (N,360):    {r}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
