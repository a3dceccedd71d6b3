"""LICM-proof on-chip timing harness (probe CLI).

The method now lives in ``cilantro_tpu.utils.honest_timing`` (the bench
prices its sub-50 ms rows with it); this probe re-exports it and keeps the
self-check __main__.

Usage::

    from tools.honest_bench import op_time
    r = op_time(lambda x: my_kernel(x, other), (x0,), lo=2, hi=8)
    print(r)   # OpTime(per_iter_ms=..., linearity=..., floor_ms=...)
"""
import jax
import jax.numpy as jnp

from cilantro_tpu.utils.honest_timing import OpTime, op_time  # noqa: F401


if __name__ == "__main__":
    # Self-check: a matmul whose honest time is predictable, plus the floor.
    print("devices:", jax.devices(), flush=True)
    x = jnp.ones((4096, 4096), jnp.bfloat16)

    r = op_time(lambda a: a @ a, (x,), lo=2, hi=10)
    flops = 2 * 4096**3
    print(f"4k bf16 matmul: {r}  -> {flops / (r.per_iter_ms * 1e-3) / 1e12:.1f} TF/s",
          flush=True)

    # Empty-ish op: measures the pure floor.
    r0 = op_time(lambda a: jnp.sum(a[:8, :8]), (x,), lo=2, hi=10)
    print(f"tiny op: {r0}", flush=True)
