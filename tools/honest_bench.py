"""LICM-proof on-chip timing harness.

Earlier probes timed ``fn`` inside ``lax.scan``/``fori_loop`` bodies whose
output did not depend on the loop carry — XLA's loop-invariant code motion
hoisted the whole body, so "10x" loops measured ONE execution plus an empty
loop.  On top of that, each host fetch pays the axon tunnel round-trip
(~20-25 ms), which dominated small measurements.

This harness fixes both:

* every iteration perturbs the first floating-point input by an amount that
  depends on the carry at RUNTIME (``where(c == sentinel, tiny, 0)``), which
  XLA cannot fold away, so the body cannot be hoisted;
* per-op time comes from TWO iteration counts: ``(t_hi - t_lo) / (hi - lo)``,
  cancelling the dispatch/fetch floor exactly.  If ``t_hi ~= t_lo`` the body
  was hoisted (or the op is free) — the result reports that ratio so broken
  measurements are visible instead of silently wrong.

Usage::

    from tools.honest_bench import op_time
    r = op_time(lambda x: my_kernel(x, other), (x0,), lo=2, hi=8)
    print(r)   # OpTime(per_iter_ms=..., linearity=..., floor_ms=...)
"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

_SENTINEL = 1.2345e38  # never equal to a real carry value


def _perturbed(args, c):
    """Add a runtime-data-dependent (always-zero in practice) epsilon to the
    first inexact leaf so the loop body depends on the carry."""
    leaves, treedef = jax.tree_util.tree_flatten(args)
    done = False
    out = []
    for x in leaves:
        if not done and hasattr(x, "dtype") and jnp.issubdtype(
            jnp.asarray(x).dtype, jnp.inexact
        ):
            eps = jnp.where(c == _SENTINEL, jnp.float32(1e-30), 0.0)
            out.append(x + eps.astype(x.dtype))
            done = True
        else:
            out.append(x)
    if not done:
        raise ValueError("op_time needs at least one floating-point input")
    return jax.tree_util.tree_unflatten(treedef, out)


def _looped(fn, iters):
    def run(*args):
        def body(c, _):
            out = fn(*_perturbed(args, c))
            s = sum(
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(out)
            )
            return s, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    return jax.jit(run, static_argnums=())


@dataclasses.dataclass
class OpTime:
    per_iter_ms: float
    linearity: float  # t_hi / t_lo; ~hi/lo when honest, ~1 when hoisted
    floor_ms: float  # extrapolated zero-iteration cost (dispatch + fetch)
    t_lo_ms: float
    t_hi_ms: float

    def __str__(self):
        flag = "" if self.linearity > 1.3 else "  [SUSPECT: body hoisted?]"
        return (
            f"{self.per_iter_ms:8.2f} ms/iter  "
            f"(floor {self.floor_ms:.1f} ms, lin x{self.linearity:.2f}){flag}"
        )


def _best(f, args, reps):
    np.asarray(f(*args))  # compile + warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def op_time(fn, args, lo=2, hi=8, reps=3):
    t_lo = _best(_looped(fn, lo), args, reps)
    t_hi = _best(_looped(fn, hi), args, reps)
    per = (t_hi - t_lo) / (hi - lo)
    return OpTime(
        per_iter_ms=per,
        linearity=t_hi / max(t_lo, 1e-9),
        floor_ms=t_lo - lo * per,
        t_lo_ms=t_lo,
        t_hi_ms=t_hi,
    )


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
