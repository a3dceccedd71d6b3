"""LICM-proof two-count op timing (the package-level home of the method
``tools/honest_bench.py`` introduced; that probe now imports from here).

Problem 1: timing ``fn`` inside ``lax.scan`` bodies whose output does not
depend on the loop carry lets XLA's loop-invariant code motion hoist the
body — a "10x" loop measures ONE execution. Problem 2: every host fetch
pays the dispatch/tunnel round trip (~20-25 ms over a remote axon chip),
which dominates sub-50 ms measurements (VERDICT r3 weak #7a: a 3×3-PCA row
"lost to numpy" because it priced the tunnel, not the chip).

Fix: (a) every scan iteration perturbs the first float input by a
runtime-carry-dependent (always zero) epsilon XLA cannot fold, so the body
cannot be hoisted; (b) per-op time comes from TWO iteration counts,
``(t_hi - t_lo) / (hi - lo)``, cancelling the dispatch/fetch floor exactly.
``linearity ~= 1`` flags a hoisted (broken) measurement instead of
reporting it as a fast op.
"""

from __future__ import annotations

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


def op_time(fn, args, lo=2, hi=8, reps=3, precompiled=None) -> OpTime:
    """Honest per-call time of ``fn(*args)`` on the device.

    ``fn`` must be jit-compatible and take at least one floating-point
    array argument (perturbed per iteration to defeat LICM).
    ``precompiled``: optional ``(lo_loop, hi_loop)`` executables for the
    exact ``_looped(fn, lo/hi)`` programs (background-prewarmed callers
    skip the in-line compiles; ``fn`` is then unused for tracing).
    """
    if precompiled is not None:
        f_lo, f_hi = precompiled
    else:
        f_lo, f_hi = _looped(fn, lo), _looped(fn, hi)
    t_lo = _best(f_lo, args, reps)
    t_hi = _best(f_hi, args, reps)
    per = (t_hi - t_lo) / (hi - lo)
    return OpTime(
        per_iter_ms=per,
        linearity=t_hi / max(t_lo, 1e-9),
        floor_ms=t_lo - lo * per,
        t_lo_ms=t_lo,
        t_hi_ms=t_hi,
    )
