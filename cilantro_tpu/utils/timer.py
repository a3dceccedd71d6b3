"""Stopwatch (reference ``utilities/timer.hpp:7-43``) plus a device-sync
variant that blocks on a JAX value before reading the clock — the honest way
to time asynchronous dispatch."""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self._start = time.perf_counter()

    def start(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def elapsed_seconds(self) -> float:
        return time.perf_counter() - self._start

    def elapsed_milliseconds(self) -> float:
        return self.elapsed_seconds() * 1e3


def time_blocked(fn, *args, repeats: int = 1, **kwargs):
    """Run ``fn`` ``repeats`` times, forcing a host sync each run (fetches
    the first leaf). Returns (last_result, seconds_per_run)."""
    import numpy as np
    import jax

    result = fn(*args, **kwargs)
    leaves = jax.tree_util.tree_leaves(result)
    if leaves:
        np.asarray(leaves[0])
    t = Timer()
    for _ in range(repeats):
        result = fn(*args, **kwargs)
        leaves = jax.tree_util.tree_leaves(result)
        if leaves:
            np.asarray(leaves[0])
    return result, t.elapsed_seconds() / max(repeats, 1)
