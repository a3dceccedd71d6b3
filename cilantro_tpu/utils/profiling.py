"""Profiling / tracing integration (SURVEY §5 plan).

The reference's entire profiling story is a chrono stopwatch
(``utilities/timer.hpp:7-43``, kept as :mod:`.timer`); a TPU pipeline wants
device-level traces. This module wraps ``jax.profiler``:

* :func:`trace` — context manager writing a TensorBoard-viewable device
  trace (XLA op timeline, HBM, fusion boundaries) to a directory;
* :func:`annotate` — named host-side region that shows up in the trace
  (``jax.profiler.TraceAnnotation``);
* :func:`annotate_function` — decorator form for per-phase attribution
  (localize / integrate / NN / solve).

Usage::

    from cilantro_tpu.utils.profiling import trace, annotate
    with trace("/tmp/tpu_trace"):
        with annotate("localize"):
            pose, res = localize(...)
"""

from __future__ import annotations

import contextlib
import functools

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace for everything executed in the block."""
    jax.profiler.start_trace(
        log_dir, create_perfetto_link=create_perfetto_link
    )
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def annotate_function(name=None):
    """Decorator: wrap a function in a named trace annotation."""

    def deco(fn):
        label = name or fn.__name__

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(label):
                return fn(*args, **kwargs)

        return wrapped

    return deco


def device_memory_profile(path: str) -> None:
    """Dump the device memory profile (pprof format) to ``path``."""
    with open(path, "wb") as f:
        f.write(jax.profiler.device_memory_profile())
