"""Profiling and debugging utilities.

The reference has no tracing, profiling or sanitizer support (SURVEY.md §5);
TPU-native equivalents:

* :func:`trace` — ``jax.profiler`` trace context writing a perfetto dump.
* :func:`timed` — wall-clock timing with host-readback synchronization.
* :func:`debug_nans` — toggle JAX NaN checking (the runtime race/NaN
  "sanitizer" for functional programs).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax

__all__ = ["trace", "timed", "debug_nans"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, sync=None, iters: int = 1, warmup: int = 1, **kwargs):
    """Time ``fn(*args, **kwargs)``; returns (seconds_per_call, last_result).

    ``sync(result)`` must force completion; default reads back the first
    leaf (block_until_ready does not synchronize on all transports).
    """
    if sync is None:
        def sync(result):
            leaves = jax.tree.leaves(result)
            if leaves:
                np.asarray(leaves[0]).ravel()[:1]

    for _ in range(warmup):
        sync(fn(*args, **kwargs))
    t0 = time.perf_counter()
    result = None
    for _ in range(iters):
        result = fn(*args, **kwargs)
        sync(result)
    return (time.perf_counter() - t0) / iters, result


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
