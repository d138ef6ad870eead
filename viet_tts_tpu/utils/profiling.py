"""Profiling / tracing hooks (SURVEY §5.1 — the reference had none).

- :func:`trace`: context manager around `jax.profiler` traces viewable in
  TensorBoard / Perfetto.
- :func:`timed`: honest wall-clock timing on the remote-TPU runtime, where
  `block_until_ready` does not reliably block — a host scalar fetch is the
  only true synchronisation point.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace into ``log_dir`` (open with TensorBoard)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_sync(tree) -> float:
    """True device sync: reduce some leaf to a host scalar."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    x = leaves[0]
    return float(jnp.sum(x)) if x.ndim else float(x)


def timed(fn: Callable, *args, iters: int = 5, warmup: int = 2, **kwargs):
    """min/mean seconds per call with honest synchronisation."""
    for _ in range(warmup):
        force_sync(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_sync(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return min(times), sum(times) / len(times)
