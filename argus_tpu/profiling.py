"""Tracing / profiling utilities.

The reference's entire tracing story is a CUDA-event timing helper
(argus/utils.py:153-171) and a stale latency script (SURVEY.md §5 "Tracing /
profiling"). This module is the upgraded TPU equivalent:

  * `trace(...)` — context manager around `jax.profiler` trace capture; the output
    directory can be opened in TensorBoard/XProf or Perfetto.
  * `annotate(...)` — named region annotation (shows up inside captured traces).
  * `profile_fn(...)` — wall-clock statistics (mean/p50/p95) of a jitted thunk with
    honest device synchronization via scalar fetch (block_until_ready can return
    early through remote-TPU tunnels).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Optional

import jax
import numpy as np

from argus_tpu import ROOT


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None, create_perfetto_trace: bool = False):
    """Capture a jax.profiler trace for the enclosed block.

    Usage:
        with profiling.trace("outputs/traces/run1"):
            state, loss = train_step(state, batch)
            float(loss)
    """
    log_dir = log_dir or os.path.join(ROOT, "outputs", "traces")
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir, create_perfetto_trace=create_perfetto_trace)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: `with profiling.annotate("augmentation"): ...`."""
    return jax.profiler.TraceAnnotation(name)


def profile_fn(
    fn: Callable[[], jax.Array],
    n_trials: int = 20,
    warmup: int = 2,
) -> dict:
    """Time a thunk returning a jax scalar (or array reducible via float-of-sum).

    Returns {"mean_ms", "p50_ms", "p95_ms", "n_trials"}.
    """

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        if leaf.ndim == 0:
            float(leaf)
        else:
            float(leaf.ravel()[0])

    for _ in range(warmup):
        sync(fn())
    times = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        sync(fn())
        times.append(time.perf_counter() - t0)
    times_ms = np.asarray(times) * 1e3
    return {
        "mean_ms": float(times_ms.mean()),
        "p50_ms": float(np.percentile(times_ms, 50)),
        "p95_ms": float(np.percentile(times_ms, 95)),
        "n_trials": n_trials,
    }
