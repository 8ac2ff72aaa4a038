"""Step timing + device profiling hooks.

The reference's only tracing is a per-round fit_duration wall clock
(flower_common.py:65-74). Here:

- ``StepTimer``: cheap wall-clock accumulator with percentile summaries;
- ``trace()``: a context manager around ``jax.profiler`` writing a TensorBoard
  trace (XLA op-level timeline on TPU);
- ``annotate()``: TraceAnnotation wrapper so phases (ala / head / body /
  aggregate) show up as named spans in the profile.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax
import numpy as np


class StepTimer:
    def __init__(self):
        self._durations: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def time(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self._durations[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self._durations[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self._durations.items():
            a = np.asarray(vals)
            out[name] = {
                "count": int(a.size),
                "mean_s": float(a.mean()),
                "p50_s": float(np.percentile(a, 50)),
                "p95_s": float(np.percentile(a, 95)),
                "total_s": float(a.sum()),
            }
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace (view in TensorBoard's profile tab / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span in device profiles (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
