"""Profiling helpers: jax.profiler traces + per-step wall timing.

The reference had no profiling beyond cudnn.benchmark (SURVEY.md section 5);
here tracing is first-class. NOTE (this environment): on the tunneled TPU,
``block_until_ready`` returns at dispatch — honest timing must chain work
on-device and fetch a scalar (see bench.py); StepTimer is for ordinary
backends and for relative host-loop timing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step timing with percentile summary."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        import numpy as np

        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p90_ms": float(np.percentile(t, 90) * 1e3),
            "n": len(t),
        }


def annotate(name: str):
    """Named trace region (shows up in the XProf timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
