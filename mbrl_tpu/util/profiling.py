"""First-class profiling/tracing hooks.

The reference has no tracing support (SURVEY.md §5.1 — its closest artifacts are
verbose prints and tqdm). Speed-of-light per chip is a north-star metric here, so
this module provides:

  - :func:`trace` — context manager around `jax.profiler` writing TensorBoard-
    compatible traces (xplane) for any code region;
  - :func:`annotate` — named TraceAnnotation for attributing device time to
    framework phases (plan / model-train / sac-update / rollout);
  - :class:`StepTimer` — lightweight wall-clock phase timer with summary stats,
    host-side (for loops where a full trace is too heavy).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region into ``log_dir``
    (view with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation attributing enclosed device work to a framework phase."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates wall-clock timings per named phase.

    Device work is asynchronous; wrap regions whose results you block on, or pass
    ``block=`` a pytree to synchronize before stopping the clock.
    """

    def __init__(self):
        self._times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, block=None) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                jax.block_until_ready(block)
            self._times[name].append(time.perf_counter() - start)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self._times.items():
            arr = np.asarray(ts)
            out[name] = {
                "count": int(arr.size),
                "total_s": float(arr.sum()),
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p95_ms": float(np.percentile(arr, 95) * 1e3),
            }
        return out

    def report(self) -> str:
        lines = [f"{'phase':<20} {'count':>6} {'total_s':>9} {'mean_ms':>9} {'p95_ms':>9}"]
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:<20} {s['count']:>6} {s['total_s']:>9.2f} "
                f"{s['mean_ms']:>9.2f} {s['p95_ms']:>9.2f}"
            )
        return "\n".join(lines)

    def clear(self) -> None:
        self._times.clear()
