"""Profiling / tracing utilities (the framework's observability subsystem;
the reference has only tqdm bars + a TensorBoard graph dump, SURVEY.md §5).

* :func:`trace` — context manager around ``jax.profiler`` writing an xplane
  trace viewable in TensorBoard's profile plugin.
* :func:`summarize_trace` — programmatic top-K op summary of a captured
  trace (device time per op), no TensorBoard needed.
* :class:`StepTimer` — wall-clock per-step timing with EMA, used by the
  train loop for Perf/* scalars.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import time
from typing import Dict, List, Optional, Tuple


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str, top_k: int = 20,
                    device_substr: str = "TPU") -> List[Tuple[str, float]]:
    """Return [(op_name, total_ms)] for the busiest device ops in the most
    recent trace under ``log_dir``."""
    import jax

    files = sorted(
        glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True)
    )
    if not files:
        return []
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[-1], "rb").read()
    )
    totals: collections.Counter = collections.Counter()
    for plane in pd.planes:
        if device_substr not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                totals[ev.name] += ev.duration_ns
    return [(name, ns / 1e6) for name, ns in totals.most_common(top_k)]


class StepTimer:
    """Exponential-moving-average step timer. The first ``warmup`` steps
    (jit compiles, layout recompiles) are excluded from the EMA so
    Perf/* scalars reflect steady state."""

    def __init__(self, alpha: float = 0.1, warmup: int = 3):
        self.alpha = alpha
        self.warmup = warmup
        self._seen = 0
        self.ema_s: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen <= self.warmup:
            return dt
        self.ema_s = (
            dt if self.ema_s is None
            else self.alpha * dt + (1 - self.alpha) * self.ema_s
        )
        return dt

    def scalars(self, batch_size: int) -> Dict[str, float]:
        if self.ema_s is None:
            return {}
        return {
            "Perf/step_time_ms": self.ema_s * 1e3,
            "Perf/images_per_sec": batch_size / self.ema_s,
        }
