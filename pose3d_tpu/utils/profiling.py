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


def memory_report(jit_fn, *example_args, **example_kwargs) -> Dict[str, float]:
    """Compiled-program memory analysis of a jitted function at the given
    (abstract) arguments: argument/output/temp/code sizes in bytes from
    XLA's own accounting (``Compiled.memory_analysis()``). ``temp`` is the
    peak scratch the program needs on top of its inputs and outputs — the
    number that says whether a config will fit in HBM *before* a 40 s
    compile-and-OOM round-trip.

    AOT lowering shares the persistent compile cache with the ordinary
    jit path, so calling this before training costs one cache hit, not a
    second compile. Returns {} when the backend doesn't expose the
    analysis (some plugin backends)."""
    try:
        compiled = jit_fn.lower(*example_args, **example_kwargs).compile()
        ma = compiled.memory_analysis()
        if ma is None:
            return {}
        out = {}
        for key, attr in (
            ("argument_bytes", "argument_size_in_bytes"),
            ("output_bytes", "output_size_in_bytes"),
            ("temp_bytes", "temp_size_in_bytes"),
            ("alias_bytes", "alias_size_in_bytes"),
            ("code_bytes", "generated_code_size_in_bytes"),
        ):
            v = getattr(ma, attr, None)
            if v is not None:
                out[key] = float(v)
        if {"argument_bytes", "output_bytes", "temp_bytes"} <= out.keys():
            # donated inputs alias outputs — don't double count
            out["peak_bytes_estimate"] = (
                out["argument_bytes"] + out["output_bytes"]
                + out["temp_bytes"] - out.get("alias_bytes", 0.0)
            )
        return out
    except Exception:  # backend without AOT memory analysis
        return {}


def format_memory_report(report: Dict[str, float]) -> str:
    if not report:
        return "memory analysis unavailable on this backend"

    def fmt(v: float) -> str:
        return f"{v / 1e9:.3f} GB" if v >= 1e8 else f"{v / 1e6:.1f} MB"

    return ", ".join(
        f"{k.replace('_bytes', '')}={fmt(report[k])}"
        for k in ("argument_bytes", "output_bytes", "temp_bytes",
                  "alias_bytes", "peak_bytes_estimate") if k in report
    )
