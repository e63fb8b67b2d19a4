"""Tracing / profiling utilities (SURVEY.md §5: the reference has none —
only tqdm bars; the rebuild provides jax.profiler traces and step-time /
throughput counters needed for the pairs-per-sec metric)."""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Dict, List, Optional


class StepTimer:
    """Wall-clock step timer with percentile summary."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, exc_type, *exc):
        # only record completed steps: an aborted block's partial elapsed
        # time would pollute the latency percentiles
        if exc_type is None:
            self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self, items_per_step: Optional[int] = None) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        out = {
            "steps": len(ts),
            "mean_s": statistics.fmean(ts),
            "p50_s": ts[len(ts) // 2],
            "p90_s": ts[int(len(ts) * 0.9)],
            "max_s": ts[-1],
        }
        if items_per_step:
            out["items_per_sec"] = items_per_step / out["mean_s"]
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard / xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True):
    """Idiomatic analogue of a sanitizer (SURVEY.md §5 race-detection row):
    make any NaN produced under jit raise immediately."""
    import jax

    jax.config.update("jax_debug_nans", enable)
