"""Profiling hooks (SURVEY.md §5.1 gap: the reference has only wall-clock
logging; here: jax.profiler traces + per-step timing).

Usage::

    with trace("/tmp/profile"):          # XLA trace, view in TensorBoard
        train_step(...)

    timer = StepTimer()
    for batch in loader:
        with timer:
            state, m = step(state, batch)
    print(timer.summary())
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional


@contextlib.contextmanager
def trace(log_dir: str, *, host_tracer_level: int = 2) -> Iterator[None]:
    """jax.profiler trace context; writes a TensorBoard-compatible trace."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside an active trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def device_memory_stats() -> Dict[str, int]:
    """Per-device memory stats where the backend exposes them (the TPU
    equivalent of torch.cuda.max_memory_allocated in the reference's
    MetricLogger, common/logger.py:175)."""
    import jax

    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            continue
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use", -1),
                "peak_bytes_in_use": s.get("peak_bytes_in_use", -1),
            }
    return stats


class StepTimer:
    """Wall-clock step timer with warmup-discard and percentile summary."""

    def __init__(self, discard_first: int = 2):
        self.discard_first = discard_first
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        times = sorted(self.times[self.discard_first :]) or sorted(self.times)
        if not times:
            return {}
        n = len(times)
        return {
            "steps": n,
            "mean_s": sum(times) / n,
            "p50_s": times[n // 2],
            "p90_s": times[min(n - 1, int(n * 0.9))],
            "max_s": times[-1],
            "steps_per_sec": n / sum(times),
        }
