"""Training observability: smoothed meters + CSV/JSONL logs.

Covers the reference's logging features (SURVEY.md §5.5): per-loss running
averages normalized by images seen (utils.py:176-206), CSV logs
(blip_fine_tune_2.py:148-151,316-319) and LAVIS's JSON-lines log.txt
(runner_base.py:628-640), plus a SmoothedValue meter (logger.py:37-120)
whose cross-process sync is a ``jax`` psum instead of a NCCL all_reduce.
"""

from __future__ import annotations

import collections
import json
import os
import time
from typing import Deque, Dict


class SmoothedValue:
    """Windowed median/avg meter (reference common/logger.py:24-120)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: Deque[float] = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(1, self.count)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    """Iteration logger with ETA (reference common/logger.py:122-181)."""

    def __init__(self, delimiter: str = "  ", print_every: int = 50):
        self.meters: Dict[str, SmoothedValue] = collections.defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print_every = print_every

    def update(self, **kwargs: float) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __str__(self) -> str:
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable, header: str = ""):
        total = len(iterable) if hasattr(iterable, "__len__") else None
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        t_prev = time.time()
        for i, obj in enumerate(iterable):
            yield obj
            iter_time.update(time.time() - t_prev)
            t_prev = time.time()
            if i % self.print_every == 0 or (total and i == total - 1):
                if total:
                    eta = iter_time.global_avg * (total - i - 1)
                    print(
                        f"{header} [{i}/{total}] eta: {eta:.0f}s {self} "
                        f"time: {iter_time}"
                    )
                else:
                    print(f"{header} [{i}] {self} time: {iter_time}")
        print(f"{header} total: {time.time()-start:.1f}s")


class MetricsLogger:
    """CSV + JSONL epoch logs (train_metrics.csv / validation_metrics.csv /
    log.jsonl), matching the reference's file outputs."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)

    def _append_csv(self, path: str, row: Dict) -> None:
        new = not os.path.exists(path)
        with open(path, "a") as f:
            if new:
                f.write(",".join(map(str, row.keys())) + "\n")
            f.write(",".join(str(v) for v in row.values()) + "\n")

    def _append_jsonl(self, row: Dict) -> None:
        with open(os.path.join(self.output_dir, "log.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")

    def log_train(self, metrics: Dict) -> None:
        self._append_csv(os.path.join(self.output_dir, "train_metrics.csv"), metrics)
        self._append_jsonl({"kind": "train", **metrics})

    def log_validation(self, metrics: Dict) -> None:
        self._append_csv(
            os.path.join(self.output_dir, "validation_metrics.csv"), metrics
        )
        self._append_jsonl({"kind": "val", **metrics})
