"""Generic train runners (the LAVIS RunnerBase / RunnerIter analogues).

The reference ships an epoch-based runner and an inner-iteration runner
(reference: src/lavis/runners/runner_base.py:38-641, runner_iter.py:24-317)
that SPRC's own scripts bypass. Here the same orchestration exists as a
compact task-driven loop over the TPU-native pieces: optax train step,
per-host sharded loaders, orbax checkpointing with full resume, best-model
selection, and JSONL/CSV logging.

A Task supplies data + batch preparation + evaluation; the runner owns the
schedule. ``EpochRunner`` = train_epochs x (train + optional eval);
``IterRunner`` = fixed iteration budget with eval every ``iters_per_inner``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Iterable, Optional

import jax

from sprc_tpu.registry import registry


class BaseTask:
    """Minimal task protocol (reference tasks/base_task.py).

    Subclasses provide ``train_loader``, ``prepare_batch`` and optionally
    ``evaluation``; the runner drives them.
    """

    def train_loader(self, epoch: int) -> Iterable[dict]:
        raise NotImplementedError

    def prepare_batch(self, batch: dict) -> Dict[str, Any]:
        raise NotImplementedError

    def evaluation(self, model, params) -> Dict[str, float]:
        return {}

    def selection_metric(self, results: Dict[str, float]) -> Optional[float]:
        return None


@dataclasses.dataclass
class RunnerConfig:
    output_dir: str = "./output"
    max_epochs: int = 1
    evaluate_every: int = 1
    save_every: int = 1
    resume: Optional[str] = None
    log_every_steps: int = 50
    # failure detection (SURVEY §5.3 — beyond the reference's silent
    # batch-shrinking): abort on a non-finite loss, after snapshotting the
    # pre-divergence state for post-mortem. Checked at the logging cadence
    # so the device pipeline isn't synced every step.
    nan_guard: bool = True
    # preemption handling (§5.3/§5.4): convert SIGTERM into a clean
    # between-steps stop that saves a fully resumable state. The reference
    # has nothing here — a preempted run loses everything since the last
    # best-checkpoint save.
    preempt_guard: bool = True
    # when the step was built with skip_nonfinite=True (train/loop.py), a
    # transient NaN batch is skipped in-step; this bounds how many SKIPS IN
    # A ROW are tolerated before the run is treated as diverged (every
    # update since the divergence was a no-op, so the last_state snapshot
    # is itself the pre-divergence state)
    max_consecutive_nonfinite: int = 10


class NonFiniteLossError(RuntimeError):
    """Training diverged (NaN/Inf loss); the last state was snapshotted."""


class PreemptedError(RuntimeError):
    """SIGTERM received; a resumable state was saved before raising."""


class EpochRunner:
    def __init__(self, model, state, tx, step_fn, task: BaseTask, cfg: RunnerConfig,
                 mesh=None):
        self.model = model
        self.state = state
        self.tx = tx
        self.step_fn = step_fn
        self.task = task
        self.cfg = cfg
        self.mesh = mesh
        os.makedirs(cfg.output_dir, exist_ok=True)

    def _log(self, row: Dict) -> None:
        with open(os.path.join(self.cfg.output_dir, "log.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")

    def _install_guard(self):
        if not self.cfg.preempt_guard:
            return None
        from sprc_tpu.utils.preempt import PreemptionGuard

        return PreemptionGuard.install()

    def _check_preempted(self, guard, **where) -> None:
        """Between-steps cooperative stop: save a fully resumable state
        (params + optimizer + step — restartable via ``cfg.resume``) and
        raise. Never called from inside jitted code."""
        if guard is None or not guard.should_stop:
            return
        from sprc_tpu.train.checkpoint import save_state

        snap = os.path.join(self.cfg.output_dir, "last_state")
        save_state(snap, self.state)
        self._log({"kind": "preempted", "signal": guard.received_signal,
                   "snapshot": snap, **where})
        guard.restore()
        raise PreemptedError(
            f"preempted (signal {guard.received_signal}); resumable state "
            f"saved to {snap}"
        )

    def _skip_policy(self, metrics, consec_skips: int, **where) -> int:
        """Consecutive-skip abort for steps built with skip_nonfinite=True
        (train/loop.py): a NaN batch was already a no-op update in-step;
        abort only after ``cfg.max_consecutive_nonfinite`` skips IN A ROW —
        every update since the divergence was a no-op, so the snapshot
        taken here is itself the last-finite state."""
        if "skipped_nonfinite" not in metrics:
            return consec_skips
        if float(metrics["skipped_nonfinite"]) <= 0.0:
            return 0
        from sprc_tpu.train.checkpoint import save_state

        consec_skips += 1
        self._log({"kind": "nonfinite_skip", "consecutive": consec_skips,
                   **where})
        if consec_skips >= self.cfg.max_consecutive_nonfinite:
            snap = os.path.join(self.cfg.output_dir, "diverged_state")
            save_state(snap, jax.device_get(self.state))
            self._log({"kind": "diverged", "snapshot": snap,
                       "consecutive_skips": consec_skips, **where})
            raise NonFiniteLossError(
                f"{consec_skips} consecutive non-finite steps at {where}; "
                f"state (last finite update) saved to {snap}"
            )
        return consec_skips

    def train(self) -> Dict[str, float]:
        from sprc_tpu.train.checkpoint import (
            BestCheckpointKeeper,
            restore_state,
            save_state,
        )

        if self.cfg.resume and os.path.isdir(self.cfg.resume):
            self.state = restore_state(self.cfg.resume, self.state)
        keeper = BestCheckpointKeeper(self.cfg.output_dir)
        best: Dict[str, float] = {}
        guard = self._install_guard()
        consec_skips = 0

        for epoch in range(self.cfg.max_epochs):
            t0 = time.time()
            running: Dict[str, float] = {}
            n = 0
            for i, batch in enumerate(self.task.train_loader(epoch)):
                prepared = self.task.prepare_batch(batch)
                if self.mesh is not None:
                    from sprc_tpu.parallel.mesh import shard_batch

                    prepared = shard_batch(self.mesh, prepared)
                if self.cfg.nan_guard and i % self.cfg.log_every_steps == 0:
                    # host copy BEFORE the step: the step donates its input
                    # state (train/loop.py donate=True default), so after
                    # divergence is detected the previous device state's
                    # buffers are already deleted — a post-hoc save can
                    # never work. Refreshed at the check cadence, this is a
                    # state from at most log_every_steps steps before the
                    # detected divergence.
                    host_snap = jax.device_get(self.state)
                self.state, metrics = self.step_fn(self.state, prepared)
                self._check_preempted(guard, epoch=epoch, step=i)
                n += 1
                for k, v in metrics.items():
                    running[k] = running.get(k, 0.0) + float(v)
                skip_guarded = "skipped_nonfinite" in metrics
                consec_skips = self._skip_policy(
                    metrics, consec_skips, epoch=epoch, step=i)
                if i % self.cfg.log_every_steps == 0:
                    row = {k: float(v) for k, v in metrics.items()}
                    self._log({"kind": "step", "epoch": epoch, "step": i,
                               **row})
                    if self.cfg.nan_guard and not skip_guarded and not all(
                        v == v and abs(v) != float("inf")
                        for v in row.values()
                    ):
                        snap = os.path.join(
                            self.cfg.output_dir, "diverged_state")
                        save_state(snap, host_snap)
                        self._log({"kind": "diverged", "epoch": epoch,
                                   "step": i, "snapshot": snap, **row})
                        raise NonFiniteLossError(
                            f"non-finite loss at epoch {epoch} step {i}: "
                            f"{row}; pre-divergence state: {snap}"
                        )
            epoch_row = {k: v / max(1, n) for k, v in running.items()}
            epoch_row.update(kind="train", epoch=epoch, seconds=round(time.time() - t0, 1))
            self._log(epoch_row)

            if (epoch + 1) % self.cfg.evaluate_every == 0:
                results = self.task.evaluation(self.model, self.state.params)
                if results:
                    self._log({"kind": "val", "epoch": epoch, **results})
                    metric = self.task.selection_metric(results)
                    if metric is not None and keeper.maybe_save(
                        metric, self.state.params, epoch
                    ):
                        best = dict(results)
            if (epoch + 1) % self.cfg.save_every == 0:
                save_state(os.path.join(self.cfg.output_dir, "last_state"), self.state)
        if guard is not None:
            guard.restore()
        return best


class IterRunner(EpochRunner):
    """Iteration-budget runner (reference runner_iter.py): ``max_iters``
    split into inner 'epochs' of ``iters_per_inner`` steps, eval between."""

    def __init__(self, *args, max_iters: int = 1000, iters_per_inner: int = 100, **kw):
        super().__init__(*args, **kw)
        self.max_iters = max_iters
        self.iters_per_inner = iters_per_inner

    def train(self) -> Dict[str, float]:
        from sprc_tpu.train.checkpoint import BestCheckpointKeeper, save_state

        keeper = BestCheckpointKeeper(self.cfg.output_dir)
        best: Dict[str, float] = {}
        guard = self._install_guard()
        it = 0
        epoch = 0
        consec_skips = 0
        loader = iter(self.task.train_loader(epoch))
        while it < self.max_iters:
            running: Dict[str, float] = {}
            n = 0
            for _ in range(min(self.iters_per_inner, self.max_iters - it)):
                try:
                    batch = next(loader)
                except StopIteration:
                    epoch += 1
                    loader = iter(self.task.train_loader(epoch))
                    batch = next(loader)
                prepared = self.task.prepare_batch(batch)
                if self.mesh is not None:
                    from sprc_tpu.parallel.mesh import shard_batch

                    prepared = shard_batch(self.mesh, prepared)
                self.state, metrics = self.step_fn(self.state, prepared)
                self._check_preempted(guard, iter=it)
                consec_skips = self._skip_policy(metrics, consec_skips, iter=it)
                it += 1
                n += 1
                for k, v in metrics.items():
                    running[k] = running.get(k, 0.0) + float(v)
            self._log({"kind": "inner", "iter": it,
                       **{k: v / max(1, n) for k, v in running.items()}})
            results = self.task.evaluation(self.model, self.state.params)
            if results:
                self._log({"kind": "val", "iter": it, **results})
                metric = self.task.selection_metric(results)
                if metric is not None and keeper.maybe_save(metric, self.state.params, it):
                    best = dict(results)
            save_state(os.path.join(self.cfg.output_dir, "last_state"), self.state)
        if guard is not None:
            guard.restore()
        return best


registry.register("runner", "runner_base")(EpochRunner)
registry.register("runner", "runner_iter")(IterRunner)
registry.register("task", "base")(BaseTask)
