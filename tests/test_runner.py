"""Runner orchestration tests over a synthetic task."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.train.loop import TrainConfig, create_train_state, make_train_step
from sprc_tpu.train.runner import BaseTask, EpochRunner, IterRunner, RunnerConfig

from test_train import tiny_model, make_batch
from sprc_tpu.loader import init_params


class SyntheticTask(BaseTask):
    def __init__(self, rng, n_batches=3):
        self.rng = rng
        self.n_batches = n_batches
        self.eval_calls = 0

    def train_loader(self, epoch):
        return [make_batch(self.rng, b=4) for _ in range(self.n_batches)]

    def prepare_batch(self, batch):
        return batch

    def evaluation(self, model, params):
        self.eval_calls += 1
        return {"metric": float(self.eval_calls)}  # strictly improving

    def selection_metric(self, results):
        return results["metric"]


@pytest.fixture()
def setup(tmp_path, rng):
    model = tiny_model()
    params = init_params(model, image_size=28)
    cfg = TrainConfig(learning_rate=1e-3, total_steps=100)
    state, tx = create_train_state(params, cfg)
    step = make_train_step(model, tx, cfg, donate=False)
    return model, state, tx, step, str(tmp_path)


def test_epoch_runner(setup, rng):
    model, state, tx, step, outdir = setup
    task = SyntheticTask(rng)
    runner = EpochRunner(
        model, state, tx, step, task,
        RunnerConfig(output_dir=outdir, max_epochs=2, log_every_steps=1),
    )
    best = runner.train()
    assert best == {"metric": 2.0}
    assert int(runner.state.step) == 6  # 2 epochs x 3 batches
    assert os.path.isdir(os.path.join(outdir, "last_state"))
    assert os.path.isdir(os.path.join(outdir, "best_arithmetic_mean"))
    rows = [json.loads(l) for l in open(os.path.join(outdir, "log.jsonl"))]
    kinds = {r["kind"] for r in rows}
    assert {"step", "train", "val"} <= kinds


def test_iter_runner(setup, rng):
    model, state, tx, step, outdir = setup
    task = SyntheticTask(rng)
    runner = IterRunner(
        model, state, tx, step, task,
        RunnerConfig(output_dir=outdir, max_epochs=1),
        max_iters=5, iters_per_inner=2,
    )
    runner.train()
    assert int(runner.state.step) == 5
    assert task.eval_calls == 3  # after inner epochs of 2,2,1


def test_nan_guard_aborts_and_snapshots(setup, rng, tmp_path):
    """§5.3 failure detection: a non-finite loss aborts the run loudly with
    a pre-divergence snapshot (vs the reference's nothing)."""
    from sprc_tpu.train.runner import NonFiniteLossError

    model, state, tx, step, outdir = setup

    calls = {"n": 0}

    def poisoned_step(state, batch):
        new_state, metrics = step(state, batch)
        # simulate donation: the production step (donate=True) deletes the
        # input state's device buffers — the snapshot must not depend on
        # them (CPU ignores real donation, which once masked exactly that)
        jax.tree.map(
            lambda x: x.delete() if hasattr(x, "delete") else None, state)
        calls["n"] += 1
        if calls["n"] >= 2:
            metrics = dict(metrics)
            metrics["loss"] = jnp.float32(float("nan"))
        return new_state, metrics

    task = SyntheticTask(rng)
    runner = EpochRunner(
        model, state, tx, poisoned_step, task,
        RunnerConfig(output_dir=str(tmp_path), max_epochs=1,
                     log_every_steps=1),
    )
    with pytest.raises(NonFiniteLossError, match="non-finite loss"):
        runner.train()
    log = (tmp_path / "log.jsonl").read_text()
    assert '"kind": "diverged"' in log
    assert os.path.isdir(tmp_path / "diverged_state")


def test_preemption_saves_resumable_state(setup, rng, tmp_path):
    """§5.3/§5.4: SIGTERM between steps -> full resumable state saved, loop
    exits via PreemptedError, and a fresh runner resumes from it."""
    import signal

    from sprc_tpu.train.runner import PreemptedError

    model, state, tx, step, outdir = setup

    calls = {"n": 0}

    def signaling_step(state, batch):
        out = step(state, batch)
        calls["n"] += 1
        if calls["n"] == 2:
            # deliver SIGTERM to ourselves, exactly like a preempting
            # scheduler would; the guard's handler runs before the next
            # between-steps check
            os.kill(os.getpid(), signal.SIGTERM)
        return out

    task = SyntheticTask(rng)
    runner = EpochRunner(
        model, state, tx, signaling_step, task,
        RunnerConfig(output_dir=str(tmp_path), max_epochs=3,
                     log_every_steps=1),
    )
    prev_handler = signal.getsignal(signal.SIGTERM)
    with pytest.raises(PreemptedError, match="resumable state"):
        runner.train()
    # handler restored after the raise
    assert signal.getsignal(signal.SIGTERM) is prev_handler
    assert calls["n"] == 2  # stopped right after the signaled step
    snap = tmp_path / "last_state"
    assert os.path.isdir(snap)
    log = (tmp_path / "log.jsonl").read_text()
    assert '"kind": "preempted"' in log

    # resume: a fresh runner restores params + opt state + step counter
    task2 = SyntheticTask(rng)
    runner2 = EpochRunner(
        model, state, tx, step, task2,
        RunnerConfig(output_dir=str(tmp_path), max_epochs=1,
                     resume=str(snap), log_every_steps=1),
    )
    runner2.train()
    assert int(runner2.state.step) == 2 + 3  # resumed at 2, one more epoch
