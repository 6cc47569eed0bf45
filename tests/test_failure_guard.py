"""In-step non-finite guard (§5.3 failure detection).

``make_train_step(..., skip_nonfinite=True)`` is the TPU-native analogue of
torch.cuda.amp.GradScaler's inf-skip (the reference relies on it implicitly
at blip_fine_tune_2.py:301-303): a NaN/Inf loss or gradient makes the
update a no-op (params AND optimizer state keep their previous values)
inside the jitted step, with a ``skipped_nonfinite`` metric for the runner's
consecutive-skip abort policy.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.loader import init_params
from sprc_tpu.train.loop import TrainConfig, create_train_state, make_train_step
from sprc_tpu.train.runner import (
    BaseTask,
    EpochRunner,
    NonFiniteLossError,
    RunnerConfig,
)

from test_train import make_batch, tiny_model


def _poison(batch):
    bad = dict(batch)
    ref = np.asarray(bad["reference"]).copy()
    ref[0, 0, 0, 0] = np.nan
    bad["reference"] = jnp.asarray(ref)
    return bad


@pytest.fixture()
def setup(rng):
    model = tiny_model()
    params = init_params(model, image_size=28)
    cfg = TrainConfig(learning_rate=1e-3, total_steps=100)
    state, tx = create_train_state(params, cfg)
    return model, cfg, state, tx


def test_nan_batch_is_noop_update(setup, rng):
    model, cfg, state, tx = setup
    step = make_train_step(model, tx, cfg, donate=False, skip_nonfinite=True)
    bad = _poison(make_batch(rng, b=4))

    new_state, metrics = step(state, bad)
    assert float(metrics["skipped_nonfinite"]) == 1.0
    assert not np.isfinite(float(metrics["loss"]))
    # params and optimizer state unchanged; step counter still advances
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        new_state.params, state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        new_state.opt_state, state.opt_state)
    assert int(new_state.step) == int(state.step) + 1
    # and the RNG still split, so the dropout stream stays aligned
    assert not np.array_equal(np.asarray(new_state.rng), np.asarray(state.rng))


def test_finite_batch_matches_unguarded_step(setup, rng):
    """When everything is finite the guarded step is bit-identical to the
    unguarded one (the guard is a select, not a rescale)."""
    model, cfg, state, tx = setup
    batch = make_batch(rng, b=4)
    guarded = make_train_step(model, tx, cfg, donate=False, skip_nonfinite=True)
    plain = make_train_step(model, tx, cfg, donate=False)

    s1, m1 = guarded(state, batch)
    s2, m2 = plain(state, batch)
    assert float(m1["skipped_nonfinite"]) == 0.0
    np.testing.assert_array_equal(float(m1["loss"]), float(m2["loss"]))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s1.params, s2.params)


def test_recovers_after_transient_nan(setup, rng):
    """A transient bad batch costs one step; training then continues from
    the exact pre-NaN state."""
    model, cfg, state, tx = setup
    step = make_train_step(model, tx, cfg, donate=False, skip_nonfinite=True)
    good = make_batch(rng, b=4)

    after_bad, _ = step(state, _poison(make_batch(rng, b=4)))
    resumed, metrics = step(after_bad, good)
    assert float(metrics["skipped_nonfinite"]) == 0.0
    assert np.isfinite(float(metrics["loss"]))
    # the update applied from the skipped state equals the one applied
    # directly from the original state (only step/rng differ pre-update)
    direct, _ = make_train_step(
        model, tx, cfg, donate=False, skip_nonfinite=True
    )(state.replace(step=after_bad.step, rng=after_bad.rng), good)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        resumed.params, direct.params)


class _NaNTask(BaseTask):
    """Synthetic task whose batches turn non-finite from ``bad_from`` on."""

    def __init__(self, rng, n_batches=8, bad_from=2, bad_until=None):
        self.rng = rng
        self.n_batches = n_batches
        self.bad_from = bad_from
        self.bad_until = bad_until if bad_until is not None else n_batches

    def train_loader(self, epoch):
        out = []
        for i in range(self.n_batches):
            b = make_batch(self.rng, b=4)
            if self.bad_from <= i < self.bad_until:
                b = _poison(b)
            out.append(b)
        return out

    def prepare_batch(self, batch):
        return batch


def test_runner_aborts_after_consecutive_skips(setup, rng, tmp_path):
    model, cfg, state, tx = setup
    step = make_train_step(model, tx, cfg, donate=False, skip_nonfinite=True)
    task = _NaNTask(rng, n_batches=8, bad_from=2)
    runner = EpochRunner(
        model, state, tx, step, task,
        RunnerConfig(output_dir=str(tmp_path), max_epochs=1,
                     log_every_steps=1, max_consecutive_nonfinite=3),
    )
    with pytest.raises(NonFiniteLossError, match="3 consecutive"):
        runner.train()
    rows = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
    skips = [r for r in rows if r["kind"] == "nonfinite_skip"]
    assert [r["consecutive"] for r in skips] == [1, 2, 3]
    assert any(r["kind"] == "diverged" for r in rows)
    assert (tmp_path / "diverged_state").is_dir()


def test_runner_survives_transient_nan(setup, rng, tmp_path):
    model, cfg, state, tx = setup
    step = make_train_step(model, tx, cfg, donate=False, skip_nonfinite=True)
    # batches 2 and 3 are bad, then recovery — under the threshold of 3
    task = _NaNTask(rng, n_batches=6, bad_from=2, bad_until=4)
    runner = EpochRunner(
        model, state, tx, step, task,
        RunnerConfig(output_dir=str(tmp_path), max_epochs=1,
                     log_every_steps=1, max_consecutive_nonfinite=3),
    )
    runner.train()  # completes
    assert int(runner.state.step) == 6
    rows = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
    assert sum(r["kind"] == "nonfinite_skip" for r in rows) == 2
    assert not any(r["kind"] == "diverged" for r in rows)


def test_generic_step_guard_holds_aux(rng):
    """make_generic_train_step(skip_nonfinite=True): a NaN loss holds
    params, optimizer state AND the functional aux state (momentum copies /
    queues) at their previous values."""
    from sprc_tpu.train.generic import make_generic_train_step

    model = tiny_model()
    params = init_params(model, image_size=28)
    cfg = TrainConfig(learning_rate=1e-3, total_steps=100)
    state, tx = create_train_state(params, cfg)
    state = state.replace(aux={"queue": jnp.zeros((4,), jnp.float32)})

    def apply_fn(p, aux, batch, rng_key):
        losses = model.apply(
            {"params": p}, batch["reference"], batch["target"],
            batch["input_ids"], batch["text_mask"],
            deterministic=False, rngs={"dropout": rng_key})
        return losses, {"queue": aux["queue"] + 1.0}

    step = make_generic_train_step(model, tx, cfg, apply_fn, uses_aux=True,
                                   skip_nonfinite=True)
    # the generic step donates its input state — keep host copies for the
    # post-step comparisons and use a fresh state per call
    params_before = jax.device_get(state.params)
    good, m_good = step(state, make_batch(rng, b=4))
    assert float(m_good["skipped_nonfinite"]) == 0.0
    np.testing.assert_array_equal(np.asarray(good.aux["queue"]), 1.0)

    state2, _ = create_train_state(params_before, cfg)
    state2 = state2.replace(aux={"queue": jnp.zeros((4,), jnp.float32)})
    bad, m_bad = step(state2, _poison(make_batch(rng, b=4)))
    assert float(m_bad["skipped_nonfinite"]) == 1.0
    np.testing.assert_array_equal(np.asarray(bad.aux["queue"]), 0.0)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        bad.params, params_before)
