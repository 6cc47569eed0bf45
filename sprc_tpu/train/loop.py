"""Training loop core: optimizer, train state, jitted/sharded train step.

TPU-native counterpart of the reference's fine-tune driver
(reference: src/blip_fine_tune_2.py:257-307):

- AdamW(0.9, 0.98, eps 1e-7, wd 0.05) over *trainable* params only (the
  frozen ViT subtree is excluded, mirroring ``requires_grad`` filtering at
  :258), with the OneCycle schedule of :261.
- loss = loss_itc + w_rtc * loss_rtc + w_align * loss_align (:294-299).
- bf16 towers need no GradScaler on TPU — grads are computed in fp32 master
  params; the whole step is one ``jax.jit`` with donated state.
- Data parallelism: ``make_train_step(..., mesh=...)`` shards the batch over
  the ``data`` axis and replicates params; XLA inserts the gradient
  all-reduce and computes the in-batch contrastive matrix over the global
  batch (replacing DDP + GatherLayer, reference base_model.py:199-253).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from sprc_tpu.train.schedules import onecycle_schedule


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    betas: Tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-7
    weight_decay: float = 0.05
    # reference flag defaults --loss-rtc/--loss-align 0.4 (blip_fine_tune_2.py:379-381)
    loss_weights: Optional[Dict[str, float]] = None
    total_steps: int = 10000
    pct_start: float = 1.0 / 50.0  # reference OneCycleLR pct_start (:261)
    grad_accum_steps: int = 1
    frozen_prefixes: Tuple[str, ...] = ("visual_encoder",)

    def weights(self) -> Dict[str, float]:
        return self.loss_weights or {"loss_rtc": 0.4, "loss_align": 0.4}


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


def _param_labels(params: Any, frozen_prefixes: Tuple[str, ...]) -> Any:
    """Label top-level frozen subtrees 'frozen', everything else 'train'."""

    def label_tree(tree, frozen: bool):
        if isinstance(tree, (dict, FrozenDict)):
            return {k: label_tree(v, frozen) for k, v in tree.items()}
        return "frozen" if frozen else "train"

    return {
        k: label_tree(v, k in frozen_prefixes) for k, v in params.items()
    }


def make_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    schedule = onecycle_schedule(
        cfg.learning_rate, cfg.total_steps, pct_start=cfg.pct_start
    )
    adamw = optax.adamw(
        learning_rate=schedule,
        b1=cfg.betas[0],
        b2=cfg.betas[1],
        eps=cfg.eps,
        weight_decay=cfg.weight_decay,
    )
    labels = _param_labels(params, cfg.frozen_prefixes)
    tx = optax.multi_transform(
        {"train": adamw, "frozen": optax.set_to_zero()}, labels
    )
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accum_steps)
    return tx


def create_train_state(
    params: Any, cfg: TrainConfig, rng: Optional[jax.Array] = None
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=rng if rng is not None else jax.random.PRNGKey(0),
    )
    return state, tx


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    mesh: Optional[jax.sharding.Mesh] = None,
    donate: bool = True,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step.

    batch keys: 'reference' [B,H,W,3], 'target' [B,H,W,3],
    'input_ids' [B,L], 'text_mask' [B,L].
    """
    weights = cfg.weights()

    def loss_fn(params, batch, dropout_rng):
        losses = model.apply(
            {"params": params},
            batch["reference"],
            batch["target"],
            batch["input_ids"],
            batch["text_mask"],
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        total = jnp.asarray(0.0, jnp.float32)
        for key, value in losses.items():
            total = total + weights.get(key, 1.0) * value
        return total, losses

    def step_fn(state: TrainState, batch):
        rng, dropout_rng = jax.random.split(state.rng)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, dropout_rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        metrics = dict(losses)
        metrics["loss"] = total
        return new_state, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(mesh, P())
        batch_sharding = NamedSharding(mesh, P("data"))
        batch_shardings = {
            "reference": batch_sharding,
            "target": batch_sharding,
            "input_ids": batch_sharding,
            "text_mask": batch_sharding,
        }
        del replicated
        # params/opt-state shardings are inferred from the arrays themselves
        # (place the state replicated before the first step); the batch is
        # pinned to the data axis, and the SPMD partitioner inserts the grad
        # all-reduce and computes the contrastive matrix over the global batch
        return jax.jit(
            step_fn,
            in_shardings=(None, batch_shardings),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
