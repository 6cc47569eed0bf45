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
    # per-ViT-layer LR decay for unfrozen-ViT fine-tuning (the LAVIS
    # lr_layer_decay path, blip2.py:105-148); None = uniform LR
    layer_decay: Optional[float] = None

    def weights(self) -> Dict[str, float]:
        return self.loss_weights or {"loss_rtc": 0.4, "loss_align": 0.4}


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    # non-parameter model state threaded through the step for families with
    # functional momentum copies / feature queues (ALBEF/BLIP retrieval &
    # pretrain — reference in-place buffers, models/albef.py). None for the
    # parameter-only families; saved/restored by checkpoint.save_state when
    # present so resume is exact.
    aux: Any = None


def _param_labels(params: Any, frozen_prefixes: Tuple[str, ...]) -> Any:
    """Label top-level frozen subtrees 'frozen', everything else 'train'."""

    def label_tree(tree, frozen: bool):
        if isinstance(tree, (dict, FrozenDict)):
            return {k: label_tree(v, frozen) for k, v in tree.items()}
        return "frozen" if frozen else "train"

    return {
        k: label_tree(v, k in frozen_prefixes) for k, v in params.items()
    }


def scale_by_tree(scale_tree: Any) -> optax.GradientTransformation:
    """Multiply updates leaf-wise by a (broadcastable) scale pytree."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        scaled = jax.tree.map(
            lambda u, s: u * jnp.asarray(s, u.dtype), updates, scale_tree
        )
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)


def layer_decay_scales(params: Any, lr_scale: float, vit_key: str = "visual_encoder") -> Any:
    """Per-layer LR scales for ViT fine-tuning (the reference's
    get_optimizer_params, blip2.py:105-148): layer i of N gets
    ``lr_scale ** (N + 1 - i)``; embeddings get the layer-0 scale; non-ViT
    params get 1. Supports both unrolled (block_i) and scanned (stacked)
    layouts — for the scanned layout the scale is a [depth, 1, ...] vector
    broadcast over the stacked leaf.
    """

    def tree_of(value, leaf):
        return value

    scales = jax.tree.map(lambda _: 1.0, params)
    if vit_key not in params:
        return scales
    trunk = params[vit_key]["trunk"]
    depth = 0
    for key in trunk:
        if key.startswith("block_"):
            depth = max(depth, int(key.split("_")[1]) + 1)
    if depth == 0 and "blocks" in trunk:
        depth = jax.tree.leaves(trunk["blocks"])[0].shape[0]

    def scale_for(layer_id: int) -> float:
        return lr_scale ** (depth + 1 - layer_id)

    new_trunk = {}
    for key, sub in trunk.items():
        if key.startswith("block_"):
            layer_id = int(key.split("_")[1]) + 1
            new_trunk[key] = jax.tree.map(lambda _: scale_for(layer_id), sub)
        elif key == "blocks":
            vec = jnp.asarray([scale_for(i + 1) for i in range(depth)])
            new_trunk[key] = jax.tree.map(
                lambda leaf: vec.reshape((depth,) + (1,) * (leaf.ndim - 1)), sub
            )
        else:  # patch embed / cls / pos / ln_pre: layer 0
            new_trunk[key] = jax.tree.map(lambda _: scale_for(0), sub)
    out = dict(scales)
    out[vit_key] = {"trunk": new_trunk}
    return out


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
    if cfg.grad_accum_steps > 1:
        # accumulate INSIDE the partition: optax.masked hands the frozen
        # leaves to MultiSteps as MaskedNode sentinels, so the grad
        # accumulator only materializes for trainable params (a full-tree
        # MultiSteps wasted ~1.2 GB on frozen-ViT zero-grads at ViT-L)
        adamw = optax.MultiSteps(adamw, cfg.grad_accum_steps)
    tx = optax.multi_transform(
        {"train": adamw, "frozen": optax.set_to_zero()}, labels
    )
    if cfg.layer_decay is not None:
        # applied to the final update so it composes with the partition;
        # matches torch per-group lr scaling (scales grad step AND wd step)
        tx = optax.chain(tx, scale_by_tree(layer_decay_scales(params, cfg.layer_decay)))
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
    from_embeds: bool = False,
    skip_nonfinite: bool = False,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step.

    batch keys: 'reference' [B,H,W,3], 'target' [B,H,W,3],
    'input_ids' [B,L], 'text_mask' [B,L].

    ``from_embeds=True`` builds the cached-frozen-feature step instead: the
    batch carries precomputed ``encode_tower`` outputs under
    'reference_embeds'/'target_embeds' [B,S,D] and the step runs
    ``model.forward_cached`` — a Q-Former-only fwd+bwd (the frozen towers,
    ~165 of ~315 ms/step at ViT-L b64, drop out entirely). Exact for the
    reference recipe; see models/cir_base.py::encode_tower.

    Frozen subtrees (``cfg.frozen_prefixes``) are excluded from
    differentiation itself — the reference's ``requires_grad=False``
    (blip_fine_tune_2.py via …align_prompt.py:64-69) done at the autodiff
    level: the jaxpr contains NO backward through (and saves no residuals
    for) the frozen towers, instead of computing those grads and zeroing
    them in the optimizer. Their optimizer updates stay zero via the
    multi_transform partition (zeros are fed for their grad leaves).

    ``skip_nonfinite=True`` adds the in-step failure guard (§5.3): when the
    loss or any gradient is NaN/Inf the params AND optimizer state keep
    their previous values (the step counter still advances, and the RNG
    still splits, so the data/dropout streams stay aligned) and the
    returned metrics carry ``skipped_nonfinite=1``. This is the TPU-native
    analogue of torch.cuda.amp.GradScaler's inf-skip (the reference relies
    on it implicitly at blip_fine_tune_2.py:301-303): one fused select
    inside the jitted step, no host sync, no recompilation. The runner
    layers a consecutive-skip abort policy on top.
    """
    weights = cfg.weights()
    frozen_keys = set(cfg.frozen_prefixes)

    def _split(params):
        train = {k: v for k, v in params.items() if k not in frozen_keys}
        frozen = {k: v for k, v in params.items() if k in frozen_keys}
        return train, frozen

    def loss_fn(train_params, frozen_params, batch, dropout_rng):
        if from_embeds:
            inputs = (batch["reference_embeds"], batch["target_embeds"])
            method = model.forward_cached
        else:
            inputs = (batch["reference"], batch["target"])
            method = None
        losses = model.apply(
            {"params": {**train_params, **frozen_params}},
            *inputs,
            batch["input_ids"],
            batch["text_mask"],
            deterministic=False,
            rngs={"dropout": dropout_rng},
            method=method,
        )
        total = jnp.asarray(0.0, jnp.float32)
        for key, value in losses.items():
            total = total + weights.get(key, 1.0) * value
        return total, losses

    def step_fn(state: TrainState, batch):
        rng, dropout_rng = jax.random.split(state.rng)
        train_params, frozen_params = _split(state.params)
        (total, losses), train_grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(train_params, frozen_params, batch, dropout_rng)
        grads = {
            **train_grads,
            **jax.tree.map(jnp.zeros_like, frozen_params),
        }
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        if skip_nonfinite:
            finite = jnp.isfinite(total)
            for g in jax.tree.leaves(train_grads):
                finite = finite & jnp.all(jnp.isfinite(g))

            def keep_old(new, old):
                return jnp.where(finite, new, old) if hasattr(new, "dtype") else new

            params = jax.tree.map(keep_old, params, state.params)
            opt_state = jax.tree.map(keep_old, opt_state, state.opt_state)
            metrics["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(mesh, P())
        batch_sharding = NamedSharding(mesh, P("data"))
        image_keys = (
            ("reference_embeds", "target_embeds")
            if from_embeds
            else ("reference", "target")
        )
        batch_shardings = {
            image_keys[0]: batch_sharding,
            image_keys[1]: batch_sharding,
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
