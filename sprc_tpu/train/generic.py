"""Generic (non-CIR) YAML-driven training: caption / VQA tasks end-to-end.

The reference's LAVIS path (``train.py --cfg-path projects/...`` ->
RunnerBase + BaseTask + dataset builders, runner_base.py:38-641,
base_task.py:155-247) for the generic model families. Here the same wiring
is: registry dataset builders (data/builders.py) -> a task adapter that
collates raw items into model-shaped arrays -> a jitted generic train step
over the family's loss forward -> EpochRunner.

Adapters exist for the two reference task families the run-config library
ships configs for (captioning, vqa); the adapter table is the extension
point for the rest.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from sprc_tpu.train.loop import TrainConfig, TrainState
from sprc_tpu.train.runner import BaseTask


class CaptionAdapter:
    """Items {image, text_input} -> (images, input_ids, text_mask) for
    BlipCaption-style LM losses (reference caption collate +
    blip_caption.py:58-92)."""

    def __init__(self, tokenizer, max_txt_len: int = 40):
        self.tokenizer = tokenizer
        self.max_txt_len = max_txt_len

    def collate(self, items: List[dict]) -> Dict[str, np.ndarray]:
        tok = self.tokenizer(
            [it["text_input"] for it in items], max_length=self.max_txt_len
        )
        return {
            "images": np.stack([np.asarray(it["image"], np.float32)
                                for it in items]),
            "input_ids": tok["input_ids"],
            "text_mask": tok["attention_mask"],
        }

    def loss_fn(self, model) -> Callable:
        def apply_fn(params, batch, rng):
            out = model.apply(
                {"params": params}, batch["images"], batch["input_ids"],
                batch["text_mask"], deterministic=False,
                rngs={"dropout": rng},
            )
            return out if isinstance(out, dict) else {"loss": out}
        return apply_fn

    @staticmethod
    def example_init(image_size: int):
        return (jnp.zeros((1, image_size, image_size, 3), jnp.float32),
                jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32))


class VQAAdapter:
    """Items {image, text_input, answers, weights} -> the VQAModel forward
    contract (images, question, flattened weighted answers + mapping)
    (reference vqa_datasets collate + blip_vqa.py:94-160)."""

    def __init__(self, tokenizer, max_txt_len: int = 35,
                 max_answer_len: int = 12):
        self.tokenizer = tokenizer
        self.max_txt_len = max_txt_len
        self.max_answer_len = max_answer_len

    def collate(self, items: List[dict]) -> Dict[str, np.ndarray]:
        qtok = self.tokenizer(
            [it["text_input"] for it in items], max_length=self.max_txt_len
        )
        answers: List[str] = []
        weights: List[float] = []
        ans_to_q: List[int] = []
        for qi, it in enumerate(items):
            for a, w in zip(it["answers"], it["weights"]):
                answers.append(a)
                weights.append(float(w))
                ans_to_q.append(qi)
        atok = self.tokenizer(answers, max_length=self.max_answer_len)
        return {
            "images": np.stack([np.asarray(it["image"], np.float32)
                                for it in items]),
            "question_ids": qtok["input_ids"],
            "question_mask": qtok["attention_mask"],
            "answer_ids": atok["input_ids"],
            "answer_mask": atok["attention_mask"],
            "ans_to_question": np.asarray(ans_to_q, np.int32),
            "weights": np.asarray(weights, np.float32),
        }

    def loss_fn(self, model) -> Callable:
        def apply_fn(params, batch, rng):
            out = model.apply(
                {"params": params}, batch["images"], batch["question_ids"],
                batch["question_mask"], batch["answer_ids"],
                batch["answer_mask"], batch["ans_to_question"],
                batch["weights"], deterministic=False,
                rngs={"dropout": rng},
            )
            return out if isinstance(out, dict) else {"loss": out}
        return apply_fn

    @staticmethod
    def example_init(image_size: int):
        return (jnp.zeros((1, image_size, image_size, 3), jnp.float32),
                jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
                jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
                jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.float32))


# reference task-name -> adapter (lavis/tasks/__init__.py names)
TASK_ADAPTERS: Dict[str, Any] = {
    "captioning": CaptionAdapter,
    "vqa": VQAAdapter,
    "gqa": VQAAdapter,
    "aok_vqa": VQAAdapter,
}


class BuilderTask(BaseTask):
    """BaseTask over a registry dataset-builder's train split + an adapter.

    Batches are collated on the host; the last partial batch is dropped
    (fixed compiled shapes)."""

    def __init__(self, datasets: Dict[str, Any], adapter, *,
                 batch_size: int, seed: int = 42):
        self.datasets = datasets
        self.adapter = adapter
        self.batch_size = batch_size
        self.seed = seed

    def train_loader(self, epoch: int):
        ds = self.datasets["train"]
        order = np.random.RandomState(self.seed + epoch).permutation(len(ds))
        bs = self.batch_size
        for s in range(0, len(order) - bs + 1, bs):
            items = [ds[int(i)] for i in order[s: s + bs]]
            yield self.adapter.collate(items)

    def prepare_batch(self, batch):
        return batch

    def evaluation(self, model, params) -> Dict[str, float]:
        return {}

    def selection_metric(self, results) -> Optional[float]:
        return None


def make_generic_train_step(model, tx, cfg: TrainConfig, apply_fn: Callable):
    """Jitted step over an adapter's ``apply_fn(params, batch, rng) ->
    {loss...}`` with the same frozen-prefix autodiff exclusion as the CIR
    step (train/loop.py)."""
    frozen_keys = set(cfg.frozen_prefixes)

    def _split(params):
        train = {k: v for k, v in params.items() if k not in frozen_keys}
        frozen = {k: v for k, v in params.items() if k in frozen_keys}
        return train, frozen

    def loss_fn(train_params, frozen_params, batch, rng):
        losses = apply_fn({**train_params, **frozen_params}, batch, rng)
        if "loss" in losses:  # families returning a pre-summed total
            total = losses["loss"]
        else:
            total = jnp.asarray(0.0, jnp.float32)
            weights = cfg.weights()
            for key, value in losses.items():
                total = total + weights.get(key, 1.0) * value
        # metrics: scalar entries only (some families also return logits)
        scalars = {k: v for k, v in losses.items()
                   if getattr(v, "ndim", 0) == 0}
        return total, scalars

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
        return state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        ), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def run_generic(cfg, args) -> Dict[str, float]:
    """Drive a generic task run config end-to-end (the LAVIS
    ``train.py --cfg-path projects/...`` analogue for non-CIR tasks).

    cfg sections: ``run`` (task/batch_size/max_epochs/lr), ``model``
    (arch + family-config overrides; dict values coerce into nested config
    dataclasses), ``datasets`` ({builder_name: builder cfg}).
    """
    from sprc_tpu.loader import build_model
    from sprc_tpu.registry import registry
    import sprc_tpu.data.builders  # noqa: F401  (registers dataset builders)
    import sprc_tpu.data.processors  # noqa: F401  (registers processors)
    from sprc_tpu.text.tokenizer import BertWordPieceTokenizer
    from sprc_tpu.train.loop import create_train_state
    from sprc_tpu.train.runner import EpochRunner, RunnerConfig
    from sprc_tpu.utils.artifacts import ensure_bert_vocab

    run = dict(cfg.run)
    task_name = run.get("task")
    if task_name not in TASK_ADAPTERS:
        raise ValueError(
            f"run.task {task_name!r} has no generic adapter "
            f"(available: {sorted(TASK_ADAPTERS)}); CIR tasks go through "
            "cli.finetune"
        )

    model_cfg = dict(cfg.model)
    arch = model_cfg.pop("arch")
    model_cfg.pop("model_type", None)
    model = build_model(arch, **model_cfg)

    datasets_cfg = dict(getattr(cfg, "datasets", {}) or {})
    assert len(datasets_cfg) == 1, "one dataset builder per run config"
    (ds_name, ds_cfg), = datasets_cfg.items()
    builder = registry.get("dataset", ds_name)(dict(ds_cfg))
    datasets = builder.build()
    assert "train" in datasets, f"builder {ds_name} produced no train split"

    tokenizer = BertWordPieceTokenizer.from_vocab_file(
        ensure_bert_vocab(getattr(args, "vocab_path", None))
    )
    adapter = TASK_ADAPTERS[task_name](
        tokenizer, max_txt_len=int(run.get("max_txt_len", 35))
    )
    batch_size = int(run.get("batch_size", 8))
    task = BuilderTask(
        datasets, adapter, batch_size=batch_size,
        seed=int(run.get("seed", 42)),
    )

    image_size = getattr(model.cfg, "image_size", 224)
    params = model.init(
        jax.random.PRNGKey(int(run.get("seed", 42))),
        *type(adapter).example_init(image_size),
    )["params"]
    # OneCycle horizon = the actual run length unless the config pins it:
    # a fixed default (the old 1000) would collapse the LR to its final
    # value after step 1000 and silently under-train multi-epoch runs.
    max_epochs = int(run.get("max_epochs", 1))
    steps_per_epoch = max(1, len(datasets["train"]) // batch_size)
    tcfg = TrainConfig(
        learning_rate=float(run.get("learning_rate", 1e-5)),
        weight_decay=float(run.get("weight_decay", 0.05)),
        total_steps=int(run.get("total_steps",
                                max_epochs * steps_per_epoch)),
        frozen_prefixes=tuple(
            getattr(model, "FROZEN_PREFIXES", ())),
    )
    state, tx = create_train_state(params, tcfg)
    step_fn = make_generic_train_step(model, tx, tcfg, adapter.loss_fn(model))

    runner = EpochRunner(
        model, state, tx, step_fn, task,
        RunnerConfig(
            output_dir=args.output_dir,
            max_epochs=max_epochs,
            log_every_steps=int(run.get("log_freq", 10)),
        ),
    )
    return runner.train()
