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

    def specialize(self, model):
        """Blip2T5 is seq2seq (prompt in the encoder, caption in the
        decoder — reference blip2_t5.py:108-156); everything else keeps the
        decoder-only (images, ids, mask) contract."""
        from sprc_tpu.models.blip2_t5 import Blip2T5

        if isinstance(model, Blip2T5):
            return Seq2SeqCaptionAdapter(self.tokenizer, self.max_txt_len)
        return self


class Seq2SeqCaptionAdapter(CaptionAdapter):
    """Caption fine-tuning for the BLIP-2 T5 head: the (optional) prompt is
    encoder input, the caption is decoder output with pads masked
    (reference blip2_t5.py forward: text_input/text_output split)."""

    prompt: str = ""

    def collate(self, items: List[dict]) -> Dict[str, np.ndarray]:
        in_tok = self.tokenizer(
            [self.prompt or "" for _ in items], max_length=4)
        out_tok = self.tokenizer(
            [it["text_input"] for it in items], max_length=self.max_txt_len)
        return {
            "images": np.stack([np.asarray(it["image"], np.float32)
                                for it in items]),
            "input_ids": in_tok["input_ids"],
            "input_mask": in_tok["attention_mask"],
            "output_ids": out_tok["input_ids"],
            "output_mask": out_tok["attention_mask"],
        }

    def loss_fn(self, model) -> Callable:
        pad_id = getattr(self.tokenizer, "pad_id", 0)

        def apply_fn(params, batch, rng):
            out = model.apply(
                {"params": params}, batch["images"], batch["input_ids"],
                batch["input_mask"], batch["output_ids"],
                batch["output_mask"], pad_token_id=pad_id,
                decoder_start_token_id=pad_id, deterministic=False,
                rngs={"dropout": rng},
            )
            return out if isinstance(out, dict) else {"loss": out}
        return apply_fn

    @staticmethod
    def example_init(image_size: int):
        ids = jnp.zeros((1, 4), jnp.int32)
        ones = jnp.ones((1, 4), jnp.int32)
        return (jnp.zeros((1, image_size, image_size, 3), jnp.float32),
                ids, ones, ids, ones)


class VQAAdapter:
    """Items {image, text_input, answers, weights} -> the VQAModel forward
    contract (images, question, flattened weighted answers + mapping)
    (reference vqa_datasets collate + blip_vqa.py:94-160). When the model
    config sets ``use_distill`` (albef flavor) the step runs the momentum
    answer-distillation of albef_vqa.py:153-226 with the one-epoch alpha
    ramp (:80-81); momentum tower copies ride the aux state."""

    uses_aux = False  # set per-model in loss_fn

    def __init__(self, tokenizer, max_txt_len: int = 35,
                 max_answer_len: int = 12):
        self.tokenizer = tokenizer
        self.max_txt_len = max_txt_len
        self.max_answer_len = max_answer_len
        self._alpha = 0.4

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

    def step_extras(self, epoch: int, i: int, iters_per_epoch: int):
        # one-epoch alpha ramp (albef_vqa.py:80-81)
        ramp = min(1.0, (epoch * iters_per_epoch + i) / iters_per_epoch)
        return {"alpha": np.float32(self._alpha * ramp)}

    def init_aux(self, model, params):
        from sprc_tpu.models.vqa import init_vqa_state

        return init_vqa_state(params)

    def loss_fn(self, model) -> Callable:
        self._alpha = float(getattr(model.cfg, "alpha", 0.4))
        self.uses_aux = bool(getattr(model.cfg, "use_distill", False))
        if self.uses_aux:
            from sprc_tpu.models.vqa import vqa_train_step

            def apply_fn(params, aux, batch, rng):
                return vqa_train_step(
                    model, params, aux, batch,
                    alpha=batch.get("alpha", self._alpha), rng=rng)
            return apply_fn

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


class RetrievalAdapter:
    """Items {image, text_input, image_id} -> ITC/ITM retrieval training for
    the momentum-queue families (reference retrieval.py +
    {blip,albef}_models retrieval forward). The momentum params + feature
    queues are functional state threaded through ``TrainState.aux``; alpha
    follows the reference two-epoch ramp (albef_retrieval.py:104-105) via
    per-batch ``step_extras``."""

    uses_aux = True

    def __init__(self, tokenizer, max_txt_len: int = 35):
        self.tokenizer = tokenizer
        self.max_txt_len = max_txt_len
        self._alpha = 0.4

    def specialize(self, model):
        if type(model).__name__ == "AlproRetrieval":  # no momentum queues
            return AlproRetrievalAdapter(self.tokenizer, self.max_txt_len)
        return self

    def collate(self, items: List[dict]) -> Dict[str, np.ndarray]:
        texts = [it["text_input"] for it in items]
        tok = self.tokenizer(texts, max_length=self.max_txt_len)
        enc = self.tokenizer(texts, max_length=self.max_txt_len,
                             enc_token=True)
        return {
            "images": np.stack([np.asarray(it["image"], np.float32)
                                for it in items]),
            "input_ids": tok["input_ids"],
            "text_mask": tok["attention_mask"],
            "enc_input_ids": enc["input_ids"],
            "image_ids": np.asarray([it["image_id"] for it in items],
                                    np.int32),
        }

    def step_extras(self, epoch: int, i: int, iters_per_epoch: int):
        ramp = min(1.0, (epoch * iters_per_epoch + i) / (2 * iters_per_epoch))
        return {"alpha": np.float32(self._alpha * ramp)}

    def init_aux(self, model, params):
        from sprc_tpu.models.albef import init_albef_state

        return init_albef_state(params, model.cfg)

    def _helper(self, model):
        from sprc_tpu.models.albef import (
            albef_pretrain_train_step,
            albef_train_step,
        )
        from sprc_tpu.models.blip1 import (
            blip_pretrain_train_step,
            blip_retrieval_train_step,
        )

        return {
            "AlbefRetrieval": albef_train_step,
            "AlbefPretrain": albef_pretrain_train_step,
            "BlipPretrain": blip_pretrain_train_step,
        }.get(type(model).__name__, blip_retrieval_train_step)

    def loss_fn(self, model) -> Callable:
        self._alpha = float(getattr(model.cfg, "alpha", 0.4))
        helper = self._helper(model)

        def apply_fn(params, aux, batch, rng):
            alpha = batch.get("alpha", self._alpha)
            return helper(model, params, aux, batch, alpha=alpha, rng=rng)

        return apply_fn

    def init_params(self, model, rng, image_size: int):
        cfg = model.cfg
        E, K, B, T = cfg.embed_dim, cfg.queue_size, 1, 4
        imgs = jnp.zeros((B, image_size, image_size, 3), jnp.float32)
        ids = jnp.zeros((B, T), jnp.int32)
        mask = jnp.ones((B, T), jnp.int32)
        iid = jnp.zeros((B,), jnp.int32)
        queues = (jnp.zeros((B, E)), jnp.zeros((B, E)), jnp.zeros((E, K)),
                  jnp.zeros((E, K)), jnp.full((K,), -100, jnp.int32),
                  jnp.asarray(0.4))
        name = type(model).__name__
        if name == "AlbefRetrieval":
            args = (imgs, ids, mask, iid) + queues
        elif name == "AlbefPretrain":
            # (..., masked_ids, mlm_labels, image_ids, feats/queues,
            #  mlm_logits_m, alpha)
            V = model.cfg.text_config().vocab_size
            args = (imgs, ids, mask, ids,
                    jnp.full((B, T), -100, jnp.int32), iid) + queues[:-1] + (
                jnp.zeros((B, T, V)), jnp.asarray(0.4))
        elif name == "BlipPretrain":
            args = (imgs, ids, mask, ids, ids, iid) + queues
        else:  # BlipRetrieval
            args = (imgs, ids, mask, ids, iid) + queues
        return model.init(
            {"params": rng, "sample": jax.random.PRNGKey(1)}, *args
        )["params"]


class PretrainAdapter(CaptionAdapter):
    """image_text_pretrain over (image, text) pair datasets. Parameter-only
    families (BLIP-2 stage 1: ITC+ITM+LM, blip2_qformer.py forward) reuse
    the caption collate/loss; the momentum-queue pretrainers
    (blip_pretrain) dispatch to :class:`RetrievalAdapter`'s aux machinery
    via ``specialize``."""

    def specialize(self, model):
        name = type(model).__name__
        if name not in ("BlipPretrain", "AlbefPretrain", "AlbefRetrieval",
                        "BlipRetrieval"):
            return self
        repl = RetrievalAdapter(self.tokenizer, self.max_txt_len)
        tok = self.tokenizer
        base_collate = repl.collate
        if name == "BlipPretrain":
            # dec_input_ids: bos([DEC])-prefixed caption (blip1.py:646)
            bos = getattr(tok, "bos_id", None)

            def collate(items, _c=base_collate, _bos=bos):
                out = _c(items)
                dec = np.array(out["input_ids"])
                dec[:, 0] = _bos if _bos is not None else dec[0, 0]
                out["dec_input_ids"] = dec
                return out

            repl.collate = collate
        elif name == "AlbefPretrain":
            # host-side BERT masking (albef.py mlm_mask, reference :340-370)
            from sprc_tpu.models.albef import mlm_mask

            mask_id = tok.vocab.get("[MASK]", tok.cls_id)
            V = model.cfg.text_config().vocab_size
            mrng = np.random.RandomState(0)

            def collate(items, _c=base_collate):
                out = _c(items)
                masked, labels = mlm_mask(
                    mrng, out["input_ids"], V, mask_id,
                    pad_token_id=tok.pad_id, cls_token_id=tok.cls_id)
                out["masked_ids"] = masked
                out["mlm_labels"] = labels
                return out

            repl.collate = collate
        return repl


class ClassificationAdapter:
    """multimodal_classification: snli_ve-style (image, sentence, label)
    and NLVR pairs (image0, image1, sentence, label), with the reference's
    momentum soft-distillation when the model config enables it
    (classification.py / nlvr.py train steps); alpha ramps over one epoch
    (classifier) or two (NLVR)."""

    uses_aux = False  # set per-model in loss_fn

    def __init__(self, tokenizer, max_txt_len: int = 40):
        self.tokenizer = tokenizer
        self.max_txt_len = max_txt_len
        self._alpha = 0.4
        self._ramp_epochs = 1

    def specialize(self, model):
        if type(model).__name__ == "AlproQA":  # video QA over answer vocab
            return AlproQAAdapter(
                self.tokenizer, self.max_txt_len).specialize(model)
        return self

    def collate(self, items: List[dict]) -> Dict[str, np.ndarray]:
        tok = self.tokenizer(
            [it["text_input"] for it in items], max_length=self.max_txt_len)
        out = {
            "input_ids": tok["input_ids"],
            "text_mask": tok["attention_mask"],
            "labels": np.asarray([int(it["label"]) for it in items],
                                 np.int32),
        }
        if "image0" in items[0]:
            out["image0"] = np.stack(
                [np.asarray(it["image0"], np.float32) for it in items])
            out["image1"] = np.stack(
                [np.asarray(it["image1"], np.float32) for it in items])
        else:
            out["images"] = np.stack(
                [np.asarray(it["image"], np.float32) for it in items])
        return out

    def step_extras(self, epoch: int, i: int, iters_per_epoch: int):
        ramp = min(1.0, (epoch * iters_per_epoch + i)
                   / (self._ramp_epochs * iters_per_epoch))
        return {"alpha": np.float32(self._alpha * ramp)}

    def init_aux(self, model, params):
        if type(model).__name__ == "NLVRClassifier":
            from sprc_tpu.models.nlvr import init_nlvr_state

            return init_nlvr_state(params)
        from sprc_tpu.models.classification import init_classifier_state

        return init_classifier_state(params)

    def loss_fn(self, model) -> Callable:
        cfg = model.cfg
        self._alpha = float(getattr(cfg, "alpha", 0.4))
        is_nlvr = type(model).__name__ == "NLVRClassifier"
        distill = bool(getattr(cfg, "use_distill", False)) and (
            not is_nlvr or getattr(cfg, "flavor", "albef") == "albef")
        self.uses_aux = distill
        self._ramp_epochs = 2 if is_nlvr else 1
        if is_nlvr:
            from sprc_tpu.models.nlvr import nlvr_train_step as helper
        else:
            from sprc_tpu.models.classification import (
                classifier_train_step as helper,
            )

        if distill:
            def apply_fn(params, aux, batch, rng):
                return helper(model, params, aux, batch,
                              alpha=batch.get("alpha", self._alpha))
            return apply_fn

        def apply_fn(params, batch, rng):
            if is_nlvr:
                out = model.apply(
                    {"params": params}, batch["image0"], batch["image1"],
                    batch["input_ids"], batch["text_mask"], batch["labels"],
                    None, jnp.asarray(0.0, jnp.float32))
            else:
                out = model.apply(
                    {"params": params}, batch["images"], batch["input_ids"],
                    batch["text_mask"], batch["labels"], None,
                    jnp.asarray(0.0, jnp.float32))
            return out
        return apply_fn

    def init_params(self, model, rng, image_size: int):
        imgs = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        ids = jnp.zeros((1, 4), jnp.int32)
        mask = jnp.ones((1, 4), jnp.int32)
        lbl = jnp.zeros((1,), jnp.int32)
        if type(model).__name__ == "NLVRClassifier":
            return model.init(rng, imgs, imgs, ids, mask, lbl)["params"]
        return model.init(rng, imgs, ids, mask, lbl)["params"]


class DialogueAdapter:
    """AVSD dialogue (reference dialogue.py + avsd_dialogue_datasets.py
    collater): GPT-processed items {input_ids, token_type_ids, labels,
    video_fts, video_token_type_ids} -> padded [video prefix | text] batch
    for :class:`~sprc_tpu.models.gpt_dialogue.GPTDialogue`. Pad ids come
    from the dataset's GPT text processor (``attach``)."""

    def __init__(self, tokenizer=None, max_txt_len: int = 0):
        self.pad_id = 0

    def attach(self, dataset) -> None:
        tok = getattr(dataset.text_processor, "tokenizer", None)
        if tok is not None:
            self.pad_id = tok.special_token_id("<pad>")

    def collate(self, items: List[dict]) -> Dict[str, np.ndarray]:
        B = len(items)
        L = max(len(it["input_ids"]) for it in items)
        T = max(len(it["video_fts"]) for it in items)
        D = items[0]["video_fts"].shape[1]
        ids = np.full((B, L), self.pad_id, np.int32)
        text_tt = np.full((B, L), self.pad_id, np.int32)
        labels = np.full((B, T + L), -1, np.int32)
        fts = np.ones((B, T, D), np.float32)  # pad value 1.0 (reference)
        vid_tt = np.full((B, T), self.pad_id, np.int32)
        attn = np.zeros((B, T + L), np.int32)
        for i, it in enumerate(items):
            l, t = len(it["input_ids"]), len(it["video_fts"])
            ids[i, :l] = it["input_ids"]
            text_tt[i, :l] = it["token_type_ids"]
            labels[i, T: T + l] = it["labels"]
            fts[i, :t] = it["video_fts"]
            vid_tt[i, :t] = it["video_token_type_ids"]
            attn[i, :t] = 1
            attn[i, T: T + l] = 1
        return {
            "input_ids": ids,
            "video_fts": fts,
            "attn_mask": attn,
            "token_type_ids": np.concatenate([vid_tt, text_tt], axis=1),
            "labels": labels,
        }

    def loss_fn(self, model) -> Callable:
        def apply_fn(params, batch, rng):
            return model.apply(
                {"params": params}, batch["input_ids"], batch["video_fts"],
                batch["attn_mask"], batch["token_type_ids"], batch["labels"])
        return apply_fn

    def init_params(self, model, rng, image_size: int):
        D = model.cfg.len_video_ft
        return model.init(
            rng, jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 2, D)),
            jnp.ones((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32),
            -jnp.ones((1, 4), jnp.int32),
        )["params"]


class AlproRetrievalAdapter:
    """ALPRO video-text retrieval training: in-batch VTC + hard-negative
    VTM (reference alpro_retrieval.py:66-240 via
    projects/alpro/train/{msrvtt,didemo}_retrieval_ft.yaml). No momentum
    queues — the forward carries both losses; hard negatives sample via the
    'sample' rng."""

    def __init__(self, tokenizer, max_txt_len: int = 35):
        self.tokenizer = tokenizer
        self.max_txt_len = max_txt_len

    def collate(self, items: List[dict]) -> Dict[str, np.ndarray]:
        tok = self.tokenizer(
            [it["text_input"] for it in items], max_length=self.max_txt_len)
        return {
            "video": np.stack([np.asarray(it["image"], np.float32)
                               for it in items]),
            "input_ids": tok["input_ids"],
            "text_mask": tok["attention_mask"],
        }

    def loss_fn(self, model) -> Callable:
        def apply_fn(params, batch, rng):
            r_drop, r_sample = jax.random.split(rng)
            return model.apply(
                {"params": params}, batch["video"], batch["input_ids"],
                batch["text_mask"], deterministic=False,
                rngs={"dropout": r_drop, "sample": r_sample},
            )
        return apply_fn

    def init_params(self, model, rng, image_size: int):
        T = model.cfg.num_frames
        return model.init(
            {"params": rng, "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, T, image_size, image_size, 3), jnp.float32),
            jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        )["params"]


class AlproQAAdapter:
    """ALPRO video QA as classification over the answer vocabulary
    (reference alpro_qa.py + projects/alpro/train/{msrvtt,msvd}_qa_ft.yaml).
    The answer vocabulary comes from the train split by frequency (the
    reference ships a fixed ans2label file; `attach` derives the same
    mapping from the data), truncated to ``cfg.num_classes``."""

    def __init__(self, tokenizer, max_txt_len: int = 35):
        self.tokenizer = tokenizer
        self.max_txt_len = max_txt_len
        self.ans2label: Dict[str, int] = {}
        self._num_classes = 0

    def specialize(self, model):
        self._num_classes = int(model.cfg.num_classes)
        return self

    def attach(self, dataset) -> None:
        counts: Dict[str, int] = {}
        for ann in getattr(dataset, "annotation", []):
            answers = ann.get("answer", ann.get("answers", []))
            if isinstance(answers, str):
                answers = [answers]
            for a in answers:
                counts[a] = counts.get(a, 0) + 1
        ranked = sorted(counts, key=lambda a: (-counts[a], a))
        limit = self._num_classes or len(ranked)
        self.ans2label = {a: i for i, a in enumerate(ranked[:limit])}

    def collate(self, items: List[dict]) -> Dict[str, np.ndarray]:
        tok = self.tokenizer(
            [it["text_input"] for it in items], max_length=self.max_txt_len)
        labels = []
        for it in items:
            answers = it.get("answers") or [""]
            # OOV answers -> -1: excluded from the loss (AlproQA.__call__),
            # matching eval's always-wrong mapping (cli/evaluate.py)
            labels.append(self.ans2label.get(answers[0], -1))
        return {
            "video": np.stack([np.asarray(it["image"], np.float32)
                               for it in items]),
            "input_ids": tok["input_ids"],
            "text_mask": tok["attention_mask"],
            "labels": np.asarray(labels, np.int32),
        }

    def loss_fn(self, model) -> Callable:
        def apply_fn(params, batch, rng):
            return model.apply(
                {"params": params}, batch["video"], batch["input_ids"],
                batch["text_mask"], batch["labels"], deterministic=False,
                rngs={"dropout": rng},
            )
        return apply_fn

    def init_params(self, model, rng, image_size: int):
        T = model.cfg.num_frames
        return model.init(
            rng,
            jnp.zeros((1, T, image_size, image_size, 3), jnp.float32),
            jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )["params"]


# reference task-name -> adapter (lavis/tasks/__init__.py names)
TASK_ADAPTERS: Dict[str, Any] = {
    "captioning": CaptionAdapter,
    "vqa": VQAAdapter,
    "gqa": VQAAdapter,
    "aok_vqa": VQAAdapter,
    "retrieval": RetrievalAdapter,
    "image_text_pretrain": PretrainAdapter,
    "multimodal_classification": ClassificationAdapter,
    "dialogue": DialogueAdapter,
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
        extras = getattr(self.adapter, "step_extras", None)
        iters_per_epoch = max(1, len(ds) // bs)
        for bi, s in enumerate(range(0, len(order) - bs + 1, bs)):
            items = [ds[int(i)] for i in order[s: s + bs]]
            batch = self.adapter.collate(items)
            if extras is not None:
                # per-step scalar inputs (e.g. the distillation-alpha ramp,
                # reference albef_retrieval.py:104-105) — traced array args,
                # so per-step values don't recompile
                batch.update(extras(epoch, bi, iters_per_epoch))
            yield batch

    def prepare_batch(self, batch):
        return batch

    def evaluation(self, model, params) -> Dict[str, float]:
        return {}

    def selection_metric(self, results) -> Optional[float]:
        return None


def make_generic_train_step(model, tx, cfg: TrainConfig, apply_fn: Callable,
                            uses_aux: bool = False,
                            skip_nonfinite: bool = False):
    """Jitted step over an adapter's ``apply_fn(params, batch, rng) ->
    {loss...}`` with the same frozen-prefix autodiff exclusion as the CIR
    step (train/loop.py). With ``uses_aux`` the adapter's apply_fn is
    ``(params, aux, batch, rng) -> (losses, new_aux)`` and the functional
    model state (momentum copies, feature queues) rides ``state.aux``.
    ``skip_nonfinite`` adds the in-step NaN/Inf no-op-update guard of
    train/loop.py (also holds ``state.aux`` — momentum copies / queues —
    at its previous value on a skipped step)."""
    frozen_keys = set(cfg.frozen_prefixes)

    def _split(params):
        train = {k: v for k, v in params.items() if k not in frozen_keys}
        frozen = {k: v for k, v in params.items() if k in frozen_keys}
        return train, frozen

    def _total_and_scalars(losses):
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

    def loss_fn(train_params, frozen_params, aux, batch, rng):
        params = {**train_params, **frozen_params}
        if uses_aux:
            losses, new_aux = apply_fn(params, aux, batch, rng)
        else:
            losses, new_aux = apply_fn(params, batch, rng), None
        total, scalars = _total_and_scalars(losses)
        return total, (scalars, new_aux)

    def step_fn(state: TrainState, batch):
        rng, dropout_rng = jax.random.split(state.rng)
        train_params, frozen_params = _split(state.params)
        (total, (losses, new_aux)), train_grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(train_params, frozen_params, state.aux, batch, dropout_rng)
        grads = {
            **train_grads,
            **jax.tree.map(jnp.zeros_like, frozen_params),
        }
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        aux = new_aux if uses_aux else state.aux
        if skip_nonfinite:
            finite = jnp.isfinite(total)
            for g in jax.tree.leaves(train_grads):
                finite = finite & jnp.all(jnp.isfinite(g))

            def keep_old(new, old):
                return jnp.where(finite, new, old) if hasattr(new, "dtype") else new

            params = jax.tree.map(keep_old, params, state.params)
            opt_state = jax.tree.map(keep_old, opt_state, state.opt_state)
            if uses_aux:
                aux = jax.tree.map(keep_old, aux, state.aux)
            metrics["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        return state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng,
            aux=aux,
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
    model_type = model_cfg.pop("model_type", "pretrain")
    model = build_model(arch, model_type, **model_cfg)

    datasets_cfg = dict(getattr(cfg, "datasets", {}) or {})
    assert len(datasets_cfg) == 1, "one dataset builder per run config"
    (ds_name, ds_cfg), = datasets_cfg.items()
    builder = registry.get("dataset", ds_name)(dict(ds_cfg))
    datasets = builder.build()
    assert "train" in datasets, f"builder {ds_name} produced no train split"

    # run.tokenizer selects the LLM's own tokenizer for stage-2-style runs
    # (reference blip2_{opt,t5} use their HF tokenizers, not BERT):
    #   tokenizer: {t5: /path/tokenizer.json} | {opt: ...} | {llama: ...}
    tok_cfg = run.get("tokenizer")
    if isinstance(tok_cfg, dict):
        from sprc_tpu.text.llm_tokenizers import (
            llama_tokenizer,
            opt_tokenizer,
            t5_tokenizer,
        )

        (kind, tok_path), = tok_cfg.items()
        tokenizer = {"t5": t5_tokenizer, "opt": opt_tokenizer,
                     "llama": llama_tokenizer}[kind](tok_path)
    else:
        tokenizer = BertWordPieceTokenizer.from_vocab_file(
            ensure_bert_vocab(getattr(args, "vocab_path", None))
        )
    adapter = TASK_ADAPTERS[task_name](
        tokenizer, max_txt_len=int(run.get("max_txt_len", 35))
    )
    if hasattr(adapter, "specialize"):  # model-dependent re-dispatch
        adapter = adapter.specialize(model)
    if hasattr(adapter, "attach"):  # dataset-derived state (pad ids)
        adapter.attach(datasets["train"])
    batch_size = int(run.get("batch_size", 8))
    task = BuilderTask(
        datasets, adapter, batch_size=batch_size,
        seed=int(run.get("seed", 42)),
    )

    image_size = getattr(model.cfg, "image_size", 224)
    init_rng = jax.random.PRNGKey(int(run.get("seed", 42)))
    if hasattr(adapter, "init_params"):  # model-dependent init signature
        params = adapter.init_params(model, init_rng, image_size)
    else:
        params = model.init(
            init_rng, *type(adapter).example_init(image_size)
        )["params"]
    # OneCycle horizon = the actual run length unless the config pins it:
    # a fixed default (the old 1000) would collapse the LR to its final
    # value after step 1000 and silently under-train multi-epoch runs.
    max_epochs = int(run.get("max_epochs", 1))
    steps_per_epoch = max(1, len(datasets["train"]) // batch_size)
    tcfg = TrainConfig(
        learning_rate=float(run.get("learning_rate", 1e-5)),
        weight_decay=float(run.get("weight_decay", 0.05)),
        total_steps=int(run.get("total_steps", run.get(
            "max_iters", max_epochs * steps_per_epoch))),
        frozen_prefixes=tuple(
            getattr(model, "FROZEN_PREFIXES", ())),
    )
    state, tx = create_train_state(params, tcfg)
    apply_fn = adapter.loss_fn(model)  # may set adapter.uses_aux
    uses_aux = bool(getattr(adapter, "uses_aux", False))
    if uses_aux:
        state = state.replace(aux=adapter.init_aux(model, params))
    step_fn = make_generic_train_step(
        model, tx, tcfg, apply_fn, uses_aux=uses_aux,
        skip_nonfinite=bool(run.get("skip_nonfinite", True)),
    )

    rcfg = RunnerConfig(
        output_dir=args.output_dir,
        max_epochs=max_epochs,
        log_every_steps=int(run.get("log_freq", 10)),
        max_consecutive_nonfinite=int(
            run.get("max_consecutive_nonfinite", 10)),
    )
    if run.get("runner") == "runner_iter":
        # iteration-budget training (reference runner_iter.py +
        # projects/blip/coco_cap_ft_iter.yaml: run.max_iters/iters_per_inner_epoch)
        from sprc_tpu.train.runner import IterRunner

        runner = IterRunner(
            model, state, tx, step_fn, task, rcfg,
            max_iters=int(run.get("max_iters", 1000)),
            iters_per_inner=int(run.get("iters_per_inner_epoch", 100)),
        )
    else:
        runner = EpochRunner(model, state, tx, step_fn, task, rcfg)
    return runner.train()
