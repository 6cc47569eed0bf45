"""Model -> eval-task glue for evaluate-only runs.

The reference's ``evaluate.py`` drives ``runner.evaluate()``, where each
task's ``valid_step`` calls methods on the stateful model
(``model.generate(samples)``, ``model.predict_answers(samples)``,
``model.predict(samples)`` — reference tasks/{captioning,vqa,
multimodal_classification}.py). Models here are functional flax modules, so
this module binds ``(model, params, tokenizer)`` into the callables the task
layer (:mod:`sprc_tpu.train.eval_tasks`) consumes.

Batches arrive from :func:`eval_loader`, which pads the final partial batch
(fixed compiled shapes) and marks padding so callers drop it.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def eval_loader(dataset, batch_size: int):
    """Yield (indices, items) batches covering EVERY sample; the last batch
    is padded by repeating its final item (results for padded rows are
    dropped by the caller via the indices length)."""
    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        items = [dataset[i] for i in idx]
        while len(items) < batch_size:  # pad to the compiled shape
            items.append(items[-1])
        yield idx, items


def _stack_images(items: List[dict], key: str = "image") -> np.ndarray:
    return np.stack([np.asarray(it[key], np.float32) for it in items])


def make_caption_generate_fn(
    model, params, tokenizer, *, prompt: str = "a picture of ",
) -> Callable:
    """``generate_fn(samples, num_beams, max_length, min_length) -> [str]``.

    blip_caption decodes from the tokenized prompt prefix (reference
    blip_caption.py:138-188); the BLIP-2 LLM heads (generate_ids taking a
    prompt mask) decode through the frozen T5/OPT from the same prompt
    (reference blip2_{t5,opt}.generate /
    projects/blip2/eval/caption_coco_*_eval.yaml)."""
    from sprc_tpu.models.blip2_opt import Blip2OPT
    from sprc_tpu.models.blip2_t5 import Blip2T5

    if isinstance(model, (Blip2T5, Blip2OPT)):
        def generate_fn(samples: dict, *, num_beams: int = 3,
                        max_length: int = 30, min_length: int = 10) -> List[str]:
            images = jnp.asarray(samples["image"])
            tok = tokenizer([prompt or ""] * images.shape[0], max_length=16)
            ids = model.generate_ids(
                params, images, jnp.asarray(tok["input_ids"]),
                jnp.asarray(tok["attention_mask"]),
                max_new_tokens=max_length,
            )
            return [tokenizer.decode(row).strip() for row in np.asarray(ids)]

        return generate_fn

    # BOS([DEC])-prefixed prompt without the trailing [SEP] — the decoder
    # was trained to start from [DEC], not [CLS] (reference
    # blip_caption.py:184 `prompt.input_ids[:, 0] = bos_token_id`)
    prompt_row = np.asarray(tokenizer.caption_prompt_ids(prompt), np.int32)
    plen = prompt_row.shape[0]

    def generate_fn(samples: dict, *, num_beams: int = 3,
                    max_length: int = 30, min_length: int = 10) -> List[str]:
        images = jnp.asarray(samples["image"])
        prompt_ids = jnp.asarray(
            np.broadcast_to(prompt_row, (images.shape[0], plen)))
        ids = model.generate_ids(
            params, images, prompt_ids,
            eos_token_id=tokenizer.sep_id, pad_token_id=tokenizer.pad_id,
            max_new_tokens=max_length,
        )
        return [tokenizer.decode(row) for row in np.asarray(ids)]

    return generate_fn


def make_vqa_predict_fn(model, params, tokenizer) -> Callable:
    """blip_vqa-style ``predict_fn(samples, answer_list, inference_method,
    ...) -> [str]`` (reference blip_vqa.py predict_answers: 'rank' scores
    the closed answer list, 'generate' decodes freely)."""
    answer_cache: Dict[int, dict] = {}

    def predict_fn(samples: dict, *, answer_list: Optional[Sequence[str]] = None,
                   inference_method: str = "rank", num_beams: int = 3,
                   max_len: int = 10, min_len: int = 1,
                   num_ans_candidates: int = 128, prompt: str = "") -> List[str]:
        images = jnp.asarray(samples["image"])
        questions = [prompt + q if prompt else q
                     for q in samples["text_input"]]
        qtok = tokenizer(questions, max_length=35)
        q_ids = jnp.asarray(qtok["input_ids"])
        q_mask = jnp.asarray(qtok["attention_mask"])
        if inference_method == "rank":
            assert answer_list, "rank inference needs run.answer_list"
            key = id(answer_list)
            if key not in answer_cache:
                answer_cache.clear()
                answer_cache[key] = tokenizer(
                    list(answer_list), max_length=max_len)
            atok = answer_cache[key]
            best, _ = model.rank_answers(
                params, images, q_ids, q_mask,
                jnp.asarray(atok["input_ids"]),
                jnp.asarray(atok["attention_mask"]),
                num_ans_candidates=num_ans_candidates,
                pad_token_id=tokenizer.pad_id,
            )
            return [answer_list[int(i)] for i in np.asarray(best)]
        ids = model.generate_answers(
            params, images, q_ids, q_mask,
            bos_token_id=tokenizer.bos_id or tokenizer.cls_id,
            eos_token_id=tokenizer.sep_id, pad_token_id=tokenizer.pad_id,
            max_new_tokens=max_len,
        )
        return [tokenizer.decode(row) for row in np.asarray(ids)]

    return predict_fn


def make_classification_predict_fn(model, params, tokenizer,
                                   *, max_txt_len: int = 35) -> Callable:
    """``predict_fn(samples) -> {"predictions", "targets"}``
    (reference {blip,albef}_classification predict + blip_nlvr.py:118-140;
    NLVR pairs arrive as image0/image1)."""

    def predict_fn(samples: dict) -> Dict[str, np.ndarray]:
        tok = tokenizer(list(samples["text_input"]), max_length=max_txt_len)
        ids = jnp.asarray(tok["input_ids"])
        mask = jnp.asarray(tok["attention_mask"])
        if "image0" in samples:  # NLVR pair
            logits = model.apply(
                {"params": params}, jnp.asarray(samples["image0"]),
                jnp.asarray(samples["image1"]), ids, mask,
                method=model.predict,
            )
        else:
            logits = model.apply(
                {"params": params}, jnp.asarray(samples["image"]), ids, mask,
                method=model.predict,
            )
        return {"predictions": np.asarray(logits),
                "targets": np.asarray(samples["label"])}

    return predict_fn


def make_blip2_vqa_predict_fn(model, params, tokenizer) -> Callable:
    """Zero-shot VQA through the BLIP-2 LLM heads (reference
    blip2_t5.predict_answers / projects/blip2/eval/vqav2_zeroshot_*_eval.yaml):
    the question is rendered through run.prompt (e.g. ``"Question: {}
    Short answer:"``) and the frozen LLM generates the answer. Inference is
    always generative; ``answer_list`` ranking is not part of the blip2
    zero-shot protocol."""

    def predict_fn(samples: dict, *, answer_list=None,
                   inference_method: str = "generate", num_beams: int = 1,
                   max_len: int = 10, min_len: int = 1,
                   num_ans_candidates: int = 0, prompt: str = "") -> List[str]:
        questions = [
            prompt.format(q) if "{}" in prompt else (prompt + q if prompt else q)
            for q in samples["text_input"]]
        tok = tokenizer(questions, max_length=35)
        ids = model.generate_ids(
            params, jnp.asarray(samples["image"]),
            jnp.asarray(tok["input_ids"]),
            jnp.asarray(tok["attention_mask"]),
            max_new_tokens=max_len,
        )
        return [tokenizer.decode(row).strip() for row in np.asarray(ids)]

    return predict_fn


# task name -> (collate keys treated as per-sample lists, glue factory)
GLUE_FACTORIES = {
    "captioning": make_caption_generate_fn,
    "vqa": make_vqa_predict_fn,
    "gqa": make_vqa_predict_fn,
    "aok_vqa": make_vqa_predict_fn,
    "multimodal_classification": make_classification_predict_fn,
}


def collate_eval(items: List[dict]) -> dict:
    """Batch eval-dataset items: stack image arrays, list everything else."""
    out: dict = {}
    for key in items[0]:
        if key.startswith("image") and not key.endswith("_id"):
            out[key] = _stack_images(items, key)
        else:
            out[key] = [it[key] for it in items]
    return out
