"""CLIP zero-shot classification (reference clip_models/model.py:692-744 +
openai_imagenet_template:1225-1305).

The reference builds a zero-shot classifier before evaluation: every class
name is rendered through the 80 OpenAI ImageNet prompt templates, text
embeddings are L2-normalized, averaged per class, re-normalized, and
stacked into a [D, C] matrix; prediction is ``100 * image_feats @
classifier`` (model.py predict). Same protocol here, functional: the
classifier is an array, the predict closure plugs into
MultimodalClassificationTask (train/eval_tasks.py).

The template strings below are the published OpenAI zero-shot protocol
(the prompt set IS the metric definition, like the VQA normalization
tables); ``{c}`` is the class name slot.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# reference model.py:1225-1305 (openai_imagenet_template), verbatim protocol
OPENAI_IMAGENET_TEMPLATES: List[str] = [
    "a bad photo of a {c}.", "a photo of many {c}.", "a sculpture of a {c}.",
    "a photo of the hard to see {c}.", "a low resolution photo of the {c}.",
    "a rendering of a {c}.", "graffiti of a {c}.", "a bad photo of the {c}.",
    "a cropped photo of the {c}.", "a tattoo of a {c}.",
    "the embroidered {c}.", "a photo of a hard to see {c}.",
    "a bright photo of a {c}.", "a photo of a clean {c}.",
    "a photo of a dirty {c}.", "a dark photo of the {c}.",
    "a drawing of a {c}.", "a photo of my {c}.", "the plastic {c}.",
    "a photo of the cool {c}.", "a close-up photo of a {c}.",
    "a black and white photo of the {c}.", "a painting of the {c}.",
    "a painting of a {c}.", "a pixelated photo of the {c}.",
    "a sculpture of the {c}.", "a bright photo of the {c}.",
    "a cropped photo of a {c}.", "a plastic {c}.",
    "a photo of the dirty {c}.", "a jpeg corrupted photo of a {c}.",
    "a blurry photo of the {c}.", "a photo of the {c}.",
    "a good photo of the {c}.", "a rendering of the {c}.",
    "a {c} in a video game.", "a photo of one {c}.", "a doodle of a {c}.",
    "a close-up photo of the {c}.", "a photo of a {c}.",
    "the origami {c}.", "the {c} in a video game.", "a sketch of a {c}.",
    "a doodle of the {c}.", "a origami {c}.",
    "a low resolution photo of a {c}.", "the toy {c}.",
    "a rendition of the {c}.", "a photo of the clean {c}.",
    "a photo of a large {c}.", "a rendition of a {c}.",
    "a photo of a nice {c}.", "a photo of a weird {c}.",
    "a blurry photo of a {c}.", "a cartoon {c}.", "art of a {c}.",
    "a sketch of the {c}.", "a embroidered {c}.",
    "a pixelated photo of a {c}.", "itap of the {c}.",
    "a jpeg corrupted photo of the {c}.", "a good photo of a {c}.",
    "a plushie {c}.", "a photo of the nice {c}.",
    "a photo of the small {c}.", "a photo of the weird {c}.",
    "the cartoon {c}.", "art of the {c}.", "a drawing of the {c}.",
    "a photo of the large {c}.", "a black and white photo of a {c}.",
    "the plushie {c}.", "a dark photo of a {c}.", "itap of a {c}.",
    "graffiti of the {c}.", "a toy {c}.", "itap of my {c}.",
    "a photo of a cool {c}.", "a photo of a small {c}.",
    "a tattoo of the {c}.",
]


def zero_shot_classifier(
    model, params, classnames: Sequence[str],
    tokenize: Callable[[Sequence[str]], tuple],
    *, templates: Sequence[str] = tuple(OPENAI_IMAGENET_TEMPLATES),
) -> np.ndarray:
    """-> [D, C] classifier (reference zero_shot_classifier, model.py:710-724).

    ``tokenize(texts) -> (input_ids [N, L], eot_positions [N])`` — e.g. a
    CLIP BPE via :class:`sprc_tpu.text.llm_tokenizers.HFFileTokenizer` with
    an offline-exported tokenizer.json, eot = position of the end-of-text
    token."""
    encode = jax.jit(lambda p, ids, eot: model.apply(
        {"params": p}, ids, eot, method=model.encode_text))
    weights = []
    for classname in classnames:
        texts = [t.format(c=classname) for t in templates]
        ids, eot = tokenize(texts)
        emb = np.asarray(encode(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(eot, jnp.int32)))
        emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
        mean = emb.mean(axis=0)
        weights.append(mean / np.linalg.norm(mean))
    return np.stack(weights, axis=1)


def make_zero_shot_predict_fn(model, params, classifier: np.ndarray) -> Callable:
    """``predict_fn(samples) -> {"predictions", "targets"}`` for
    MultimodalClassificationTask (reference predict, model.py:692-701)."""
    clf = jnp.asarray(classifier, jnp.float32)
    logits_fn = jax.jit(lambda p, img: 100.0 * (
        lambda f: f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    )(model.apply({"params": p}, img, method=model.encode_image)) @ clf)

    def predict_fn(samples: dict) -> Dict[str, np.ndarray]:
        logits = logits_fn(params, jnp.asarray(samples["image"]))
        return {"predictions": np.asarray(logits),
                "targets": np.asarray(samples["label"])}

    return predict_fn
