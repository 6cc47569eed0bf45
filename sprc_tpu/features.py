"""Unified feature-extraction API (the reference's ``extract_features``).

Every LAVIS feature-extractor family exposes ``model.extract_features(
samples, mode)`` returning a ``BlipOutputFeatures`` record (reference
blip_models/blip_feature_extractor.py:58-140, blip2_qformer.py:387-467,
albef_models/albef_feature_extractor.py, clip_models/model.py
extract_features). Here the same contract is one functional entry point::

    from sprc_tpu.features import extract_features
    feats = extract_features(model, params, {"image": imgs,
                                             "text_input": ["a cat"]},
                             mode="multimodal", tokenizer=tok)
    feats.image_embeds_proj  # [B, ...] L2-normalized projections

``samples`` carries either raw ``text_input`` strings (tokenized with
``tokenizer``) or pre-tokenized ``input_ids``/``attention_mask`` arrays;
``image`` is a preprocessed [B, H, W, 3] array. Modes: "image" | "text" |
"multimodal" (like the reference, multimodal also fills the unimodal
fields it computes along the way where the family provides them).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class OutputFeatures:
    """The reference's BlipOutputFeatures (blip_outputs.py): raw last-layer
    embeddings + L2-normalized contrastive projections."""

    image_embeds: Optional[np.ndarray] = None
    image_embeds_proj: Optional[np.ndarray] = None
    text_embeds: Optional[np.ndarray] = None
    text_embeds_proj: Optional[np.ndarray] = None
    multimodal_embeds: Optional[np.ndarray] = None


def _tokens(samples: dict, tokenizer, max_txt_len: int):
    if "input_ids" in samples:
        return (jnp.asarray(samples["input_ids"]),
                jnp.asarray(samples["attention_mask"]))
    assert tokenizer is not None, (
        "text modes need either pre-tokenized input_ids/attention_mask in "
        "samples or a tokenizer argument")
    tok = tokenizer(list(samples["text_input"]), max_length=max_txt_len)
    return jnp.asarray(tok["input_ids"]), jnp.asarray(tok["attention_mask"])


def extract_features(model, params, samples: dict, mode: str = "multimodal",
                     *, tokenizer=None, max_txt_len: Optional[int] = None,
                     ) -> OutputFeatures:
    assert mode in ("image", "text", "multimodal"), mode
    from sprc_tpu.models.albef import AlbefRetrieval
    from sprc_tpu.models.blip1 import BlipCirBase, BlipRetrieval
    from sprc_tpu.models.blip2_stage1 import Blip2Stage1
    from sprc_tpu.models.clip import Clip

    L = max_txt_len or int(getattr(model.cfg, "max_txt_len", 35))

    def apply(method, *args, **kw):
        return model.apply({"params": params}, *args, method=method, **kw)

    out = OutputFeatures()

    if isinstance(model, Blip2Stage1):
        # reference blip2_qformer.py:387-467
        if mode in ("image", "multimodal"):
            image = jnp.asarray(samples["image"])
        if mode == "image":
            proj, hidden = apply(model.extract_image_features, image)
            out.image_embeds = np.asarray(hidden)
            out.image_embeds_proj = np.asarray(proj)
        elif mode == "text":
            ids, mask = _tokens(samples, tokenizer, L)
            proj, hidden = apply(model.extract_text_features, ids, mask)
            out.text_embeds = np.asarray(hidden)
            out.text_embeds_proj = np.asarray(proj)
        else:
            ids, mask = _tokens(samples, tokenizer, L)

            def _mm(m, image, ids, mask):
                embeds = m.encode_image(image)
                fused, _ = m.fuse_reference(embeds, ids, mask)
                return fused  # [B, Q, hidden] (blip2_qformer.py:444-460)

            out.multimodal_embeds = np.asarray(apply(_mm, image, ids, mask))
        return out

    if isinstance(model, (AlbefRetrieval, BlipRetrieval)):
        # reference {albef,blip}_feature_extractor.py: unimodal towers
        # (PER-TOKEN projections, e.g. [B, 197, 256] — the reference
        # normalizes the whole sequence) + fusion encoder for multimodal
        ids = mask = None
        if mode in ("text", "multimodal"):
            ids, mask = _tokens(samples, tokenizer, L)
        if mode == "image":
            def _img(m, image):
                embeds = m.visual_encoder(image).astype(jnp.float32)
                from sprc_tpu.ops.layers import l2_normalize

                return embeds, l2_normalize(m.vision_proj(embeds))

            embeds, proj = apply(_img, jnp.asarray(samples["image"]))
            out.image_embeds = np.asarray(embeds)
            out.image_embeds_proj = np.asarray(proj)
        elif mode == "text":
            def _txt(m, ids, mask):
                embeds = m.text_encoder(
                    input_ids=ids, attention_mask=mask, mode="text")
                from sprc_tpu.ops.layers import l2_normalize

                return embeds, l2_normalize(m.text_proj(embeds))

            embeds, proj = apply(_txt, ids, mask)
            out.text_embeds = np.asarray(embeds)
            out.text_embeds_proj = np.asarray(proj)
        else:
            image = jnp.asarray(samples["image"])
            if isinstance(model, AlbefRetrieval):
                def _mm(m, image, ids, mask):
                    image_embeds = m.visual_encoder(image).astype(jnp.float32)
                    text_embeds = m.text_encoder(
                        input_ids=ids, attention_mask=mask, mode="text")
                    return m.text_encoder(
                        inputs_embeds=text_embeds, attention_mask=mask,
                        image_embeds=image_embeds, mode="fusion")
            else:
                # the BLIP fusion branch was trained on [ENC]-prefixed ids
                # (reference blip_feature_extractor.py:170)
                if "input_ids" not in samples and tokenizer is not None:
                    tok = tokenizer(list(samples["text_input"]),
                                    max_length=L, enc_token=True)
                    ids = jnp.asarray(tok["input_ids"])
                    mask = jnp.asarray(tok["attention_mask"])
                elif tokenizer is not None:
                    enc_id = tokenizer.vocab.get("[ENC]")
                    if enc_id is not None:
                        ids = ids.at[:, 0].set(enc_id)

                def _mm(m, image, ids, mask):
                    image_embeds = m.visual_encoder(image).astype(jnp.float32)
                    return m.text_encoder(
                        input_ids=ids, attention_mask=mask,
                        image_embeds=image_embeds, mode="multimodal")
            out.multimodal_embeds = np.asarray(apply(_mm, image, ids, mask))
        return out

    if isinstance(model, BlipCirBase):
        # the SPRC CIR base (registered as blip_feature_extractor): CLS
        # image projection + prompt-conditioned text feature (blip1.py)
        if mode == "image":
            out.image_embeds_proj = np.asarray(apply(
                model.extract_target_features, jnp.asarray(samples["image"])))
        elif mode == "text":
            ids, mask = _tokens(samples, tokenizer, L)
            prompts = jnp.asarray(samples.get(
                "prompts",
                np.zeros((ids.shape[0], model.cfg.num_prompts,
                          model.cfg.text_config().hidden_size), np.float32)))
            out.text_embeds_proj = np.asarray(apply(
                model.extract_cir_txt_feats, ids, mask, prompts))
        else:
            raise ValueError(
                "blip_cir_base has no multimodal mode (prompt-conditioned "
                "CIR features only; reference blip_cir.py)")
        return out

    if isinstance(model, Clip):
        # reference clip extract_features: projected tower features only
        if mode in ("image", "multimodal"):
            out.image_embeds_proj = np.asarray(apply(
                model.encode_image, jnp.asarray(samples["image"])))
        if mode in ("text", "multimodal"):
            if "eot_positions" in samples:
                ids = jnp.asarray(samples["input_ids"])
                eot = jnp.asarray(samples["eot_positions"])
            else:
                ids, mask = _tokens(samples, tokenizer, L)
                eot = mask.sum(axis=1).astype(jnp.int32) - 1
            out.text_embeds_proj = np.asarray(apply(model.encode_text, ids, eot))
        return out

    raise TypeError(
        f"extract_features: unsupported model type {type(model).__name__} "
        "(supported: blip2/blip2_feature_extractor, albef_feature_extractor, "
        "blip_retrieval, blip_feature_extractor/blip_cir_base, clip)")
