"""Stage-1 BLIP-2 pretraining model (registry: ``blip2``).

TPU-native re-implementation of ``Blip2Qformer``
(reference: src/lavis/models/blip2_models/blip2_qformer.py:95-315): the
model the SPRC CIR family initializes from. Losses:

- **ITC** (:129-172): token-max image<->text similarity both directions,
  cross-entropy with label smoothing 0.1 over in-batch targets. The
  reference all-gathers features across GPUs with rank-offset labels
  (:130-157); under ``pjit`` the batch axis IS the global batch, so the
  plain diagonal formulation reproduces those semantics and XLA inserts the
  collectives.
- **ITM** (:177-247): in-batch hard negatives (diagonal masked), joint
  queries+text pass over [pos, neg-image, neg-text], itm_head mean over
  query outputs. The differentiable all-gather (``all_gather_with_grad``,
  :178) again dissolves into the partitioner.
- **LM** (:249-268): caption the image — decoder-mode pass where text
  attends causally with the image-queries prefix; next-token CE with label
  smoothing 0.1, pads ignored. The reference reuses the query pass through
  the KV cache; the joint UniLM-masked pass computes identical states (the
  query prefix is self-contained under the mask).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from sprc_tpu.models.cir_base import Blip2CirBase
from sprc_tpu.models.cir_variants import _HardNegMixin
from sprc_tpu.models.lm import QFormerLMHead
from sprc_tpu.ops.layers import l2_normalize
from sprc_tpu.registry import registry


def _smoothed_ce(logits: jnp.ndarray, targets: jnp.ndarray, smoothing: float = 0.1) -> jnp.ndarray:
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    smooth = -logp.mean(axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


@registry.register_model("blip2")
@registry.register_model("blip2_feature_extractor")
class Blip2Stage1(Blip2CirBase, _HardNegMixin):
    """ITC + ITM + LM stage-1 pretraining."""

    def setup(self) -> None:
        super().setup()
        self.lm_head = QFormerLMHead(self.cfg.qformer_config())

    def __call__(
        self,
        images: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        *,
        bos_token_id: int = 30522,
        pad_token_id: int = 0,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        bs = input_ids.shape[0]
        Q = self.cfg.num_query_token

        image_embeds = self.encode_image(images)
        image_hidden = self.embed_image_queries(image_embeds, deterministic=deterministic)
        image_feats = l2_normalize(self.vision_proj(image_hidden))  # [B, Q, E]

        text_hidden = self.qformer(
            input_ids=input_ids, attention_mask=text_mask, deterministic=deterministic
        )
        text_feat = l2_normalize(self.text_proj(text_hidden[:, 0, :]))  # [B, E]

        # ---- ITC (token-max, both directions, smoothed CE) ----
        sim_q2t = jnp.einsum(
            "bqe,te->btq", image_feats.astype(jnp.float32), text_feat.astype(jnp.float32)
        )
        sim_i2t = sim_q2t.max(axis=-1) / self.temp  # [B_img, B_txt]
        sim_t2i = sim_q2t.max(axis=-1).T / self.temp
        targets = jnp.arange(bs)
        loss_itc = 0.5 * (
            _smoothed_ce(sim_i2t, targets) + _smoothed_ce(sim_t2i, targets)
        )

        # ---- ITM with in-batch hard negatives ----
        neg_img, neg_txt = self._neg_indices(sim_t2i, self._maybe_rng())
        ids_all = jnp.concatenate([input_ids, input_ids, input_ids[neg_txt]], axis=0)
        mask_all = jnp.concatenate([text_mask, text_mask, text_mask[neg_txt]], axis=0)
        images_all = jnp.concatenate(
            [image_embeds, image_embeds[neg_img], image_embeds], axis=0
        )
        queries = jnp.broadcast_to(
            self.query_tokens, (3 * bs, Q, self.query_tokens.shape[2])
        )
        attn_all = jnp.concatenate(
            [jnp.ones((3 * bs, Q), dtype=mask_all.dtype), mask_all], axis=1
        )
        itm_hidden = self.qformer(
            input_ids=ids_all,
            query_embeds=queries,
            attention_mask=attn_all,
            image_embeds=images_all,
            deterministic=deterministic,
        )
        logits = self.itm_head(itm_hidden[:, :Q, :]).mean(axis=1)
        itm_labels = jnp.concatenate(
            [jnp.ones((bs,), jnp.int32), jnp.zeros((2 * bs,), jnp.int32)]
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        loss_itm = -jnp.mean(jnp.take_along_axis(logp, itm_labels[:, None], axis=-1))

        # ---- LM (caption) ----
        decoder_ids = input_ids.at[:, 0].set(bos_token_id)
        q_batch = jnp.broadcast_to(self.query_tokens, (bs, Q, self.query_tokens.shape[2]))
        attn = jnp.concatenate(
            [jnp.ones((bs, Q), dtype=text_mask.dtype), text_mask], axis=1
        )
        dec_hidden = self.qformer(
            input_ids=decoder_ids,
            query_embeds=q_batch,
            attention_mask=attn,
            image_embeds=image_embeds,
            is_decoder=True,
            deterministic=deterministic,
        )
        lm_logits = self.lm_head(dec_hidden[:, Q:, :])  # [B, L, V]
        labels = jnp.where(decoder_ids == pad_token_id, -100, decoder_ids)
        shifted_logits = lm_logits[:, :-1, :]
        shifted_labels = labels[:, 1:]
        valid = shifted_labels != -100
        logp = jax.nn.log_softmax(shifted_logits.astype(jnp.float32), axis=-1)
        safe_labels = jnp.where(valid, shifted_labels, 0)
        nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
        smooth = -logp.mean(axis=-1)
        per_tok = 0.9 * nll + 0.1 * smooth
        loss_lm = (per_tok * valid).sum() / jnp.maximum(valid.sum(), 1)

        return {"loss_itc": loss_itc, "loss_itm": loss_itm, "loss_lm": loss_lm}

    # feature-extractor API (reference extract_features, used by the
    # "blip2_feature_extractor" registry alias)
    def extract_image_features(self, images: jnp.ndarray):
        frozen = self.encode_image(images)
        hidden = self.embed_image_queries(frozen)
        return l2_normalize(self.vision_proj(hidden)), hidden

    def extract_text_features(self, input_ids: jnp.ndarray, text_mask: jnp.ndarray):
        hidden = self.qformer(input_ids=input_ids, attention_mask=text_mask)
        return l2_normalize(self.text_proj(hidden[:, 0, :])), hidden


@registry.register_model("blip2_image_text_matching", override=True)
class Blip2ITM(Blip2Stage1):
    """Image-text matching scorer (reference blip2_image_text_matching.py):
    ``itm`` returns the 2-class matching logits via the joint pass;
    ``itc`` the token-max cosine similarity."""

    def itm(self, images: jnp.ndarray, input_ids: jnp.ndarray, text_mask: jnp.ndarray):
        image_embeds = self.encode_image(images)
        return self.compute_itm(image_embeds, input_ids, text_mask)

    def itc(self, images: jnp.ndarray, input_ids: jnp.ndarray, text_mask: jnp.ndarray):
        feats, _ = self.extract_image_features(images)
        tfeat, _ = self.extract_text_features(input_ids, text_mask)
        sims = jnp.einsum(
            "bqe,be->bq", feats.astype(jnp.float32), tfeat.astype(jnp.float32)
        )
        return sims.max(axis=-1)
