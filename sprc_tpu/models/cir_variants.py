"""The CIR ablation-variant model zoo.

TPU-native implementations of the reference's sibling models (SURVEY.md
§2.2; reference src/lavis/models/blip2_models/blip2_qformer_cir_*.py).
Every variant shares the :class:`~sprc_tpu.models.cir_base.Blip2CirBase`
skeleton; only losses / heads differ:

==========================  =====================================================
registry name               losses / mechanism (reference file)
==========================  =====================================================
blip2_cir_cat               itc only (blip2_qformer_cir_cat.py:95-167)
blip2_cir_rel               itc + rtc via PLAIN text pass (…cir_rel.py:169-187)
blip2_cir_z_learn_pos_align itc + rtc + align vs prompt OUTPUTS at positions
                            1..Q+1 (…cir_z_learn_pos_align.py:191-199)
blip2_cir_neg               itc + hard-negative ITM with fused queries
                            prepended (…cir_neg.py:168-246)
blip2_cir_neg_rel           neg + relative-token chain rtc (…cir_neg_rel.py:250-286)
blip2_cir_full              align_prompt + the neg ITM (…cir_full.py:170-278)
blip2_cir_rerank            dedicated ITM reranker with frozen Fformer twin
                            (…cir_rerank.py:85-260)
blip2_cir_cls               itc + 5-way prompt-to-prompt classification with a
                            second temperature (…cir_cls.py:85-231)
blip2_cir_slt               top-k query-token selection by cross-attn weight
                            (…cir_slt.py:110-174; forward returns sim_i2t)
blip2_cir_prompt            feature extractor: forward returns fused queries
                            (blip2_qformer_prompt.py:89-125)
==========================  =====================================================

Hard-negative sampling uses ``jax.random.categorical`` (the reference's
``torch.multinomial`` over softmaxed off-diagonal similarities); pass an
``rngs={'sample': key}`` collection, or deterministic argmax sampling is
used as a fallback so eval paths stay rng-free.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sprc_tpu.models.cir_base import Blip2CirBase, cross_entropy_diagonal
from sprc_tpu.ops.layers import l2_normalize
from sprc_tpu.registry import registry

NEG_DIAG = -10000.0


def _cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


class _HardNegMixin:
    """In-batch hard-negative selection (…cir_neg.py:172-198)."""

    def _neg_indices(
        self, sim_i2t: jnp.ndarray, rng: Optional[jax.Array]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        bs = sim_i2t.shape[0]
        sim = jax.lax.stop_gradient(sim_i2t.astype(jnp.float32))
        diag = jnp.eye(bs, dtype=jnp.float32) * (NEG_DIAG - 0.0)
        sim_masked = sim + diag  # fill_diagonal_(-10000)
        if rng is not None:
            r1, r2 = jax.random.split(rng)
            neg_target = jax.random.categorical(r1, sim_masked, axis=1)
            neg_ref = jax.random.categorical(r2, sim_masked.T, axis=1)
        else:
            neg_target = jnp.argmax(sim_masked, axis=1)
            neg_ref = jnp.argmax(sim_masked.T, axis=1)
        return neg_target, neg_ref

    def _maybe_rng(self) -> Optional[jax.Array]:
        if self.has_rng("sample"):
            return self.make_rng("sample")
        return None


class _FusionItcBase(Blip2CirBase):
    """Shared prologue: fusion feats + target feats + in-batch ITC."""

    def _itc(self, reference_images, target_images, input_ids, text_mask, deterministic):
        ref_embeds = self.encode_image(reference_images)
        fused_queries, fusion_feats = self.fuse_reference(
            ref_embeds, input_ids, text_mask, deterministic=deterministic
        )
        tgt_embeds = self.encode_image(target_images)
        target_feats = self.target_features(tgt_embeds, deterministic=deterministic)
        sim_i2t = self.token_max_sim(fusion_feats, target_feats) / self.temp
        loss_itc = cross_entropy_diagonal(sim_i2t)
        return dict(
            ref_embeds=ref_embeds,
            tgt_embeds=tgt_embeds,
            fused_queries=fused_queries,
            fusion_feats=fusion_feats,
            target_feats=target_feats,
            sim_i2t=sim_i2t,
            loss_itc=loss_itc,
        )

    def _itm_fused(
        self,
        ctx: dict,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        rng: Optional[jax.Array],
        *,
        deterministic: bool,
    ) -> jnp.ndarray:
        """Hard-negative ITM with fused queries prepended to the query tokens
        (…cir_neg.py:168-246 == …cir_full.py:170-248)."""
        bs = input_ids.shape[0]
        Q = self.cfg.num_query_token
        fusion_d = jax.lax.stop_gradient(ctx["fused_queries"])
        target_d = jax.lax.stop_gradient(ctx["tgt_embeds"])
        neg_target, neg_ref = self._neg_indices(ctx["sim_i2t"], rng)

        ids_all = jnp.concatenate([input_ids, input_ids, input_ids[neg_ref]], axis=0)
        mask_all = jnp.concatenate([text_mask, text_mask, text_mask[neg_ref]], axis=0)
        query_fusion = jnp.concatenate(
            [ctx["fused_queries"], ctx["fused_queries"], fusion_d[neg_ref]], axis=0
        )
        queries = jnp.broadcast_to(
            self.query_tokens, (3 * bs, Q, self.query_tokens.shape[2])
        )
        query_embeds = jnp.concatenate([query_fusion, queries], axis=1)  # [3B, 2Q, H]
        attn_mask = jnp.concatenate(
            [jnp.ones((3 * bs, 2 * Q), dtype=mask_all.dtype), mask_all], axis=1
        )
        targets_all = jnp.concatenate(
            [ctx["tgt_embeds"], target_d[neg_target], ctx["tgt_embeds"]], axis=0
        )
        hidden = self.qformer(
            input_ids=ids_all,
            query_embeds=query_embeds,
            attention_mask=attn_mask,
            image_embeds=targets_all,
            deterministic=deterministic,
        )
        logits = self.itm_head(hidden[:, :Q, :]).mean(axis=1)
        labels = jnp.concatenate(
            [jnp.ones((bs,), jnp.int32), jnp.zeros((2 * bs,), jnp.int32)]
        )
        return _cross_entropy(logits, labels)


@registry.register_model("blip2_cir_cat", override=True)
class CirCat(_FusionItcBase):
    """Two-pass fusion, ITC only (blip2_qformer_cir_cat.py)."""

    # candidate representation its inference_rerank consumes: the index's
    # projected target feats [N,Q,E] (…cir_cat.py:337-396), vs the ITM
    # reranker's frozen embeds — serving picks the gather by this tag
    RERANK_INPUT = "feats"

    def __call__(self, reference_images, target_images, input_ids, text_mask,
                 *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        ctx = self._itc(reference_images, target_images, input_ids, text_mask, deterministic)
        return {"loss_itc": ctx["loss_itc"]}

    def extract_target_features(self, images, *, target_only=False, ref_only=False):
        """(…cir_cat.py:401-427): optionally only one of the two outputs."""
        frozen = self.encode_image(images)
        if ref_only:
            return frozen
        feats = self.target_features(frozen)
        if target_only:
            return feats
        return feats, frozen

    def inference(self, reference_embeds, target_feats, input_ids, text_mask):
        _, fusion_feats = self.fuse_reference(reference_embeds, input_ids, text_mask)
        return self.token_max_sim(fusion_feats, target_feats)

    def inference_rerank(self, reference_embeds, target_feats, input_ids, text_mask):
        """Feature-space rerank (…cir_cat.py:337-396): re-fuse each query
        against its candidates' frozen embeds, score against proj feats.

        reference_embeds: [B*K, S, D] (already repeated per candidate),
        target_feats: [B*K, Q, E]. Returns [B*K] scores.
        """
        _, fusion_feats = self.fuse_reference(reference_embeds, input_ids, text_mask)
        sims = jnp.einsum(
            "bqe,be->bq",
            target_feats.astype(jnp.float32),
            fusion_feats.astype(jnp.float32),
        )
        return sims.max(axis=-1)


@registry.register_model("blip2_cir_rel", override=True)
class CirRel(_FusionItcBase):
    """ITC + rtc via a PLAIN text-only pass — no learned prompt tokens
    (blip2_qformer_cir_rel.py:169-187)."""

    def __call__(self, reference_images, target_images, input_ids, text_mask,
                 *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        ctx = self._itc(reference_images, target_images, input_ids, text_mask, deterministic)
        text_feat = self.encode_text_cls(input_ids, text_mask, deterministic=deterministic)
        sim_r2t = self.token_max_sim(text_feat, ctx["target_feats"]) / self.temp
        return {
            "loss_itc": ctx["loss_itc"],
            "loss_rtc": cross_entropy_diagonal(sim_r2t),
        }


class _PromptedBase(_FusionItcBase):
    """Base for variants with learned prompt tokens (align_prompt family)."""

    def setup(self) -> None:
        super().setup()
        qcfg = self.cfg.qformer_config()
        self.prompt_tokens = self.param(
            "prompt_tokens",
            nn.initializers.normal(qcfg.initializer_range),
            (1, self.cfg.num_query_token, qcfg.hidden_size),
            jnp.float32,
        )

    def _prompt_pass(self, input_ids, text_mask, deterministic):
        """prompt_tokens + text, no_img -> (hidden, normalized CLS feature)."""
        B = input_ids.shape[0]
        Q = self.cfg.num_query_token
        prompt = jnp.broadcast_to(self.prompt_tokens, (B, Q, self.prompt_tokens.shape[2]))
        attn_mask = jnp.concatenate(
            [jnp.ones((B, Q), dtype=text_mask.dtype), text_mask], axis=1
        )
        hidden = self.qformer(
            input_ids=input_ids,
            query_embeds=prompt,
            attention_mask=attn_mask,
            no_img=True,
            deterministic=deterministic,
        )
        feat = l2_normalize(self.text_proj(hidden[:, 0, :]))
        return hidden, feat, prompt


@registry.register_model("blip2_cir_z_learn_pos_align", override=True)
class CirZLearnPosAlign(_PromptedBase):
    """align target = prompt-token OUTPUTS at positions 1..Q+1 of the no_img
    pass (…cir_z_learn_pos_align.py:191-199)."""

    def __call__(self, reference_images, target_images, input_ids, text_mask,
                 *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        Q = self.cfg.num_query_token
        ctx = self._itc(reference_images, target_images, input_ids, text_mask, deterministic)
        hidden, feat, _ = self._prompt_pass(input_ids, text_mask, deterministic)
        sim_r2t = self.token_max_sim(feat, ctx["target_feats"]) / self.temp
        loss_align = jnp.mean(
            jnp.square(
                ctx["fused_queries"].astype(jnp.float32).mean(axis=1)
                - jax.lax.stop_gradient(
                    hidden[:, 1 : Q + 1, :].astype(jnp.float32).mean(axis=1)
                )
            )
        )
        return {
            "loss_itc": ctx["loss_itc"],
            "loss_rtc": cross_entropy_diagonal(sim_r2t),
            "loss_align": loss_align,
        }


@registry.register_model("blip2_cir_neg", override=True)
class CirNeg(_FusionItcBase, _HardNegMixin):
    """ITC + fused-query hard-negative ITM (blip2_qformer_cir_neg.py)."""

    def __call__(self, reference_images, target_images, input_ids, text_mask,
                 *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        ctx = self._itc(reference_images, target_images, input_ids, text_mask, deterministic)
        loss_itm = self._itm_fused(
            ctx, input_ids, text_mask, self._maybe_rng(), deterministic=deterministic
        )
        return {"loss_itc": ctx["loss_itc"], "loss_itm": loss_itm}


@registry.register_model("blip2_cir_neg_rel", override=True)
class CirNegRel(_FusionItcBase, _HardNegMixin):
    """neg + relative-token chain rtc (blip2_qformer_cir_neg_rel.py:250-286):
    learned rel_tokens pass through the reference image, the outputs pass
    through the target image, scored against the plain text feature."""

    def setup(self) -> None:
        super().setup()
        qcfg = self.cfg.qformer_config()
        self.rel_tokens = self.param(
            "rel_tokens",
            nn.initializers.normal(qcfg.initializer_range),
            (1, self.cfg.num_query_token, qcfg.hidden_size),
            jnp.float32,
        )

    def __call__(self, reference_images, target_images, input_ids, text_mask,
                 *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        ctx = self._itc(reference_images, target_images, input_ids, text_mask, deterministic)
        loss_itm = self._itm_fused(
            ctx, input_ids, text_mask, self._maybe_rng(), deterministic=deterministic
        )

        B = input_ids.shape[0]
        Q = self.cfg.num_query_token
        rel = jnp.broadcast_to(self.rel_tokens, (B, Q, self.rel_tokens.shape[2]))
        img_hidden = self.qformer(
            query_embeds=rel, image_embeds=ctx["ref_embeds"], deterministic=deterministic
        )
        rel_hidden = self.qformer(
            query_embeds=img_hidden, image_embeds=ctx["tgt_embeds"],
            deterministic=deterministic,
        )
        rel_feats = l2_normalize(self.vision_proj(rel_hidden))
        text_feat = self.encode_text_cls(input_ids, text_mask, deterministic=deterministic)
        sim_r2t = self.token_max_sim(text_feat, rel_feats) / self.temp
        return {
            "loss_itc": ctx["loss_itc"],
            "loss_itm": loss_itm,
            "loss_rtc": cross_entropy_diagonal(sim_r2t),
        }


@registry.register_model("blip2_cir_full", override=True)
class CirFull(_PromptedBase, _HardNegMixin):
    """align_prompt + the fused-query hard-negative ITM
    (blip2_qformer_cir_full.py:95-278)."""

    def __call__(self, reference_images, target_images, input_ids, text_mask,
                 *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        ctx = self._itc(reference_images, target_images, input_ids, text_mask, deterministic)
        loss_itm = self._itm_fused(
            ctx, input_ids, text_mask, self._maybe_rng(), deterministic=deterministic
        )
        hidden, feat, prompt = self._prompt_pass(input_ids, text_mask, deterministic)
        sim_r2t = self.token_max_sim(feat, ctx["target_feats"]) / self.temp
        loss_align = jnp.mean(
            jnp.square(
                ctx["fused_queries"].astype(jnp.float32).mean(axis=1)
                - jax.lax.stop_gradient(prompt.astype(jnp.float32).mean(axis=1))
            )
        )
        return {
            "loss_itc": ctx["loss_itc"],
            "loss_rtc": cross_entropy_diagonal(sim_r2t),
            "loss_itm": loss_itm,
            "loss_align": loss_align,
        }

@registry.register_model("blip2_cir_rerank", override=True)
class CirRerank(_FusionItcBase, _HardNegMixin):
    """Dedicated ITM reranker (blip2_qformer_cir_rerank.py).

    A frozen twin ("Fformer" — same architecture, periodically synced copy of
    the trainable Q-Former, :85-136) scores retrieval similarity to mine hard
    negatives; the trainable Q-Former learns ITM over the concatenated
    [reference, target] frozen-embedding memory (:240-259).

    TPU-native twist: the frozen twin is represented as a second parameter
    subtree ``fformer`` (+ ``query_tokens_f``/projection twins) excluded from
    the optimizer; ``sync_fformer(params)`` returns a pytree with the twin
    refreshed (the reference's ``_update_f_former``).
    """

    FROZEN_PREFIXES = ("visual_encoder", "fformer", "query_tokens_f",
                       "vision_proj_f", "text_proj_f")

    def setup(self) -> None:
        super().setup()
        from sprc_tpu.models.qformer import QFormer
        from sprc_tpu.ops.layers import DenseGeneral

        qcfg = self.cfg.qformer_config()
        self.fformer = QFormer(qcfg)
        self.query_tokens_f = self.param(
            "query_tokens_f",
            nn.initializers.normal(qcfg.initializer_range),
            (1, self.cfg.num_query_token, qcfg.hidden_size),
            jnp.float32,
        )
        self.vision_proj_f = DenseGeneral(self.cfg.embed_dim, dtype=qcfg.dtype)
        self.text_proj_f = DenseGeneral(self.cfg.embed_dim, dtype=qcfg.dtype)

    @staticmethod
    def sync_fformer(params: dict) -> dict:
        """Copy the trainable tower into the frozen twin
        (reference _update_f_former, …cir_rerank.py:122-136)."""
        import jax

        new = dict(params)
        new["fformer"] = jax.tree.map(lambda x: x, params["qformer"])
        new["query_tokens_f"] = params["query_tokens"]
        # the contrastive projections are only present if the trainable tower
        # was initialized with them (flax materializes used modules only)
        for src, dst in (("vision_proj", "vision_proj_f"), ("text_proj", "text_proj_f")):
            if src in params:
                new[dst] = jax.tree.map(lambda x: x, params[src])
        return new

    def __call__(self, reference_images, target_images, input_ids, text_mask,
                 *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        bs = input_ids.shape[0]
        Q = self.cfg.num_query_token
        ref_embeds = self.encode_image(reference_images)
        tgt_embeds = self.encode_image(target_images)

        # frozen-twin retrieval scores for negative mining (:151-185)
        qf = jnp.broadcast_to(
            jax.lax.stop_gradient(self.query_tokens_f),
            (bs, Q, self.query_tokens_f.shape[2]),
        )
        tgt_hidden_f = self.fformer(
            query_embeds=qf, image_embeds=tgt_embeds, deterministic=True
        )
        target_feats_f = l2_normalize(self.vision_proj_f(tgt_hidden_f))
        text_hidden_f = self.fformer(
            input_ids=input_ids, attention_mask=text_mask, deterministic=True
        )
        text_feat_f = l2_normalize(self.text_proj_f(text_hidden_f[:, 0, :]))
        sim_i2t = jax.lax.stop_gradient(
            self.token_max_sim(text_feat_f, target_feats_f) / self.temp
        )

        neg_target, neg_ref = self._neg_indices(sim_i2t, self._maybe_rng())

        ids_all = jnp.concatenate([input_ids, input_ids, input_ids[neg_ref]], axis=0)
        mask_all = jnp.concatenate([text_mask, text_mask, text_mask[neg_ref]], axis=0)
        reference_all = jnp.concatenate(
            [ref_embeds, ref_embeds, ref_embeds[neg_ref]], axis=0
        )
        targets_all = jnp.concatenate(
            [tgt_embeds, tgt_embeds[neg_target], tgt_embeds], axis=0
        )
        queries = jnp.broadcast_to(
            self.query_tokens, (3 * bs, Q, self.query_tokens.shape[2])
        )
        attn_mask = jnp.concatenate(
            [jnp.ones((3 * bs, Q), dtype=mask_all.dtype), mask_all], axis=1
        )
        hidden = self.qformer(
            input_ids=ids_all,
            query_embeds=queries,
            attention_mask=attn_mask,
            image_embeds=jnp.concatenate([reference_all, targets_all], axis=1),
            deterministic=deterministic,
        )
        logits = self.itm_head(hidden[:, :Q, :]).mean(axis=1)
        labels = jnp.concatenate(
            [jnp.ones((bs,), jnp.int32), jnp.zeros((2 * bs,), jnp.int32)]
        )
        return {"loss_itm": _cross_entropy(logits, labels)}

    def extract_target_features(self, images):
        frozen = self.encode_image(images)
        B = frozen.shape[0]
        Q = self.cfg.num_query_token
        qf = jnp.broadcast_to(self.query_tokens_f, (B, Q, self.query_tokens_f.shape[2]))
        hidden = self.fformer(query_embeds=qf, image_embeds=frozen, deterministic=True)
        return l2_normalize(self.vision_proj_f(hidden)), frozen

    def inference(self, reference_embeds, target_feats, input_ids, text_mask):
        """Stage-1 scoring with the frozen twin text tower (:360-397)."""
        hidden = self.fformer(
            input_ids=input_ids, attention_mask=text_mask, deterministic=True
        )
        text_feat = l2_normalize(self.text_proj_f(hidden[:, 0, :]))
        return self.token_max_sim(text_feat, target_feats)

    RERANK_INPUT = "frozen"

    def inference_rerank(self, reference_embeds, target_embeds, input_ids, text_mask):
        """ITM rerank over [reference, candidate] memory (:399-445).

        reference_embeds/target_embeds: [N, S, D] (queries already repeated
        per candidate). Returns [N] softmax-positive scores.
        """
        N = reference_embeds.shape[0]
        Q = self.cfg.num_query_token
        queries = jnp.broadcast_to(self.query_tokens, (N, Q, self.query_tokens.shape[2]))
        attn_mask = jnp.concatenate(
            [jnp.ones((N, Q), dtype=text_mask.dtype), text_mask], axis=1
        )
        hidden = self.qformer(
            input_ids=input_ids,
            query_embeds=queries,
            attention_mask=attn_mask,
            image_embeds=jnp.concatenate([reference_embeds, target_embeds], axis=1),
            deterministic=True,
        )
        logits = self.itm_head(hidden[:, :Q, :]).mean(axis=1)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, -1]


@registry.register_model("blip2_cir_cls", override=True)
class CirCls(_FusionItcBase, _HardNegMixin):
    """ITC + 5-way prompt-to-prompt classification with a second temperature
    (blip2_qformer_cir_cls.py:85-231)."""

    NUM_CANDIDATES = 5

    def setup(self) -> None:
        super().setup()
        self.temp2 = self.param("temp2", nn.initializers.constant(0.07), (), jnp.float32)

    def __call__(self, reference_images, target_images, input_ids, text_mask,
                 *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        bs = input_ids.shape[0]
        Q = self.cfg.num_query_token
        K = self.NUM_CANDIDATES
        ctx = self._itc(reference_images, target_images, input_ids, text_mask, deterministic)

        # text-only similarity to pick 4 hard negative captions (:160-186)
        text_feat = jax.lax.stop_gradient(
            self.encode_text_cls(input_ids, text_mask, deterministic=True)
        )
        sim_t2t = text_feat @ text_feat.T + jnp.eye(bs) * NEG_DIAG
        rng = self._maybe_rng()
        if rng is not None:
            keys = jax.random.split(rng, bs + 1)
            neg = jnp.stack(
                [
                    jax.random.choice(
                        keys[b], bs, (K - 1,), replace=False,
                        p=jax.nn.softmax(sim_t2t[b]),
                    )
                    for b in range(bs)
                ]
            )
            perm_key = keys[-1]
        else:
            neg = jnp.argsort(-sim_t2t, axis=1)[:, : K - 1]
            perm_key = None
        cand = jnp.concatenate([neg, jnp.arange(bs)[:, None]], axis=1)  # [B, K]
        if perm_key is not None:
            perm = jax.random.permutation(perm_key, K)
            cand = cand[:, perm]
        label_index = jnp.argmax(
            (cand == jnp.arange(bs)[:, None]).astype(jnp.int32), axis=1
        )

        # fuse every candidate caption with the reference image (:202-218)
        flat = cand.reshape(-1)
        ids_neg = input_ids[flat]
        mask_neg = text_mask[flat]
        ref_rep = jnp.repeat(ctx["ref_embeds"], K, axis=0)
        queries = jnp.broadcast_to(
            self.query_tokens, (bs * K, Q, self.query_tokens.shape[2])
        )
        attn_mask = jnp.concatenate(
            [jnp.ones((bs * K, Q), dtype=mask_neg.dtype), mask_neg], axis=1
        )
        neg_hidden = jax.lax.stop_gradient(
            self.qformer(
                input_ids=ids_neg,
                query_embeds=queries,
                attention_mask=attn_mask,
                image_embeds=ref_rep,
                deterministic=True,
            )
        )
        neg_mean = neg_hidden[:, :Q, :].mean(axis=1).reshape(bs, K, -1)
        fusion_mean = l2_normalize(ctx["fused_queries"].mean(axis=1))
        sim_p2p = jnp.einsum(
            "bkh,bh->bk", l2_normalize(neg_mean), fusion_mean
        ) / self.temp2
        loss_p2p = _cross_entropy(sim_p2p, label_index)
        return {"loss_itc": ctx["loss_itc"], "loss_p2p": loss_p2p}


@registry.register_model("blip2_cir_slt", override=True)
class CirSlt(Blip2CirBase):
    """Select the top-``num_prompt`` query tokens by the CLS-position
    self-attention weight onto the queries, fuse only those
    (blip2_qformer_cir_slt.py:110-174). Forward returns raw ``sim_i2t``."""

    NUM_PROMPT = 4

    def __call__(self, reference_images, target_images, input_ids, text_mask,
                 *, deterministic: bool = True) -> jnp.ndarray:
        B = input_ids.shape[0]
        Q = self.cfg.num_query_token
        P = self.NUM_PROMPT
        ref_embeds = self.encode_image(reference_images)
        queries = self._queries(B)
        attn_mask = jnp.concatenate(
            [jnp.ones((B, Q), dtype=text_mask.dtype), text_mask], axis=1
        )
        fusion_hidden, probs = self.qformer(
            input_ids=input_ids,
            query_embeds=queries,
            attention_mask=attn_mask,
            image_embeds=ref_embeds,
            deterministic=deterministic,
            output_attentions=True,
        )
        # probs: [B, H, S, S]; weight of position Q (CLS) onto the queries
        weights = probs[:, :, Q, :Q].mean(axis=1)  # [B, Q]
        _, top_idx = jax.lax.top_k(weights, P)
        selected = jnp.take_along_axis(
            fusion_hidden[:, :Q, :], top_idx[:, :, None], axis=1
        )  # [B, P, H]

        slt_mask = jnp.concatenate(
            [jnp.ones((B, P), dtype=text_mask.dtype), text_mask], axis=1
        )
        text_hidden = self.qformer(
            input_ids=input_ids,
            query_embeds=selected,
            attention_mask=slt_mask,
            deterministic=deterministic,
        )
        fusion_feats = l2_normalize(self.text_proj(text_hidden[:, P, :]))

        tgt_embeds = self.encode_image(target_images)
        target_feats = self.target_features(tgt_embeds, deterministic=deterministic)
        return self.token_max_sim(fusion_feats, target_feats) / self.temp


@registry.register_model("blip2_cir_prompt", override=True)
class CirPrompt(Blip2CirBase):
    """Feature extractor: forward returns the fused query outputs
    (blip2_qformer_prompt.py:89-125); ``inference`` scores fused queries
    against gallery features."""

    def __call__(self, reference_images, target_images, input_ids, text_mask,
                 *, deterministic: bool = True) -> jnp.ndarray:
        ref_embeds = self.encode_image(reference_images)
        B = input_ids.shape[0]
        Q = self.cfg.num_query_token
        queries = self._queries(B)
        attn_mask = jnp.concatenate(
            [jnp.ones((B, Q), dtype=text_mask.dtype), text_mask], axis=1
        )
        hidden = self.qformer(
            input_ids=input_ids,
            query_embeds=queries,
            attention_mask=attn_mask,
            image_embeds=ref_embeds,
            deterministic=deterministic,
        )
        return hidden[:, :Q, :]

    def inference(self, reference_embeds, target_feats, input_ids, text_mask):
        B = input_ids.shape[0]
        Q = self.cfg.num_query_token
        queries = self._queries(B)
        attn_mask = jnp.concatenate(
            [jnp.ones((B, Q), dtype=text_mask.dtype), text_mask], axis=1
        )
        hidden = self.qformer(
            input_ids=input_ids,
            query_embeds=queries,
            attention_mask=attn_mask,
            image_embeds=reference_embeds,
            deterministic=True,
        )
        fused = l2_normalize(self.text_proj(hidden[:, :Q, :].mean(axis=1)))
        return self.token_max_sim(fused, target_feats)
