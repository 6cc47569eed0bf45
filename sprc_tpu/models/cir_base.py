"""Shared trunk for the BLIP-2 CIR model family.

Every CIR variant in the reference shares one skeleton (reference:
src/lavis/models/blip2_models/blip2_qformer_cir_align_prompt.py:44-92):
frozen ViT -> fp32 ``ln_vision`` -> Q-Former (32 learned queries, cross-attn
every 2 layers) -> 256-d vision/text projections, an ITM head and a learned
temperature (init 0.07). :class:`Blip2CirBase` implements that skeleton plus
the encode paths shared by train and eval; variants subclass it and add
their losses/inference heads.

Text enters as token arrays (``input_ids`` + ``attention_mask``) — host-side
WordPiece tokenization lives in :mod:`sprc_tpu.text`, keeping everything here
jit-compatible with static shapes.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sprc_tpu.models.qformer import QFormer, QFormerConfig
from sprc_tpu.models.vit import (
    ClipViT,
    EvaViT,
    ViTConfig,
    clip_vit_l_config,
    eva_vit_g_config,
)
from sprc_tpu.ops.layers import DenseGeneral, LayerNormFP32, l2_normalize


@dataclasses.dataclass(frozen=True)
class CirConfig:
    """Configuration for BLIP-2 CIR models (mirrors blip2_pretrain.yaml knobs)."""

    vit_model: str = "eva_clip_g"  # or "clip_L"
    image_size: int = 224
    num_query_token: int = 32
    cross_attention_freq: int = 2
    embed_dim: int = 256
    max_txt_len: int = 32
    freeze_vit: bool = True
    vocab_size: int = 30523
    # dtype policy: bf16 towers / fp32 LayerNorms on TPU; fp32 everywhere on CPU
    vit_dtype: Any = jnp.bfloat16
    qformer_dtype: Any = jnp.float32
    vit_remat: bool = False
    qformer_remat: bool = False  # activation-checkpoint the Q-Former layers
    # "int8": frozen-tower int8 MXU path (see ViTConfig.quant); serving only
    vit_quant: Optional[str] = None
    # test-size overrides (None = full size)
    vit_config_override: Optional[ViTConfig] = None
    qformer_config_override: Optional[QFormerConfig] = None

    def vit_config(self) -> ViTConfig:
        if self.vit_config_override is not None:
            cfg = self.vit_config_override
        elif self.vit_model == "eva_clip_g":
            cfg = eva_vit_g_config(self.image_size, dtype=self.vit_dtype, remat=self.vit_remat)
        elif self.vit_model == "clip_L":
            cfg = clip_vit_l_config(self.image_size, dtype=self.vit_dtype, remat=self.vit_remat)
        else:
            raise ValueError(f"unknown vit_model {self.vit_model!r}")
        if self.vit_quant:
            cfg = dataclasses.replace(cfg, quant=self.vit_quant)
        return cfg

    def qformer_config(self) -> QFormerConfig:
        if self.qformer_config_override is not None:
            return self.qformer_config_override
        return QFormerConfig(
            vocab_size=self.vocab_size,
            encoder_width=self.vit_config().width,
            cross_attention_freq=self.cross_attention_freq,
            query_length=self.num_query_token,
            dtype=self.qformer_dtype,
            remat=self.qformer_remat,
        )


class Blip2CirBase(nn.Module):
    """Frozen ViT + ln_vision + Q-Former + projection heads."""

    cfg: CirConfig

    def setup(self) -> None:
        cfg = self.cfg
        vcfg = cfg.vit_config()
        qcfg = cfg.qformer_config()
        self._vit_cfg = vcfg
        self._q_cfg = qcfg

        if cfg.vit_model == "eva_clip_g":
            self.visual_encoder = EvaViT(vcfg)
        elif cfg.vit_model == "clip_L":
            self.visual_encoder = ClipViT(vcfg)
        else:  # custom tiny config for tests: pick by qkv style
            self.visual_encoder = (
                EvaViT(vcfg) if vcfg.qkv_fused_no_kbias else ClipViT(vcfg)
            )
        # fp32 LayerNorm bridging the (b)f16 tower into the Q-Former
        # (reference blip2.py:81,193-199; torch default eps 1e-5)
        self.ln_vision = LayerNormFP32(epsilon=1e-5)

        self.qformer = QFormer(qcfg)
        self.query_tokens = self.param(
            "query_tokens",
            nn.initializers.normal(qcfg.initializer_range),
            (1, cfg.num_query_token, qcfg.hidden_size),
            jnp.float32,
        )
        self.vision_proj = DenseGeneral(cfg.embed_dim, dtype=qcfg.dtype)
        self.text_proj = DenseGeneral(cfg.embed_dim, dtype=qcfg.dtype)
        self.itm_head = DenseGeneral(2, dtype=qcfg.dtype)
        # learned temperature, used as a direct divisor (not exp), init 0.07
        # (reference blip2_qformer_cir_align_prompt.py:85)
        self.temp = self.param("temp", nn.initializers.constant(0.07), (), jnp.float32)

    # ---------------------------------------------------------------- towers

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        """images [B, H, W, 3] -> frozen embeddings [B, S, D] in float32.

        Matches ``ln_vision(visual_encoder(image)).float()``
        (reference …cir_align_prompt.py:102,367-368). The ViT runs in its
        configured (bf16) dtype; ln_vision computes in fp32 and we keep fp32.

        Rank dispatch (static at trace time): a rank-3 input is taken to be
        precomputed ``encode_tower`` features [B, S, D] and only runs
        ``embed_cached`` — this is what lets every CIR variant train from
        the frozen-feature cache through its unmodified ``__call__``.
        """
        if images.ndim == 3:
            return self.embed_cached(images)
        return self.embed_cached(self.encode_tower(images))

    def encode_image_pair(
        self, reference: jnp.ndarray, target: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Encode reference+target, optionally in ONE tower call.

        Every op on the image path (patchify, blocks, ln_vision) is
        batch-pointwise, so concatenating along batch computes the same
        function as two separate :meth:`encode_image` calls. The single
        2B-row megakernel chain was hypothesized to halve dispatch/
        pipeline-ramp overhead at the live train step's small micro-batch,
        but measured on chip it is a wash — 237.3 vs 237.9 imgs/s at
        b64×accum2 (MEASUREMENTS.md r4): at b64 the grid is already deep
        enough (8 groups × 23 blocks) and XLA pipelines the two calls.
        Default therefore stays the two-call form, which is also bitwise
        equal to :meth:`encode_image` per input on every backend
        (XLA:CPU's dot reduction order shifts with batch shape — observed
        ≤1 fp32 ulp at 2B — so the concat form trades that equality for
        nothing). ``SPRC_PAIR_ENCODE=1`` opts in to the concat form.
        The reference encodes the pair separately
        (…cir_align_prompt.py:102-110).
        """
        if os.environ.get("SPRC_PAIR_ENCODE", "0") != "1":
            return self.encode_image(reference), self.encode_image(target)
        B = reference.shape[0]
        both = self.encode_image(
            jnp.concatenate([reference, target], axis=0))
        return both[:B], both[B:]

    def forward_cached(
        self,
        reference_tower: jnp.ndarray,
        target_tower: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
    ):
        """Training forward from CACHED frozen-tower features (generic).

        ``*_tower`` are ``encode_tower`` outputs ([B, S, D], pre-ln_vision).
        Numerically identical to ``__call__`` on the corresponding images —
        the reference recipe's frozen eval-mode ViT + deterministic targetpad
        transform (blip_fine_tune_2.py:251) make tower outputs epoch-
        invariant, so one precompute pass replaces both tower forwards in
        every step (train/feature_cache.py). Works for every variant because
        image encoding funnels through the rank-dispatched ``encode_image``.
        """
        return self(
            reference_tower, target_tower, input_ids, text_mask,
            deterministic=deterministic,
        )

    def encode_tower(self, images: jnp.ndarray) -> jnp.ndarray:
        """Raw frozen-tower features [B, S, D] (PRE-ln_vision, tower dtype).

        This is the cacheable tensor for frozen-ViT training: the reference
        recipe's train transform is deterministic (targetpad, no random aug
        — blip_fine_tune_2.py:251) and the frozen tower runs in eval mode
        (LAVIS ``disabled_train``), so the output per image is identical
        every epoch. ``ln_vision`` is TRAINABLE (only ``visual_encoder`` is
        frozen, …align_prompt.py:64-69), so the cache boundary must sit
        before it — apply :meth:`embed_cached` to cached features at step
        time.
        """
        return self.visual_encoder(images)

    def embed_cached(self, tower_feats: jnp.ndarray) -> jnp.ndarray:
        """Cached/live tower features -> fp32 ln_vision embeddings."""
        if self.cfg.freeze_vit:
            tower_feats = jax.lax.stop_gradient(tower_feats)
        return self.ln_vision(tower_feats.astype(jnp.float32))

    # ------------------------------------------------------------ QFormer passes

    def _queries(self, batch: int) -> jnp.ndarray:
        return jnp.broadcast_to(
            self.query_tokens,
            (batch, self.query_tokens.shape[1], self.query_tokens.shape[2]),
        )

    def embed_image_queries(
        self, image_embeds: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        """Query-only Q-Former pass over image embeds -> [B, Q, hidden]."""
        q = self._queries(image_embeds.shape[0])
        return self.qformer(
            query_embeds=q, image_embeds=image_embeds, deterministic=deterministic
        )

    def target_features(
        self, image_embeds: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        """L2-normalized 256-d per-query target features [B, Q, 256]."""
        hidden = self.embed_image_queries(image_embeds, deterministic=deterministic)
        return l2_normalize(self.vision_proj(hidden))

    def fuse_reference(
        self,
        image_embeds: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """The SPRC two-pass fusion (…cir_align_prompt.py:119-139).

        Pass 1: queries + text cross-attend into the reference image.
        Pass 2: the fused query outputs are re-fed as query embeds together
        with the text (no image); the hidden at the first text position (CLS,
        index Q) projects to the 256-d "sentence-level prompt" feature.

        Returns ``(fused_queries [B, Q, hidden], fusion_feats [B, 256])``.
        """
        B = image_embeds.shape[0]
        Q = self.cfg.num_query_token
        q = self._queries(B)
        attn_mask = jnp.concatenate(
            [jnp.ones((B, Q), dtype=text_mask.dtype), text_mask], axis=1
        )
        fusion_hidden = self.qformer(
            input_ids=input_ids,
            query_embeds=q,
            attention_mask=attn_mask,
            image_embeds=image_embeds,
            deterministic=deterministic,
        )
        fused_queries = fusion_hidden[:, :Q, :]
        text_hidden = self.qformer(
            input_ids=input_ids,
            query_embeds=fused_queries,
            attention_mask=attn_mask,
            deterministic=deterministic,
        )
        fusion_feats = l2_normalize(self.text_proj(text_hidden[:, Q, :]))
        return fused_queries, fusion_feats

    def encode_text_cls(
        self, input_ids: jnp.ndarray, text_mask: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        """Plain BERT text pass -> normalized 256-d CLS feature."""
        hidden = self.qformer(
            input_ids=input_ids, attention_mask=text_mask, deterministic=deterministic
        )
        return l2_normalize(self.text_proj(hidden[:, 0, :]))

    # ----------------------------------------------------- default eval contract

    def extract_target_features(self, images: jnp.ndarray):
        """Gallery encode: [B,H,W,3] -> (proj feats [B,Q,E], frozen [B,S,D])
        (reference …cir_align_prompt.py:364-386; shared by the variants)."""
        frozen = self.encode_image(images)
        return self.target_features(frozen), frozen

    def inference(
        self,
        reference_embeds: jnp.ndarray,
        target_feats: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        """Composed-query scoring -> [B, N] raw max-sims (:312-361)."""
        _, fusion_feats = self.fuse_reference(reference_embeds, input_ids, text_mask)
        return self.token_max_sim(fusion_feats, target_feats)

    def fusion_feature(
        self,
        reference_embeds: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        """Just the 256-d composed-query feature (sharded gallery scoring)."""
        _, fusion_feats = self.fuse_reference(reference_embeds, input_ids, text_mask)
        return fusion_feats

    def compute_itm(
        self,
        image_embeds: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        """ITM score: queries+text cross-attend the image, itm_head logits
        averaged over query positions, positive-class logit
        (reference …cir_align_prompt.py:289-309). -> [B]."""
        B = input_ids.shape[0]
        Q = self.cfg.num_query_token
        q = self._queries(B)
        attn_mask = jnp.concatenate(
            [jnp.ones((B, Q), dtype=text_mask.dtype), text_mask], axis=1
        )
        hidden = self.qformer(
            input_ids=input_ids,
            query_embeds=q,
            attention_mask=attn_mask,
            image_embeds=image_embeds,
            deterministic=True,
        )
        logits = self.itm_head(hidden[:, :Q, :])
        return logits[:, :, 1].mean(axis=1)

    # ------------------------------------------------------------------ scoring

    @staticmethod
    def token_max_sim(feats: jnp.ndarray, target_feats: jnp.ndarray) -> jnp.ndarray:
        """max over target query tokens of <feat, token>: [B,256]x[N,Q,256]->[B,N].

        The token-wise max-sim ITC of BLIP-2 stage 1
        (…cir_align_prompt.py:158-162, :353-358).
        """
        sims = jnp.einsum(
            "bd,nqd->bnq",
            feats.astype(jnp.float32),
            target_feats.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return sims.max(axis=-1)


def cross_entropy_diagonal(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean CE with targets = diagonal (in-batch contrastive labels)."""
    labels = jnp.arange(logits.shape[0])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
