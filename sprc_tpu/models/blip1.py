"""BLIP-1 CIR feature extractor (registry: ``blip_cir_base``,
``blip_feature_extractor``).

TPU-native re-implementation of ``BlipCirBase``
(reference: src/lavis/models/blip_models/blip_cir_base.py:20-141): a BLIP-1
ViT-B/16 (final-LayerNorm timm ViT) plus a med-BERT text encoder used in
*text mode with learned prompt embeds prepended* — exactly the Q-Former's
no-image path (med.py:123-124 prepends query embeds after position add, all
positions through the single text FFN), so the text tower reuses
:class:`~sprc_tpu.models.qformer.QFormer`.

Eval contract:
- ``extract_target_features(images)`` -> normalized 256-d CLS projection.
- ``extract_cir_txt_feats(tokens, prompts)`` -> normalized 256-d feature at
  the first text position after the prompts (index = #prompts).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sprc_tpu.models.qformer import QFormer, QFormerConfig
from sprc_tpu.models.vit import ClipViT, ViTConfig, blip_vit_b_config
from sprc_tpu.ops.layers import DenseGeneral, l2_normalize
from sprc_tpu.registry import registry

import dataclasses


@dataclasses.dataclass(frozen=True)
class Blip1Config:
    image_size: int = 224
    embed_dim: int = 256
    max_txt_len: int = 40
    vocab_size: int = 30523  # bert-base-uncased + [DEC]
    num_prompts: int = 32
    vit_dtype: jnp.dtype = jnp.bfloat16
    text_dtype: jnp.dtype = jnp.float32
    vit_config_override: Optional[ViTConfig] = None
    text_config_override: Optional[QFormerConfig] = None

    def vit_config(self) -> ViTConfig:
        return self.vit_config_override or blip_vit_b_config(
            self.image_size, dtype=self.vit_dtype
        )

    def text_config(self) -> QFormerConfig:
        if self.text_config_override is not None:
            return self.text_config_override
        # med-BERT = bert-base; the CIR path never runs the image branch so
        # cross-attention / query-FFN params are never materialized
        return QFormerConfig(
            vocab_size=self.vocab_size,
            encoder_width=self.vit_config().width,
            cross_attention_freq=1,
            query_length=self.num_prompts,
            dtype=self.text_dtype,
        )


@registry.register_model("blip_cir_base", override=True)
@registry.register_model("blip_feature_extractor", override=True)
class BlipCirBase(nn.Module):
    """ViT-B CLS features + prompt-conditioned med-BERT text features."""

    cfg: Blip1Config

    def setup(self) -> None:
        cfg = self.cfg
        self.visual_encoder = ClipViT(cfg.vit_config())
        self.text_encoder = QFormer(cfg.text_config())
        vision_width = cfg.vit_config().width
        self.vision_proj = DenseGeneral(cfg.embed_dim, dtype=cfg.text_dtype)
        self.text_proj = DenseGeneral(cfg.embed_dim, dtype=cfg.text_dtype)
        self.temp = self.param(
            "temp", nn.initializers.constant(0.07), (), jnp.float32
        )

    def __call__(
        self,
        target_images: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        prompts: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """extract_cir_features (:58-88): (text_feat [B,E], image_feat [B,E])."""
        image_feat = self.extract_target_features(target_images)
        text_feat = self.extract_cir_txt_feats(input_ids, text_mask, prompts)
        return text_feat, image_feat

    def extract_target_features(self, images: jnp.ndarray) -> jnp.ndarray:
        """CLS-token projection (:113-118)."""
        embeds = self.visual_encoder(images)
        return l2_normalize(self.vision_proj(embeds[:, 0, :].astype(jnp.float32)))

    def extract_cir_txt_feats(
        self,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        prompts: jnp.ndarray,
    ) -> jnp.ndarray:
        """Prompt-conditioned text feature (:91-111): feature at the first
        text position after the ``prompts`` block."""
        B = input_ids.shape[0]
        P = prompts.shape[1]
        attn = jnp.concatenate(
            [jnp.ones((B, P), dtype=text_mask.dtype), text_mask], axis=1
        )
        hidden = self.text_encoder(
            input_ids=input_ids,
            query_embeds=prompts,
            attention_mask=attn,
        )
        return l2_normalize(self.text_proj(hidden[:, P, :]))


def blip_cir_base_params_from_torch(sd, model) -> dict:
    """Reference BlipCirBase state_dict -> param pytree.

    Maps the timm-style ViT (visual_encoder.*) and the med-BERT text encoder
    (text_encoder.*) onto the materialized tree; med's cross-attention and
    token-type weights have no counterpart in the text-mode-only forward and
    are skipped (the reference also loads strict=False).
    """
    import numpy as np

    from sprc_tpu.interop.torch_import import (
        _layernorm,
        _linear,
        _stack_blocks,
        clip_vit_params_from_torch,
    )

    vcfg = model.cfg.vit_config()
    tcfg = model.cfg.text_config()

    # ViT: timm packed qkv with bias == the ClipViT layout, but timm names
    p = "visual_encoder."
    conv_w = np.asarray(sd[f"{p}patch_embed.proj.weight"])
    trunk = {
        "cls_token": np.asarray(sd[f"{p}cls_token"]),
        "pos_embed": np.asarray(sd[f"{p}pos_embed"]),
        "patch_embed": {
            "proj": {
                "kernel": np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0)),
                "bias": np.asarray(sd[f"{p}patch_embed.proj.bias"]),
            }
        },
        "norm": _layernorm(sd, f"{p}norm"),
    }
    blocks = []
    for i in range(vcfg.depth):
        bp = f"{p}blocks.{i}."
        blocks.append({
            "norm1": _layernorm(sd, f"{bp}norm1"),
            "attn": {
                "qkv": _linear(sd, f"{bp}attn.qkv"),
                "proj": _linear(sd, f"{bp}attn.proj"),
            },
            "norm2": _layernorm(sd, f"{bp}norm2"),
            "mlp_fc1": _linear(sd, f"{bp}mlp.fc1"),
            "mlp_fc2": _linear(sd, f"{bp}mlp.fc2"),
        })
    if vcfg.scan_blocks:
        trunk["blocks"] = {"block": _stack_blocks(blocks)}
    else:
        for i, b in enumerate(blocks):
            trunk[f"block_{i}"] = b

    # med-BERT text encoder (text-mode subset)
    t = "text_encoder."
    text = {
        "embeddings": {
            "word_embeddings": {
                "embedding": np.asarray(sd[f"{t}embeddings.word_embeddings.weight"])
            },
            "position_embeddings": {
                "embedding": np.asarray(sd[f"{t}embeddings.position_embeddings.weight"])
            },
            "ln": _layernorm(sd, f"{t}embeddings.LayerNorm"),
        }
    }
    for i in range(tcfg.num_layers):
        lp = f"{t}encoder.layer.{i}."
        text[f"layer_{i}"] = {
            "self_attn": {
                "query": _linear(sd, f"{lp}attention.self.query"),
                "key": _linear(sd, f"{lp}attention.self.key"),
                "value": _linear(sd, f"{lp}attention.self.value"),
                "out": _linear(sd, f"{lp}attention.output.dense"),
                "ln": _layernorm(sd, f"{lp}attention.output.LayerNorm"),
            },
            "ffn_text": {
                "fc1": _linear(sd, f"{lp}intermediate.dense"),
                "fc2": _linear(sd, f"{lp}output.dense"),
                "ln": _layernorm(sd, f"{lp}output.LayerNorm"),
            },
        }

    params = {
        "visual_encoder": {"trunk": trunk},
        "text_encoder": text,
        "vision_proj": _linear(sd, "vision_proj"),
        "text_proj": _linear(sd, "text_proj"),
        "temp": np.asarray(sd["temp"]),
    }
    return params


# --------------------------------------------------------------- retrieval


@dataclasses.dataclass(frozen=True)
class BlipRetrievalConfig:
    image_size: int = 384
    embed_dim: int = 256
    max_txt_len: int = 35
    vocab_size: int = 30524  # bert-base + [DEC] + [ENC]
    queue_size: int = 57600
    momentum: float = 0.995
    alpha: float = 0.4
    temp_init: float = 0.07
    vit_dtype: jnp.dtype = jnp.bfloat16
    text_dtype: jnp.dtype = jnp.float32
    vit_config_override: Optional[ViTConfig] = None
    text_config_override: Optional[QFormerConfig] = None

    def vit_config(self) -> ViTConfig:
        return self.vit_config_override or blip_vit_b_config(
            self.image_size, dtype=self.vit_dtype
        )

    def text_config(self) -> QFormerConfig:
        return self.text_config_override or QFormerConfig(
            vocab_size=self.vocab_size,
            encoder_width=self.vit_config().width,
            dtype=self.text_dtype,
        )


@registry.register_model("blip_retrieval", override=True)
class BlipRetrieval(nn.Module):
    """BLIP-1 retrieval (reference blip_models/blip_retrieval.py:47-330):
    ALBEF-style momentum-distilled queue ITC + hard-negative ITM, but with
    cross-attention on EVERY med layer (med.py:406-420 BLIP branch) and the
    ITM pass re-encoding the text with an [ENC]-prefixed input (:221-233).

    Momentum/queue state is functional — reuse
    :func:`sprc_tpu.models.albef.init_albef_state` /
    :func:`~sprc_tpu.models.albef.momentum_update` /
    :func:`~sprc_tpu.models.albef.enqueue` and
    :func:`blip_retrieval_train_step`.
    """

    cfg: BlipRetrievalConfig

    MOMENTUM_KEYS = ("visual_encoder", "text_encoder", "vision_proj", "text_proj")

    def setup(self) -> None:
        from sprc_tpu.models.albef import MedEncoder

        cfg = self.cfg
        tcfg = cfg.text_config()
        self.visual_encoder = ClipViT(cfg.vit_config())
        # BLIP med: cross on all layers; 'text' mode spans all layers
        self.text_encoder = MedEncoder(tcfg, fusion_layer=tcfg.num_layers, cross_from=0)
        self.vision_proj = DenseGeneral(cfg.embed_dim, dtype=cfg.text_dtype)
        self.text_proj = DenseGeneral(cfg.embed_dim, dtype=cfg.text_dtype)
        self.itm_head = DenseGeneral(2, dtype=cfg.text_dtype)
        self.temp = self.param(
            "temp", nn.initializers.constant(cfg.temp_init), (), jnp.float32
        )

    def unimodal(self, images, input_ids, text_mask, *, deterministic=True):
        import jax

        image_embeds = self.visual_encoder(images).astype(jnp.float32)
        image_feat = l2_normalize(self.vision_proj(image_embeds[:, 0, :]))
        text_embeds = self.text_encoder(
            input_ids=input_ids, attention_mask=text_mask, mode="text",
            deterministic=deterministic,
        )
        text_feat = l2_normalize(self.text_proj(text_embeds[:, 0, :]))
        return image_embeds, image_feat, text_embeds, text_feat

    def itm_logits(self, enc_input_ids, text_mask, image_embeds, *, deterministic=True):
        """Multimodal pass over [ENC]-prefixed ids -> itm head on CLS."""
        hidden = self.text_encoder(
            input_ids=enc_input_ids, attention_mask=text_mask,
            image_embeds=image_embeds, mode="multimodal",
            deterministic=deterministic,
        )
        return self.itm_head(hidden[:, 0, :])

    def __call__(
        self,
        images,
        input_ids,
        text_mask,
        enc_input_ids,
        image_ids,
        image_feat_m,
        text_feat_m,
        image_queue,
        text_queue,
        idx_queue,
        alpha,
        *,
        deterministic: bool = True,
    ):
        import jax

        bs = images.shape[0]
        temp = jnp.clip(self.temp, 0.001, 0.5)
        image_embeds, image_feat, _, text_feat = self.unimodal(
            images, input_ids, text_mask, deterministic=deterministic
        )

        idx = image_ids.reshape(-1, 1)
        idx_all = jnp.concatenate([image_ids, idx_queue])
        pos_idx = (idx == idx_all[None, :]).astype(jnp.float32)
        sim_targets = pos_idx / pos_idx.sum(axis=1, keepdims=True)

        image_feat_all = jnp.concatenate([image_feat_m.T, image_queue], axis=1)
        text_feat_all = jnp.concatenate([text_feat_m.T, text_queue], axis=1)
        sim_i2t = image_feat @ text_feat_all / temp
        sim_t2i = text_feat @ image_feat_all / temp
        sim_i2t_m = jax.lax.stop_gradient(image_feat_m @ text_feat_all / temp)
        sim_t2i_m = jax.lax.stop_gradient(text_feat_m @ image_feat_all / temp)
        i2t_t = alpha * jax.nn.softmax(sim_i2t_m, -1) + (1 - alpha) * sim_targets
        t2i_t = alpha * jax.nn.softmax(sim_t2i_m, -1) + (1 - alpha) * sim_targets
        loss_itc = 0.5 * (
            -jnp.mean(jnp.sum(jax.nn.log_softmax(sim_i2t, -1) * i2t_t, axis=1))
            - jnp.mean(jnp.sum(jax.nn.log_softmax(sim_t2i, -1) * t2i_t, axis=1))
        )

        # local hard negatives (negative_all_rank=False path, :290-311)
        same = idx == image_ids[None, :]
        w_i2t = jnp.where(same, 0.0, jax.nn.softmax(sim_i2t[:, :bs] + 1e-4, axis=1))
        w_t2i = jnp.where(same, 0.0, jax.nn.softmax(sim_t2i[:, :bs] + 1e-4, axis=1))
        if self.has_rng("sample"):
            r1, r2 = jax.random.split(self.make_rng("sample"))
            neg_img = jax.random.categorical(r1, jnp.log(w_t2i + 1e-9), axis=1)
            neg_txt = jax.random.categorical(r2, jnp.log(w_i2t + 1e-9), axis=1)
        else:
            neg_img = jnp.argmax(w_t2i, axis=1)
            neg_txt = jnp.argmax(w_i2t, axis=1)

        ids_all = jnp.concatenate(
            [enc_input_ids, enc_input_ids, enc_input_ids[neg_txt]], axis=0
        )
        mask_all = jnp.concatenate([text_mask, text_mask, text_mask[neg_txt]], axis=0)
        images_all = jnp.concatenate(
            [image_embeds, image_embeds[neg_img], image_embeds], axis=0
        )
        logits = self.itm_logits(
            ids_all, mask_all, images_all, deterministic=deterministic
        )
        labels = jnp.concatenate(
            [jnp.ones((bs,), jnp.int32), jnp.zeros((2 * bs,), jnp.int32)]
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        loss_itm = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
        return {"loss_itc": loss_itc, "loss_itm": loss_itm}


def blip_retrieval_train_step(model, params, state, batch, *, alpha, rng):
    """Pure BLIP-retrieval forward (mirrors albef_train_step)."""
    import jax

    from sprc_tpu.models.albef import enqueue, momentum_update

    state = momentum_update(params, state, model.cfg.momentum)
    params_m_full = {**params, **state["params_m"]}
    _, image_feat_m, _, text_feat_m = model.apply(
        {"params": params_m_full},
        batch["images"], batch["input_ids"], batch["text_mask"],
        method=model.unimodal,
    )
    image_feat_m = jax.lax.stop_gradient(image_feat_m)
    text_feat_m = jax.lax.stop_gradient(text_feat_m)
    losses = model.apply(
        {"params": params},
        batch["images"], batch["input_ids"], batch["text_mask"],
        batch["enc_input_ids"], batch["image_ids"],
        image_feat_m, text_feat_m,
        state["image_queue"], state["text_queue"], state["idx_queue"],
        jnp.asarray(alpha, jnp.float32),
        rngs={"sample": rng},
    )
    state = enqueue(state, image_feat_m, text_feat_m, batch["image_ids"])
    return losses, state


@registry.register_model("blip_image_text_matching", override=True)
class BlipITM(BlipRetrieval):
    """BLIP-1 ITM/ITC scorer (reference blip_models/blip_image_text_matching.py):
    ``itm`` = multimodal med pass -> itm_head CLS logits; ``itc`` = cosine of
    unimodal projections / temp."""

    def itm(self, images, enc_input_ids, text_mask):
        image_embeds = self.visual_encoder(images).astype(jnp.float32)
        return self.itm_logits(enc_input_ids, text_mask, image_embeds)

    def itc(self, images, input_ids, text_mask):
        _, image_feat, _, text_feat = self.unimodal(images, input_ids, text_mask)
        return jnp.sum(image_feat * text_feat, axis=-1) / jnp.clip(self.temp, 0.001, 0.5)

    def itm_gradcam(self, images, enc_input_ids, text_mask, probe, block_num):
        """ITM 'match' logit sum + the cross-attn probs at ``block_num``,
        with a zero-valued ``probe`` added to the probs so callers can take
        grads w.r.t. them (GradCAM; reference compute_gradcam :151-199)."""
        image_embeds = self.visual_encoder(images).astype(jnp.float32)
        hidden, probs = self.text_encoder(
            input_ids=enc_input_ids, attention_mask=text_mask,
            image_embeds=image_embeds, mode="multimodal",
            gradcam_layer=block_num, gradcam_probe=probe,
        )
        logits = self.itm_head(hidden[:, 0, :])
        return jnp.sum(logits[:, 1]), probs

    def itm_embeds(self, enc_input_ids, text_mask, image_embeds):
        """ITM match probability for precomputed image embeds (the
        Img2Prompt caption filter, img2prompt_vqa.py:103-128 itm_rank)."""
        logits = self.itm_logits(enc_input_ids, text_mask, image_embeds)
        return jax.nn.softmax(logits, axis=-1)[:, 1]


@dataclasses.dataclass(frozen=True)
class BlipCaptionConfig:
    image_size: int = 384
    max_txt_len: int = 40
    vocab_size: int = 30524
    prompt_length: int = 4  # tokens of "a picture of " minus the final [SEP]
    vit_dtype: jnp.dtype = jnp.bfloat16
    text_dtype: jnp.dtype = jnp.float32
    vit_config_override: Optional[ViTConfig] = None
    text_config_override: Optional[QFormerConfig] = None

    def vit_config(self) -> ViTConfig:
        return self.vit_config_override or blip_vit_b_config(
            self.image_size, dtype=self.vit_dtype
        )

    def text_config(self) -> QFormerConfig:
        return self.text_config_override or QFormerConfig(
            vocab_size=self.vocab_size,
            encoder_width=self.vit_config().width,
            dtype=self.text_dtype,
        )


@registry.register_model("blip_caption", override=True)
class BlipCaption(nn.Module):
    """BLIP-1 captioner (reference blip_models/blip_caption.py:40-135):
    ViT-B + med decoder (causal, cross-attention to the image on every
    layer) + BERT LM head; next-token CE with label smoothing 0.1, pads and
    the prompt prefix masked (:68-73, med.py:1246)."""

    cfg: BlipCaptionConfig

    def setup(self) -> None:
        from sprc_tpu.models.albef import MedEncoder
        from sprc_tpu.models.lm import QFormerLMHead

        cfg = self.cfg
        tcfg = cfg.text_config()
        self.visual_encoder = ClipViT(cfg.vit_config())
        self.text_decoder = MedEncoder(tcfg, fusion_layer=tcfg.num_layers, cross_from=0)
        self.lm_head = QFormerLMHead(tcfg)

    def decode_logits(self, input_ids, text_mask, image_embeds, *, deterministic=True):
        hidden = self.text_decoder(
            input_ids=input_ids, attention_mask=text_mask,
            image_embeds=image_embeds, mode="multimodal", is_decoder=True,
            deterministic=deterministic,
        )
        return self.lm_head(hidden)

    def __call__(
        self,
        images: jnp.ndarray,
        input_ids: jnp.ndarray,  # bos-prefixed caption ids (:67)
        text_mask: jnp.ndarray,
        *,
        pad_token_id: int = 0,
        deterministic: bool = True,
    ):
        import jax

        cfg = self.cfg
        image_embeds = self.visual_encoder(images).astype(jnp.float32)
        logits = self.decode_logits(
            input_ids, text_mask, image_embeds, deterministic=deterministic
        )
        labels = jnp.where(input_ids == pad_token_id, -100, input_ids)
        pos = jnp.arange(input_ids.shape[1])[None, :]
        labels = jnp.where(pos < cfg.prompt_length, -100, labels)

        shifted_logits = logits[:, :-1, :]
        shifted_labels = labels[:, 1:]
        valid = shifted_labels != -100
        logp = jax.nn.log_softmax(shifted_logits.astype(jnp.float32), axis=-1)
        safe = jnp.where(valid, shifted_labels, 0)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        smooth = -logp.mean(axis=-1)
        per_tok = 0.9 * nll + 0.1 * smooth  # med.py:1246 label smoothing
        loss = (per_tok * valid).sum() / jnp.maximum(valid.sum(), 1)
        return {"loss": loss, "loss_lm": loss}

    def generate_ids(
        self,
        params,
        images: jnp.ndarray,
        prompt_ids: jnp.ndarray,
        *,
        eos_token_id: int,
        pad_token_id: int = 0,
        max_new_tokens: int = 30,
    ) -> jnp.ndarray:
        """Greedy caption decode from the prompt prefix (:175-220 greedy)."""
        import jax
        import numpy as np

        B, L = prompt_ids.shape

        def _logits(mdl, images, ids, mask):
            image_embeds = mdl.visual_encoder(images).astype(jnp.float32)
            return mdl.decode_logits(ids, mask, image_embeds)

        logits_fn = jax.jit(
            lambda ids, mask: self.apply(
                {"params": params}, images, ids, mask, method=_logits
            )
        )
        total = L + max_new_tokens
        ids = np.full((B, total), pad_token_id, np.int32)
        ids[:, :L] = np.asarray(prompt_ids)
        mask = np.zeros((B, total), np.int32)
        mask[:, :L] = 1
        lengths = np.full((B,), L, np.int64)
        finished = np.zeros((B,), bool)
        for _ in range(max_new_tokens):
            logits = np.asarray(logits_fn(jnp.asarray(ids), jnp.asarray(mask)))
            rows = np.arange(B)
            nxt = logits[rows, lengths - 1].argmax(-1).astype(np.int32)
            nxt = np.where(finished, pad_token_id, nxt)
            ids[rows, lengths] = nxt
            mask[rows, lengths] = (~finished).astype(np.int32)
            lengths = lengths + (~finished).astype(np.int64)
            finished |= nxt == eos_token_id
            if finished.all():
                break
        out = np.full((B, max_new_tokens), pad_token_id, np.int32)
        for b in range(B):
            gen = ids[b, L : lengths[b]]
            out[b, : len(gen)] = gen
        return jnp.asarray(out)


@registry.register_model("blip_pretrain", override=True)
class BlipPretrain(BlipRetrieval):
    """BLIP-1 pretraining (reference blip_models/blip_pretrain.py:114-345):
    the retrieval losses (momentum-queue ITC with PLAIN diagonal targets,
    :226-234, + hard-negative ITM) plus a captioning LM loss from a med
    DECODER cross-attending the image (:317-333).

    Diagonal-target note: the reference fills the diagonal directly; here the
    idx-based multi-positive targets of :class:`BlipRetrieval` reduce to that
    exact diagonal as long as callers pass GLOBALLY UNIQUE ``image_ids``
    (e.g. ``step * B + arange(B)``) so no queue entry ever matches —
    :func:`blip_pretrain_train_step` documents the contract.
    """

    def setup(self) -> None:
        from sprc_tpu.models.albef import MedEncoder
        from sprc_tpu.models.lm import QFormerLMHead

        super().setup()
        tcfg = self.cfg.text_config()
        self.text_decoder = MedEncoder(tcfg, fusion_layer=tcfg.num_layers, cross_from=0)
        self.lm_head = QFormerLMHead(tcfg)

    def lm_loss(
        self,
        images,
        dec_input_ids,
        text_mask,
        *,
        pad_token_id: int = 0,
        deterministic: bool = True,
    ):
        """Smoothed next-token CE over bos-prefixed captions (:317-333)."""
        import jax

        image_embeds = self.visual_encoder(images).astype(jnp.float32)
        hidden = self.text_decoder(
            input_ids=dec_input_ids, attention_mask=text_mask,
            image_embeds=image_embeds, mode="multimodal", is_decoder=True,
            deterministic=deterministic,
        )
        logits = self.lm_head(hidden)
        labels = jnp.where(dec_input_ids == pad_token_id, -100, dec_input_ids)
        shifted_logits = logits[:, :-1, :].astype(jnp.float32)
        shifted_labels = labels[:, 1:]
        valid = shifted_labels != -100
        logp = jax.nn.log_softmax(shifted_logits, axis=-1)
        safe = jnp.where(valid, shifted_labels, 0)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        smooth = -logp.mean(axis=-1)
        per_tok = 0.9 * nll + 0.1 * smooth  # med.py:1246 label smoothing
        return (per_tok * valid).sum() / jnp.maximum(valid.sum(), 1)

    def __call__(
        self,
        images,
        input_ids,
        text_mask,
        enc_input_ids,
        dec_input_ids,
        image_ids,
        image_feat_m,
        text_feat_m,
        image_queue,
        text_queue,
        idx_queue,
        alpha,
        *,
        pad_token_id: int = 0,
        deterministic: bool = True,
    ):
        losses = super().__call__(
            images, input_ids, text_mask, enc_input_ids, image_ids,
            image_feat_m, text_feat_m, image_queue, text_queue, idx_queue,
            alpha, deterministic=deterministic,
        )
        # the duplicate ViT pass CSEs away under jit (same fn of same inputs)
        losses["loss_lm"] = self.lm_loss(
            images, dec_input_ids, text_mask,
            pad_token_id=pad_token_id, deterministic=deterministic,
        )
        losses["loss"] = losses["loss_itc"] + losses["loss_itm"] + losses["loss_lm"]
        return losses


def blip_pretrain_train_step(model, params, state, batch, *, alpha, rng):
    """Pure BLIP-pretrain forward. ``batch['image_ids']`` MUST be globally
    unique across steps (never re-enqueued), so ITC targets stay diagonal."""
    import jax

    from sprc_tpu.models.albef import enqueue, momentum_update

    state = momentum_update(params, state, model.cfg.momentum)
    params_m_full = {**params, **state["params_m"]}
    _, image_feat_m, _, text_feat_m = model.apply(
        {"params": params_m_full},
        batch["images"], batch["input_ids"], batch["text_mask"],
        method=model.unimodal,
    )
    image_feat_m = jax.lax.stop_gradient(image_feat_m)
    text_feat_m = jax.lax.stop_gradient(text_feat_m)
    losses = model.apply(
        {"params": params},
        batch["images"], batch["input_ids"], batch["text_mask"],
        batch["enc_input_ids"], batch["dec_input_ids"], batch["image_ids"],
        image_feat_m, text_feat_m,
        state["image_queue"], state["text_queue"], state["idx_queue"],
        jnp.asarray(alpha, jnp.float32),
        rngs={"sample": rng},
    )
    state = enqueue(state, image_feat_m, text_feat_m, batch["image_ids"])
    return losses, state
