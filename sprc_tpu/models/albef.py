"""ALBEF retrieval (registry: ``albef_retrieval``, ``albef_feature_extractor``).

TPU-native re-implementation of ``AlbefRetrieval``
(reference: src/lavis/models/albef_models/albef_retrieval.py:26-306):
ViT-B + a med-BERT whose first ``fusion_layer`` layers are text-only and
whose remaining layers cross-attend the image over ALL positions
(med.py:540-565). Losses: momentum-distilled queue ITC (soft targets mixing
the momentum model's softmax with multi-positive id targets, ramped by
``alpha``) and hard-negative ITM over fusion CLS outputs.

TPU-first twist: the reference's momentum encoders, feature queues and
pointer are module buffers mutated in-place; here they are an EXPLICIT
functional state threaded through :func:`albef_train_step` — momentum
update, queue enqueue and the jitted loss all stay pure, so the whole step
jits/shards like any other.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sprc_tpu.models.qformer import (
    QFormerAttention,
    QFormerConfig,
    QFormerFFN,
    make_additive_mask,
)
from sprc_tpu.models.vit import ClipViT, ViTConfig, blip_vit_b_config
from sprc_tpu.ops.layers import DenseGeneral, LayerNormFP32, l2_normalize
from sprc_tpu.registry import registry


class MedEncoder(nn.Module):
    """ALBEF/BLIP med-BERT (med.py modes):

    - mode 'text' runs layers [0, fusion_layer) without cross-attention,
    - mode 'fusion' runs layers [fusion_layer, n) with cross-attention,
    - mode 'multimodal' runs all layers, cross-attending from
      ``cross_from`` (ALBEF: cross_from == fusion_layer; BLIP: every layer
      has cross-attention — fusion_layer = n, cross_from = 0, med.py:406-420).
    """

    config: QFormerConfig
    fusion_layer: int
    cross_from: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        image_embeds: Optional[jnp.ndarray] = None,
        image_mask: Optional[jnp.ndarray] = None,
        *,
        mode: str = "multimodal",
        is_decoder: bool = False,
        deterministic: bool = True,
        gradcam_layer: Optional[int] = None,
        gradcam_probe: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        if inputs_embeds is None:
            word = nn.Embed(
                cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
                embedding_init=nn.initializers.normal(cfg.initializer_range),
                name="word_embeddings",
            )(input_ids)
            pos = nn.Embed(
                cfg.max_position_embeddings, cfg.hidden_size, param_dtype=jnp.float32,
                embedding_init=nn.initializers.normal(cfg.initializer_range),
                name="position_embeddings",
            )(jnp.arange(input_ids.shape[1]))
            hidden = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="embeddings_ln")(
                word + pos[None]
            ).astype(cfg.dtype)
        else:
            hidden = inputs_embeds.astype(cfg.dtype)

        bias = None
        if attention_mask is not None:
            bias = make_additive_mask(attention_mask)
        # mask over cross-attended positions (padded encoder states, e.g. the
        # VQA question states; reference encoder_attention_mask)
        cross_bias = None if image_mask is None else make_additive_mask(image_mask)
        if is_decoder:
            S = hidden.shape[1]
            causal = jnp.tril(jnp.ones((S, S), jnp.float32))
            causal_bias = ((1.0 - causal) * -10000.0)[None, None]
            bias = causal_bias if bias is None else bias + causal_bias

        if mode == "text":
            start, end = 0, self.fusion_layer
        elif mode == "fusion":
            start, end = self.fusion_layer, cfg.num_layers
        else:  # multimodal
            start, end = 0, cfg.num_layers

        cross_from = self.fusion_layer if self.cross_from is None else self.cross_from
        gradcam_probs = None
        for i in range(start, end):
            hidden = QFormerAttention(cfg, name=f"layer_{i}_self")(
                hidden, hidden, bias, deterministic=deterministic
            )
            if i >= cross_from and image_embeds is not None:
                cross = QFormerAttention(cfg, is_cross=True, name=f"layer_{i}_cross")
                if gradcam_layer == i:
                    # GradCAM probe (reference blip_image_text_matching.py
                    # compute_gradcam :151-199): expose this layer's
                    # cross-attention probs and add a zero-valued offset so
                    # jax.grad w.r.t. the offset yields d loss / d probs
                    hidden, gradcam_probs = cross(
                        hidden, image_embeds.astype(cfg.dtype), cross_bias,
                        deterministic=deterministic, return_probs=True,
                        probs_offset=gradcam_probe,
                    )
                else:
                    hidden = cross(
                        hidden, image_embeds.astype(cfg.dtype), cross_bias,
                        deterministic=deterministic,
                    )
            hidden = QFormerFFN(cfg, name=f"layer_{i}_ffn")(
                hidden, deterministic=deterministic
            )
        if gradcam_layer is not None:
            return hidden, gradcam_probs
        return hidden


@dataclasses.dataclass(frozen=True)
class AlbefConfig:
    image_size: int = 384
    embed_dim: int = 256
    max_txt_len: int = 30
    vocab_size: int = 30523
    fusion_layer: int = 6
    queue_size: int = 65536
    momentum: float = 0.995
    alpha: float = 0.4
    temp_init: float = 0.07
    use_distill: bool = True
    vit_dtype: Any = jnp.bfloat16
    text_dtype: Any = jnp.float32
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


@registry.register_model("albef_retrieval", override=True)
@registry.register_model("albef_feature_extractor", override=True)
class AlbefRetrieval(nn.Module):
    cfg: AlbefConfig

    # the subtrees mirrored into the momentum copy (reference model_pairs)
    MOMENTUM_KEYS = ("visual_encoder", "text_encoder", "vision_proj", "text_proj")

    def setup(self) -> None:
        cfg = self.cfg
        self.visual_encoder = ClipViT(cfg.vit_config())
        self.text_encoder = MedEncoder(cfg.text_config(), cfg.fusion_layer)
        self.vision_proj = DenseGeneral(cfg.embed_dim, dtype=cfg.text_dtype)
        self.text_proj = DenseGeneral(cfg.embed_dim, dtype=cfg.text_dtype)
        self.itm_head = DenseGeneral(2, dtype=cfg.text_dtype)
        self.temp = self.param(
            "temp", nn.initializers.constant(cfg.temp_init), (), jnp.float32
        )

    # ------------------------------------------------------------- features

    def unimodal(self, images, input_ids, text_mask, *, deterministic=True):
        """-> (image_embeds, image_feat, text_embeds, text_feat)."""
        image_embeds = self.visual_encoder(images).astype(jnp.float32)
        image_feat = l2_normalize(self.vision_proj(image_embeds[:, 0, :]))
        text_embeds = self.text_encoder(
            input_ids=input_ids, attention_mask=text_mask, mode="text",
            deterministic=deterministic,
        )
        text_feat = l2_normalize(self.text_proj(text_embeds[:, 0, :]))
        return image_embeds, image_feat, text_embeds, text_feat

    def fusion_cls(self, text_embeds, text_mask, image_embeds, *, deterministic=True):
        out = self.text_encoder(
            inputs_embeds=text_embeds, attention_mask=text_mask,
            image_embeds=image_embeds, mode="fusion", deterministic=deterministic,
        )
        return out[:, 0, :]

    # ----------------------------------------------------------------- loss

    def __call__(
        self,
        images: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        image_ids: jnp.ndarray,
        image_feat_m: jnp.ndarray,
        text_feat_m: jnp.ndarray,
        image_queue: jnp.ndarray,  # [E, Qs]
        text_queue: jnp.ndarray,
        idx_queue: jnp.ndarray,  # [Qs]
        alpha: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        bs = images.shape[0]
        temp = jnp.clip(self.temp, 0.001, 0.5)

        image_embeds, image_feat, text_embeds, text_feat = self.unimodal(
            images, input_ids, text_mask, deterministic=deterministic
        )

        idx = image_ids.reshape(-1, 1)
        idx_all = jnp.concatenate([image_ids, idx_queue])  # [bs+Qs]
        pos_idx = (idx == idx_all[None, :]).astype(jnp.float32)
        sim_targets = pos_idx / pos_idx.sum(axis=1, keepdims=True)

        image_feat_all = jnp.concatenate([image_feat_m.T, image_queue], axis=1)
        text_feat_all = jnp.concatenate([text_feat_m.T, text_queue], axis=1)

        sim_i2t = image_feat @ text_feat_all / temp
        sim_t2i = text_feat @ image_feat_all / temp

        if cfg.use_distill:
            sim_i2t_m = jax.lax.stop_gradient(image_feat_m @ text_feat_all / temp)
            sim_t2i_m = jax.lax.stop_gradient(text_feat_m @ image_feat_all / temp)
            i2t_targets = alpha * jax.nn.softmax(sim_i2t_m, -1) + (1 - alpha) * sim_targets
            t2i_targets = alpha * jax.nn.softmax(sim_t2i_m, -1) + (1 - alpha) * sim_targets
        else:
            i2t_targets = t2i_targets = sim_targets
        loss_i2t = -jnp.mean(
            jnp.sum(jax.nn.log_softmax(sim_i2t, -1) * i2t_targets, axis=1)
        )
        loss_t2i = -jnp.mean(
            jnp.sum(jax.nn.log_softmax(sim_t2i, -1) * t2i_targets, axis=1)
        )
        loss_itc = (loss_i2t + loss_t2i) / 2

        # ---- hard-negative ITM (:218-283)
        same = idx == image_ids[None, :]
        w_i2t = jax.nn.softmax(sim_i2t[:, :bs] + 1e-4, axis=1)
        w_t2i = jax.nn.softmax(sim_t2i[:, :bs] + 1e-4, axis=1)
        w_i2t = jnp.where(same, 0.0, w_i2t)
        w_t2i = jnp.where(same, 0.0, w_t2i)
        if self.has_rng("sample"):
            r1, r2 = jax.random.split(self.make_rng("sample"))
            neg_img = jax.random.categorical(r1, jnp.log(w_t2i + 1e-9), axis=1)
            neg_txt = jax.random.categorical(r2, jnp.log(w_i2t + 1e-9), axis=1)
        else:
            neg_img = jnp.argmax(w_t2i, axis=1)
            neg_txt = jnp.argmax(w_i2t, axis=1)

        pos_cls = self.fusion_cls(
            text_embeds, text_mask, image_embeds, deterministic=deterministic
        )
        text_embeds_all = jnp.concatenate(
            [text_embeds, text_embeds[neg_txt]], axis=0
        )
        text_mask_all = jnp.concatenate([text_mask, text_mask[neg_txt]], axis=0)
        image_embeds_all = jnp.concatenate(
            [image_embeds[neg_img], image_embeds], axis=0
        )
        neg_cls = self.fusion_cls(
            text_embeds_all, text_mask_all, image_embeds_all,
            deterministic=deterministic,
        )
        logits = self.itm_head(jnp.concatenate([pos_cls, neg_cls], axis=0))
        labels = jnp.concatenate(
            [jnp.ones((bs,), jnp.int32), jnp.zeros((2 * bs,), jnp.int32)]
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        loss_itm = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

        return {"loss_itc": loss_itc, "loss_itm": loss_itm}


# ------------------------------------------------- functional momentum state


def _copy(x):
    """Fresh device buffer — ``jnp.asarray`` is a no-op on device arrays, and
    momentum copies that ALIAS the live params break train-state donation
    (the same buffer would be donated twice)."""
    return jnp.array(x, copy=True)


def init_albef_state(params, cfg: AlbefConfig, seed: int = 0) -> Dict[str, Any]:
    """Momentum params + normalized feature queues + id queue + pointer."""
    rng = np.random.RandomState(seed)
    iq = rng.randn(cfg.embed_dim, cfg.queue_size).astype(np.float32)
    tq = rng.randn(cfg.embed_dim, cfg.queue_size).astype(np.float32)
    iq /= np.linalg.norm(iq, axis=0, keepdims=True)
    tq /= np.linalg.norm(tq, axis=0, keepdims=True)
    keys = getattr(cfg, "momentum_keys", AlbefRetrieval.MOMENTUM_KEYS)
    return {
        "params_m": {k: jax.tree.map(_copy, params[k]) for k in keys},
        "image_queue": jnp.asarray(iq),
        "text_queue": jnp.asarray(tq),
        "idx_queue": jnp.full((cfg.queue_size,), -100, jnp.int32),
        "ptr": jnp.zeros((), jnp.int32),
    }


def momentum_update(params, state, momentum: float, keys=None):
    keys = keys or tuple(state["params_m"].keys())
    new_m = {
        k: jax.tree.map(
            lambda m, p: momentum * m + (1.0 - momentum) * p,
            state["params_m"][k],
            params[k],
        )
        for k in keys
    }
    return {**state, "params_m": new_m}


def enqueue(state, image_feat_m, text_feat_m, image_ids):
    """Ring-buffer enqueue (reference SharedQueueMixin._dequeue_and_enqueue)."""
    bs = image_feat_m.shape[0]
    qs = state["image_queue"].shape[1]
    ptr = state["ptr"]
    cols = (ptr + jnp.arange(bs)) % qs
    return {
        **state,
        "image_queue": state["image_queue"].at[:, cols].set(image_feat_m.T),
        "text_queue": state["text_queue"].at[:, cols].set(text_feat_m.T),
        "idx_queue": state["idx_queue"].at[cols].set(image_ids.astype(jnp.int32)),
        "ptr": (ptr + bs) % qs,
    }


def albef_train_step(model, params, state, batch, *, alpha, rng):
    """One pure ALBEF forward: momentum update -> momentum feats -> losses ->
    queue enqueue. Returns (losses, new_state). Wrap in jax.grad over a
    closure on ``params`` for training."""
    cfg = model.cfg
    state = momentum_update(params, state, cfg.momentum)
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
        batch["image_ids"], image_feat_m, text_feat_m,
        state["image_queue"], state["text_queue"], state["idx_queue"],
        jnp.asarray(alpha, jnp.float32),
        rngs={"sample": rng},
    )
    state = enqueue(state, image_feat_m, text_feat_m, batch["image_ids"])
    return losses, state


def rampup_alpha(cfg: AlbefConfig, epoch: int, iters: int, iters_per_epoch: int) -> float:
    """alpha ramp (reference :104-105)."""
    return cfg.alpha * min(1.0, (epoch * iters_per_epoch + iters) / (2 * iters_per_epoch))


@registry.register_model("albef_pretrain", override=True)
class AlbefPretrain(AlbefRetrieval):
    """ALBEF pretraining (reference albef_models/albef_pretrain.py:33-330):
    the retrieval losses (queue ITC with diagonal targets + hard-neg ITM)
    plus momentum-distilled MLM over the multimodal encoder (:282-314,
    med.py:1085-1099): CE on masked positions mixed with
    -E[logp · softmax(logits_m)] by ``alpha``.

    Masking (80% [MASK] / 10% random / 10% keep, :340-370) happens host-side
    via :func:`mlm_mask`; the diagonal-ITC contract matches
    :class:`~sprc_tpu.models.blip1.BlipPretrain` — pass globally unique
    ``image_ids``.
    """

    def setup(self) -> None:
        from sprc_tpu.models.lm import QFormerLMHead

        super().setup()
        self.mlm_head = QFormerLMHead(self.cfg.text_config())

    def mlm_logits(self, masked_ids, text_mask, image_embeds, *, deterministic=True):
        hidden = self.text_encoder(
            input_ids=masked_ids, attention_mask=text_mask,
            image_embeds=image_embeds, mode="multimodal",
            deterministic=deterministic,
        )
        return self.mlm_head(hidden)

    def mlm_loss(
        self,
        images,
        masked_ids,
        text_mask,
        mlm_labels,  # [B, L], -100 = unmasked position
        logits_m,  # momentum model's MLM logits, or None
        alpha,
        *,
        deterministic: bool = True,
    ):
        image_embeds = self.visual_encoder(images).astype(jnp.float32)
        logits = self.mlm_logits(
            masked_ids, text_mask, image_embeds, deterministic=deterministic
        ).astype(jnp.float32)
        valid = mlm_labels != -100
        denom = jnp.maximum(valid.sum(), 1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        safe = jnp.where(valid, mlm_labels, 0)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        loss = (nll * valid).sum() / denom
        if logits_m is not None:
            soft = jax.nn.softmax(jax.lax.stop_gradient(logits_m), axis=-1)
            distill = (-(logp * soft).sum(-1) * valid).sum() / denom
            loss = (1.0 - alpha) * loss + alpha * distill
        return loss

    def __call__(
        self,
        images,
        input_ids,
        text_mask,
        masked_ids,
        mlm_labels,
        image_ids,
        image_feat_m,
        text_feat_m,
        image_queue,
        text_queue,
        idx_queue,
        mlm_logits_m,
        alpha,
        *,
        deterministic: bool = True,
    ):
        losses = super().__call__(
            images, input_ids, text_mask, image_ids, image_feat_m, text_feat_m,
            image_queue, text_queue, idx_queue, alpha,
            deterministic=deterministic,
        )
        losses["loss_mlm"] = self.mlm_loss(
            images, masked_ids, text_mask, mlm_labels, mlm_logits_m, alpha,
            deterministic=deterministic,
        )
        losses["loss"] = losses["loss_itc"] + losses["loss_itm"] + losses["loss_mlm"]
        return losses


def mlm_mask(
    rng: np.random.RandomState,
    input_ids: np.ndarray,
    vocab_size: int,
    mask_token_id: int,
    *,
    pad_token_id: int = 0,
    cls_token_id: int = 2,
    probability: float = 0.15,
):
    """Host-side BERT masking (reference :340-370): select ``probability`` of
    non-special tokens; 80% -> [MASK], 10% -> random, 10% keep. Returns
    (masked_ids, labels) with -100 on unselected positions."""
    ids = np.array(input_ids, np.int32)
    special = (ids == pad_token_id) | (ids == cls_token_id)
    picked = (rng.rand(*ids.shape) < probability) & ~special
    labels = np.where(picked, ids, -100).astype(np.int32)
    r = rng.rand(*ids.shape)
    masked = np.where(picked & (r < 0.8), mask_token_id, ids)
    masked = np.where(
        picked & (r >= 0.8) & (r < 0.9),
        rng.randint(0, vocab_size, ids.shape),
        masked,
    ).astype(np.int32)
    return masked, labels


def albef_pretrain_train_step(model, params, state, batch, *, alpha, rng):
    """Pure ALBEF-pretrain forward: momentum feats + momentum MLM logits ->
    losses -> enqueue. ``batch['image_ids']`` must be globally unique."""
    cfg = model.cfg
    state = momentum_update(params, state, cfg.momentum)
    params_m_full = {**params, **state["params_m"]}
    image_embeds_m, image_feat_m, _, text_feat_m = model.apply(
        {"params": params_m_full},
        batch["images"], batch["input_ids"], batch["text_mask"],
        method=model.unimodal,
    )
    mlm_logits_m = model.apply(
        {"params": params_m_full},
        batch["masked_ids"], batch["text_mask"], image_embeds_m,
        method=model.mlm_logits,
    )
    image_feat_m = jax.lax.stop_gradient(image_feat_m)
    text_feat_m = jax.lax.stop_gradient(text_feat_m)
    mlm_logits_m = jax.lax.stop_gradient(mlm_logits_m)
    losses = model.apply(
        {"params": params},
        batch["images"], batch["input_ids"], batch["text_mask"],
        batch["masked_ids"], batch["mlm_labels"], batch["image_ids"],
        image_feat_m, text_feat_m,
        state["image_queue"], state["text_queue"], state["idx_queue"],
        mlm_logits_m, jnp.asarray(alpha, jnp.float32),
        rngs={"sample": rng},
    )
    state = enqueue(state, image_feat_m, text_feat_m, batch["image_ids"])
    return losses, state


def med_params_from_torch(
    sd,
    prefix: str,
    num_layers: int,
    *,
    cross_layers=(),
    fold_type_token0: bool = False,
) -> dict:
    """Reference med.py ``BertModel`` state dict -> ``MedEncoder`` tree.

    ``cross_layers``: layer indices whose ``crossattention`` weights exist in
    the checkpoint (ALBEF: ``range(fusion_layer, n)``; BLIP: ``range(n)``;
    ALPRO: none — bert_config_alpro.json has ``add_cross_attention: false``).

    ``fold_type_token0``: ALPRO's med config keeps BERT's token-type
    embeddings and always passes all-zero type ids (alpro_retrieval.py:85-88),
    so row 0 of ``token_type_embeddings`` is a constant added to every token
    before the embedding LayerNorm; MedEncoder carries no type table, so the
    row is folded into every position-embedding row — exact for any length.
    """
    import numpy as np

    from sprc_tpu.interop.torch_import import _layernorm, _linear

    p = prefix
    pos = np.asarray(sd[f"{p}embeddings.position_embeddings.weight"])
    if fold_type_token0:
        pos = pos + np.asarray(
            sd[f"{p}embeddings.token_type_embeddings.weight"]
        )[0][None, :]
    params = {
        "word_embeddings": {
            "embedding": np.asarray(sd[f"{p}embeddings.word_embeddings.weight"])
        },
        "position_embeddings": {"embedding": pos},
        "embeddings_ln": _layernorm(sd, f"{p}embeddings.LayerNorm"),
    }
    cross = set(cross_layers)
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}."
        params[f"layer_{i}_self"] = {
            "query": _linear(sd, f"{lp}attention.self.query"),
            "key": _linear(sd, f"{lp}attention.self.key"),
            "value": _linear(sd, f"{lp}attention.self.value"),
            "out": _linear(sd, f"{lp}attention.output.dense"),
            "ln": _layernorm(sd, f"{lp}attention.output.LayerNorm"),
        }
        if i in cross:
            params[f"layer_{i}_cross"] = {
                "query": _linear(sd, f"{lp}crossattention.self.query"),
                "key": _linear(sd, f"{lp}crossattention.self.key"),
                "value": _linear(sd, f"{lp}crossattention.self.value"),
                "out": _linear(sd, f"{lp}crossattention.output.dense"),
                "ln": _layernorm(sd, f"{lp}crossattention.output.LayerNorm"),
            }
        params[f"layer_{i}_ffn"] = {
            "fc1": _linear(sd, f"{lp}intermediate.dense"),
            "fc2": _linear(sd, f"{lp}output.dense"),
            "ln": _layernorm(sd, f"{lp}output.LayerNorm"),
        }
    return params
