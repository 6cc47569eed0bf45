"""NLVR2 two-image reasoning models (registry: ``albef_nlvr``, ``blip_nlvr``).

TPU-native re-implementation of the reference NLVR models:

- ``AlbefNLVR`` (reference: src/lavis/models/albef_models/albef_nlvr.py:24-232):
  med-BERT (12 layers, fusion at 6) in multimodal mode where cross-attention
  layer ``i`` attends image ``(i - 6) % 2`` — alternating image0/image1 —
  and the cross K/V projections are TIED across each layer pair (6,7),
  (8,9), (10,11) (``share_cross_attention``, :198-211). Distilled CE with
  the two-epoch alpha ramp (:77).
- ``BlipNLVR`` (reference: src/lavis/models/blip_models/blip_nlvr.py:24-147 +
  nlvr_encoder.py:256-379): every layer carries TWIN cross-attention (self0
  over image0, self1 over image1, separate output denses); the two contexts
  are averaged below layer 6 and concat+merge-projected from layer 6 on.
  Plain CE, no distillation.

Both share the wrapper: one ViT pass over the concatenated image batch
(reference stacks image0/image1 into a 2B batch — a single large MXU-friendly
batch on TPU too), split, text encoder over both, 2-layer MLP head on CLS.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sprc_tpu.models.albef import _copy, momentum_update
from sprc_tpu.models.qformer import (
    QFormerAttention,
    QFormerConfig,
    QFormerFFN,
    make_additive_mask,
)
from sprc_tpu.models.vit import ClipViT, ViTConfig, blip_vit_b_config
from sprc_tpu.ops.attention import dot_product_attention
from sprc_tpu.ops.layers import DenseGeneral, LayerNormFP32
from sprc_tpu.registry import registry


def _mha(q, k, v, num_heads: int):
    """Raw multi-head attention; projections live in the caller."""
    B, S, C = q.shape
    Sk = k.shape[1]
    D = C // num_heads
    ctx = dot_product_attention(
        q.reshape(B, S, num_heads, D),
        k.reshape(B, Sk, num_heads, D),
        v.reshape(B, Sk, num_heads, D),
        bias=None,
    )
    return ctx.reshape(B, S, C)


class _Embeddings(nn.Module):
    config: QFormerConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
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
        return LayerNormFP32(epsilon=cfg.layer_norm_eps, name="ln")(
            word + pos[None]
        ).astype(cfg.dtype)


class AlbefNLVRMed(nn.Module):
    """ALBEF NLVR text encoder: alternating-image cross, tied K/V per pair."""

    config: QFormerConfig
    fusion_layer: int = 6

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        image0_embeds: jnp.ndarray,
        image1_embeds: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        hidden = _Embeddings(cfg, name="embeddings")(input_ids)
        bias = make_additive_mask(attention_mask)
        images = (image0_embeds.astype(cfg.dtype), image1_embeds.astype(cfg.dtype))

        # tied cross K/V: one (key, value) pair per layer pair (med pairs
        # (6,7), (8,9), (10,11) share them; reference :198-211)
        n_pairs = (cfg.num_layers - self.fusion_layer + 1) // 2
        kv = [
            (
                DenseGeneral(cfg.hidden_size, dtype=cfg.dtype, name=f"cross_key_{p}"),
                DenseGeneral(cfg.hidden_size, dtype=cfg.dtype, name=f"cross_value_{p}"),
            )
            for p in range(n_pairs)
        ]

        for i in range(cfg.num_layers):
            hidden = QFormerAttention(cfg, name=f"layer_{i}_self")(
                hidden, hidden, bias, deterministic=deterministic
            )
            if i >= self.fusion_layer:
                img = images[(i - self.fusion_layer) % 2]
                k_dense, v_dense = kv[(i - self.fusion_layer) // 2]
                q = DenseGeneral(
                    cfg.hidden_size, dtype=cfg.dtype, name=f"layer_{i}_cross_query"
                )(hidden)
                ctx = _mha(q, k_dense(img), v_dense(img), cfg.num_heads)
                out = DenseGeneral(
                    cfg.hidden_size, dtype=cfg.dtype, name=f"layer_{i}_cross_out"
                )(ctx)
                out = nn.Dropout(cfg.dropout_rate)(out, deterministic=deterministic)
                hidden = LayerNormFP32(
                    epsilon=cfg.layer_norm_eps, name=f"layer_{i}_cross_ln"
                )(out + hidden)
            hidden = QFormerFFN(cfg, name=f"layer_{i}_ffn")(
                hidden, deterministic=deterministic
            )
        return hidden


class BlipNLVRMed(nn.Module):
    """BLIP NLVR text encoder: twin cross on every layer, avg/merge combine."""

    config: QFormerConfig
    merge_from: int = 6

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        image0_embeds: jnp.ndarray,
        image1_embeds: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        hidden = _Embeddings(cfg, name="embeddings")(input_ids)
        bias = make_additive_mask(attention_mask)
        images = (image0_embeds.astype(cfg.dtype), image1_embeds.astype(cfg.dtype))

        for i in range(cfg.num_layers):
            hidden = QFormerAttention(cfg, name=f"layer_{i}_self")(
                hidden, hidden, bias, deterministic=deterministic
            )
            # twin cross-attention (nlvr_encoder.py:291-360): independent
            # q/k/v per image, independent output dense0/dense1
            ctxs = []
            for t, img in enumerate(images):
                q = DenseGeneral(
                    cfg.hidden_size, dtype=cfg.dtype, name=f"layer_{i}_cross{t}_query"
                )(hidden)
                k = DenseGeneral(
                    cfg.hidden_size, dtype=cfg.dtype, name=f"layer_{i}_cross{t}_key"
                )(img)
                v = DenseGeneral(
                    cfg.hidden_size, dtype=cfg.dtype, name=f"layer_{i}_cross{t}_value"
                )(img)
                ctx = _mha(q, k, v, cfg.num_heads)
                ctxs.append(
                    DenseGeneral(
                        cfg.hidden_size, dtype=cfg.dtype, name=f"layer_{i}_cross_dense{t}"
                    )(ctx)
                )
            if i >= self.merge_from:
                # concat + merge dense, NO activation (nlvr_encoder.py:277-281)
                out = DenseGeneral(
                    cfg.hidden_size, dtype=cfg.dtype, name=f"layer_{i}_merge"
                )(jnp.concatenate(ctxs, axis=-1))
            else:
                out = (ctxs[0] + ctxs[1]) / 2.0
            out = nn.Dropout(cfg.dropout_rate)(out, deterministic=deterministic)
            hidden = LayerNormFP32(
                epsilon=cfg.layer_norm_eps, name=f"layer_{i}_cross_ln"
            )(out + hidden)
            hidden = QFormerFFN(cfg, name=f"layer_{i}_ffn")(
                hidden, deterministic=deterministic
            )
        return hidden


@dataclasses.dataclass(frozen=True)
class NLVRConfig:
    flavor: str = "albef"  # 'albef' | 'blip'
    num_classes: int = 2
    image_size: int = 384
    max_txt_len: int = 40
    vocab_size: int = 30523
    fusion_layer: int = 6
    momentum: float = 0.995
    alpha: float = 0.4
    use_distill: bool = True  # ALBEF only; BLIP NLVR has no distillation
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


@registry.register_model("albef_nlvr", override=True)
@registry.register_model("blip_nlvr", override=True)
class NLVRClassifier(nn.Module):
    """Two-image entailment classifier (reference forward :108-197)."""

    cfg: NLVRConfig

    MOMENTUM_KEYS = ("visual_encoder", "text_encoder", "cls_head")

    def setup(self) -> None:
        cfg = self.cfg
        tcfg = cfg.text_config()
        self.visual_encoder = ClipViT(cfg.vit_config())
        if cfg.flavor == "blip":
            self.text_encoder = BlipNLVRMed(tcfg, merge_from=cfg.fusion_layer)
        else:
            self.text_encoder = AlbefNLVRMed(tcfg, fusion_layer=cfg.fusion_layer)
        hidden = tcfg.hidden_size
        num_classes = cfg.num_classes

        class _ClsHead(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = DenseGeneral(hidden, name="fc1")(x)
                x = nn.relu(x)
                return DenseGeneral(num_classes, name="fc2")(x)

        self.cls_head = _ClsHead()

    def predict(
        self,
        image0: jnp.ndarray,
        image1: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """-> [B, num_classes]. One ViT pass over the stacked 2B batch
        (reference :120-126)."""
        B = image0.shape[0]
        embeds = self.visual_encoder(
            jnp.concatenate([image0, image1], axis=0)
        ).astype(jnp.float32)
        out = self.text_encoder(
            input_ids, text_mask, embeds[:B], embeds[B:],
            deterministic=deterministic,
        )
        return self.cls_head(out[:, 0, :].astype(jnp.float32))

    def __call__(
        self,
        image0: jnp.ndarray,
        image1: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        labels: jnp.ndarray,
        logits_m: Optional[jnp.ndarray] = None,
        alpha: jnp.ndarray = 0.0,
        *,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        logits = self.predict(
            image0, image1, input_ids, text_mask, deterministic=deterministic
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
        if logits_m is not None:
            soft = jax.nn.softmax(jax.lax.stop_gradient(logits_m), axis=-1)
            loss = (1.0 - alpha) * ce - alpha * (logp * soft).sum(-1).mean()
        else:
            loss = ce
        return {"loss": loss, "logits": logits}


# ------------------------------------------------- functional momentum state


def init_nlvr_state(params) -> Dict[str, Any]:
    return {
        "params_m": {
            k: jax.tree.map(_copy, params[k])
            for k in NLVRClassifier.MOMENTUM_KEYS
        }
    }


def nlvr_train_step(model, params, state, batch, *, alpha):
    """ALBEF-style distilled step. Reference quirk kept (:150-159): the
    momentum pass uses the MOMENTUM visual encoder + cls head but the
    ONLINE text encoder."""
    cfg = model.cfg
    if cfg.use_distill and cfg.flavor == "albef":
        state = momentum_update(params, state, cfg.momentum)
        params_mix = {
            **params,
            "visual_encoder": state["params_m"]["visual_encoder"],
            "cls_head": state["params_m"]["cls_head"],
        }
        logits_m = model.apply(
            {"params": params_mix},
            batch["image0"], batch["image1"],
            batch["input_ids"], batch["text_mask"],
            method=model.predict,
        )
    else:
        logits_m = None
    out = model.apply(
        {"params": params},
        batch["image0"], batch["image1"], batch["input_ids"], batch["text_mask"],
        batch["labels"], logits_m, jnp.asarray(alpha, jnp.float32),
    )
    return out, state


def nlvr_rampup_alpha(cfg, epoch: int, iters: int, iters_per_epoch: int) -> float:
    """Two-epoch ramp (reference albef_nlvr.py:76-77)."""
    return cfg.alpha * min(
        1.0, (epoch * iters_per_epoch + iters) / (2 * iters_per_epoch)
    )
