"""Multimodal classification heads (registry: ``albef_classification``,
``blip_classification``).

TPU-native re-implementation of the reference classifiers
(reference: src/lavis/models/albef_models/albef_classification.py:26-147 and
src/lavis/models/blip_models/blip_classification.py:25-147 — the two are
structurally identical): ViT image embeds -> med-BERT in multimodal mode
(``forward_automask``) -> 2-layer ReLU MLP on the CLS token. Training loss is
(1-alpha)*CE + alpha*KL-to-momentum-model (soft distillation), with alpha
ramped over the first epoch (classification ramp divides by ONE epoch,
:80-81, unlike retrieval's two).

The ALBEF flavor cross-attends from ``fusion_layer`` (6); the BLIP flavor
cross-attends on every med layer. As with :mod:`sprc_tpu.models.albef`, the
momentum copy is EXPLICIT functional state threaded through
:func:`classifier_train_step`, not in-place module buffers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sprc_tpu.models.albef import MedEncoder, _copy, momentum_update
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.vit import ClipViT, ViTConfig, blip_vit_b_config
from sprc_tpu.ops.layers import DenseGeneral
from sprc_tpu.registry import registry


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    num_classes: int = 3  # visual entailment default (ve config)
    image_size: int = 384
    max_txt_len: int = 40
    vocab_size: int = 30523
    fusion_layer: int = 6
    cross_on_all_layers: bool = False  # True = BLIP flavor
    momentum: float = 0.995
    alpha: float = 0.4
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


@registry.register_model("albef_classification", override=True)
@registry.register_model("blip_classification", override=True)
class MultimodalClassifier(nn.Module):
    """ViT + multimodal med-BERT + MLP class head (reference :83-147)."""

    cfg: ClassifierConfig

    MOMENTUM_KEYS = ("visual_encoder", "text_encoder", "cls_head")

    def setup(self) -> None:
        cfg = self.cfg
        tcfg = cfg.text_config()
        self.visual_encoder = ClipViT(cfg.vit_config())
        if cfg.cross_on_all_layers:
            # BLIP med: every layer has cross-attention (med.py:406-420)
            self.text_encoder = MedEncoder(tcfg, tcfg.num_layers, cross_from=0)
        else:
            self.text_encoder = MedEncoder(tcfg, cfg.fusion_layer)
        hidden = tcfg.hidden_size

        class _ClsHead(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = DenseGeneral(hidden, name="fc1")(x)
                x = nn.relu(x)
                return DenseGeneral(cfg.num_classes, name="fc2")(x)

        self.cls_head = _ClsHead()

    def predict(
        self,
        images: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """-> [B, num_classes] logits (reference :96-101)."""
        image_embeds = self.visual_encoder(images).astype(jnp.float32)
        out = self.text_encoder(
            input_ids=input_ids, attention_mask=text_mask,
            image_embeds=image_embeds, mode="multimodal",
            deterministic=deterministic,
        )
        return self.cls_head(out[:, 0, :].astype(jnp.float32))

    def __call__(
        self,
        images: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        labels: jnp.ndarray,
        logits_m: Optional[jnp.ndarray] = None,
        alpha: jnp.ndarray = 0.0,
        *,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Distilled CE (reference :117-128): (1-a)*CE - a*E[logp · p_m]."""
        logits = self.predict(
            images, input_ids, text_mask, deterministic=deterministic
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


def init_classifier_state(params) -> Dict[str, Any]:
    return {
        "params_m": {
            k: jax.tree.map(_copy, params[k])
            for k in MultimodalClassifier.MOMENTUM_KEYS
        }
    }


def classifier_train_step(model, params, state, batch, *, alpha):
    """Pure distilled-classification step: momentum EMA -> momentum logits ->
    loss. Returns (out, new_state); wrap in jax.grad over params."""
    cfg = model.cfg
    if cfg.use_distill:
        state = momentum_update(params, state, cfg.momentum)
        logits_m = model.apply(
            {"params": {**params, **state["params_m"]}},
            batch["images"], batch["input_ids"], batch["text_mask"],
            method=model.predict,
        )
    else:
        logits_m = None
    out = model.apply(
        {"params": params},
        batch["images"], batch["input_ids"], batch["text_mask"],
        batch["labels"], logits_m, jnp.asarray(alpha, jnp.float32),
    )
    return out, state


def classifier_rampup_alpha(cfg, epoch: int, iters: int, iters_per_epoch: int) -> float:
    """alpha ramp over ONE epoch (reference :80-81)."""
    return cfg.alpha * min(1.0, (epoch * iters_per_epoch + iters) / iters_per_epoch)
