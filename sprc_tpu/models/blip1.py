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
