"""CLIP contrastive image-text model (registry: ``clip``,
``clip_feature_extractor``).

TPU-native equivalent of the reference's vendored OpenCLIP port
(reference: src/lavis/models/clip_models/model.py): a ViT visual tower with
ln_post + linear projection, a causal text transformer (QuickGELU, ln_final,
eot-token pooling, text projection) and a learned logit scale.

The visual tower reuses :class:`~sprc_tpu.models.vit.ClipViT` with
``final_norm`` (= ln_post). Weights import from an HF ``CLIPModel``
state_dict (q/k/v packed into the fused qkv); parity-tested against
``transformers.CLIPModel`` (tests/test_clip_model.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sprc_tpu.models.resnet_clip import ResNetConfig
from sprc_tpu.models.vit import ClipViT, ViTConfig
from sprc_tpu.ops.attention import dot_product_attention
from sprc_tpu.ops.layers import DenseGeneral, LayerNormFP32, l2_normalize, quick_gelu
from sprc_tpu.registry import registry


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    embed_dim: int = 512
    image_size: int = 224
    vision: Optional[ViTConfig] = None
    # ResNet tower (RN50): the attention pool's c_proj already projects to
    # embed_dim, so no separate visual_projection is applied
    # (reference clip_models/model.py:156-244 + CLIP.encode_image)
    vision_resnet: Optional[ResNetConfig] = None
    text: ClipTextConfig = ClipTextConfig()

    def vision_config(self) -> ViTConfig:
        if self.vision is not None:
            return self.vision
        return ViTConfig(
            image_size=self.image_size, patch_size=16, width=768, depth=12,
            num_heads=12, mlp_hidden=3072, layer_norm_eps=1e-5, use_ln_pre=True,
            quick_gelu=True, final_norm=True, patch_bias=False,
            dtype=jnp.float32,
        )


class ClipTextBlock(nn.Module):
    config: ClipTextConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        B, S, C = x.shape
        H = cfg.heads
        D = C // H
        h = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="norm1")(x)
        qkv = DenseGeneral(3 * C, dtype=cfg.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ctx = dot_product_attention(
            q.reshape(B, S, H, D), k.reshape(B, S, H, D), v.reshape(B, S, H, D),
            bias=bias, use_pallas=False,
        ).reshape(B, S, C)
        x = x + DenseGeneral(C, dtype=cfg.dtype, name="proj")(ctx)
        h = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="norm2")(x)
        h = DenseGeneral(cfg.width * 4, dtype=cfg.dtype, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = DenseGeneral(cfg.width, dtype=cfg.dtype, name="mlp_fc2")(h)
        return x + h


class ClipTextEncoder(nn.Module):
    config: ClipTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        B, S = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.width, param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(0.02), name="token_embedding",
        )(input_ids)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width), jnp.float32,
        )
        x = tok + pos[None, :S].astype(tok.dtype)
        causal = jnp.tril(jnp.ones((S, S), bool))
        bias = jnp.where(causal, 0.0, -1e9).astype(jnp.float32)[None, None]
        for i in range(cfg.layers):
            x = ClipTextBlock(cfg, name=f"block_{i}")(x, bias)
        return LayerNormFP32(epsilon=cfg.layer_norm_eps, name="ln_final")(x)


@registry.register_model("clip", override=True)
@registry.register_model("clip_feature_extractor", override=True)
class Clip(nn.Module):
    """Contrastive image-text model with projection heads + logit scale."""

    cfg: ClipConfig

    def setup(self) -> None:
        cfg = self.cfg
        if cfg.vision_resnet is not None:
            from sprc_tpu.models.resnet_clip import ClipResNet

            self.visual = ClipResNet(cfg.vision_resnet)
        else:
            self.visual = ClipViT(cfg.vision_config())
        self.text = ClipTextEncoder(cfg.text)
        self.visual_projection = DenseGeneral(cfg.embed_dim, use_bias=False)
        self.text_projection = DenseGeneral(cfg.embed_dim, use_bias=False)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(np.log(1 / 0.07)), (), jnp.float32
        )

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.vision_resnet is not None:
            return self.visual(images)  # attnpool c_proj projects already
        feats = self.visual(images)  # final_norm applied in trunk
        return self.visual_projection(feats[:, 0, :].astype(jnp.float32))

    def encode_text(self, input_ids: jnp.ndarray, eot_positions: jnp.ndarray) -> jnp.ndarray:
        hidden = self.text(input_ids)
        pooled = jnp.take_along_axis(
            hidden, eot_positions[:, None, None].astype(jnp.int32), axis=1
        )[:, 0, :]
        return self.text_projection(pooled.astype(jnp.float32))

    def __call__(
        self,
        images: jnp.ndarray,
        input_ids: jnp.ndarray,
        eot_positions: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """-> (logits_per_image [B_i, B_t], image_feats, text_feats)."""
        img = l2_normalize(self.encode_image(images))
        txt = l2_normalize(self.encode_text(input_ids, eot_positions))
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T, img, txt


# ------------------------------------------------------------------ interop


def clip_params_from_hf(sd: Mapping[str, Any], *, vision_depth: int,
                        text_depth: int, scan_blocks: bool = False) -> Dict[str, Any]:
    """HF CLIPModel state_dict -> params (q/k/v packed into fused qkv)."""
    from sprc_tpu.interop.torch_import import _layernorm, _linear, _stack_blocks

    def t(name):
        return np.ascontiguousarray(np.asarray(sd[name]).T)

    def packed_qkv(prefix):
        kernel = np.concatenate(
            [t(f"{prefix}.q_proj.weight"), t(f"{prefix}.k_proj.weight"), t(f"{prefix}.v_proj.weight")],
            axis=1,
        )
        bias = np.concatenate(
            [np.asarray(sd[f"{prefix}.q_proj.bias"]), np.asarray(sd[f"{prefix}.k_proj.bias"]),
             np.asarray(sd[f"{prefix}.v_proj.bias"])]
        )
        return {"kernel": kernel, "bias": bias}

    vp = "vision_model."
    trunk: Dict[str, Any] = {
        "cls_token": np.asarray(sd[f"{vp}embeddings.class_embedding"]).reshape(1, 1, -1),
        "pos_embed": np.asarray(sd[f"{vp}embeddings.position_embedding.weight"])[None],
        "patch_embed": {
            "proj": {
                "kernel": np.ascontiguousarray(
                    np.asarray(sd[f"{vp}embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
                )
            }
        },
        "ln_pre": _layernorm(sd, f"{vp}pre_layrnorm"),
        "norm": _layernorm(sd, f"{vp}post_layernorm"),
    }
    vblocks = []
    for i in range(vision_depth):
        bp = f"{vp}encoder.layers.{i}."
        vblocks.append({
            "norm1": _layernorm(sd, f"{bp}layer_norm1"),
            "attn": {
                "qkv": packed_qkv(f"{bp}self_attn"),
                "proj": _linear(sd, f"{bp}self_attn.out_proj"),
            },
            "norm2": _layernorm(sd, f"{bp}layer_norm2"),
            "mlp_fc1": _linear(sd, f"{bp}mlp.fc1"),
            "mlp_fc2": _linear(sd, f"{bp}mlp.fc2"),
        })
    if scan_blocks:
        trunk["blocks"] = {"block": _stack_blocks(vblocks)}
    else:
        for i, b in enumerate(vblocks):
            trunk[f"block_{i}"] = b

    tp = "text_model."
    text: Dict[str, Any] = {
        "token_embedding": {
            "embedding": np.asarray(sd[f"{tp}embeddings.token_embedding.weight"])
        },
        "positional_embedding": np.asarray(
            sd[f"{tp}embeddings.position_embedding.weight"]
        ),
        "ln_final": _layernorm(sd, f"{tp}final_layer_norm"),
    }
    for i in range(text_depth):
        bp = f"{tp}encoder.layers.{i}."
        text[f"block_{i}"] = {
            "norm1": _layernorm(sd, f"{bp}layer_norm1"),
            "qkv": packed_qkv(f"{bp}self_attn"),
            "proj": _linear(sd, f"{bp}self_attn.out_proj"),
            "norm2": _layernorm(sd, f"{bp}layer_norm2"),
            "mlp_fc1": _linear(sd, f"{bp}mlp.fc1"),
            "mlp_fc2": _linear(sd, f"{bp}mlp.fc2"),
        }

    return {
        "visual": {"trunk": trunk},
        "text": text,
        "visual_projection": {"kernel": t("visual_projection.weight")},
        "text_projection": {"kernel": t("text_projection.weight")},
        "logit_scale": np.asarray(sd["logit_scale"]),
    }


def clip_params_from_openai(sd: Mapping[str, Any], model: "Clip") -> Dict[str, Any]:
    """OpenAI/OpenCLIP-format CLIP state dict -> params.

    The reference clip family's vendored ``clip_models/model.py`` (and the
    released ViT-B/L + RN50 checkpoints) use this layout: the visual tower
    under ``visual.`` (``conv1`` / ``class_embedding`` /
    ``transformer.resblocks`` / ``ln_post`` / ``proj``), the text tower at
    the root (``transformer.resblocks`` / ``token_embedding`` /
    ``ln_final`` / ``text_projection``), packed ``attn.in_proj`` qkv.
    ``visual.proj`` / ``text_projection`` multiply activations directly
    (``x @ proj``), so they map to kernels untransposed.
    """
    from sprc_tpu.interop.torch_import import (
        _layernorm,
        _linear,
        _t,
        clip_vit_params_from_torch,
    )

    cfg = model.cfg
    if cfg.vision_resnet is not None:
        from sprc_tpu.models.resnet_clip import clip_resnet_params_from_torch

        vis_sd = {k[len("visual."):]: v for k, v in sd.items()
                  if k.startswith("visual.")}
        visual = clip_resnet_params_from_torch(vis_sd, cfg.vision_resnet)
    else:
        vcfg = cfg.vision_config()
        visual = clip_vit_params_from_torch(
            sd, prefix="visual.", depth=vcfg.depth,
            scan_blocks=getattr(vcfg, "scan_blocks", False),
        )
        if "visual.ln_post.weight" in sd:  # our final_norm
            visual["trunk"]["norm"] = _layernorm(sd, "visual.ln_post")

    tcfg = cfg.text
    text: Dict[str, Any] = {
        "token_embedding": {"embedding": np.asarray(sd["token_embedding.weight"])},
        "positional_embedding": np.asarray(sd["positional_embedding"]),
        "ln_final": _layernorm(sd, "ln_final"),
    }
    for i in range(tcfg.layers):
        bp = f"transformer.resblocks.{i}."
        text[f"block_{i}"] = {
            "norm1": _layernorm(sd, f"{bp}ln_1"),
            "qkv": {
                "kernel": _t(np.asarray(sd[f"{bp}attn.in_proj_weight"])),
                "bias": np.asarray(sd[f"{bp}attn.in_proj_bias"]),
            },
            "proj": _linear(sd, f"{bp}attn.out_proj"),
            "norm2": _layernorm(sd, f"{bp}ln_2"),
            "mlp_fc1": _linear(sd, f"{bp}mlp.c_fc"),
            "mlp_fc2": _linear(sd, f"{bp}mlp.c_proj"),
        }

    params: Dict[str, Any] = {
        "visual": visual,
        "text": text,
        "text_projection": {"kernel": np.asarray(sd["text_projection"])},
        "logit_scale": np.asarray(sd["logit_scale"]).reshape(()),
    }
    if "visual.proj" in sd:  # absent for RN50 (attnpool projects already)
        params["visual_projection"] = {"kernel": np.asarray(sd["visual.proj"])}
    return params
