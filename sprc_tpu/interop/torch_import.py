"""torch state_dict -> JAX parameter pytree importers.

Covers the four artifact formats the reference bootstraps from (SURVEY.md
§3.4): ``eva_vit_g.pth`` / ``clip_vit_L.pth`` (vision towers),
``blip2_pretrained.pth`` (stage-1 Q-Former under a ``model`` key), BERT-base
token embeddings, and the released fine-tuned ``sprc_*.pt`` checkpoints
(``{epoch, ClassName: state_dict}``, reference src/utils.py:208-222).

Conventions:
- torch ``nn.Linear.weight`` is ``[out, in]`` -> flax ``kernel`` is its
  transpose ``[in, out]``.
- torch conv weight ``[out, in, kh, kw]`` -> flax ``[kh, kw, in, out]``.
- torch ``LayerNorm.weight/bias`` -> ``scale``/``bias``.
- image layout converts NCHW -> NHWC at the data boundary, not in weights
  (only the patchifier conv kernel needs the transpose above).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

Array = np.ndarray
Pytree = Dict[str, Any]


def _t(w: Array) -> Array:
    return np.ascontiguousarray(w.T)


def _linear(sd: Mapping[str, Array], name: str, use_bias: bool = True) -> Pytree:
    out = {"kernel": _t(np.asarray(sd[f"{name}.weight"]))}
    if use_bias and f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _layernorm(sd: Mapping[str, Array], name: str) -> Pytree:
    return {
        "scale": np.asarray(sd[f"{name}.weight"]),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


# --------------------------------------------------------------------- QFormer


def qformer_params_from_torch(
    sd: Mapping[str, Array],
    *,
    prefix: str = "Qformer.bert.",
    num_layers: int = 12,
    cross_attention_freq: int = 2,
) -> Pytree:
    """Map the reference BertModel state_dict into our QFormer pytree."""
    p = prefix
    params: Pytree = {
        "embeddings": {
            "word_embeddings": {
                "embedding": np.asarray(sd[f"{p}embeddings.word_embeddings.weight"])
            },
            "position_embeddings": {
                "embedding": np.asarray(sd[f"{p}embeddings.position_embeddings.weight"])
            },
            "ln": _layernorm(sd, f"{p}embeddings.LayerNorm"),
        }
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}."
        layer: Pytree = {
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
            "ffn_query": {
                "fc1": _linear(sd, f"{lp}intermediate_query.dense"),
                "fc2": _linear(sd, f"{lp}output_query.dense"),
                "ln": _layernorm(sd, f"{lp}output_query.LayerNorm"),
            },
        }
        if i % cross_attention_freq == 0:
            layer["cross_attn"] = {
                "query": _linear(sd, f"{lp}crossattention.self.query"),
                "key": _linear(sd, f"{lp}crossattention.self.key"),
                "value": _linear(sd, f"{lp}crossattention.self.value"),
                "out": _linear(sd, f"{lp}crossattention.output.dense"),
                "ln": _layernorm(sd, f"{lp}crossattention.output.LayerNorm"),
            }
        params[f"layer_{i}"] = layer
    return params


# ------------------------------------------------------------------ EVA ViT-g


def eva_vit_params_from_torch(
    sd: Mapping[str, Array], *, prefix: str = "visual_encoder.", depth: int = 39
) -> Pytree:
    p = prefix
    conv_w = np.asarray(sd[f"{p}patch_embed.proj.weight"])  # [out,in,kh,kw]
    trunk: Pytree = {
        "cls_token": np.asarray(sd[f"{p}cls_token"]),
        "pos_embed": np.asarray(sd[f"{p}pos_embed"]),
        "patch_embed": {
            "proj": {
                "kernel": np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0)),
                "bias": np.asarray(sd[f"{p}patch_embed.proj.bias"]),
            }
        },
    }
    for i in range(depth):
        bp = f"{p}blocks.{i}."
        trunk[f"block_{i}"] = {
            "norm1": _layernorm(sd, f"{bp}norm1"),
            "attn": {
                "qkv": {"kernel": _t(np.asarray(sd[f"{bp}attn.qkv.weight"]))},
                "q_bias": np.asarray(sd[f"{bp}attn.q_bias"]),
                "v_bias": np.asarray(sd[f"{bp}attn.v_bias"]),
                "proj": _linear(sd, f"{bp}attn.proj"),
            },
            "norm2": _layernorm(sd, f"{bp}norm2"),
            "mlp_fc1": _linear(sd, f"{bp}mlp.fc1"),
            "mlp_fc2": _linear(sd, f"{bp}mlp.fc2"),
        }
    return {"trunk": trunk}


# ----------------------------------------------------------------- CLIP ViT-L


def clip_vit_params_from_torch(
    sd: Mapping[str, Array], *, prefix: str = "visual_encoder.", depth: int = 23
) -> Pytree:
    p = prefix
    conv_w = np.asarray(sd[f"{p}conv1.weight"])
    trunk: Pytree = {
        "cls_token": np.asarray(sd[f"{p}class_embedding"]).reshape(1, 1, -1),
        "pos_embed": np.asarray(sd[f"{p}positional_embedding"])[None],
        "patch_embed": {
            "proj": {"kernel": np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0))}
        },
        "ln_pre": _layernorm(sd, f"{p}ln_pre"),
    }
    for i in range(depth):
        bp = f"{p}transformer.resblocks.{i}."
        trunk[f"block_{i}"] = {
            "norm1": _layernorm(sd, f"{bp}ln_1"),
            "attn": {
                "qkv": {
                    "kernel": _t(np.asarray(sd[f"{bp}attn.in_proj_weight"])),
                    "bias": np.asarray(sd[f"{bp}attn.in_proj_bias"]),
                },
                "proj": _linear(sd, f"{bp}attn.out_proj"),
            },
            "norm2": _layernorm(sd, f"{bp}ln_2"),
            "mlp_fc1": _linear(sd, f"{bp}mlp.c_fc"),
            "mlp_fc2": _linear(sd, f"{bp}mlp.c_proj"),
        }
    return {"trunk": trunk}


# ------------------------------------------------------------------ top model


def cir_align_prompt_params_from_torch(sd: Mapping[str, Array], model) -> Pytree:
    """Full ``Blip2QformerCirAlignPrompt`` state_dict -> model param pytree."""
    cfg = model.cfg
    vcfg = cfg.vit_config()
    qcfg = cfg.qformer_config()
    if vcfg.qkv_fused_no_kbias:
        vit = eva_vit_params_from_torch(sd, depth=vcfg.depth)
    else:
        vit = clip_vit_params_from_torch(sd, depth=vcfg.depth)
    params: Pytree = {
        "visual_encoder": vit,
        "ln_vision": _layernorm(sd, "ln_vision"),
        "qformer": qformer_params_from_torch(
            sd,
            num_layers=qcfg.num_layers,
            cross_attention_freq=qcfg.cross_attention_freq,
        ),
        "query_tokens": np.asarray(sd["query_tokens"]),
        "vision_proj": _linear(sd, "vision_proj"),
        "text_proj": _linear(sd, "text_proj"),
        "itm_head": _linear(sd, "itm_head"),
        "temp": np.asarray(sd["temp"]),
    }
    if "prompt_tokens" in sd:
        params["prompt_tokens"] = np.asarray(sd["prompt_tokens"])
    return params


# ------------------------------------------------------------------- loading


def torch_state_dict_to_numpy(state_dict) -> Dict[str, Array]:
    return {k: v.detach().cpu().float().numpy() for k, v in state_dict.items()}


def load_torch_file(path: str) -> Dict[str, Array]:
    """Load any of the reference checkpoint flavors into a flat numpy dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        if "model" in ckpt and isinstance(ckpt["model"], dict):
            ckpt = ckpt["model"]  # blip2_pretrained.pth style
        else:
            # fine-tuned {epoch, ClassName: state_dict} style (utils.py:219-222)
            for key, val in ckpt.items():
                if isinstance(val, dict) and any(
                    hasattr(x, "detach") for x in val.values()
                ):
                    ckpt = val
                    break
    return torch_state_dict_to_numpy(ckpt)


def load_checkpoint_auto(path: str, model) -> Pytree:
    """Load torch ``.pt``/``.pth`` or an orbax checkpoint dir into params."""
    import os

    if os.path.isdir(path):
        from sprc_tpu.train.checkpoint import restore_params

        return restore_params(path)
    sd = load_torch_file(path)
    return cir_align_prompt_params_from_torch(sd, model)
