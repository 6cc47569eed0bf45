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


def _stack_blocks(blocks) -> Pytree:
    """Per-layer dicts -> one dict with a leading [depth] axis per leaf
    (the nn.scan stacked-params layout)."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)


def eva_vit_params_from_torch(
    sd: Mapping[str, Array],
    *,
    prefix: str = "visual_encoder.",
    depth: int = 39,
    scan_blocks: bool = False,
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
    blocks = []
    for i in range(depth):
        bp = f"{p}blocks.{i}."
        blocks.append({
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
        })
    if scan_blocks:
        trunk["blocks"] = {"block": _stack_blocks(blocks)}
    else:
        for i, b in enumerate(blocks):
            trunk[f"block_{i}"] = b
    return {"trunk": trunk}


# ----------------------------------------------------------------- CLIP ViT-L


def clip_vit_params_from_torch(
    sd: Mapping[str, Array],
    *,
    prefix: str = "visual_encoder.",
    depth: int = 23,
    scan_blocks: bool = False,
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
    blocks = []
    for i in range(depth):
        bp = f"{p}transformer.resblocks.{i}."
        blocks.append({
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
        })
    if scan_blocks:
        trunk["blocks"] = {"block": _stack_blocks(blocks)}
    else:
        for i, b in enumerate(blocks):
            trunk[f"block_{i}"] = b
    return {"trunk": trunk}


# ------------------------------------------------------------------ top model


def cir_align_prompt_params_from_torch(
    sd: Mapping[str, Array], model, template: Optional[Pytree] = None
) -> Pytree:
    """Full ``Blip2QformerCirAlignPrompt``-family state_dict -> param pytree.

    ``template`` (e.g. from ``jax.eval_shape(model.init, ...)``) filters the
    result to the keys the model actually materializes — flax only creates
    params for modules a model's forward uses, so e.g. ``itm_head`` exists in
    reference checkpoints but not in the align_prompt param tree (mirrors the
    reference's ``strict=False`` load, blip_validate.py:108).
    """
    cfg = model.cfg
    vcfg = cfg.vit_config()
    qcfg = cfg.qformer_config()
    if vcfg.qkv_fused_no_kbias:
        vit = eva_vit_params_from_torch(
            sd, depth=vcfg.depth, scan_blocks=vcfg.scan_blocks
        )
    else:
        vit = clip_vit_params_from_torch(
            sd, depth=vcfg.depth, scan_blocks=vcfg.scan_blocks
        )
    params: Pytree = {
        "visual_encoder": vit,
        "ln_vision": _layernorm(sd, "ln_vision"),
        "qformer": qformer_params_from_torch(
            sd,
            num_layers=qcfg.num_layers,
            cross_attention_freq=qcfg.cross_attention_freq,
        ),
        "query_tokens": np.asarray(sd["query_tokens"]),
        # scalar regardless of serialization ([1]-shaped scalars appear in
        # some torch save paths; the module declares temp with shape ())
        "temp": np.asarray(sd["temp"]).reshape(()),
    }
    for name in ("vision_proj", "text_proj", "itm_head",
                 "vision_proj_f", "text_proj_f"):
        if f"{name}.weight" in sd:
            params[name] = _linear(sd, name)
    for name in ("prompt_tokens", "rel_tokens", "query_tokens_f"):
        if name in sd:
            params[name] = np.asarray(sd[name])
    if "temp2" in sd:
        params["temp2"] = np.asarray(sd["temp2"]).reshape(())
    # the rerank model's frozen twin tower (reference Fformer,
    # blip2_qformer_cir_rerank.py:90-117) lives under Fformer.bert.*
    if "Fformer.bert.embeddings.word_embeddings.weight" in sd:
        params["fformer"] = qformer_params_from_torch(
            sd, prefix="Fformer.bert.", num_layers=qcfg.num_layers,
            cross_attention_freq=qcfg.cross_attention_freq,
        )
    if template is not None:
        params = _filter_to_template(params, template)
    return params


def _filter_to_template(params: Pytree, template: Pytree) -> Pytree:
    """Keep only keys present in template; error on template keys missing
    from params (a genuinely absent weight is a porting bug)."""
    out: Pytree = {}
    for key, tval in template.items():
        if key not in params:
            raise KeyError(f"checkpoint missing parameter subtree '{key}'")
        pval = params[key]
        if isinstance(tval, dict) and isinstance(pval, dict):
            out[key] = _filter_to_template(pval, tval)
        else:
            out[key] = pval
    return out


# ------------------------------------------------------------------- loading


def torch_state_dict_to_numpy(state_dict) -> Dict[str, Array]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        out[k] = np.asarray(v)
    return out


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
    """Load torch ``.pt``/``.pth`` or an orbax checkpoint dir into params.

    Torch state dicts are routed by model family: the LAVIS-style families
    (ALBEF / BLIP-1 / ALPRO / classification / VQA) go through
    ``interop/lavis_import.py``; everything else takes the BLIP-2 CIR
    mapping (the reference SPRC checkpoints, utils.py:219-222)."""
    import os

    if os.path.isdir(path):
        from sprc_tpu.train.checkpoint import restore_params

        return restore_params(path)
    import jax
    import jax.numpy as jnp

    sd = load_torch_file(path)
    from sprc_tpu.interop import lavis_import

    if lavis_import.handles(model):
        return lavis_import.lavis_params_from_torch(sd, model)
    # filter to the structure this model actually materializes (strict=False)
    dummy_img = jnp.zeros((1, model.cfg.image_size, model.cfg.image_size, 3))
    dummy_ids = jnp.zeros((1, model.cfg.max_txt_len), jnp.int32)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), dummy_img, dummy_img, dummy_ids,
        jnp.ones((1, model.cfg.max_txt_len), jnp.int32),
    )["params"]
    return cir_align_prompt_params_from_torch(sd, model, template=template)
