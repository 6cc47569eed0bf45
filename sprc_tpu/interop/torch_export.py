"""JAX params -> torch state_dict exporter (inverse of torch_import).

Produces reference-named tensors so a checkpoint trained here can be loaded
by the PyTorch implementation (`load_state_dict(ckpt[ClassName])`,
reference src/blip_validate.py:107-109) for cross-validation.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

Array = np.ndarray


def _t(x) -> Array:
    return np.ascontiguousarray(np.asarray(x).T)


def _put_linear(out: Dict[str, Array], name: str, p: Mapping[str, Any]) -> None:
    out[f"{name}.weight"] = _t(p["kernel"])
    if "bias" in p:
        out[f"{name}.bias"] = np.asarray(p["bias"])


def _put_ln(out: Dict[str, Array], name: str, p: Mapping[str, Any]) -> None:
    out[f"{name}.weight"] = np.asarray(p["scale"])
    out[f"{name}.bias"] = np.asarray(p["bias"])


def qformer_to_torch(params: Mapping[str, Any], *, prefix: str = "Qformer.bert.") -> Dict[str, Array]:
    out: Dict[str, Array] = {}
    emb = params["embeddings"]
    out[f"{prefix}embeddings.word_embeddings.weight"] = np.asarray(
        emb["word_embeddings"]["embedding"]
    )
    out[f"{prefix}embeddings.position_embeddings.weight"] = np.asarray(
        emb["position_embeddings"]["embedding"]
    )
    # non-learnable buffer the reference BertEmbeddings registers; emit it
    # so load_state_dict reports no missing keys
    out[f"{prefix}embeddings.position_ids"] = np.arange(
        out[f"{prefix}embeddings.position_embeddings.weight"].shape[0],
        dtype=np.int64,
    )[None]
    _put_ln(out, f"{prefix}embeddings.LayerNorm", emb["ln"])

    for key, layer in params.items():
        if not key.startswith("layer_"):
            continue
        i = int(key.split("_")[1])
        lp = f"{prefix}encoder.layer.{i}."
        sa = layer["self_attn"]
        _put_linear(out, f"{lp}attention.self.query", sa["query"])
        _put_linear(out, f"{lp}attention.self.key", sa["key"])
        _put_linear(out, f"{lp}attention.self.value", sa["value"])
        _put_linear(out, f"{lp}attention.output.dense", sa["out"])
        _put_ln(out, f"{lp}attention.output.LayerNorm", sa["ln"])
        if "cross_attn" in layer:
            ca = layer["cross_attn"]
            _put_linear(out, f"{lp}crossattention.self.query", ca["query"])
            _put_linear(out, f"{lp}crossattention.self.key", ca["key"])
            _put_linear(out, f"{lp}crossattention.self.value", ca["value"])
            _put_linear(out, f"{lp}crossattention.output.dense", ca["out"])
            _put_ln(out, f"{lp}crossattention.output.LayerNorm", ca["ln"])
        _put_linear(out, f"{lp}intermediate.dense", layer["ffn_text"]["fc1"])
        _put_linear(out, f"{lp}output.dense", layer["ffn_text"]["fc2"])
        _put_ln(out, f"{lp}output.LayerNorm", layer["ffn_text"]["ln"])
        _put_linear(out, f"{lp}intermediate_query.dense", layer["ffn_query"]["fc1"])
        _put_linear(out, f"{lp}output_query.dense", layer["ffn_query"]["fc2"])
        _put_ln(out, f"{lp}output_query.LayerNorm", layer["ffn_query"]["ln"])
    return out


def eva_vit_to_torch(params: Mapping[str, Any], *, prefix: str = "visual_encoder.") -> Dict[str, Array]:
    trunk = params["trunk"]
    out: Dict[str, Array] = {
        f"{prefix}cls_token": np.asarray(trunk["cls_token"]),
        f"{prefix}pos_embed": np.asarray(trunk["pos_embed"]),
        f"{prefix}patch_embed.proj.weight": np.ascontiguousarray(
            np.asarray(trunk["patch_embed"]["proj"]["kernel"]).transpose(3, 2, 0, 1)
        ),
        f"{prefix}patch_embed.proj.bias": np.asarray(trunk["patch_embed"]["proj"]["bias"]),
    }
    for key, block in trunk.items():
        if not key.startswith("block_"):
            continue
        i = int(key.split("_")[1])
        bp = f"{prefix}blocks.{i}."
        _put_ln(out, f"{bp}norm1", block["norm1"])
        out[f"{bp}attn.qkv.weight"] = _t(block["attn"]["qkv"]["kernel"])
        out[f"{bp}attn.q_bias"] = np.asarray(block["attn"]["q_bias"])
        out[f"{bp}attn.v_bias"] = np.asarray(block["attn"]["v_bias"])
        _put_linear(out, f"{bp}attn.proj", block["attn"]["proj"])
        _put_ln(out, f"{bp}norm2", block["norm2"])
        _put_linear(out, f"{bp}mlp.fc1", block["mlp_fc1"])
        _put_linear(out, f"{bp}mlp.fc2", block["mlp_fc2"])
    return out


def clip_vit_to_torch(params: Mapping[str, Any], *, prefix: str = "visual_encoder.") -> Dict[str, Array]:
    trunk = params["trunk"]
    out: Dict[str, Array] = {
        f"{prefix}class_embedding": np.asarray(trunk["cls_token"]).reshape(-1),
        f"{prefix}positional_embedding": np.asarray(trunk["pos_embed"])[0],
        f"{prefix}conv1.weight": np.ascontiguousarray(
            np.asarray(trunk["patch_embed"]["proj"]["kernel"]).transpose(3, 2, 0, 1)
        ),
    }
    _put_ln(out, f"{prefix}ln_pre", trunk["ln_pre"])
    for key, block in trunk.items():
        if not key.startswith("block_"):
            continue
        i = int(key.split("_")[1])
        bp = f"{prefix}transformer.resblocks.{i}."
        _put_ln(out, f"{bp}ln_1", block["norm1"])
        out[f"{bp}attn.in_proj_weight"] = _t(block["attn"]["qkv"]["kernel"])
        out[f"{bp}attn.in_proj_bias"] = np.asarray(block["attn"]["qkv"]["bias"])
        _put_linear(out, f"{bp}attn.out_proj", block["attn"]["proj"])
        _put_ln(out, f"{bp}ln_2", block["norm2"])
        _put_linear(out, f"{bp}mlp.c_fc", block["mlp_fc1"])
        _put_linear(out, f"{bp}mlp.c_proj", block["mlp_fc2"])
    return out


def params_to_torch_state_dict(params: Mapping[str, Any], model) -> Dict[str, Array]:
    """Full CirAlignPrompt-family params -> reference-named state_dict."""
    vcfg = model.cfg.vit_config()
    out: Dict[str, Array] = {}
    if vcfg.qkv_fused_no_kbias:
        out.update(eva_vit_to_torch(params["visual_encoder"]))
    else:
        out.update(clip_vit_to_torch(params["visual_encoder"]))
    _put_ln(out, "ln_vision", params["ln_vision"])
    out.update(qformer_to_torch(params["qformer"]))
    out["query_tokens"] = np.asarray(params["query_tokens"])
    for name in ("prompt_tokens", "rel_tokens", "query_tokens_f", "temp2"):
        if name in params:
            out[name] = np.asarray(params[name])
    for name in ("vision_proj", "text_proj", "itm_head",
                 "vision_proj_f", "text_proj_f"):
        if name in params:
            _put_linear(out, name, params[name])
    # rerank frozen twin (reference Fformer, blip2_qformer_cir_rerank.py:90)
    if "fformer" in params:
        out.update(qformer_to_torch(params["fformer"], prefix="Fformer.bert."))
    out["temp"] = np.asarray(params["temp"])
    return out
