"""Checkpoint importers for the LAVIS-style model families.

Maps reference torch state dicts (the released ALBEF / BLIP-1 /
classification / VQA / ALPRO weights) onto this framework's param pytrees,
following the reference ``from_config`` assemblies:

- visual towers: timm-style ``VisionTransformer`` under ``visual_encoder.``
  (reference lavis/models/vit.py; packed qkv with bias, final LayerNorm)
- text towers: med.py ``BertModel`` under ``text_encoder.`` (XBertEncoder)
  or ``text_encoder.bert.`` when the reference wraps it in
  ``BertForMaskedLM``/``BertLMHeadModel`` (albef_pretrain.py:388-394,
  albef_vqa.py:353-358)
- LM heads: ``cls.predictions.`` (BertLMPredictionHead)
- cross-attention keys exist on layers >= ``fusion_layer`` for ALBEF
  (med_config_albef.json) and on EVERY layer for BLIP (med_config.json has
  no fusion_layer -> med.py:405-423 except-branch)

Entry point: :func:`lavis_params_from_torch` dispatches on the model class;
``load_checkpoint_auto`` (interop/torch_import.py) routes here for these
families.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from sprc_tpu.interop.torch_import import _layernorm, _linear, _stack_blocks

Array = Any
Pytree = Dict[str, Any]


def vit_trunk_params_from_torch(sd: Mapping[str, Array], prefix: str, vcfg) -> Pytree:
    """timm-style ViT (reference lavis/models/vit.py, packed qkv + bias,
    final LayerNorm) -> ``ClipViT`` tree (``{"trunk": ...}``)."""
    p = prefix
    conv_w = np.asarray(sd[f"{p}patch_embed.proj.weight"])
    proj = {"kernel": np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0))}
    if f"{p}patch_embed.proj.bias" in sd:
        proj["bias"] = np.asarray(sd[f"{p}patch_embed.proj.bias"])
    trunk: Pytree = {
        "cls_token": np.asarray(sd[f"{p}cls_token"]),
        "pos_embed": np.asarray(sd[f"{p}pos_embed"]),
        "patch_embed": {"proj": proj},
    }
    if f"{p}norm.weight" in sd:  # BLIP-1/ALBEF final LN
        trunk["norm"] = _layernorm(sd, f"{p}norm")
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
    if getattr(vcfg, "scan_blocks", False):
        trunk["blocks"] = {"block": _stack_blocks(blocks)}
    else:
        for i, b in enumerate(blocks):
            trunk[f"block_{i}"] = b
    return {"trunk": trunk}


def lm_head_params_from_torch(sd: Mapping[str, Array], prefix: str) -> Pytree:
    """``<prefix>cls.predictions.*`` (BertLMPredictionHead) ->
    ``QFormerLMHead`` tree."""
    p = f"{prefix}cls.predictions."
    return {
        "transform": _linear(sd, f"{p}transform.dense"),
        "ln": _layernorm(sd, f"{p}transform.LayerNorm"),
        "decoder": {
            "kernel": np.ascontiguousarray(np.asarray(sd[f"{p}decoder.weight"]).T),
            "bias": np.asarray(sd[f"{p}bias"]),
        },
    }


def _text_prefix(sd: Mapping[str, Array], base: str) -> str:
    """``text_encoder.`` vs ``text_encoder.bert.`` (MaskedLM/LMHead wrap)."""
    return f"{base}bert." if f"{base}bert.embeddings.word_embeddings.weight" in sd else base


def _med(sd, prefix, num_layers, cross_layers):
    from sprc_tpu.models.albef import med_params_from_torch

    return med_params_from_torch(
        sd, prefix, num_layers, cross_layers=cross_layers,
        fold_type_token0=(
            f"{prefix}embeddings.token_type_embeddings.weight" in sd
        ),
    )


def _proj_heads(sd, params, names=("vision_proj", "text_proj", "itm_head")):
    for n in names:
        if f"{n}.weight" in sd:
            params[n] = _linear(sd, n)
    if "temp" in sd:
        params["temp"] = np.asarray(sd["temp"]).reshape(())


def albef_retrieval_params_from_torch(sd, model) -> Pytree:
    """ALBEF retrieval / feature-extractor / pretrain checkpoints
    (albef_retrieval.py:300-330, albef_pretrain.py:380-420)."""
    cfg = model.cfg
    tcfg = cfg.text_config()
    tp = _text_prefix(sd, "text_encoder.")
    params: Pytree = {
        "visual_encoder": vit_trunk_params_from_torch(
            sd, "visual_encoder.", cfg.vit_config()
        ),
        "text_encoder": _med(
            sd, tp, tcfg.num_layers,
            cross_layers=range(cfg.fusion_layer, tcfg.num_layers),
        ),
    }
    _proj_heads(sd, params)
    if "text_encoder.cls.predictions.decoder.weight" in sd:  # MaskedLM head
        params["mlm_head"] = lm_head_params_from_torch(sd, "text_encoder.")
    return params


def blip_retrieval_params_from_torch(sd, model) -> Pytree:
    """BLIP-1 retrieval / ITM / pretrain checkpoints
    (blip_retrieval.py, blip_image_text_matching.py, blip_pretrain.py):
    cross-attention on every med layer."""
    cfg = model.cfg
    tcfg = cfg.text_config()
    tp = _text_prefix(sd, "text_encoder.")
    params: Pytree = {
        "visual_encoder": vit_trunk_params_from_torch(
            sd, "visual_encoder.", cfg.vit_config()
        ),
        "text_encoder": _med(sd, tp, tcfg.num_layers, range(tcfg.num_layers)),
    }
    _proj_heads(sd, params)
    if "text_decoder.bert.embeddings.word_embeddings.weight" in sd:  # pretrain
        params["text_decoder"] = _med(
            sd, "text_decoder.bert.", tcfg.num_layers, range(tcfg.num_layers)
        )
        params["lm_head"] = lm_head_params_from_torch(sd, "text_decoder.")
    return params


def blip_caption_params_from_torch(sd, model) -> Pytree:
    """BLIP-1 captioner (blip_caption.py: XBertLMHeadDecoder under
    ``text_decoder.``)."""
    cfg = model.cfg
    dcfg = cfg.text_config()
    return {
        "visual_encoder": vit_trunk_params_from_torch(
            sd, "visual_encoder.", cfg.vit_config()
        ),
        "text_decoder": _med(
            sd, _text_prefix(sd, "text_decoder."), dcfg.num_layers,
            range(dcfg.num_layers),
        ),
        "lm_head": lm_head_params_from_torch(sd, "text_decoder."),
    }


def classifier_params_from_torch(sd, model) -> Pytree:
    """ALBEF/BLIP classification (cls_head = nn.Sequential Linear/ReLU/Linear
    -> keys ``cls_head.0`` / ``cls_head.2``)."""
    cfg = model.cfg
    tcfg = cfg.text_config()
    cross = (
        range(tcfg.num_layers)
        if cfg.cross_on_all_layers
        else range(cfg.fusion_layer, tcfg.num_layers)
    )
    tp = _text_prefix(sd, "text_encoder.")
    return {
        "visual_encoder": vit_trunk_params_from_torch(
            sd, "visual_encoder.", cfg.vit_config()
        ),
        "text_encoder": _med(sd, tp, tcfg.num_layers, cross),
        "cls_head": {
            "fc1": _linear(sd, "cls_head.0"),
            "fc2": _linear(sd, "cls_head.2"),
        },
    }


def vqa_params_from_torch(sd, model) -> Pytree:
    """ALBEF/BLIP VQA (albef_vqa.py:348-375, blip_vqa.py): question encoder
    + answer decoder (decoder crosses on every layer — the reference sets
    ``fusion_layer = 0`` on the decoder config)."""
    cfg = model.cfg
    tcfg = cfg.text_config()
    dcfg = cfg.decoder_config()
    enc_cross = (
        range(cfg.fusion_layer, tcfg.num_layers)
        if cfg.flavor == "albef"
        else range(tcfg.num_layers)
    )
    return {
        "visual_encoder": vit_trunk_params_from_torch(
            sd, "visual_encoder.", cfg.vit_config()
        ),
        "text_encoder": _med(
            sd, _text_prefix(sd, "text_encoder."), tcfg.num_layers, enc_cross
        ),
        "text_decoder": _med(
            sd, _text_prefix(sd, "text_decoder."), dcfg.num_layers,
            range(dcfg.num_layers),
        ),
        "lm_head": lm_head_params_from_torch(sd, "text_decoder."),
    }


def blip2_llm_params_from_torch(sd, model) -> Pytree:
    """LAVIS stage-2 ``blip2_t5`` / ``blip2_opt`` checkpoints: frozen ViT +
    ln_vision + Q-Former + query_tokens, plus the frozen LLM under
    ``t5_model.`` / ``opt_model.`` (HF layout with prefix) and its
    projection (reference blip2_t5.py:60-107, blip2_opt.py:52-96)."""
    from sprc_tpu.interop.torch_import import (
        clip_vit_params_from_torch,
        eva_vit_params_from_torch,
        qformer_params_from_torch,
    )

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
    }
    # stage-2 checkpoints usually drop the stage-1 heads, but setup()
    # materializes the temp scalar eagerly -> default it to the init value
    params["temp"] = (
        np.asarray(sd["temp"]) if "temp" in sd else np.asarray(0.07, np.float32)
    )
    if any(k.startswith("t5_model.") for k in sd):
        from sprc_tpu.models.t5 import t5_params_from_hf

        tcfg = model.t5_config
        params["t5"] = t5_params_from_hf(
            sd, num_layers=tcfg.num_layers,
            num_decoder_layers=tcfg.num_decoder_layers,
            gated_act=tcfg.gated_act,
            tie_word_embeddings=tcfg.tie_word_embeddings,
            prefix="t5_model.",
        )
        params["t5_proj"] = _linear(sd, "t5_proj")
    elif any(k.startswith("opt_model.") for k in sd):
        from sprc_tpu.models.opt import opt_params_from_hf

        params["opt"] = opt_params_from_hf(
            sd, num_layers=model.opt_config.num_layers, prefix="opt_model."
        )
        params["opt_proj"] = _linear(sd, "opt_proj")
    else:
        raise KeyError(
            "no t5_model./opt_model. subtree in checkpoint — not a stage-2 "
            "blip2 LLM checkpoint"
        )
    return params


def nlvr_params_from_torch(sd, model) -> Pytree:
    """ALBEF/BLIP NLVR checkpoints.

    BLIP (blip_nlvr.py + nlvr_encoder.py): every layer carries TWIN
    cross-attention (``crossattention.self0``/``self1``, output
    ``dense0``/``dense1``) with a ``merge_layer`` from layer 6 on.

    ALBEF (albef_nlvr.py): standard med keys with cross on layers >=
    fusion_layer; ``share_cross_attention`` (:198-211) ties the K/V weights
    across each layer pair, so the checkpoint carries identical tensors for
    both pair members — the tied tree stores one copy per pair.
    """
    cfg = model.cfg
    tcfg = cfg.text_config()
    n = tcfg.num_layers
    fl = cfg.fusion_layer
    tp = _text_prefix(sd, "text_encoder.")
    text: Pytree = {
        "embeddings": {
            "word_embeddings": {
                "embedding": np.asarray(sd[f"{tp}embeddings.word_embeddings.weight"])
            },
            "position_embeddings": {
                "embedding": np.asarray(
                    sd[f"{tp}embeddings.position_embeddings.weight"]
                )
            },
            "ln": _layernorm(sd, f"{tp}embeddings.LayerNorm"),
        }
    }
    for i in range(n):
        lp = f"{tp}encoder.layer.{i}."
        text[f"layer_{i}_self"] = {
            "query": _linear(sd, f"{lp}attention.self.query"),
            "key": _linear(sd, f"{lp}attention.self.key"),
            "value": _linear(sd, f"{lp}attention.self.value"),
            "out": _linear(sd, f"{lp}attention.output.dense"),
            "ln": _layernorm(sd, f"{lp}attention.output.LayerNorm"),
        }
        text[f"layer_{i}_ffn"] = {
            "fc1": _linear(sd, f"{lp}intermediate.dense"),
            "fc2": _linear(sd, f"{lp}output.dense"),
            "ln": _layernorm(sd, f"{lp}output.LayerNorm"),
        }
        if cfg.flavor == "blip":
            for t in (0, 1):
                text[f"layer_{i}_cross{t}_query"] = _linear(
                    sd, f"{lp}crossattention.self{t}.query"
                )
                text[f"layer_{i}_cross{t}_key"] = _linear(
                    sd, f"{lp}crossattention.self{t}.key"
                )
                text[f"layer_{i}_cross{t}_value"] = _linear(
                    sd, f"{lp}crossattention.self{t}.value"
                )
                text[f"layer_{i}_cross_dense{t}"] = _linear(
                    sd, f"{lp}crossattention.output.dense{t}"
                )
            if i >= fl:
                text[f"layer_{i}_merge"] = _linear(
                    sd, f"{lp}crossattention.output.merge_layer"
                )
            text[f"layer_{i}_cross_ln"] = _layernorm(
                sd, f"{lp}crossattention.output.LayerNorm"
            )
        elif i >= fl:  # albef
            text[f"layer_{i}_cross_query"] = _linear(
                sd, f"{lp}crossattention.self.query"
            )
            text[f"layer_{i}_cross_out"] = _linear(
                sd, f"{lp}crossattention.output.dense"
            )
            text[f"layer_{i}_cross_ln"] = _layernorm(
                sd, f"{lp}crossattention.output.LayerNorm"
            )
            if (i - fl) % 2 == 0:  # one tied K/V copy per layer pair
                p = (i - fl) // 2
                text[f"cross_key_{p}"] = _linear(
                    sd, f"{lp}crossattention.self.key"
                )
                text[f"cross_value_{p}"] = _linear(
                    sd, f"{lp}crossattention.self.value"
                )
    return {
        "visual_encoder": vit_trunk_params_from_torch(
            sd, "visual_encoder.", cfg.vit_config()
        ),
        "text_encoder": text,
        "cls_head": {
            "fc1": _linear(sd, "cls_head.0"),
            "fc2": _linear(sd, "cls_head.2"),
        },
    }


def albef_state_from_torch(sd, model, params, seed: int = 0) -> Dict[str, Any]:
    """Momentum/queue aux state from a reference train checkpoint: re-run the
    family importer over the ``*_m`` momentum copies and lift the queues.
    Falls back to fresh state pieces for anything absent (eval checkpoints
    often strip queues)."""
    import jax.numpy as jnp

    from sprc_tpu.models.albef import init_albef_state

    state = init_albef_state(params, model.cfg, seed=seed)
    m_sd = {}
    for k, v in sd.items():
        head = k.split(".", 1)[0]
        if head.endswith("_m"):
            m_sd[k.replace(f"{head}.", f"{head[:-2]}.", 1)] = v
    if m_sd:
        m_sd.setdefault("temp", sd.get("temp", np.asarray(0.07)))
        m_params = lavis_params_from_torch(m_sd, model)
        state["params_m"] = {
            k: m_params[k] for k in state["params_m"] if k in m_params
        }
    for src, dst in (
        ("image_queue", "image_queue"),
        ("text_queue", "text_queue"),
        ("idx_queue", "idx_queue"),
        ("queue_ptr", "ptr"),
    ):
        if src in sd:
            val = np.asarray(sd[src])
            state[dst] = jnp.asarray(val.reshape(state[dst].shape))
    return state


def _family_classes():
    from sprc_tpu.models.albef import AlbefRetrieval
    from sprc_tpu.models.alpro import AlproQA, AlproRetrieval
    from sprc_tpu.models.blip1 import BlipCaption, BlipCirBase, BlipRetrieval
    from sprc_tpu.models.blip2_opt import Blip2OPT
    from sprc_tpu.models.blip2_t5 import Blip2T5
    from sprc_tpu.models.classification import MultimodalClassifier
    from sprc_tpu.models.clip import Clip
    from sprc_tpu.models.nlvr import NLVRClassifier
    from sprc_tpu.models.pnp_vqa import FiDT5
    from sprc_tpu.models.t5 import T5ForConditionalGeneration
    from sprc_tpu.models.vqa import VQAModel

    return (
        AlproRetrieval, AlproQA, AlbefRetrieval, BlipRetrieval, BlipCaption,
        BlipCirBase, MultimodalClassifier, VQAModel, NLVRClassifier,
        Blip2T5, Blip2OPT, FiDT5, T5ForConditionalGeneration, Clip,
    )


def handles(model) -> bool:
    """True if :func:`lavis_params_from_torch` can import this model."""
    return isinstance(model, _family_classes())


def lavis_params_from_torch(sd, model) -> Pytree:
    """Dispatch a reference LAVIS-family state dict by model class."""
    import jax
    import jax.numpy as jnp

    from sprc_tpu.models.albef import AlbefRetrieval
    from sprc_tpu.models.alpro import AlproQA, AlproRetrieval
    from sprc_tpu.models.blip1 import (
        BlipCaption,
        BlipCirBase,
        BlipRetrieval,
    )
    from sprc_tpu.models.classification import MultimodalClassifier
    from sprc_tpu.models.vqa import VQAModel

    from sprc_tpu.models.blip2_opt import Blip2OPT
    from sprc_tpu.models.blip2_t5 import Blip2T5
    from sprc_tpu.models.pnp_vqa import FiDT5
    from sprc_tpu.models.t5 import T5ForConditionalGeneration, t5_params_from_hf

    if isinstance(model, (AlproRetrieval, AlproQA)):
        from sprc_tpu.models.alpro import alpro_params_from_torch

        return alpro_params_from_torch(sd, model)
    if isinstance(model, (Blip2T5, Blip2OPT)):
        return jax.tree.map(jnp.asarray, blip2_llm_params_from_torch(sd, model))
    from sprc_tpu.models.clip import Clip

    if isinstance(model, Clip):
        if "text_model.embeddings.token_embedding.weight" in sd:  # HF layout
            from sprc_tpu.models.clip import clip_params_from_hf

            return jax.tree.map(jnp.asarray, clip_params_from_hf(
                sd, vision_depth=model.cfg.vision_config().depth,
                text_depth=model.cfg.text.layers,
            ))
        from sprc_tpu.models.clip import clip_params_from_openai

        return jax.tree.map(jnp.asarray, clip_params_from_openai(sd, model))
    if isinstance(model, (FiDT5, T5ForConditionalGeneration)):
        # bare HF-layout seq2seq T5 (e.g. the released unifiedqav2 FiD reader)
        tcfg = model.config
        t5 = t5_params_from_hf(
            sd, num_layers=tcfg.num_layers,
            num_decoder_layers=tcfg.num_decoder_layers,
            gated_act=tcfg.gated_act,
            tie_word_embeddings=tcfg.tie_word_embeddings,
        )
        if isinstance(model, FiDT5):
            t5 = {"t5": t5}
        return jax.tree.map(jnp.asarray, t5)
    if isinstance(model, AlbefRetrieval):  # covers AlbefPretrain subclass
        fn = albef_retrieval_params_from_torch
    elif isinstance(model, BlipRetrieval):  # covers BlipITM / BlipPretrain
        fn = blip_retrieval_params_from_torch
    elif isinstance(model, BlipCaption):
        fn = blip_caption_params_from_torch
    elif isinstance(model, BlipCirBase):
        from sprc_tpu.models.blip1 import blip_cir_base_params_from_torch

        return jax.tree.map(jnp.asarray, blip_cir_base_params_from_torch(sd, model))
    elif isinstance(model, MultimodalClassifier):
        fn = classifier_params_from_torch
    elif isinstance(model, VQAModel):
        fn = vqa_params_from_torch
    else:
        from sprc_tpu.models.nlvr import NLVRClassifier

        if isinstance(model, NLVRClassifier):
            fn = nlvr_params_from_torch
        else:
            raise TypeError(f"no LAVIS importer for {type(model).__name__}")
    return jax.tree.map(jnp.asarray, fn(sd, model))
