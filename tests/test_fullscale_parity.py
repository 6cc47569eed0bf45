"""FULL-SCALE numerics parity (SURVEY §7.2 de-risk; VERDICT r1 item 4).

Assembles the reference Blip2QformerCirAlignPrompt equations at REAL dims
(ViT 1024x23 EVA layout, Q-Former 768x12, 32 query tokens, bert vocab) from
seeded random torch weights, ports them through interop/torch_import, and
compares the eval contract (extract_target_features / inference):

  - fp32 JAX vs fp32 torch  (exactness of the port at real dims)
  - bf16 JAX vs fp32 torch  (the production dtype policy's drift)

Slow (~minutes on the 1-core CPU box): runs when SPRC_FULLSCALE=1 or under
``-m fullscale``. Prints a per-output max-abs-diff drift table (the
MEASUREMENTS.md table is produced from this).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.interop.torch_import import (
    cir_align_prompt_params_from_torch,
    torch_state_dict_to_numpy,
)
from sprc_tpu.models.cir_base import CirConfig
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.vit import ViTConfig
from sprc_tpu.registry import registry

pytestmark = pytest.mark.skipif(
    os.environ.get("SPRC_FULLSCALE") != "1",
    reason="full-scale parity is slow; set SPRC_FULLSCALE=1",
)

# real dims (reference blip2.py init_Qformer + eva_vit/clip_vit scale)
IMG, PATCH = 224, 14
VWIDTH, VDEPTH, VHEADS, VMLP = 1024, 23, 16, 4096
HIDDEN, LAYERS, HEADS, INTER = 768, 12, 12, 3072
Q, VOCAB, TXT, EMBED = 32, 30523, 16, 256
B = 2


def build_ref(qmod, vmod):
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    bcfg = qmod.BertConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    bcfg.encoder_width = VWIDTH
    bcfg.add_cross_attention = True
    bcfg.cross_attention_freq = 2
    bcfg.query_length = Q

    class QformerWrapper(nn.Module):
        def __init__(self):
            super().__init__()
            self.bert = qmod.BertModel(bcfg, add_pooling_layer=False)

    class RefAssembly(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = vmod.VisionTransformer(
                img_size=IMG, patch_size=PATCH, embed_dim=VWIDTH,
                depth=VDEPTH, num_heads=VHEADS, mlp_ratio=VMLP / VWIDTH,
                qkv_bias=True, use_mean_pooling=False,
                norm_layer=lambda d: nn.LayerNorm(d, eps=1e-6),
            )
            self.ln_vision = nn.LayerNorm(VWIDTH)
            self.Qformer = QformerWrapper()
            self.query_tokens = nn.Parameter(torch.randn(1, Q, HIDDEN) * 0.02)
            self.prompt_tokens = nn.Parameter(torch.randn(1, Q, HIDDEN) * 0.02)
            self.vision_proj = nn.Linear(HIDDEN, EMBED)
            self.text_proj = nn.Linear(HIDDEN, EMBED)
            self.itm_head = nn.Linear(HIDDEN, 2)
            self.temp = nn.Parameter(0.07 * torch.ones([]))

        def extract_target_features(self, image):
            import torch.nn.functional as F

            frozen = self.ln_vision(self.visual_encoder(image))
            q = self.query_tokens.expand(image.shape[0], -1, -1)
            out = self.Qformer.bert(
                query_embeds=q, encoder_hidden_states=frozen, return_dict=True
            ).last_hidden_state
            return F.normalize(self.vision_proj(out), dim=-1), frozen

        def inference(self, reference_embeds, target_feats, ids, mask):
            import torch.nn.functional as F

            bs = reference_embeds.shape[0]
            q = self.query_tokens.expand(bs, -1, -1)
            attn = torch.cat([torch.ones(bs, Q, dtype=mask.dtype), mask], dim=1)
            fusion = self.Qformer.bert(
                ids, query_embeds=q, attention_mask=attn,
                encoder_hidden_states=reference_embeds, return_dict=True,
            ).last_hidden_state
            text_out = self.Qformer.bert(
                ids, query_embeds=fusion[:, :Q, :], attention_mask=attn,
                return_dict=True,
            ).last_hidden_state
            fusion_feats = F.normalize(self.text_proj(text_out[:, Q, :]), dim=-1)
            return torch.einsum(
                "bd,nqd->bnq", fusion_feats, target_feats
            ).max(-1).values

    return RefAssembly().eval()


def build_jax(vit_dtype):
    vcfg = ViTConfig(
        image_size=IMG, patch_size=PATCH, width=VWIDTH, depth=VDEPTH,
        num_heads=VHEADS, mlp_hidden=VMLP, layer_norm_eps=1e-6,
        qkv_fused_no_kbias=True, dtype=vit_dtype, scan_blocks=True,
    )
    qcfg = QFormerConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=LAYERS,
        num_heads=HEADS, intermediate_size=INTER, encoder_width=VWIDTH,
        cross_attention_freq=2, query_length=Q, dropout_rate=0.0,
        attention_dropout_rate=0.0,
        dtype=jnp.float32 if vit_dtype == jnp.float32 else jnp.bfloat16,
    )
    cfg = CirConfig(
        vit_model="eva_clip_g", image_size=IMG, num_query_token=Q,
        embed_dim=EMBED, max_txt_len=TXT, vocab_size=VOCAB,
        vit_dtype=vit_dtype, vit_config_override=vcfg,
        qformer_config_override=qcfg,
    )
    return registry.get_model_class("blip2_cir_align_prompt")(cfg)


def test_fullscale_eval_parity(ref_qformer_module, ref_eva_vit_module):
    import torch

    tmodel = build_ref(ref_qformer_module, ref_eva_vit_module)
    sd = torch_state_dict_to_numpy(tmodel.state_dict())

    rs = np.random.RandomState(0)
    gallery = rs.rand(2 * B, 3, IMG, IMG).astype(np.float32)
    ids = rs.randint(0, VOCAB, size=(B, TXT)).astype(np.int32)
    mask = np.ones((B, TXT), np.int32)
    mask[0, -5:] = 0

    with torch.no_grad():
        want_feats, want_frozen = tmodel.extract_target_features(
            torch.from_numpy(gallery)
        )
        want_sims = tmodel.inference(
            want_frozen[:B], want_feats,
            torch.from_numpy(ids).long(), torch.from_numpy(mask).long(),
        ).numpy()
    want_feats = want_feats.numpy()
    want_frozen = want_frozen.numpy()

    gallery_j = jnp.asarray(gallery.transpose(0, 2, 3, 1))
    drift = {}
    for label, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = build_jax(dtype)
        params = cir_align_prompt_params_from_torch(sd, model)
        feats, frozen = model.apply(
            {"params": params}, gallery_j, method=model.extract_target_features
        )
        sims = model.apply(
            {"params": params}, frozen[:B], feats,
            jnp.asarray(ids), jnp.asarray(mask), method=model.inference,
        )
        drift[label] = {
            "frozen_maxabs": float(np.abs(np.asarray(frozen, np.float32) - want_frozen).max()),
            "feats_maxabs": float(np.abs(np.asarray(feats, np.float32) - want_feats).max()),
            "sims_maxabs": float(np.abs(np.asarray(sims, np.float32) - want_sims).max()),
            "top1_agree": float(
                (np.argmax(np.asarray(sims, np.float32), 1) == np.argmax(want_sims, 1)).mean()
            ),
        }
        del model, params, feats, frozen, sims

    print("\nFULLSCALE DRIFT TABLE:", drift)
    # fp32 port must be numerically tight at real dims
    assert drift["fp32"]["frozen_maxabs"] < 2e-3  # 23 accumulated fp32 layers
    assert drift["fp32"]["feats_maxabs"] < 5e-4   # l2-normalized features
    assert drift["fp32"]["sims_maxabs"] < 5e-4
    assert drift["fp32"]["top1_agree"] == 1.0
    # bf16 policy: features drift but rankings hold
    assert drift["bf16"]["feats_maxabs"] < 0.05
    assert drift["bf16"]["top1_agree"] == 1.0
