"""Composite parity: full CirAlignPrompt vs reference-math torch assembly.

Builds the reference flagship from its published pieces — the reference
Q-Former fork + EVA ViT (loaded standalone) + the documented glue equations
of blip2_qformer_cir_align_prompt.py:95-200 (train), :312-361 (inference),
:364-386 (extract_target_features) — then ports the weights into our model
and requires agreement on losses, inference scores and gallery features.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.cir_base import CirConfig
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.vit import ViTConfig
from sprc_tpu.interop.torch_import import (
    cir_align_prompt_params_from_torch,
    torch_state_dict_to_numpy,
)
from sprc_tpu.registry import registry

IMG = 28
PATCH = 14
VWIDTH = 32
VDEPTH = 2
HIDDEN = 48
HEADS = 2
LAYERS = 2
INTER = 96
Q = 4
VOCAB = 80
TXT = 8
EMBED = 16
B = 3

ATOL = 3e-5


@pytest.fixture(scope="module")
def torch_model(ref_qformer_module, ref_eva_vit_module):
    import torch
    import torch.nn as nn

    qmod = ref_qformer_module
    vmod = ref_eva_vit_module

    torch.manual_seed(0)

    bcfg = qmod.BertConfig(
        vocab_size=VOCAB,
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=INTER,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
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
                img_size=IMG,
                patch_size=PATCH,
                embed_dim=VWIDTH,
                depth=VDEPTH,
                num_heads=HEADS,
                mlp_ratio=4.0,
                qkv_bias=True,
                use_mean_pooling=False,
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

        # ---- reference equations (…cir_align_prompt.py:95-200) ----
        def forward(self, image, target, ids, mask):
            import torch.nn.functional as F

            image_embeds = self.ln_vision(self.visual_encoder(image))
            bs = image.shape[0]
            query_tokens = self.query_tokens.expand(bs, -1, -1)
            attn = torch.cat([torch.ones(bs, Q, dtype=mask.dtype), mask], dim=1)
            fusion = self.Qformer.bert(
                ids,
                query_embeds=query_tokens,
                attention_mask=attn,
                encoder_hidden_states=image_embeds,
                return_dict=True,
            ).last_hidden_state
            text_out = self.Qformer.bert(
                ids,
                query_embeds=fusion[:, :Q, :],
                attention_mask=attn,
                return_dict=True,
            ).last_hidden_state
            fusion_feats = F.normalize(self.text_proj(text_out[:, Q, :]), dim=-1)

            target_embeds = self.ln_vision(self.visual_encoder(target))
            target_out = self.Qformer.bert(
                query_embeds=query_tokens,
                encoder_hidden_states=target_embeds,
                return_dict=True,
            ).last_hidden_state
            target_feats = F.normalize(self.vision_proj(target_out), dim=-1)

            sim = torch.einsum("bd,nqd->bnq", fusion_feats, target_feats).max(-1).values
            sim = sim / self.temp
            labels = torch.arange(bs)
            loss_itc = F.cross_entropy(sim, labels)

            prompt = self.prompt_tokens.expand(bs, -1, -1)
            text_only = self.Qformer.bert(
                ids,
                query_embeds=prompt,
                attention_mask=attn,
                return_dict=True,
                no_img=True,
            ).last_hidden_state
            text_only_feat = F.normalize(self.text_proj(text_only[:, 0, :]), dim=-1)
            sim_r = torch.einsum("bd,nqd->bnq", text_only_feat, target_feats).max(-1).values
            loss_rtc = F.cross_entropy(sim_r / self.temp, labels)

            loss_align = F.mse_loss(
                fusion[:, :Q, :].mean(1), prompt.detach().mean(1)
            )
            return {
                "loss_itc": loss_itc,
                "loss_rtc": loss_rtc,
                "loss_align": loss_align,
            }

        # ---- eval contract (:312-386) ----
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
                ids,
                query_embeds=q,
                attention_mask=attn,
                encoder_hidden_states=reference_embeds,
                return_dict=True,
            ).last_hidden_state
            text_out = self.Qformer.bert(
                ids,
                query_embeds=fusion[:, :Q, :],
                attention_mask=attn,
                return_dict=True,
            ).last_hidden_state
            fusion_feats = F.normalize(self.text_proj(text_out[:, Q, :]), dim=-1)
            return torch.einsum("bd,nqd->bnq", fusion_feats, target_feats).max(-1).values

    return RefAssembly().eval()


@pytest.fixture(scope="module")
def jax_model(torch_model):
    vcfg = ViTConfig(
        image_size=IMG,
        patch_size=PATCH,
        width=VWIDTH,
        depth=VDEPTH,
        num_heads=HEADS,
        mlp_hidden=int(VWIDTH * 4.0),
        layer_norm_eps=1e-6,
        qkv_fused_no_kbias=True,
        dtype=jnp.float32,
    )
    qcfg = QFormerConfig(
        vocab_size=VOCAB,
        hidden_size=HIDDEN,
        num_layers=LAYERS,
        num_heads=HEADS,
        intermediate_size=INTER,
        encoder_width=VWIDTH,
        cross_attention_freq=2,
        query_length=Q,
        dropout_rate=0.0,
        attention_dropout_rate=0.0,
    )
    cfg = CirConfig(
        vit_model="eva_clip_g",
        image_size=IMG,
        num_query_token=Q,
        embed_dim=EMBED,
        max_txt_len=TXT,
        vocab_size=VOCAB,
        vit_dtype=jnp.float32,
        vit_config_override=vcfg,
        qformer_config_override=qcfg,
    )
    model = registry.get_model_class("blip2_cir_align_prompt")(cfg)
    sd = torch_state_dict_to_numpy(torch_model.state_dict())
    params = cir_align_prompt_params_from_torch(sd, model)
    return model, {"params": params}


@pytest.fixture(scope="module")
def inputs(rng):
    ref = rng.rand(B, 3, IMG, IMG).astype(np.float32)
    tgt = rng.rand(B, 3, IMG, IMG).astype(np.float32)
    ids = rng.randint(0, VOCAB, size=(B, TXT)).astype(np.int32)
    mask = np.ones((B, TXT), np.int32)
    mask[0, -3:] = 0
    return ref, tgt, ids, mask


def test_training_losses_parity(torch_model, jax_model, inputs):
    import torch

    ref, tgt, ids, mask = inputs
    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(ref),
            torch.from_numpy(tgt),
            torch.from_numpy(ids).long(),
            torch.from_numpy(mask).long(),
        )
    model, variables = jax_model
    got = model.apply(
        variables,
        jnp.asarray(ref.transpose(0, 2, 3, 1)),
        jnp.asarray(tgt.transpose(0, 2, 3, 1)),
        jnp.asarray(ids),
        jnp.asarray(mask),
    )
    for k in ("loss_itc", "loss_rtc", "loss_align"):
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), atol=ATOL, err_msg=k
        )


def test_extract_and_inference_parity(torch_model, jax_model, inputs):
    import torch

    ref, tgt, ids, mask = inputs
    gallery = np.concatenate([ref, tgt], axis=0)
    with torch.no_grad():
        want_feats, want_frozen = torch_model.extract_target_features(
            torch.from_numpy(gallery)
        )
        want_sims = torch_model.inference(
            want_frozen[:B],
            want_feats,
            torch.from_numpy(ids).long(),
            torch.from_numpy(mask).long(),
        ).numpy()

    model, variables = jax_model
    got_feats, got_frozen = model.apply(
        variables,
        jnp.asarray(gallery.transpose(0, 2, 3, 1)),
        method=model.extract_target_features,
    )
    np.testing.assert_allclose(np.asarray(got_frozen), want_frozen.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_feats), want_feats.numpy(), atol=ATOL)

    got_sims = model.apply(
        variables,
        got_frozen[:B],
        got_feats,
        jnp.asarray(ids),
        jnp.asarray(mask),
        method=model.inference,
    )
    np.testing.assert_allclose(np.asarray(got_sims), want_sims, atol=ATOL)
