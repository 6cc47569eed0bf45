"""Golden tests for the LAVIS-family checkpoint importers
(sprc_tpu/interop/lavis_import.py): reference torch towers (vit.py + med.py
loaded standalone) are assembled into containers with the released
checkpoints' key layout, imported through ``lavis_params_from_torch``, and
the JAX models' outputs compared against the torch compositions.

Covers: ALBEF retrieval (unimodal feats + fusion ITM), BLIP retrieval
([ENC] multimodal ITM), classification head, VQA encoder+decoder, BLIP
captioner decoder. NLVR's twin-cross encoder is explicitly unsupported
(lavis_import raises TypeError)."""

import pathlib
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import _load_module_with_shims
from sprc_tpu.interop.lavis_import import lavis_params_from_torch
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.vit import ViTConfig

IMG, PATCH, VW, VDEPTH = 32, 16, 32, 2
TH, TLAYERS, HEADS, TINTER, FUSION = 48, 4, 2, 96, 2
VOCAB, TXT, B, E, NCLS = 80, 6, 2, 16, 5
ATOL = 5e-5

VCFG = ViTConfig(
    image_size=IMG, patch_size=PATCH, width=VW, depth=VDEPTH, num_heads=HEADS,
    mlp_hidden=VW * 4, layer_norm_eps=1e-6, qkv_fused_no_kbias=False,
    final_norm=True, dtype=jnp.float32,
)


def _tcfg(vocab=VOCAB):
    return QFormerConfig(
        vocab_size=vocab, hidden_size=TH, num_layers=TLAYERS, num_heads=HEADS,
        intermediate_size=TINTER, encoder_width=VW, dropout_rate=0.0,
    )


def _ref_vit(ref_blip_vit_module, seed):
    import torch

    torch.manual_seed(seed)
    return ref_blip_vit_module.VisionTransformer(
        img_size=IMG, patch_size=PATCH, embed_dim=VW, depth=VDEPTH,
        num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    )


def _ref_bert_cfg(mod, *, fusion=None, cross=True):
    cfg = mod.BertConfig(
        vocab_size=VOCAB, hidden_size=TH, num_hidden_layers=TLAYERS,
        num_attention_heads=HEADS, intermediate_size=TINTER,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfg.encoder_width = VW
    cfg.add_cross_attention = cross
    cfg.add_type_embeddings = False
    if fusion is not None:  # ALBEF flavor; BLIP configs carry no fusion_layer
        cfg.fusion_layer = fusion
    return cfg


def _randomize(model, seed):
    import torch

    torch.manual_seed(seed)
    with torch.no_grad():
        for _, p in model.named_parameters():
            if p.ndim > 0:
                p.copy_(torch.randn_like(p) * 0.05)


@pytest.fixture()
def data(rng):
    img = rng.rand(B, IMG, IMG, 3).astype(np.float32)
    ids = rng.randint(0, VOCAB, (B, TXT)).astype(np.int32)
    mask = np.ones((B, TXT), np.int32)
    mask[1, 4:] = 0
    return img, ids, mask


def _timg(img):
    import torch

    return torch.from_numpy(img).permute(0, 3, 1, 2).contiguous()


def test_albef_retrieval_import_golden(
    ref_blip_vit_module, ref_med_module, rng, data
):
    """unimodal feats + fusion-mode ITM CLS vs the torch composition
    (albef_retrieval.py:64-130 + compute_sim_matrix's itm rescoring)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from sprc_tpu.models.albef import AlbefConfig, AlbefRetrieval

    img, ids, mask = data

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = _ref_vit(ref_blip_vit_module, 11)
            self.text_encoder = ref_med_module.BertModel(
                _ref_bert_cfg(ref_med_module, fusion=FUSION),
                add_pooling_layer=False,
            )
            self.vision_proj = nn.Linear(VW, E)
            self.text_proj = nn.Linear(TH, E)
            self.itm_head = nn.Linear(TH, 2)
            self.temp = nn.Parameter(torch.ones([]) * 0.07)

    ref = Container().eval()
    _randomize(ref, 12)
    with torch.no_grad():
        ref.temp.copy_(torch.tensor(0.07))
        v_emb = ref.visual_encoder(_timg(img))
        v_feat = F.normalize(ref.vision_proj(v_emb[:, 0, :]), dim=-1)
        t_emb = ref.text_encoder(
            torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            mode="text", return_dict=True,
        ).last_hidden_state
        t_feat = F.normalize(ref.text_proj(t_emb[:, 0, :]), dim=-1)
        fused = ref.text_encoder(
            encoder_embeds=t_emb,
            attention_mask=torch.from_numpy(mask).long(),
            encoder_hidden_states=v_emb, mode="fusion", return_dict=True,
        ).last_hidden_state
        itm = ref.itm_head(fused[:, 0, :])

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = AlbefConfig(
        image_size=IMG, embed_dim=E, max_txt_len=TXT, vocab_size=VOCAB,
        fusion_layer=FUSION, vit_dtype=jnp.float32,
        vit_config_override=VCFG, text_config_override=_tcfg(),
    )
    model = AlbefRetrieval(cfg)
    params = lavis_params_from_torch(sd, model)

    j_vemb, j_vfeat, j_temb, j_tfeat = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(ids),
        jnp.asarray(mask), method=model.unimodal,
    )
    cls = model.apply(
        {"params": params}, j_temb, jnp.asarray(mask), j_vemb,
        method=model.fusion_cls,
    )

    def head(p, x):  # itm head on the fusion CLS
        return np.asarray(x) @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    np.testing.assert_allclose(np.asarray(j_vemb), v_emb.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_vfeat), v_feat.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_temb), t_emb.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_tfeat), t_feat.numpy(), atol=ATOL)
    np.testing.assert_allclose(
        head(params["itm_head"], cls), itm.numpy(), atol=1e-4
    )


def test_blip_retrieval_import_golden(
    ref_blip_vit_module, ref_med_module, rng, data
):
    """BLIP flavor: text mode spans ALL layers, cross-attention keys on every
    layer, ITM via the [ENC] multimodal pass (blip_retrieval.py:221-233)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from sprc_tpu.models.blip1 import BlipRetrieval, BlipRetrievalConfig

    img, ids, mask = data

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = _ref_vit(ref_blip_vit_module, 21)
            self.text_encoder = ref_med_module.BertModel(
                _ref_bert_cfg(ref_med_module, fusion=None),
                add_pooling_layer=False,
            )
            self.vision_proj = nn.Linear(VW, E)
            self.text_proj = nn.Linear(TH, E)
            self.itm_head = nn.Linear(TH, 2)
            self.temp = nn.Parameter(torch.ones([]) * 0.07)

    ref = Container().eval()
    _randomize(ref, 22)
    with torch.no_grad():
        ref.temp.copy_(torch.tensor(0.07))
        v_emb = ref.visual_encoder(_timg(img))
        t_emb = ref.text_encoder(
            torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            mode="text", return_dict=True,
        ).last_hidden_state
        t_feat = F.normalize(ref.text_proj(t_emb[:, 0, :]), dim=-1)
        multi = ref.text_encoder(
            torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            encoder_hidden_states=v_emb,
            encoder_attention_mask=torch.ones(v_emb.shape[:-1]).long(),
            mode="multimodal", return_dict=True,
        ).last_hidden_state
        itm = ref.itm_head(multi[:, 0, :])

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = BlipRetrievalConfig(
        image_size=IMG, embed_dim=E, max_txt_len=TXT, vocab_size=VOCAB,
        vit_dtype=jnp.float32,
        vit_config_override=VCFG, text_config_override=_tcfg(),
    )
    model = BlipRetrieval(cfg)
    params = lavis_params_from_torch(sd, model)

    _, _, j_temb, j_tfeat = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(ids),
        jnp.asarray(mask), method=model.unimodal,
    )
    j_itm = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(np.asarray(v_emb)), method=model.itm_logits,
    )

    np.testing.assert_allclose(np.asarray(j_temb), t_emb.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_tfeat), t_feat.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_itm), itm.numpy(), atol=1e-4)


def test_classifier_import_golden(ref_blip_vit_module, ref_med_module, rng, data):
    """ALBEF classification: multimodal pass + Sequential cls head
    (albef_classification.py:83-147; cls_head.0/cls_head.2 keys)."""
    import torch
    import torch.nn as nn

    from sprc_tpu.models.classification import ClassifierConfig, MultimodalClassifier

    img, ids, mask = data

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = _ref_vit(ref_blip_vit_module, 31)
            self.text_encoder = ref_med_module.BertModel(
                _ref_bert_cfg(ref_med_module, fusion=FUSION),
                add_pooling_layer=False,
            )
            self.cls_head = nn.Sequential(
                nn.Linear(TH, TH), nn.ReLU(), nn.Linear(TH, NCLS)
            )

    ref = Container().eval()
    _randomize(ref, 32)
    with torch.no_grad():
        v_emb = ref.visual_encoder(_timg(img))
        multi = ref.text_encoder(
            torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            encoder_hidden_states=v_emb,
            encoder_attention_mask=torch.ones(v_emb.shape[:-1]).long(),
            mode="multimodal", return_dict=True,
        ).last_hidden_state
        want = ref.cls_head(multi[:, 0, :])

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = ClassifierConfig(
        image_size=IMG, num_classes=NCLS, vocab_size=VOCAB,
        fusion_layer=FUSION, vit_dtype=jnp.float32,
        vit_config_override=VCFG, text_config_override=_tcfg(),
    )
    model = MultimodalClassifier(cfg)
    params = lavis_params_from_torch(sd, model)
    got = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(ids),
        jnp.asarray(mask), method=model.predict,
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_vqa_import_golden(ref_blip_vit_module, ref_med_module, rng, data):
    """ALBEF VQA: question encoder states + answer-decoder LM logits vs the
    torch composition (albef_vqa.py:348-375: XBertEncoder + BertLMHeadModel,
    decoder fusion_layer=0 -> cross on every decoder layer)."""
    import torch
    import torch.nn as nn

    from sprc_tpu.models.vqa import VQAConfig, VQAModel

    img, ids, mask = data
    La = 5
    ans_ids = rng.randint(0, VOCAB, (B, La)).astype(np.int32)
    ans_mask = np.ones((B, La), np.int32)

    dec_cfg = _ref_bert_cfg(ref_med_module, fusion=0)
    dec_cfg.encoder_width = TH  # decoder cross-attends question states

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = _ref_vit(ref_blip_vit_module, 41)
            self.text_encoder = ref_med_module.BertModel(
                _ref_bert_cfg(ref_med_module, fusion=FUSION),
                add_pooling_layer=False,
            )
            self.text_decoder = ref_med_module.BertLMHeadModel(dec_cfg)

    ref = Container().eval()
    _randomize(ref, 42)
    with torch.no_grad():
        v_emb = ref.visual_encoder(_timg(img))
        q_states = ref.text_encoder(
            torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            encoder_hidden_states=v_emb,
            encoder_attention_mask=torch.ones(v_emb.shape[:-1]).long(),
            mode="multimodal", return_dict=True,
        ).last_hidden_state
        want = ref.text_decoder(
            torch.from_numpy(ans_ids).long(),
            attention_mask=torch.from_numpy(ans_mask).long(),
            encoder_hidden_states=q_states,
            encoder_attention_mask=torch.from_numpy(mask).long(),
            is_decoder=True, mode="multimodal", return_logits=True,
        )

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    dcfg = QFormerConfig(
        vocab_size=VOCAB, hidden_size=TH, num_layers=TLAYERS, num_heads=HEADS,
        intermediate_size=TINTER, encoder_width=TH, dropout_rate=0.0,
    )
    cfg = VQAConfig(
        image_size=IMG, vocab_size=VOCAB, fusion_layer=FUSION, flavor="albef",
        vit_dtype=jnp.float32, vit_config_override=VCFG,
        text_config_override=_tcfg(), decoder_config_override=dcfg,
    )
    model = VQAModel(cfg)
    params = lavis_params_from_torch(sd, model)

    j_states = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(ids),
        jnp.asarray(mask), method=model.encode_question,
    )
    j_logits = model.apply(
        {"params": params}, jnp.asarray(ans_ids), jnp.asarray(ans_mask),
        j_states, jnp.asarray(mask), method=model.decode_logits,
    )
    np.testing.assert_allclose(np.asarray(j_states), q_states.numpy(), atol=ATOL)
    # reference return_logits drops the last position (med.py:1238-1239)
    np.testing.assert_allclose(
        np.asarray(j_logits)[:, :-1, :], want.numpy(), atol=2e-4
    )


def test_blip_caption_import_golden(ref_blip_vit_module, ref_med_module, rng, data):
    """BLIP captioner: causal decoder over image cross-attention
    (blip_caption.py: XBertLMHeadDecoder under ``text_decoder.``)."""
    import torch
    import torch.nn as nn

    from sprc_tpu.models.blip1 import BlipCaption, BlipCaptionConfig

    img, ids, mask = data

    dec_cfg = _ref_bert_cfg(ref_med_module, fusion=None)  # BLIP: cross everywhere

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = _ref_vit(ref_blip_vit_module, 51)
            self.text_decoder = ref_med_module.BertLMHeadModel(dec_cfg)

    ref = Container().eval()
    _randomize(ref, 52)
    with torch.no_grad():
        v_emb = ref.visual_encoder(_timg(img))
        want = ref.text_decoder(
            torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            encoder_hidden_states=v_emb,
            encoder_attention_mask=torch.ones(v_emb.shape[:-1]).long(),
            is_decoder=True, mode="multimodal", return_logits=True,
        )

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = BlipCaptionConfig(
        image_size=IMG, vocab_size=VOCAB, vit_dtype=jnp.float32,
        vit_config_override=VCFG, text_config_override=_tcfg(),
    )
    model = BlipCaption(cfg)
    params = lavis_params_from_torch(sd, model)

    def _logits(mdl, images, i, m):
        emb = mdl.visual_encoder(images).astype(jnp.float32)
        return mdl.decode_logits(i, m, emb)

    got = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(ids),
        jnp.asarray(mask), method=_logits,
    )
    # reference return_logits drops the last position (med.py:1238-1239)
    np.testing.assert_allclose(
        np.asarray(got)[:, :-1, :], want.numpy(), atol=2e-4
    )


def test_blip2_t5_import_golden(ref_qformer_module, ref_eva_vit_module, rng):
    """Stage-2 blip2_t5 checkpoint import: reference EVA + Q-Former fork +
    HF T5 under ``t5_model.`` assembled with the released key layout; the
    seq2seq LM loss on imported weights must match the torch composition
    (reference blip2_models/blip2_t5.py:60-107 forward)."""
    import torch
    import torch.nn as nn
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration as HFT5

    from sprc_tpu.models.blip2_t5 import Blip2T5
    from sprc_tpu.models.cir_base import CirConfig
    from sprc_tpu.models.t5 import T5Config

    IMG28, PATCH14, VWIDTH, VDEPTH2 = 28, 14, 32, 2
    HIDDEN, L2, H2, INTER96, Q4, TVOCAB, TXT8 = 48, 2, 2, 96, 4, 60, 8
    TD, TKV, TFF, TH4, TL = 32, 8, 64, 4, 2

    torch.manual_seed(91)
    bcfg = ref_qformer_module.BertConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=L2,
        num_attention_heads=H2, intermediate_size=INTER96,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    bcfg.encoder_width = VWIDTH
    bcfg.add_cross_attention = True
    bcfg.cross_attention_freq = 2
    bcfg.query_length = Q4

    hfcfg = HFT5Config(
        vocab_size=TVOCAB, d_model=TD, d_kv=TKV, d_ff=TFF, num_layers=TL,
        num_decoder_layers=TL, num_heads=TH4, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, dropout_rate=0.0,
        decoder_start_token_id=0, pad_token_id=0,
    )

    class QformerWrapper(nn.Module):
        def __init__(self):
            super().__init__()
            self.bert = ref_qformer_module.BertModel(bcfg, add_pooling_layer=False)

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = ref_eva_vit_module.VisionTransformer(
                img_size=IMG28, patch_size=PATCH14, embed_dim=VWIDTH,
                depth=VDEPTH2, num_heads=H2, mlp_ratio=4.0, qkv_bias=True,
                use_mean_pooling=False,
                norm_layer=lambda d: nn.LayerNorm(d, eps=1e-6),
            )
            self.ln_vision = nn.LayerNorm(VWIDTH)
            self.Qformer = QformerWrapper()
            self.query_tokens = nn.Parameter(torch.randn(1, Q4, HIDDEN) * 0.02)
            self.t5_model = HFT5(hfcfg)
            self.t5_proj = nn.Linear(HIDDEN, TD)

    ref = Container().eval()
    _randomize(ref, 92)

    Bsz = 2
    img = rng.rand(Bsz, IMG28, IMG28, 3).astype(np.float32)
    in_ids = rng.randint(1, TVOCAB, (Bsz, TXT8)).astype(np.int32)
    in_mask = np.ones((Bsz, TXT8), np.int32)
    in_mask[1, 5:] = 0
    out_ids = rng.randint(1, TVOCAB, (Bsz, TXT8)).astype(np.int32)
    out_ids[0, 6:] = 0  # right pads
    out_mask = (out_ids != 0).astype(np.int32)

    with torch.no_grad():
        v = ref.ln_vision(ref.visual_encoder(_timg(img)))
        q = ref.Qformer.bert(
            query_embeds=ref.query_tokens.expand(Bsz, -1, -1),
            encoder_hidden_states=v,
            encoder_attention_mask=torch.ones(v.shape[:-1]).long(),
            return_dict=True,
        ).last_hidden_state
        inputs_t5 = ref.t5_proj(q)
        tok = ref.t5_model.encoder.embed_tokens(torch.from_numpy(in_ids).long())
        embeds = torch.cat([inputs_t5, tok], dim=1)
        emask = torch.cat(
            [torch.ones(Bsz, Q4).long(), torch.from_numpy(in_mask).long()], dim=1
        )
        labels = torch.from_numpy(out_ids).long()
        labels[labels == 0] = -100
        want_loss = ref.t5_model(
            inputs_embeds=embeds, attention_mask=emask, labels=labels
        ).loss

    sd = {k: v_.detach().numpy() for k, v_ in ref.state_dict().items()}

    from sprc_tpu.models.vit import ViTConfig

    vcfg = ViTConfig(
        image_size=IMG28, patch_size=PATCH14, width=VWIDTH, depth=VDEPTH2,
        num_heads=H2, mlp_hidden=4 * VWIDTH, layer_norm_eps=1e-6,
        qkv_fused_no_kbias=True, dtype=jnp.float32,
    )
    qcfg = QFormerConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=L2, num_heads=H2,
        intermediate_size=INTER96, encoder_width=VWIDTH, query_length=Q4,
        cross_attention_freq=2, dropout_rate=0.0,
    )
    cir = CirConfig(
        vit_model="eva_clip_g", image_size=IMG28, num_query_token=Q4,
        max_txt_len=TXT8, vocab_size=VOCAB, vit_dtype=jnp.float32,
        qformer_dtype=jnp.float32, vit_config_override=vcfg,
        qformer_config_override=qcfg,
    )
    tcfg = T5Config(
        vocab_size=TVOCAB, d_model=TD, d_kv=TKV, d_ff=TFF, num_heads=TH4,
        num_layers=TL, num_decoder_layers=TL, gated_act=True,
        tie_word_embeddings=False, dtype=jnp.float32,
    )
    model = Blip2T5(cfg=cir, t5_config=tcfg)
    params = lavis_params_from_torch(sd, model)
    got = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(in_ids),
        jnp.asarray(in_mask), jnp.asarray(out_ids), jnp.asarray(out_mask),
    )
    np.testing.assert_allclose(
        float(got["loss"]), float(want_loss), atol=3e-5, rtol=1e-4
    )


def test_blip2_opt_import_golden(ref_qformer_module, ref_eva_vit_module, rng):
    """Stage-2 blip2_opt checkpoint import: LM caption loss on imported
    weights vs the torch composition (blip2_models/blip2_opt.py:52-96;
    OPT under ``opt_model.``)."""
    import torch
    import torch.nn as nn
    from transformers import OPTConfig as HFOPTConfig
    from transformers import OPTForCausalLM as HFOPT

    from sprc_tpu.models.blip2_opt import Blip2OPT
    from sprc_tpu.models.cir_base import CirConfig
    from sprc_tpu.models.opt import OPTConfig
    from sprc_tpu.models.vit import ViTConfig

    IMG28, PATCH14, VWIDTH, VDEPTH2 = 28, 14, 32, 2
    HIDDEN, L2, H2, INTER96, Q4, OVOCAB, TXT8 = 48, 2, 2, 96, 4, 60, 8
    OD, OFF, OH, OL = 32, 64, 4, 2

    torch.manual_seed(101)
    bcfg = ref_qformer_module.BertConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=L2,
        num_attention_heads=H2, intermediate_size=INTER96,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    bcfg.encoder_width = VWIDTH
    bcfg.add_cross_attention = True
    bcfg.cross_attention_freq = 2
    bcfg.query_length = Q4

    hfcfg = HFOPTConfig(
        vocab_size=OVOCAB, hidden_size=OD, ffn_dim=OFF,
        num_hidden_layers=OL, num_attention_heads=OH,
        max_position_embeddings=64, word_embed_proj_dim=OD,
        do_layer_norm_before=True, dropout=0.0, pad_token_id=1,
    )

    class QformerWrapper(nn.Module):
        def __init__(self):
            super().__init__()
            self.bert = ref_qformer_module.BertModel(bcfg, add_pooling_layer=False)

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = ref_eva_vit_module.VisionTransformer(
                img_size=IMG28, patch_size=PATCH14, embed_dim=VWIDTH,
                depth=VDEPTH2, num_heads=H2, mlp_ratio=4.0, qkv_bias=True,
                use_mean_pooling=False,
                norm_layer=lambda d: nn.LayerNorm(d, eps=1e-6),
            )
            self.ln_vision = nn.LayerNorm(VWIDTH)
            self.Qformer = QformerWrapper()
            self.query_tokens = nn.Parameter(torch.randn(1, Q4, HIDDEN) * 0.02)
            self.opt_model = HFOPT(hfcfg)
            self.opt_proj = nn.Linear(HIDDEN, OD)

    ref = Container().eval()
    _randomize(ref, 102)

    Bsz = 2
    img = rng.rand(Bsz, IMG28, IMG28, 3).astype(np.float32)
    ids = rng.randint(2, OVOCAB, (Bsz, TXT8)).astype(np.int32)
    ids[1, 6:] = 1  # right pads (OPT pad id 1)
    mask = (ids != 1).astype(np.int32)

    with torch.no_grad():
        v = ref.ln_vision(ref.visual_encoder(_timg(img)))
        q = ref.Qformer.bert(
            query_embeds=ref.query_tokens.expand(Bsz, -1, -1),
            encoder_hidden_states=v,
            encoder_attention_mask=torch.ones(v.shape[:-1]).long(),
            return_dict=True,
        ).last_hidden_state
        inputs_opt = ref.opt_proj(q)
        tok = ref.opt_model.model.decoder.embed_tokens(
            torch.from_numpy(ids).long()
        )
        embeds = torch.cat([inputs_opt, tok], dim=1)
        emask = torch.cat(
            [torch.ones(Bsz, Q4).long(), torch.from_numpy(mask).long()], dim=1
        )
        tlabels = torch.from_numpy(ids).long()
        tlabels[tlabels == 1] = -100
        tlabels = torch.cat(
            [torch.full((Bsz, Q4), -100).long(), tlabels], dim=1
        )
        want_loss = ref.opt_model(
            inputs_embeds=embeds, attention_mask=emask, labels=tlabels
        ).loss

    sd = {k: v_.detach().numpy() for k, v_ in ref.state_dict().items()}

    vcfg = ViTConfig(
        image_size=IMG28, patch_size=PATCH14, width=VWIDTH, depth=VDEPTH2,
        num_heads=H2, mlp_hidden=4 * VWIDTH, layer_norm_eps=1e-6,
        qkv_fused_no_kbias=True, dtype=jnp.float32,
    )
    qcfg = QFormerConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=L2, num_heads=H2,
        intermediate_size=INTER96, encoder_width=VWIDTH, query_length=Q4,
        cross_attention_freq=2, dropout_rate=0.0,
    )
    cir = CirConfig(
        vit_model="eva_clip_g", image_size=IMG28, num_query_token=Q4,
        max_txt_len=TXT8, vocab_size=VOCAB, vit_dtype=jnp.float32,
        qformer_dtype=jnp.float32, vit_config_override=vcfg,
        qformer_config_override=qcfg,
    )
    ocfg = OPTConfig(
        vocab_size=OVOCAB, hidden_size=OD, ffn_dim=OFF, num_layers=OL,
        num_heads=OH, max_positions=64, dtype=jnp.float32,
    )
    model = Blip2OPT(cfg=cir, opt_config=ocfg)
    params = lavis_params_from_torch(sd, model)
    got = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(ids),
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        float(got["loss"]), float(want_loss), atol=3e-5, rtol=1e-4
    )


def test_albef_state_from_torch(ref_blip_vit_module, ref_med_module, rng, data):
    """Momentum copies (*_m keys) + queues lift into the functional aux
    state; the momentum subtree must equal re-importing the _m weights."""
    import torch
    import torch.nn as nn

    from sprc_tpu.interop.lavis_import import albef_state_from_torch
    from sprc_tpu.models.albef import AlbefConfig, AlbefRetrieval

    img, ids, mask = data
    QS = 8

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = _ref_vit(ref_blip_vit_module, 81)
            self.text_encoder = ref_med_module.BertModel(
                _ref_bert_cfg(ref_med_module, fusion=FUSION),
                add_pooling_layer=False,
            )
            self.vision_proj = nn.Linear(VW, E)
            self.text_proj = nn.Linear(TH, E)
            self.itm_head = nn.Linear(TH, 2)
            self.temp = nn.Parameter(torch.ones([]) * 0.07)
            # momentum twins (reference model_pairs) + queues
            self.visual_encoder_m = _ref_vit(ref_blip_vit_module, 82)
            self.text_encoder_m = ref_med_module.BertModel(
                _ref_bert_cfg(ref_med_module, fusion=FUSION),
                add_pooling_layer=False,
            )
            self.vision_proj_m = nn.Linear(VW, E)
            self.text_proj_m = nn.Linear(TH, E)
            self.register_buffer("image_queue", torch.randn(E, QS))
            self.register_buffer("text_queue", torch.randn(E, QS))
            self.register_buffer("idx_queue", torch.full((1, QS), -100).long())
            self.register_buffer("queue_ptr", torch.zeros(1).long())

    ref = Container().eval()
    _randomize(ref, 83)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = AlbefConfig(
        image_size=IMG, embed_dim=E, max_txt_len=TXT, vocab_size=VOCAB,
        fusion_layer=FUSION, queue_size=QS, vit_dtype=jnp.float32,
        vit_config_override=VCFG, text_config_override=_tcfg(),
    )
    model = AlbefRetrieval(cfg)
    params = lavis_params_from_torch(sd, model)
    state = albef_state_from_torch(sd, model, params)

    # the _m twins were randomized differently from the online weights
    on = np.asarray(params["vision_proj"]["kernel"])
    mo = np.asarray(state["params_m"]["vision_proj"]["kernel"])
    assert not np.allclose(on, mo)
    np.testing.assert_allclose(
        mo, np.asarray(sd["vision_proj_m.weight"]).T, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state["image_queue"]), sd["image_queue"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state["idx_queue"]), sd["idx_queue"].reshape(-1), atol=0
    )
    assert int(state["ptr"]) == 0


def test_albef_pretrain_import_golden(
    ref_blip_vit_module, ref_med_module, rng, data
):
    """ALBEF pretrain checkpoints wrap the text tower in BertForMaskedLM
    (albef_pretrain.py:388-394): keys under ``text_encoder.bert.`` plus the
    MLM head under ``text_encoder.cls.predictions.`` -> ``mlm_head``."""
    import torch
    import torch.nn as nn

    from sprc_tpu.models.albef import AlbefConfig, AlbefPretrain

    img, ids, mask = data

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = _ref_vit(ref_blip_vit_module, 111)
            self.text_encoder = ref_med_module.BertForMaskedLM(
                _ref_bert_cfg(ref_med_module, fusion=FUSION)
            )
            self.vision_proj = nn.Linear(VW, E)
            self.text_proj = nn.Linear(TH, E)
            self.itm_head = nn.Linear(TH, 2)
            self.temp = nn.Parameter(torch.ones([]) * 0.07)

    ref = Container().eval()
    _randomize(ref, 112)
    with torch.no_grad():
        v_emb = ref.visual_encoder(_timg(img))
        want = ref.text_encoder(
            torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            encoder_hidden_states=v_emb,
            encoder_attention_mask=torch.ones(v_emb.shape[:-1]).long(),
            mode="multimodal", return_logits=True,
        )

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = AlbefConfig(
        image_size=IMG, embed_dim=E, max_txt_len=TXT, vocab_size=VOCAB,
        fusion_layer=FUSION, vit_dtype=jnp.float32,
        vit_config_override=VCFG, text_config_override=_tcfg(),
    )
    model = AlbefPretrain(cfg)
    params = lavis_params_from_torch(sd, model)
    got = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(np.asarray(v_emb)), method=model.mlm_logits,
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)


def test_albef_nlvr_import_golden(ref_blip_vit_module, ref_med_module, rng, data):
    """ALBEF NLVR: alternating-image cross with K/V tied per layer pair
    (albef_nlvr.py:102-140 + share_cross_attention :198-211)."""
    import torch
    import torch.nn as nn

    from sprc_tpu.models.nlvr import NLVRClassifier, NLVRConfig

    img, ids, mask = data
    img1 = rng.rand(B, IMG, IMG, 3).astype(np.float32)

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = _ref_vit(ref_blip_vit_module, 61)
            self.text_encoder = ref_med_module.BertModel(
                _ref_bert_cfg(ref_med_module, fusion=FUSION),
                add_pooling_layer=False,
            )
            self.cls_head = nn.Sequential(
                nn.Linear(TH, TH), nn.ReLU(), nn.Linear(TH, NCLS)
            )

    ref = Container().eval()
    _randomize(ref, 62)
    # share_cross_attention: tie cross K/V across each layer pair
    layers = ref.text_encoder.encoder.layer
    for p in range((TLAYERS - FUSION + 1) // 2):
        m0 = layers[FUSION + 2 * p].crossattention.self
        m1 = layers[FUSION + 2 * p + 1].crossattention.self
        m0.key.weight = m1.key.weight
        m0.key.bias = m1.key.bias
        m0.value.weight = m1.value.weight
        m0.value.bias = m1.value.bias

    with torch.no_grad():
        embeds = ref.visual_encoder(
            torch.cat([_timg(img), _timg(img1)], dim=0)
        )
        e0, e1 = embeds[:B], embeds[B:]
        atts = torch.ones(e0.shape[:-1]).long()
        out = ref.text_encoder(
            torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            encoder_hidden_states=[e0, e1],
            encoder_attention_mask=[atts, atts],
            mode="multimodal", return_dict=True,
        ).last_hidden_state
        want = ref.cls_head(out[:, 0, :])

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = NLVRConfig(
        flavor="albef", num_classes=NCLS, image_size=IMG, vocab_size=VOCAB,
        fusion_layer=FUSION, vit_dtype=jnp.float32,
        vit_config_override=VCFG, text_config_override=_tcfg(),
    )
    model = NLVRClassifier(cfg)
    params = lavis_params_from_torch(sd, model)
    got = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(img1),
        jnp.asarray(ids), jnp.asarray(mask), method=model.predict,
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


@pytest.fixture(scope="session")
def ref_clip_vendored_module():
    """Reference vendored OpenCLIP (clip_models/model.py), loaded as a
    package member so its relative ``.pretrained`` import resolves; the
    tokenizer submodule is faked (ftfy isn't installed and tokenize is
    unused here)."""
    import importlib.util
    import sys
    import types

    import torch.nn as nn

    class _FakeRegistry:
        def register_model(self, name):
            return lambda cls: cls

    base = pathlib.Path("/root/reference/src/lavis/models/clip_models")
    if not (base / "model.py").exists():
        pytest.skip("reference clip_models not present")
    pkg = types.ModuleType("ref_clipm")
    pkg.__path__ = [str(base)]
    sys.modules.setdefault("ref_clipm", pkg)
    tok = types.ModuleType("ref_clipm.tokenizer")
    tok.tokenize = lambda *a, **k: None
    sys.modules["ref_clipm.tokenizer"] = tok
    spec = importlib.util.spec_from_file_location(
        "ref_clipm.pretrained", str(base / "pretrained.py")
    )
    pre = importlib.util.module_from_spec(spec)
    sys.modules["ref_clipm.pretrained"] = pre
    spec.loader.exec_module(pre)

    class _Out:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    shims = {
        "lavis.common.registry": {"registry": _FakeRegistry()},
        "lavis.common.utils": {"get_abs_path": lambda p: p},
        "lavis.models.base_model": {"BaseModel": nn.Module},
        "lavis.models.clip_models.clip_outputs": {
            "ClipOutput": _Out, "ClipOutputFeatures": _Out,
        },
        "lavis.models.clip_models.timm_model": {"TimmModel": object},
        "lavis.models.clip_models.transform": {
            "image_transform": lambda *a, **k: None
        },
        "lavis.models.clip_models.utils": {
            "freeze_batch_norm_2d": lambda m: m
        },
        "lavis.tasks.multimodal_classification": {
            "MultimodalClassificationTask": object
        },
    }
    mod = _load_module_with_shims(base / "model.py", "ref_clipm.model", shims)
    if mod is None:
        pytest.skip("reference clip model.py not loadable")
    return mod


def test_clip_openai_import_golden(ref_clip_vendored_module, rng):
    """OpenAI-format CLIP import: encode_image / encode_text / logits on
    imported weights vs the reference vendored CLIP (clip_models/model.py:
    409-570) at tiny dims (ViT tower; quick_gelu as the released OpenAI
    checkpoints use)."""
    import torch

    from sprc_tpu.models.clip import Clip, ClipConfig, ClipTextConfig
    from sprc_tpu.models.vit import ViTConfig

    mod = ref_clip_vendored_module
    CW, CD, CTX, CVOC, CTW, CE = 64, 2, 12, 60, 32, 16

    torch.manual_seed(121)
    ref = mod.CLIP(
        embed_dim=CE,
        vision_cfg=mod.CLIPVisionCfg(layers=CD, width=CW, patch_size=16,
                                     image_size=32),
        text_cfg=mod.CLIPTextCfg(context_length=CTX, vocab_size=CVOC,
                                 width=CTW, heads=2, layers=CD),
        quick_gelu=True,
    ).eval()
    _randomize(ref, 122)

    imgs = rng.rand(2, 32, 32, 3).astype(np.float32)
    ids = rng.randint(1, CVOC - 1, (2, CTX)).astype(np.int32)
    ids[:, -1] = CVOC - 1  # eot = highest id, at the last position
    with torch.no_grad():
        t_img = ref.encode_image(_timg(imgs))
        t_txt = ref.encode_text(torch.from_numpy(ids).long())

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = ClipConfig(
        embed_dim=CE, image_size=32,
        vision=ViTConfig(
            image_size=32, patch_size=16, width=CW, depth=CD,
            num_heads=CW // 64, mlp_hidden=4 * CW, layer_norm_eps=1e-5,
            use_ln_pre=True, quick_gelu=True, final_norm=True,
            patch_bias=False, dtype=jnp.float32,
        ),
        text=ClipTextConfig(vocab_size=CVOC, width=CTW, layers=CD, heads=2,
                            context_length=CTX),
    )
    model = Clip(cfg)
    params = lavis_params_from_torch(sd, model)
    eot = jnp.asarray(np.argmax(ids, axis=1))
    j_img = model.apply({"params": params}, jnp.asarray(imgs),
                        method=model.encode_image)
    j_txt = model.apply({"params": params}, jnp.asarray(ids), eot,
                        method=model.encode_text)
    np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_txt), t_txt.numpy(), atol=1e-4)


@pytest.fixture(scope="session")
def ref_nlvr_encoder_module(ref_qformer_module):
    """Reference nlvr_encoder.py standalone (transformers shims come from
    the qformer fixture's modeling_utils patch)."""
    import importlib.util
    import pathlib

    path = pathlib.Path(
        "/root/reference/src/lavis/models/blip_models/nlvr_encoder.py"
    )
    if not path.exists():
        pytest.skip("reference nlvr_encoder.py not present")
    spec = importlib.util.spec_from_file_location("ref_nlvr_encoder", str(path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_blip_nlvr_import_golden(
    ref_blip_vit_module, ref_nlvr_encoder_module, rng, data
):
    """BLIP NLVR: twin cross every layer, avg below layer 6, concat+merge
    from layer 6 (nlvr_encoder.py:291-380; merge threshold hardcoded at 6,
    so the tiny config runs 8 layers to cover both branches)."""
    import torch
    import torch.nn as nn

    from sprc_tpu.models.nlvr import NLVRClassifier, NLVRConfig

    NL = 8  # >= 7 so layers 6-7 exercise the merge branch
    img, ids, mask = data
    img1 = rng.rand(B, IMG, IMG, 3).astype(np.float32)

    cfgb = ref_nlvr_encoder_module.BertConfig(
        vocab_size=VOCAB, hidden_size=TH, num_hidden_layers=NL,
        num_attention_heads=HEADS, intermediate_size=TINTER,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfgb.encoder_width = VW
    cfgb.add_cross_attention = True

    class Container(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = _ref_vit(ref_blip_vit_module, 71)
            self.text_encoder = ref_nlvr_encoder_module.BertModel(
                cfgb, add_pooling_layer=False
            )
            self.cls_head = nn.Sequential(
                nn.Linear(TH, TH), nn.ReLU(), nn.Linear(TH, NCLS)
            )

    ref = Container().eval()
    _randomize(ref, 72)
    with torch.no_grad():
        embeds = ref.visual_encoder(
            torch.cat([_timg(img), _timg(img1)], dim=0)
        )
        e0, e1 = embeds[:B], embeds[B:]
        atts = torch.ones(e0.shape[:-1]).long()
        out = ref.text_encoder(
            torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            encoder_hidden_states=[e0, e1],
            encoder_attention_mask=[atts, atts],
            return_dict=True,
        ).last_hidden_state
        want = ref.cls_head(out[:, 0, :])

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tcfg = QFormerConfig(
        vocab_size=VOCAB, hidden_size=TH, num_layers=NL, num_heads=HEADS,
        intermediate_size=TINTER, encoder_width=VW, dropout_rate=0.0,
    )
    cfg = NLVRConfig(
        flavor="blip", num_classes=NCLS, image_size=IMG, vocab_size=VOCAB,
        fusion_layer=6, vit_dtype=jnp.float32,
        vit_config_override=VCFG, text_config_override=tcfg,
    )
    model = NLVRClassifier(cfg)
    params = lavis_params_from_torch(sd, model)
    got = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(img1),
        jnp.asarray(ids), jnp.asarray(mask), method=model.predict,
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)
