"""BLIP-1 CIR parity tests: ViT-B vs reference vit.py, text tower vs med.py,
full BlipCirBase with ported weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.blip1 import Blip1Config, BlipCirBase, blip_cir_base_params_from_torch
from sprc_tpu.models.qformer import QFormer, QFormerConfig
from sprc_tpu.models.vit import ClipViT, ViTConfig

IMG = 32
PATCH = 16
VW = 32
VDEPTH = 2
HEADS = 2
TH = 48
TLAYERS = 2
TINTER = 96
P = 4
VOCAB = 80
TXT = 6
B = 2
ATOL = 3e-5


def _tiny_vit_cfg(scan=False):
    return ViTConfig(
        image_size=IMG, patch_size=PATCH, width=VW, depth=VDEPTH, num_heads=HEADS,
        mlp_hidden=VW * 4, layer_norm_eps=1e-6, qkv_fused_no_kbias=False,
        final_norm=True, dtype=jnp.float32, scan_blocks=scan,
    )


def test_blip_vit_parity(ref_blip_vit_module, rng):
    import torch
    from functools import partial

    torch.manual_seed(4)
    tmodel = ref_blip_vit_module.VisionTransformer(
        img_size=IMG, patch_size=PATCH, embed_dim=VW, depth=VDEPTH,
        num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()

    jmodel = ClipViT(_tiny_vit_cfg())
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from sprc_tpu.interop.torch_import import _layernorm, _linear

    conv_w = np.asarray(sd["patch_embed.proj.weight"])
    trunk = {
        "cls_token": np.asarray(sd["cls_token"]),
        "pos_embed": np.asarray(sd["pos_embed"]),
        "patch_embed": {"proj": {
            "kernel": np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd["patch_embed.proj.bias"]),
        }},
        "norm": _layernorm(sd, "norm"),
    }
    for i in range(VDEPTH):
        bp = f"blocks.{i}."
        trunk[f"block_{i}"] = {
            "norm1": _layernorm(sd, f"{bp}norm1"),
            "attn": {"qkv": _linear(sd, f"{bp}attn.qkv"), "proj": _linear(sd, f"{bp}attn.proj")},
            "norm2": _layernorm(sd, f"{bp}norm2"),
            "mlp_fc1": _linear(sd, f"{bp}mlp.fc1"),
            "mlp_fc2": _linear(sd, f"{bp}mlp.fc2"),
        }

    x = rng.randn(B, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = jmodel.apply({"params": {"trunk": trunk}}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_med_text_mode_parity(ref_med_module, rng):
    """med-BERT text mode with prompt embeds == QFormer no-image path."""
    import torch

    mod = ref_med_module
    cfg = mod.BertConfig(
        vocab_size=VOCAB, hidden_size=TH, num_hidden_layers=TLAYERS,
        num_attention_heads=HEADS, intermediate_size=TINTER,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfg.encoder_width = VW
    cfg.add_cross_attention = True
    cfg.add_type_embeddings = False  # med-specific flag (med.py embeddings)
    torch.manual_seed(6)
    tmodel = mod.BertModel(cfg, add_pooling_layer=False).eval()

    jcfg = QFormerConfig(
        vocab_size=VOCAB, hidden_size=TH, num_layers=TLAYERS, num_heads=HEADS,
        intermediate_size=TINTER, encoder_width=VW, cross_attention_freq=1,
        query_length=P, dropout_rate=0.0,
    )
    jmodel = QFormer(jcfg)

    from sprc_tpu.interop.torch_import import _layernorm, _linear

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {
        "embeddings": {
            "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
            "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"]},
            "ln": _layernorm(sd, "embeddings.LayerNorm"),
        }
    }
    for i in range(TLAYERS):
        lp = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
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

    ids = rng.randint(0, VOCAB, (B, TXT)).astype(np.int32)
    mask = np.ones((B, TXT), np.int32)
    mask[0, -2:] = 0
    prompts = rng.randn(B, P, TH).astype(np.float32)
    full_mask = np.concatenate([np.ones((B, P), np.int32), mask], axis=1)

    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(full_mask).long(),
            query_embeds=torch.from_numpy(prompts),
            mode="text",
            return_dict=True,
        ).last_hidden_state.numpy()
    got = jmodel.apply(
        {"params": params},
        input_ids=jnp.asarray(ids),
        query_embeds=jnp.asarray(prompts),
        attention_mask=jnp.asarray(full_mask),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_blip_cir_base_end_to_end(rng):
    cfg = Blip1Config(
        image_size=IMG, embed_dim=16, max_txt_len=TXT, vocab_size=VOCAB,
        num_prompts=P, vit_dtype=jnp.float32,
        vit_config_override=_tiny_vit_cfg(),
        text_config_override=QFormerConfig(
            vocab_size=VOCAB, hidden_size=TH, num_layers=TLAYERS, num_heads=HEADS,
            intermediate_size=TINTER, encoder_width=VW, cross_attention_freq=1,
            query_length=P, dropout_rate=0.0,
        ),
    )
    model = BlipCirBase(cfg)
    images = jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32)
    ids = jnp.asarray(rng.randint(0, VOCAB, (B, TXT)), jnp.int32)
    mask = jnp.asarray(np.ones((B, TXT)), jnp.int32)
    prompts = jnp.asarray(rng.randn(B, P, TH).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0), images, ids, mask, prompts)
    text_feat, image_feat = model.apply(variables, images, ids, mask, prompts)
    assert text_feat.shape == (B, 16) and image_feat.shape == (B, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(text_feat), axis=-1), 1.0, atol=1e-5)

    tgt = model.apply(variables, images, method=model.extract_target_features)
    np.testing.assert_allclose(np.asarray(tgt), np.asarray(image_feat), atol=1e-6)

    from sprc_tpu.registry import registry

    assert registry.get_model_class("blip_cir_base") is BlipCirBase
    assert registry.get_model_class("blip_feature_extractor") is BlipCirBase


def test_med_decoder_lm_parity(ref_med_module, rng):
    """MedEncoder decoder mode + LM head == reference med BertLMHeadModel."""
    import torch

    mod = ref_med_module
    cfg = mod.BertConfig(
        vocab_size=VOCAB, hidden_size=TH, num_hidden_layers=TLAYERS,
        num_attention_heads=HEADS, intermediate_size=TINTER,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfg.encoder_width = VW
    cfg.add_cross_attention = True
    cfg.add_type_embeddings = False
    torch.manual_seed(12)
    tmodel = mod.BertLMHeadModel(cfg).eval()

    from sprc_tpu.models.albef import MedEncoder
    from sprc_tpu.models.lm import QFormerLMHead
    from sprc_tpu.interop.torch_import import _layernorm, _linear

    jcfg = QFormerConfig(vocab_size=VOCAB, hidden_size=TH, num_layers=TLAYERS,
                         num_heads=HEADS, intermediate_size=TINTER,
                         encoder_width=VW, dropout_rate=0.0)
    dec = MedEncoder(jcfg, fusion_layer=TLAYERS, cross_from=0)
    head = QFormerLMHead(jcfg)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    t = "bert."
    dparams = {
        "word_embeddings": {"embedding": sd[f"{t}embeddings.word_embeddings.weight"]},
        "position_embeddings": {"embedding": sd[f"{t}embeddings.position_embeddings.weight"]},
        "embeddings_ln": _layernorm(sd, f"{t}embeddings.LayerNorm"),
    }
    for i in range(TLAYERS):
        lp = f"{t}encoder.layer.{i}."
        dparams[f"layer_{i}_self"] = {
            "query": _linear(sd, f"{lp}attention.self.query"),
            "key": _linear(sd, f"{lp}attention.self.key"),
            "value": _linear(sd, f"{lp}attention.self.value"),
            "out": _linear(sd, f"{lp}attention.output.dense"),
            "ln": _layernorm(sd, f"{lp}attention.output.LayerNorm"),
        }
        dparams[f"layer_{i}_cross"] = {
            "query": _linear(sd, f"{lp}crossattention.self.query"),
            "key": _linear(sd, f"{lp}crossattention.self.key"),
            "value": _linear(sd, f"{lp}crossattention.self.value"),
            "out": _linear(sd, f"{lp}crossattention.output.dense"),
            "ln": _layernorm(sd, f"{lp}crossattention.output.LayerNorm"),
        }
        dparams[f"layer_{i}_ffn"] = {
            "fc1": _linear(sd, f"{lp}intermediate.dense"),
            "fc2": _linear(sd, f"{lp}output.dense"),
            "ln": _layernorm(sd, f"{lp}output.LayerNorm"),
        }
    hparams = {
        "transform": _linear(sd, "cls.predictions.transform.dense"),
        "ln": _layernorm(sd, "cls.predictions.transform.LayerNorm"),
        "decoder": {
            "kernel": np.ascontiguousarray(np.asarray(sd["cls.predictions.decoder.weight"]).T),
            "bias": np.asarray(sd["cls.predictions.bias"]),
        },
    }

    ids = rng.randint(0, VOCAB, (B, TXT)).astype(np.int32)
    mask = np.ones((B, TXT), np.int32)
    mask[0, -2:] = 0
    img = rng.randn(B, 5, VW).astype(np.float32)

    with torch.no_grad():
        want = tmodel(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            encoder_hidden_states=torch.from_numpy(img),
            return_dict=True,
        ).logits.numpy()
    hidden = dec.apply(
        {"params": dparams}, input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask), image_embeds=jnp.asarray(img),
        mode="multimodal", is_decoder=True,
    )
    got = np.asarray(head.apply({"params": hparams}, hidden))
    # compare only attended positions (mask padding)
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], want[m], atol=ATOL)


def test_blip_caption_loss_and_generate(rng):
    from sprc_tpu.models.blip1 import BlipCaption, BlipCaptionConfig

    tcfg = QFormerConfig(vocab_size=VOCAB, hidden_size=TH, num_layers=TLAYERS,
                         num_heads=HEADS, intermediate_size=TINTER,
                         encoder_width=VW, dropout_rate=0.0)
    cfg = BlipCaptionConfig(image_size=IMG, vocab_size=VOCAB, prompt_length=2,
                            vit_dtype=jnp.float32,
                            vit_config_override=_tiny_vit_cfg(),
                            text_config_override=tcfg)
    model = BlipCaption(cfg)
    images = jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32)
    ids = np.asarray(rng.randint(3, VOCAB, (B, TXT)), np.int32)
    ids[0, -1] = 0  # pad
    mask = np.ones((B, TXT), np.int32)
    mask[0, -1] = 0
    variables = model.init(
        jax.random.PRNGKey(0), images, jnp.asarray(ids), jnp.asarray(mask)
    )
    out = model.apply(variables, images, jnp.asarray(ids), jnp.asarray(mask))
    assert np.isfinite(float(out["loss"]))
    assert 1.0 < float(out["loss"]) < 12.0

    gen = model.generate_ids(
        variables["params"], images, jnp.asarray(ids[:, :2]),
        eos_token_id=2, pad_token_id=0, max_new_tokens=3,
    )
    gen = np.asarray(gen)
    assert gen.shape == (B, 3)
    assert ((gen >= 0) & (gen < VOCAB)).all()

    from sprc_tpu.registry import registry

    assert registry.get_model_class("blip_caption") is BlipCaption


def test_blip_pretrain_losses(rng):
    """ITC+ITM+LM pretrain step with functional queue state."""
    from sprc_tpu.models.albef import init_albef_state
    from sprc_tpu.models.blip1 import (
        BlipPretrain,
        BlipRetrievalConfig,
        blip_pretrain_train_step,
    )
    from sprc_tpu.registry import registry as _reg

    assert _reg.get_model_class("blip_pretrain") is BlipPretrain

    IMG2, VOCAB2, TXT2, B2 = 32, 60, 6, 3
    vcfg = ViTConfig(image_size=IMG2, patch_size=16, width=32, depth=2,
                     num_heads=2, mlp_hidden=64, qkv_fused_no_kbias=False,
                     final_norm=True, dtype=jnp.float32)
    tcfg = QFormerConfig(vocab_size=VOCAB2, hidden_size=32, num_layers=2,
                         num_heads=2, intermediate_size=64, encoder_width=32,
                         dropout_rate=0.0)
    cfg = BlipRetrievalConfig(image_size=IMG2, embed_dim=16, vocab_size=VOCAB2,
                              queue_size=8, momentum=0.9, vit_dtype=jnp.float32,
                              vit_config_override=vcfg, text_config_override=tcfg)
    model = BlipPretrain(cfg)

    ids = rng.randint(4, VOCAB2, (B2, TXT2)).astype(np.int32)
    batch = {
        "images": jnp.asarray(rng.rand(B2, IMG2, IMG2, 3), jnp.float32),
        "input_ids": jnp.asarray(ids),
        "text_mask": jnp.ones((B2, TXT2), jnp.int32),
        "enc_input_ids": jnp.asarray(np.where(np.arange(TXT2) == 0, 2, ids)),
        "dec_input_ids": jnp.asarray(np.where(np.arange(TXT2) == 0, 1, ids)),
        "image_ids": jnp.arange(B2, dtype=jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch["images"], batch["input_ids"], batch["text_mask"],
        batch["enc_input_ids"], batch["dec_input_ids"], batch["image_ids"],
        jnp.zeros((B2, 16)), jnp.zeros((B2, 16)),
        jnp.zeros((16, 8)), jnp.zeros((16, 8)),
        jnp.full((8,), -100, jnp.int32), jnp.asarray(0.4),
    )
    params = variables["params"]
    state = init_albef_state(params, cfg)
    losses, state = blip_pretrain_train_step(
        model, params, state, batch, alpha=0.4, rng=jax.random.PRNGKey(2)
    )
    assert set(losses) == {"loss_itc", "loss_itm", "loss_lm", "loss"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    np.testing.assert_allclose(
        float(losses["loss"]),
        float(losses["loss_itc"]) + float(losses["loss_itm"]) + float(losses["loss_lm"]),
        rtol=1e-6,
    )
    # queue advanced by B entries
    assert int(state["ptr"]) == B2
