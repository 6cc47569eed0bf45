"""Unified extract_features API (the reference's ``model.extract_features``
across blip2/albef/blip/clip feature extractors — reference
blip2_qformer.py:387-467, blip_feature_extractor.py:58-140)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sprc_tpu.features import extract_features
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.vit import ViTConfig
from sprc_tpu.text.tokenizer import BertWordPieceTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[DEC]", "[ENC]",
         "a", "cat", "red"]
IMG = 28


@pytest.fixture(scope="module")
def tok():
    return BertWordPieceTokenizer(
        {t: i for i, t in enumerate(VOCAB)}, extra_special_tokens=["[DEC]"])


def _tiny_vit(**kw):
    return ViTConfig(image_size=IMG, patch_size=14, width=32, depth=1,
                     num_heads=2, mlp_hidden=64, dtype=jnp.float32, **kw)


def _tiny_txt(**kw):
    return QFormerConfig(vocab_size=len(VOCAB) + 1, hidden_size=32,
                         num_layers=2, num_heads=2, intermediate_size=64,
                         encoder_width=32, dropout_rate=0.0, **kw)


def _samples():
    rs = np.random.RandomState(0)
    return {"image": rs.rand(2, IMG, IMG, 3).astype(np.float32),
            "text_input": ["a red cat", "a cat"]}


def test_blip2_features(tok):
    from sprc_tpu.models.cir_base import CirConfig
    from sprc_tpu.registry import registry

    cfg = CirConfig(
        image_size=IMG, num_query_token=3, max_txt_len=8,
        vocab_size=len(VOCAB) + 1, vit_dtype=jnp.float32,
        qformer_dtype=jnp.float32,
        vit_config_override=_tiny_vit(qkv_fused_no_kbias=True),
        qformer_config_override=_tiny_txt(query_length=3,
                                          cross_attention_freq=1))
    model = registry.get_model_class("blip2_feature_extractor")(cfg)
    s = _samples()
    img = jnp.asarray(s["image"])
    ids = jnp.zeros((2, 4), jnp.int32)
    mask = jnp.ones((2, 4), jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        img, ids, mask, bos_token_id=1, pad_token_id=0)["params"]

    f = extract_features(model, params, s, "image")
    assert f.image_embeds.shape == (2, 3, 32)  # [B, Q, hidden]
    assert f.image_embeds_proj.shape == (2, 3, 256)
    np.testing.assert_allclose(
        np.linalg.norm(f.image_embeds_proj, axis=-1), 1.0, atol=1e-5)
    f = extract_features(model, params, s, "text", tokenizer=tok)
    assert f.text_embeds_proj.shape == (2, 256)
    f = extract_features(model, params, s, "multimodal", tokenizer=tok)
    assert f.multimodal_embeds.shape == (2, 3, 32)


def test_albef_and_blip_features(tok):
    from sprc_tpu.models.albef import AlbefConfig, AlbefRetrieval
    from sprc_tpu.models.blip1 import BlipRetrieval, BlipRetrievalConfig

    s = _samples()
    rng = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}

    acfg = AlbefConfig(
        image_size=IMG, embed_dim=8, vocab_size=len(VOCAB) + 1,
        fusion_layer=1, queue_size=8, vit_dtype=jnp.float32,
        vit_config_override=_tiny_vit(final_norm=True),
        text_config_override=_tiny_txt())
    albef = AlbefRetrieval(acfg)
    ids = jnp.zeros((2, 4), jnp.int32)
    mask = jnp.ones((2, 4), jnp.int32)
    E, K = 8, 8
    queues = (jnp.zeros((2, E)), jnp.zeros((2, E)), jnp.zeros((E, K)),
              jnp.zeros((E, K)), jnp.full((K,), -100, jnp.int32),
              jnp.asarray(0.4))
    params = albef.init(rng, jnp.asarray(s["image"]), ids, mask,
                        jnp.zeros((2,), jnp.int32), *queues)["params"]
    f = extract_features(albef, params, s, "image")
    # per-token projections, the reference contract (e.g. [1, 197, 256])
    assert f.image_embeds_proj.shape == (2, f.image_embeds.shape[1], 8)
    f = extract_features(albef, params, s, "text", tokenizer=tok)
    assert f.text_embeds.shape[0] == 2
    assert f.text_embeds_proj.shape == (2, f.text_embeds.shape[1], 8)
    f = extract_features(albef, params, s, "multimodal", tokenizer=tok)
    assert f.multimodal_embeds.shape[0] == 2

    bcfg = BlipRetrievalConfig(
        image_size=IMG, embed_dim=8, vocab_size=len(VOCAB) + 1,
        queue_size=8, vit_dtype=jnp.float32,
        vit_config_override=_tiny_vit(final_norm=True),
        text_config_override=_tiny_txt())
    blip = BlipRetrieval(bcfg)
    params = blip.init(rng, jnp.asarray(s["image"]), ids, mask, ids,
                       jnp.zeros((2,), jnp.int32), *queues)["params"]
    f = extract_features(blip, params, s, "multimodal", tokenizer=tok)
    assert f.multimodal_embeds.shape[0] == 2


def test_clip_features(tok):
    from sprc_tpu.models.clip import Clip, ClipConfig, ClipTextConfig

    model = Clip(ClipConfig(
        embed_dim=16, image_size=IMG,
        vision=_tiny_vit(use_ln_pre=True, quick_gelu=True, final_norm=True,
                         patch_bias=False),
        text=ClipTextConfig(vocab_size=len(VOCAB) + 1, width=16, layers=1,
                            heads=2, context_length=8)))
    s = _samples()
    img = jnp.asarray(s["image"])
    variables = model.init(jax.random.PRNGKey(0), img,
                           jnp.zeros((2, 8), jnp.int32),
                           jnp.zeros((2,), jnp.int32))
    f = extract_features(model, variables["params"], s, "multimodal",
                         tokenizer=tok, max_txt_len=8)
    assert f.image_embeds_proj.shape == (2, 16)
    assert f.text_embeds_proj.shape == (2, 16)
