"""Stage-1 BLIP-2 pretraining model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.cir_base import CirConfig
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.vit import ViTConfig
from sprc_tpu.registry import registry

IMG, VOCAB, TXT, Q, B = 28, 60, 8, 4, 4


@pytest.fixture(scope="module")
def model_and_batch(rng):
    vcfg = ViTConfig(image_size=IMG, patch_size=14, width=32, depth=2, num_heads=2,
                     mlp_hidden=64, qkv_fused_no_kbias=True, dtype=jnp.float32)
    qcfg = QFormerConfig(vocab_size=VOCAB, hidden_size=32, num_layers=2, num_heads=2,
                         intermediate_size=64, encoder_width=32, query_length=Q,
                         dropout_rate=0.0)
    cfg = CirConfig(vit_model="eva_clip_g", image_size=IMG, num_query_token=Q,
                    max_txt_len=TXT, vocab_size=VOCAB, vit_dtype=jnp.float32,
                    embed_dim=16, vit_config_override=vcfg,
                    qformer_config_override=qcfg)
    model = registry.get_model_class("blip2")(cfg)
    images = jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32)
    ids = rng.randint(4, VOCAB, (B, TXT)).astype(np.int32)
    ids[:, 0] = 2  # CLS
    mask = np.ones((B, TXT), np.int32)
    mask[0, -2:] = 0
    ids[0, -2:] = 0  # pads
    return model, images, jnp.asarray(ids), jnp.asarray(mask)


def test_stage1_losses(model_and_batch):
    model, images, ids, mask = model_and_batch
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, ids, mask, bos_token_id=1, pad_token_id=0,
    )
    losses = model.apply(
        variables, images, ids, mask, bos_token_id=1, pad_token_id=0,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    assert set(losses) == {"loss_itc", "loss_itm", "loss_lm"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # LM loss magnitude ~ log(vocab) at random init
    assert 1.0 < float(losses["loss_lm"]) < 10.0


def test_stage1_feature_extractor(model_and_batch):
    model, images, ids, mask = model_and_batch
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, ids, mask, bos_token_id=1, pad_token_id=0,
    )
    feats, hidden = model.apply(
        variables, images, method=model.extract_image_features
    )
    assert feats.shape == (B, Q, 16)
    norms = np.linalg.norm(np.asarray(feats), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    tfeats, _ = model.apply(
        variables, ids, mask, method=model.extract_text_features
    )
    assert tfeats.shape == (B, 16)
    assert registry.get_model_class("blip2_feature_extractor") is type(model)


def test_model_zoo_has_no_stubs():
    """Every LAVIS family the reference registers resolves to a REAL class
    (round 1 shipped 5 NotImplementedError stubs; round 2 finished the zoo)."""
    from sprc_tpu.models.albef import AlbefRetrieval
    from sprc_tpu.models.alpro import AlproQA, AlproRetrieval, TimeSformerModel
    from sprc_tpu.models.blip1 import BlipRetrieval
    from sprc_tpu.models.gpt_dialogue import GPTDialogue
    from sprc_tpu.models.pnp_vqa import Img2PromptVqaPipeline, PnpVqaPipeline

    assert registry.get_model_class("alpro_qa") is AlproQA
    assert registry.get_model_class("alpro_retrieval") is AlproRetrieval
    assert registry.get_model_class("timesformer") is TimeSformerModel
    assert registry.get_model_class("pnp_vqa") is PnpVqaPipeline
    assert registry.get_model_class("img2prompt_vqa") is Img2PromptVqaPipeline
    assert registry.get_model_class("albef_retrieval") is AlbefRetrieval
    assert registry.get_model_class("blip_retrieval") is BlipRetrieval
    assert registry.get_model_class("gpt_dialogue") is GPTDialogue
    for name in registry.list("model"):
        assert not registry.get_model_class(name).__name__.startswith("Stub_"), name
