"""Variant-zoo smoke + behavior tests (tiny configs, 8-token images)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.cir_base import CirConfig
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.vit import ViTConfig
from sprc_tpu.registry import registry

IMG, VOCAB, TXT, Q, B = 28, 60, 8, 4, 4


def build(name):
    vcfg = ViTConfig(
        image_size=IMG, patch_size=14, width=32, depth=2, num_heads=2,
        mlp_hidden=64, qkv_fused_no_kbias=True, dtype=jnp.float32,
    )
    qcfg = QFormerConfig(
        vocab_size=VOCAB, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, encoder_width=32, query_length=Q,
        dropout_rate=0.0,
    )
    cfg = CirConfig(
        vit_model="eva_clip_g", image_size=IMG, num_query_token=Q,
        max_txt_len=TXT, vocab_size=VOCAB, vit_dtype=jnp.float32,
        embed_dim=16, vit_config_override=vcfg, qformer_config_override=qcfg,
    )
    return registry.get_model_class(name)(cfg)


@pytest.fixture(scope="module")
def batch(rng):
    return (
        jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        jnp.asarray(rng.randint(0, VOCAB, (B, TXT)), jnp.int32),
        jnp.asarray(np.ones((B, TXT)), jnp.int32),
    )


LOSS_KEYS = {
    "blip2_cir_align_prompt": {"loss_itc", "loss_rtc", "loss_align"},
    "blip2_cir_cat": {"loss_itc"},
    "blip2_cir_rel": {"loss_itc", "loss_rtc"},
    "blip2_cir_z_learn_pos_align": {"loss_itc", "loss_rtc", "loss_align"},
    "blip2_cir_neg": {"loss_itc", "loss_itm"},
    "blip2_cir_neg_rel": {"loss_itc", "loss_itm", "loss_rtc"},
    "blip2_cir_full": {"loss_itc", "loss_rtc", "loss_itm", "loss_align"},
    "blip2_cir_rerank": {"loss_itm"},
    "blip2_cir_cls": {"loss_itc", "loss_p2p"},
}


@pytest.mark.parametrize("name", sorted(LOSS_KEYS))
def test_variant_losses(name, batch):
    model = build(name)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, *batch
    )
    losses = model.apply(variables, *batch, rngs={"sample": jax.random.PRNGKey(2)})
    assert set(losses) == LOSS_KEYS[name]
    for k, v in losses.items():
        assert np.isfinite(float(v)), (name, k)


def test_slt_returns_sims(batch):
    model = build("blip2_cir_slt")
    variables = model.init({"params": jax.random.PRNGKey(0)}, *batch)
    sims = model.apply(variables, *batch)
    assert sims.shape == (B, B)
    assert np.isfinite(np.asarray(sims)).all()


def test_prompt_returns_fused_queries(batch):
    model = build("blip2_cir_prompt")
    variables = model.init({"params": jax.random.PRNGKey(0)}, *batch)
    out = model.apply(variables, *batch)
    assert out.shape == (B, Q, 32)


def test_rerank_fformer_sync_and_inference(batch, rng):
    model = build("blip2_cir_rerank")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, *batch
    )
    params = variables["params"]
    synced = model.sync_fformer(dict(params))
    for a, b in zip(
        jax.tree.leaves(synced["fformer"]), jax.tree.leaves(params["qformer"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ref, tgt, ids, mask = batch
    feats, frozen = model.apply(
        {"params": synced}, ref, method=model.extract_target_features
    )
    sims = model.apply({"params": synced}, frozen, feats, ids, mask, method=model.inference)
    assert sims.shape == (B, B)

    scores = model.apply(
        {"params": synced}, frozen, frozen, ids, mask, method=model.inference_rerank
    )
    assert scores.shape == (B,)
    assert (np.asarray(scores) >= 0).all() and (np.asarray(scores) <= 1).all()


def test_cat_extract_modes(batch):
    model = build("blip2_cir_cat")
    variables = model.init({"params": jax.random.PRNGKey(0)}, *batch)
    ref, tgt, ids, mask = batch
    both = model.apply(variables, ref, method=model.extract_target_features)
    assert isinstance(both, tuple)
    only_feats = model.apply(
        variables, ref, method=model.extract_target_features, target_only=True
    )
    assert only_feats.shape == (B, Q, 16)
    only_frozen = model.apply(
        variables, ref, method=model.extract_target_features, ref_only=True
    )
    assert only_frozen.shape[1:] == (5, 32)
    scores = model.apply(
        variables, only_frozen, only_feats, ids, mask, method=model.inference_rerank
    )
    assert scores.shape == (B,)
