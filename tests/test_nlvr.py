"""NLVR two-image reasoning model tests (ALBEF + BLIP flavors)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.nlvr import (
    NLVRClassifier,
    NLVRConfig,
    init_nlvr_state,
    nlvr_rampup_alpha,
    nlvr_train_step,
)
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.vit import ViTConfig
from sprc_tpu.registry import registry

IMG, VOCAB, TXT, B, NC = 32, 60, 6, 3, 2


def tiny_cfg(flavor="albef", **kw):
    vcfg = ViTConfig(image_size=IMG, patch_size=16, width=32, depth=2, num_heads=2,
                     mlp_hidden=64, qkv_fused_no_kbias=False, final_norm=True,
                     dtype=jnp.float32)
    tcfg = QFormerConfig(vocab_size=VOCAB, hidden_size=32, num_layers=4, num_heads=2,
                         intermediate_size=64, encoder_width=32, dropout_rate=0.0)
    return NLVRConfig(flavor=flavor, num_classes=NC, image_size=IMG,
                      vocab_size=VOCAB, fusion_layer=2, vit_dtype=jnp.float32,
                      vit_config_override=vcfg, text_config_override=tcfg, **kw)


@pytest.fixture(scope="module")
def batch(rng):
    return {
        "image0": jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        "image1": jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        "input_ids": jnp.asarray(rng.randint(4, VOCAB, (B, TXT)), jnp.int32),
        "text_mask": jnp.ones((B, TXT), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, NC, (B,)), jnp.int32),
    }


def _init(model, batch):
    return model.init(
        jax.random.PRNGKey(0),
        batch["image0"], batch["image1"], batch["input_ids"],
        batch["text_mask"], batch["labels"],
    )


def test_registry_names():
    cls = registry.get_model_class("albef_nlvr")
    assert cls is NLVRClassifier
    assert registry.get_model_class("blip_nlvr") is cls


def test_albef_tied_kv_structure(batch):
    model = NLVRClassifier(tiny_cfg("albef"))
    params = _init(model, batch)["params"]["text_encoder"]
    # fusion_layer=2 over 4 layers -> 1 tied K/V module (pair (2,3)) + one for
    # a possible odd tail, but NOT per-layer keys
    assert "cross_key_0" in params and "cross_value_0" in params
    assert "layer_2_cross_query" in params and "layer_3_cross_query" in params
    assert "layer_2_cross_key" not in params  # tied, not per-layer
    # text-only layers have no cross modules
    assert "layer_0_cross_query" not in params


def test_albef_images_both_matter(batch):
    """Alternating cross: swapping image1 changes logits (layer fusion+1)."""
    model = NLVRClassifier(tiny_cfg("albef"))
    variables = _init(model, batch)

    def predict(img0, img1):
        return np.asarray(model.apply(
            variables, img0, img1, batch["input_ids"], batch["text_mask"],
            method=model.predict,
        ))

    base = predict(batch["image0"], batch["image1"])
    assert base.shape == (B, NC)
    other = jnp.asarray(np.roll(np.asarray(batch["image1"]), 1, axis=0))
    changed0 = predict(other, batch["image1"])
    changed1 = predict(batch["image0"], other)
    assert np.abs(changed0 - base).max() > 1e-6
    assert np.abs(changed1 - base).max() > 1e-6


def test_blip_twin_merge_structure(batch):
    model = NLVRClassifier(tiny_cfg("blip"))
    params = _init(model, batch)["params"]["text_encoder"]
    # every layer twin: cross0/cross1 q/k/v + dense0/dense1
    for i in range(4):
        for t in (0, 1):
            assert f"layer_{i}_cross{t}_query" in params
            assert f"layer_{i}_cross_dense{t}" in params
    # merge dense only from merge_from (=2) on
    assert "layer_0_merge" not in params
    assert "layer_2_merge" in params and "layer_3_merge" in params


def test_blip_plain_ce(batch):
    torch = pytest.importorskip("torch")
    model = NLVRClassifier(tiny_cfg("blip", use_distill=False))
    variables = _init(model, batch)
    out = model.apply(
        variables, batch["image0"], batch["image1"], batch["input_ids"],
        batch["text_mask"], batch["labels"],
    )
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(np.asarray(out["logits"], np.float32)),
        torch.tensor(np.asarray(batch["labels"], np.int64)),
    ).item()
    np.testing.assert_allclose(float(out["loss"]), ref, rtol=1e-5)


def test_albef_distilled_train_step(batch):
    model = NLVRClassifier(tiny_cfg("albef"))
    params = _init(model, batch)["params"]
    state = init_nlvr_state(params)
    out, state = nlvr_train_step(model, params, state, batch, alpha=0.4)
    assert np.isfinite(float(out["loss"]))
    # blip flavor: no distillation even when asked
    model_b = NLVRClassifier(tiny_cfg("blip"))
    params_b = _init(model_b, batch)["params"]
    state_b = init_nlvr_state(params_b)
    out_b, state_b2 = nlvr_train_step(model_b, params_b, state_b, batch, alpha=0.4)
    assert np.isfinite(float(out_b["loss"]))
    assert state_b2 is state_b  # untouched


def test_rampup_two_epochs():
    cfg = tiny_cfg()
    assert nlvr_rampup_alpha(cfg, 0, 0, 100) == 0.0
    assert nlvr_rampup_alpha(cfg, 1, 0, 100) == pytest.approx(0.2)
    assert nlvr_rampup_alpha(cfg, 2, 0, 100) == pytest.approx(0.4)
    assert nlvr_rampup_alpha(cfg, 9, 50, 100) == pytest.approx(0.4)
