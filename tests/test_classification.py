"""ALBEF/BLIP multimodal classification head tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.classification import (
    ClassifierConfig,
    MultimodalClassifier,
    classifier_rampup_alpha,
    classifier_train_step,
    init_classifier_state,
)
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.vit import ViTConfig
from sprc_tpu.registry import registry

IMG, VOCAB, TXT, B, NC = 32, 60, 6, 4, 3


def tiny_cfg(**kw):
    vcfg = ViTConfig(image_size=IMG, patch_size=16, width=32, depth=2, num_heads=2,
                     mlp_hidden=64, qkv_fused_no_kbias=False, final_norm=True,
                     dtype=jnp.float32)
    tcfg = QFormerConfig(vocab_size=VOCAB, hidden_size=32, num_layers=4, num_heads=2,
                         intermediate_size=64, encoder_width=32, dropout_rate=0.0)
    return ClassifierConfig(num_classes=NC, image_size=IMG, vocab_size=VOCAB,
                            fusion_layer=2, vit_dtype=jnp.float32,
                            vit_config_override=vcfg, text_config_override=tcfg, **kw)


@pytest.fixture(scope="module")
def batch(rng):
    return {
        "images": jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        "input_ids": jnp.asarray(rng.randint(4, VOCAB, (B, TXT)), jnp.int32),
        "text_mask": jnp.ones((B, TXT), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, NC, (B,)), jnp.int32),
    }


def test_registry_names():
    cls = registry.get_model_class("albef_classification")
    assert cls is MultimodalClassifier
    assert registry.get_model_class("blip_classification") is cls


def test_predict_and_plain_ce(batch):
    torch = pytest.importorskip("torch")
    model = MultimodalClassifier(tiny_cfg(use_distill=False))
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["images"], batch["input_ids"], batch["text_mask"], batch["labels"],
    )
    out = model.apply(
        variables,
        batch["images"], batch["input_ids"], batch["text_mask"], batch["labels"],
    )
    assert out["logits"].shape == (B, NC)
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(np.asarray(out["logits"], np.float32)),
        torch.tensor(np.asarray(batch["labels"], np.int64)),
    ).item()
    np.testing.assert_allclose(float(out["loss"]), ref, rtol=1e-5)


def test_distill_loss_formula(batch, rng):
    """(1-a)*CE - a*sum(logp*softmax(logits_m)) per reference :117-128."""
    model = MultimodalClassifier(tiny_cfg())
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["images"], batch["input_ids"], batch["text_mask"], batch["labels"],
    )
    logits_m = jnp.asarray(rng.randn(B, NC), jnp.float32)
    a = 0.3
    out = model.apply(
        variables, batch["images"], batch["input_ids"], batch["text_mask"],
        batch["labels"], logits_m, jnp.asarray(a),
    )
    logits = np.asarray(out["logits"], np.float64)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ce = -logp[np.arange(B), np.asarray(batch["labels"])].mean()
    lm = np.asarray(logits_m, np.float64)
    soft = np.exp(lm) / np.exp(lm).sum(-1, keepdims=True)
    want = (1 - a) * ce - a * (logp * soft).sum(-1).mean()
    np.testing.assert_allclose(float(out["loss"]), want, rtol=1e-5)
    # alpha=0 with distillation reduces to plain CE
    out0 = model.apply(
        variables, batch["images"], batch["input_ids"], batch["text_mask"],
        batch["labels"], logits_m, jnp.asarray(0.0),
    )
    np.testing.assert_allclose(float(out0["loss"]), ce, rtol=1e-5)


def test_train_step_momentum_state(batch):
    model = MultimodalClassifier(tiny_cfg())
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["images"], batch["input_ids"], batch["text_mask"], batch["labels"],
    )
    params = variables["params"]
    state = init_classifier_state(params)
    # at init the momentum copy equals params -> logits_m == logits
    out, state = classifier_train_step(model, params, state, batch, alpha=0.4)
    assert np.isfinite(float(out["loss"]))
    # EMA: after stepping with perturbed params, momentum copy moves slightly
    params2 = jax.tree.map(lambda p: p + 1.0, params)
    _, state2 = classifier_train_step(model, params2, state, batch, alpha=0.4)
    m0 = state["params_m"]["cls_head"]["fc2"]["bias"]
    m1 = state2["params_m"]["cls_head"]["fc2"]["bias"]
    np.testing.assert_allclose(
        np.asarray(m1 - m0), 0.005 * np.ones_like(m0) * (1 + 0), atol=1e-6
    )  # (1-0.995)*(p+1-m) with p==m -> 0.005


def test_rampup():
    cfg = tiny_cfg()
    assert classifier_rampup_alpha(cfg, 0, 0, 100) == 0.0
    assert classifier_rampup_alpha(cfg, 0, 50, 100) == pytest.approx(0.2)
    assert classifier_rampup_alpha(cfg, 1, 0, 100) == pytest.approx(0.4)
    assert classifier_rampup_alpha(cfg, 5, 99, 100) == pytest.approx(0.4)


def test_blip_flavor_cross_all_layers(batch):
    model = MultimodalClassifier(tiny_cfg(cross_on_all_layers=True))
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["images"], batch["input_ids"], batch["text_mask"], batch["labels"],
    )
    # every layer materializes a cross-attention block
    med = variables["params"]["text_encoder"]
    for i in range(4):
        assert f"layer_{i}_cross" in med, sorted(med)
    out = model.apply(
        variables, batch["images"], batch["input_ids"], batch["text_mask"],
        batch["labels"],
    )
    assert np.isfinite(float(out["loss"]))
