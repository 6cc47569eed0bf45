"""BLIP/ALBEF VQA model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.vit import ViTConfig
from sprc_tpu.models.vqa import VQAConfig, VQAModel
from sprc_tpu.registry import registry

IMG, VOCAB, LQ, LA, B = 32, 60, 6, 5, 3
BOS, EOS, PAD = 1, 3, 0


def tiny_cfg(flavor="blip"):
    vcfg = ViTConfig(image_size=IMG, patch_size=16, width=32, depth=2, num_heads=2,
                     mlp_hidden=64, qkv_fused_no_kbias=False, final_norm=True,
                     dtype=jnp.float32)
    tcfg = QFormerConfig(vocab_size=VOCAB, hidden_size=32, num_layers=4, num_heads=2,
                         intermediate_size=64, encoder_width=32, dropout_rate=0.0)
    return VQAConfig(flavor=flavor, image_size=IMG, vocab_size=VOCAB, fusion_layer=2,
                     vit_dtype=jnp.float32, vit_config_override=vcfg,
                     text_config_override=tcfg)


@pytest.fixture(scope="module")
def batch(rng):
    # 2 answers for q0, 1 each for q1/q2 -> N=4 (reference n_answers pattern)
    N = 4
    answer_ids = rng.randint(4, VOCAB, (N, LA)).astype(np.int32)
    answer_ids[:, 0] = BOS
    answer_ids[0, -1] = PAD
    answer_mask = (answer_ids != PAD).astype(np.int32)
    return {
        "images": jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        "question_ids": jnp.asarray(rng.randint(4, VOCAB, (B, LQ)), jnp.int32),
        "question_mask": jnp.ones((B, LQ), jnp.int32),
        "answer_ids": jnp.asarray(answer_ids),
        "answer_mask": jnp.asarray(answer_mask),
        "ans_to_question": jnp.asarray([0, 0, 1, 2], jnp.int32),
        "weights": jnp.asarray([0.5, 0.5, 1.0, 1.0], jnp.float32),
    }


def _init(model, batch):
    return model.init(jax.random.PRNGKey(0), **{k: batch[k] for k in (
        "images", "question_ids", "question_mask", "answer_ids",
        "answer_mask", "ans_to_question", "weights")})


def test_registry_names():
    assert registry.get_model_class("blip_vqa") is VQAModel
    assert registry.get_model_class("albef_vqa") is VQAModel


@pytest.mark.parametrize("flavor", ["blip", "albef"])
def test_weighted_answer_loss(batch, flavor):
    model = VQAModel(tiny_cfg(flavor))
    variables = _init(model, batch)
    out = model.apply(variables, **{k: batch[k] for k in (
        "images", "question_ids", "question_mask", "answer_ids",
        "answer_mask", "ans_to_question", "weights")})
    assert np.isfinite(float(out["loss"]))
    assert out["logits"].shape == (4, LA, VOCAB)
    # doubling all weights doubles the loss (linear weighting, /B constant)
    out2 = model.apply(variables, batch["images"], batch["question_ids"],
                       batch["question_mask"], batch["answer_ids"],
                       batch["answer_mask"], batch["ans_to_question"],
                       batch["weights"] * 2.0)
    np.testing.assert_allclose(float(out2["loss"]), 2 * float(out["loss"]), rtol=1e-5)


def test_albef_fusion_staging(batch):
    """ALBEF flavor: no cross-attention below fusion_layer."""
    model = VQAModel(tiny_cfg("albef"))
    enc = _init(model, batch)["params"]["text_encoder"]
    assert "layer_0_cross" not in enc
    assert "layer_2_cross" in enc and "layer_3_cross" in enc
    blip_enc = _init(VQAModel(tiny_cfg("blip")), batch)["params"]["text_encoder"]
    assert "layer_0_cross" in blip_enc  # BLIP crosses everywhere


def test_rank_answers_recovers_trained_answer(batch):
    """After overfitting on one answer per question, ranking must pick it."""
    import optax

    model = VQAModel(tiny_cfg("blip"))
    variables = _init(model, batch)
    params = variables["params"]
    # answer list = the 4 training answers; supervise q_i with answer_i+? use
    # ans_to_question mapping: q0 -> answer rows 0/1, q1 -> 2, q2 -> 3
    opt = optax.adam(5e-3)
    ostate = opt.init(params)
    args = tuple(batch[k] for k in (
        "images", "question_ids", "question_mask", "answer_ids",
        "answer_mask", "ans_to_question", "weights"))

    @jax.jit
    def step(params, ostate):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply({"params": p}, *args)["loss"]
        )(params)
        updates, ostate = opt.update(grads, ostate)
        return optax.apply_updates(params, updates), ostate, loss

    for _ in range(30):
        params, ostate, loss = step(params, ostate)

    best, topk = model.rank_answers(
        params, batch["images"], batch["question_ids"], batch["question_mask"],
        batch["answer_ids"], batch["answer_mask"], num_ans_candidates=3,
    )
    best = np.asarray(best)
    assert best.shape == (B,)
    assert topk.shape == (B, 3)
    # q1 trained on answer 2, q2 on answer 3
    assert best[1] == 2
    assert best[2] == 3
    assert best[0] in (0, 1)  # q0 had two valid answers


def test_generate_answers(batch):
    model = VQAModel(tiny_cfg("blip"))
    params = _init(model, batch)["params"]
    out = model.generate_answers(
        params, batch["images"], batch["question_ids"], batch["question_mask"],
        bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD, max_new_tokens=4,
    )
    assert out.shape == (B, 4)
    assert np.asarray(out).dtype == np.int32


def test_momentum_distillation_step(batch):
    """ALBEF use_distill (reference albef_vqa.py:153-226): momentum towers
    EMA-track the live ones, the distill branch re-derives in torch from
    the step's own logits, and alpha=0 reduces to the plain loss."""
    import dataclasses

    import torch
    import torch.nn.functional as F

    from sprc_tpu.models.vqa import (
        VQA_MOMENTUM_KEYS,
        init_vqa_state,
        vqa_train_step,
    )

    cfg = dataclasses.replace(tiny_cfg("albef"), use_distill=True,
                              momentum=0.9, alpha=0.4)
    model = VQAModel(cfg)
    params = _init(model, batch)["params"]
    state = init_vqa_state(params)
    assert set(state["params_m"]) == set(VQA_MOMENTUM_KEYS) & set(params)

    # alpha=0 -> identical to the undistilled forward
    plain = model.apply({"params": params}, **{k: batch[k] for k in (
        "images", "question_ids", "question_mask", "answer_ids",
        "answer_mask", "ans_to_question", "weights")})
    losses0, _ = vqa_train_step(model, params, state, batch, alpha=0.0)
    np.testing.assert_allclose(float(losses0["loss"]), float(plain["loss"]),
                               rtol=1e-6)

    losses, new_state = vqa_train_step(model, params, state, batch, alpha=0.4)
    assert np.isfinite(float(losses["loss"]))

    # EMA: after one update with momentum m, params_m = m*old + (1-m)*live.
    # init copies live params, so the first update must leave them equal
    leaf = lambda tree: np.asarray(jax.tree.leaves(tree)[0])
    np.testing.assert_allclose(
        leaf(new_state["params_m"]["text_decoder"]),
        leaf(params["text_decoder"]), rtol=1e-6)
    # ...and from a perturbed momentum copy it moves 1-m of the gap
    pert = jax.tree.map(lambda x: x + 1.0, state["params_m"])
    _, moved = vqa_train_step(model, params, {"params_m": pert}, batch,
                              alpha=0.0)
    np.testing.assert_allclose(
        leaf(moved["params_m"]["text_decoder"]),
        0.9 * (leaf(params["text_decoder"]) + 1.0)
        + 0.1 * leaf(params["text_decoder"]), rtol=1e-5)

    # torch re-derivation of the distilled loss from the model's own logits
    # (momentum == live at init, so soft logits == live logits here)
    out = model.apply({"params": params}, **{k: batch[k] for k in (
        "images", "question_ids", "question_mask", "answer_ids",
        "answer_mask", "ans_to_question", "weights")})
    logits = torch.from_numpy(np.asarray(out["logits"], np.float32))
    ids = torch.from_numpy(np.asarray(batch["answer_ids"]))
    labels = ids.masked_fill(ids == 0, -100)
    sl, ll = logits[:, :-1], labels[:, 1:]
    valid = ll != -100
    logp = F.log_softmax(sl, dim=-1)
    nll = -logp.gather(-1, ll.clamp(min=0).unsqueeze(-1)).squeeze(-1)
    smooth = -logp.mean(-1)
    ce = ((0.9 * nll + 0.1 * smooth) * valid).sum(1)
    distill = ((-(F.softmax(sl, -1) * logp).sum(-1)) * valid).sum(1)
    mixed = 0.6 * ce + 0.4 * distill
    w = torch.from_numpy(np.asarray(batch["weights"]))
    want = float((w * mixed).sum() / B)
    np.testing.assert_allclose(float(losses["loss"]), want, rtol=1e-5)
