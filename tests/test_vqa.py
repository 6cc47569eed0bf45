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
