"""ALBEF retrieval tests: functional momentum/queue state + losses + med
fusion-mode parity vs the reference med.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.albef import (
    AlbefConfig,
    AlbefRetrieval,
    MedEncoder,
    albef_train_step,
    enqueue,
    init_albef_state,
    momentum_update,
    rampup_alpha,
)
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.vit import ViTConfig

IMG, PATCH, VW, VDEPTH, HEADS = 32, 16, 32, 2, 2
TH, TLAYERS, TINTER, FUSION = 48, 4, 96, 2
VOCAB, TXT, B, E, QS = 80, 6, 3, 16, 12


def build():
    vcfg = ViTConfig(image_size=IMG, patch_size=PATCH, width=VW, depth=VDEPTH,
                     num_heads=HEADS, mlp_hidden=VW * 4, qkv_fused_no_kbias=False,
                     final_norm=True, dtype=jnp.float32)
    tcfg = QFormerConfig(vocab_size=VOCAB, hidden_size=TH, num_layers=TLAYERS,
                         num_heads=HEADS, intermediate_size=TINTER,
                         encoder_width=VW, dropout_rate=0.0)
    cfg = AlbefConfig(image_size=IMG, embed_dim=E, vocab_size=VOCAB,
                      fusion_layer=FUSION, queue_size=QS, momentum=0.9,
                      vit_dtype=jnp.float32, vit_config_override=vcfg,
                      text_config_override=tcfg)
    return AlbefRetrieval(cfg)


@pytest.fixture(scope="module")
def setup(rng):
    model = build()
    batch = {
        "images": jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        "input_ids": jnp.asarray(rng.randint(0, VOCAB, (B, TXT)), jnp.int32),
        "text_mask": jnp.asarray(np.ones((B, TXT)), jnp.int32),
        "image_ids": jnp.asarray([1, 1, 2], jnp.int32),  # duplicate image id
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch["images"], batch["input_ids"], batch["text_mask"],
        batch["image_ids"],
        jnp.zeros((B, E)), jnp.zeros((B, E)),
        jnp.zeros((E, QS)), jnp.zeros((E, QS)),
        jnp.full((QS,), -100, jnp.int32), jnp.asarray(0.4),
    )
    return model, variables["params"], batch


def test_albef_step_losses_and_state(setup):
    model, params, batch = setup
    state = init_albef_state(params, model.cfg)
    losses, new_state = albef_train_step(
        model, params, state, batch, alpha=0.4, rng=jax.random.PRNGKey(2)
    )
    assert set(losses) == {"loss_itc", "loss_itm"}
    for v in losses.values():
        assert np.isfinite(float(v))
    # queue advanced by bs and holds normalized momentum feats
    assert int(new_state["ptr"]) == B
    col = np.asarray(new_state["image_queue"][:, 0])
    np.testing.assert_allclose(np.linalg.norm(col), 1.0, atol=1e-4)
    assert int(new_state["idx_queue"][0]) == 1


def test_momentum_update_moves_toward_params(setup):
    model, params, batch = setup
    state = init_albef_state(params, model.cfg)
    # perturb momentum params
    state["params_m"] = jax.tree.map(lambda x: x + 1.0, state["params_m"])
    new_state = momentum_update(params, state, momentum=0.5)
    leaf_m = jax.tree.leaves(new_state["params_m"]["vision_proj"])[0]
    leaf_p = jax.tree.leaves(params["vision_proj"])[0]
    np.testing.assert_allclose(
        np.asarray(leaf_m), np.asarray(leaf_p) + 0.5, atol=1e-6
    )


def test_enqueue_wraps(setup):
    model, params, batch = setup
    state = init_albef_state(params, model.cfg)
    feats = jnp.ones((B, E)) / np.sqrt(E)
    ids = jnp.asarray([7, 8, 9], jnp.int32)
    for _ in range(5):  # 15 > QS=12: wraps
        state = enqueue(state, feats, feats, ids)
    assert int(state["ptr"]) == (5 * B) % QS
    assert set(np.asarray(state["idx_queue"]).tolist()) <= {7, 8, 9}


def test_rampup():
    cfg = AlbefConfig(alpha=0.4)
    assert rampup_alpha(cfg, 0, 0, 100) == 0.0
    assert rampup_alpha(cfg, 1, 0, 100) == pytest.approx(0.2)
    assert rampup_alpha(cfg, 5, 0, 100) == pytest.approx(0.4)


def test_med_fusion_mode_parity(ref_med_module, rng):
    """MedEncoder text+fusion staging == reference med.py modes."""
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
    cfg.fusion_layer = FUSION
    torch.manual_seed(9)
    tmodel = mod.BertModel(cfg, add_pooling_layer=False).eval()

    jcfg = QFormerConfig(vocab_size=VOCAB, hidden_size=TH, num_layers=TLAYERS,
                         num_heads=HEADS, intermediate_size=TINTER,
                         encoder_width=VW, dropout_rate=0.0)
    jmodel = MedEncoder(jcfg, FUSION)

    from sprc_tpu.interop.torch_import import _layernorm, _linear

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "embeddings_ln": _layernorm(sd, "embeddings.LayerNorm"),
    }
    for i in range(TLAYERS):
        lp = f"encoder.layer.{i}."
        params[f"layer_{i}_self"] = {
            "query": _linear(sd, f"{lp}attention.self.query"),
            "key": _linear(sd, f"{lp}attention.self.key"),
            "value": _linear(sd, f"{lp}attention.self.value"),
            "out": _linear(sd, f"{lp}attention.output.dense"),
            "ln": _layernorm(sd, f"{lp}attention.output.LayerNorm"),
        }
        if i >= FUSION:
            params[f"layer_{i}_cross"] = {
                "query": _linear(sd, f"{lp}crossattention.self.query"),
                "key": _linear(sd, f"{lp}crossattention.self.key"),
                "value": _linear(sd, f"{lp}crossattention.self.value"),
                "out": _linear(sd, f"{lp}crossattention.output.dense"),
                "ln": _layernorm(sd, f"{lp}crossattention.output.LayerNorm"),
            }
        params[f"layer_{i}_ffn"] = {
            "fc1": _linear(sd, f"{lp}intermediate.dense"),
            "fc2": _linear(sd, f"{lp}output.dense"),
            "ln": _layernorm(sd, f"{lp}output.LayerNorm"),
        }

    ids = rng.randint(0, VOCAB, (B, TXT)).astype(np.int32)
    mask = np.ones((B, TXT), np.int32)
    img = rng.randn(B, 5, VW).astype(np.float32)

    with torch.no_grad():
        t_text = tmodel(
            torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            mode="text", return_dict=True,
        ).last_hidden_state
        want = tmodel(
            encoder_embeds=t_text,
            attention_mask=torch.from_numpy(mask).long(),
            encoder_hidden_states=torch.from_numpy(img),
            mode="fusion", return_dict=True,
        ).last_hidden_state.numpy()

    j_text = jmodel.apply(
        {"params": params}, input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask), mode="text",
    )
    np.testing.assert_allclose(np.asarray(j_text), t_text.numpy(), atol=3e-5)
    got = jmodel.apply(
        {"params": params}, inputs_embeds=j_text,
        attention_mask=jnp.asarray(mask), image_embeds=jnp.asarray(img),
        mode="fusion",
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_blip_retrieval_step(rng):
    from sprc_tpu.models.albef import init_albef_state
    from sprc_tpu.models.blip1 import (
        BlipRetrieval,
        BlipRetrievalConfig,
        blip_retrieval_train_step,
    )
    from sprc_tpu.models.vit import ViTConfig
    from sprc_tpu.models.qformer import QFormerConfig

    vcfg = ViTConfig(image_size=IMG, patch_size=PATCH, width=VW, depth=VDEPTH,
                     num_heads=HEADS, mlp_hidden=VW * 4, qkv_fused_no_kbias=False,
                     final_norm=True, dtype=jnp.float32)
    tcfg = QFormerConfig(vocab_size=VOCAB, hidden_size=TH, num_layers=2,
                         num_heads=HEADS, intermediate_size=TINTER,
                         encoder_width=VW, dropout_rate=0.0)
    cfg = BlipRetrievalConfig(image_size=IMG, embed_dim=E, vocab_size=VOCAB,
                              queue_size=QS, momentum=0.9, vit_dtype=jnp.float32,
                              vit_config_override=vcfg, text_config_override=tcfg)
    model = BlipRetrieval(cfg)
    batch = {
        "images": jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        "input_ids": jnp.asarray(rng.randint(0, VOCAB, (B, TXT)), jnp.int32),
        "text_mask": jnp.asarray(np.ones((B, TXT)), jnp.int32),
        "image_ids": jnp.asarray([5, 6, 6], jnp.int32),
    }
    batch["enc_input_ids"] = batch["input_ids"].at[:, 0].set(VOCAB - 1)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch["images"], batch["input_ids"], batch["text_mask"],
        batch["enc_input_ids"], batch["image_ids"],
        jnp.zeros((B, E)), jnp.zeros((B, E)),
        jnp.zeros((E, QS)), jnp.zeros((E, QS)),
        jnp.full((QS,), -100, jnp.int32), jnp.asarray(0.4),
    )
    params = variables["params"]
    state = init_albef_state(params, model.cfg)
    losses, new_state = blip_retrieval_train_step(
        model, params, state, batch, alpha=0.4, rng=jax.random.PRNGKey(3)
    )
    assert set(losses) == {"loss_itc", "loss_itm"}
    for v in losses.values():
        assert np.isfinite(float(v))
    assert int(new_state["ptr"]) == B
    # the BLIP med has cross-attention params on EVERY layer
    assert "layer_0_cross" in params["text_encoder"]
    assert "layer_1_cross" in params["text_encoder"]

    from sprc_tpu.registry import registry

    assert registry.get_model_class("blip_retrieval") is BlipRetrieval


def test_blip_itm_scorer(rng):
    from sprc_tpu.models.blip1 import BlipITM, BlipRetrievalConfig
    from sprc_tpu.models.vit import ViTConfig
    from sprc_tpu.models.qformer import QFormerConfig

    vcfg = ViTConfig(image_size=IMG, patch_size=PATCH, width=VW, depth=VDEPTH,
                     num_heads=HEADS, mlp_hidden=VW * 4, qkv_fused_no_kbias=False,
                     final_norm=True, dtype=jnp.float32)
    tcfg = QFormerConfig(vocab_size=VOCAB, hidden_size=TH, num_layers=2,
                         num_heads=HEADS, intermediate_size=TINTER,
                         encoder_width=VW, dropout_rate=0.0)
    cfg = BlipRetrievalConfig(image_size=IMG, embed_dim=E, vocab_size=VOCAB,
                              queue_size=QS, vit_dtype=jnp.float32,
                              vit_config_override=vcfg, text_config_override=tcfg)
    model = BlipITM(cfg)
    images = jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32)
    ids = jnp.asarray(rng.randint(0, VOCAB, (B, TXT)), jnp.int32)
    mask = jnp.asarray(np.ones((B, TXT)), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, images, ids, mask, method=model.itm
    )
    itm = model.apply(variables, images, ids, mask, method=model.itm)
    assert itm.shape == (B, 2)
    # itc needs unimodal params too — materialize with its own init
    variables2 = model.init({"params": jax.random.PRNGKey(0)}, images, ids, mask,
                            method=model.itc)
    itc = model.apply(variables2, images, ids, mask, method=model.itc)
    assert itc.shape == (B,)
    assert np.isfinite(np.asarray(itc)).all()


def test_albef_pretrain_losses(rng):
    """ITC+ITM+MLM pretrain step with host-side masking + momentum distill."""
    from sprc_tpu.models.albef import (
        AlbefPretrain,
        albef_pretrain_train_step,
        init_albef_state,
        mlm_mask,
    )
    from sprc_tpu.registry import registry as _reg

    assert _reg.get_model_class("albef_pretrain") is AlbefPretrain

    model = AlbefPretrain(build().cfg)
    B2 = 3
    ids = rng.randint(4, VOCAB, (B2, TXT)).astype(np.int32)
    ids[:, 0] = 2  # CLS
    masked, labels = mlm_mask(rng, ids, VOCAB, mask_token_id=3)
    assert ((labels == -100) | (labels == ids)).all()
    assert (labels[:, 0] == -100).all()  # CLS never masked
    assert (labels != -100).any()

    batch = {
        "images": jnp.asarray(rng.rand(B2, IMG, IMG, 3), jnp.float32),
        "input_ids": jnp.asarray(ids),
        "text_mask": jnp.ones((B2, TXT), jnp.int32),
        "masked_ids": jnp.asarray(masked),
        "mlm_labels": jnp.asarray(labels),
        "image_ids": jnp.arange(B2, dtype=jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch["images"], batch["input_ids"], batch["text_mask"],
        batch["masked_ids"], batch["mlm_labels"], batch["image_ids"],
        jnp.zeros((B2, E)), jnp.zeros((B2, E)),
        jnp.zeros((E, QS)), jnp.zeros((E, QS)),
        jnp.full((QS,), -100, jnp.int32), None, jnp.asarray(0.4),
    )
    params = variables["params"]
    state = init_albef_state(params, model.cfg)
    losses, state = albef_pretrain_train_step(
        model, params, state, batch, alpha=0.4, rng=jax.random.PRNGKey(2)
    )
    assert set(losses) == {"loss_itc", "loss_itm", "loss_mlm", "loss"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert int(state["ptr"]) == B2
    # alpha=0 -> plain masked CE, positive
    losses0, _ = albef_pretrain_train_step(
        model, params, state, batch, alpha=0.0, rng=jax.random.PRNGKey(2)
    )
    assert float(losses0["loss_mlm"]) > 0
