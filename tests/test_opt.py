"""JAX OPT parity vs transformers.OPTForCausalLM (tiny config, offline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.opt import OPTConfig, OPTForCausalLM, opt_params_from_hf

VOCAB = 70
HIDDEN = 32
FFN = 64
LAYERS = 2
HEADS = 4
B, S = 2, 6


@pytest.fixture(scope="module")
def pair():
    torch = pytest.importorskip("torch")
    try:
        from transformers import OPTConfig as HFConfig
        from transformers import OPTForCausalLM as HFModel
    except Exception:
        pytest.skip("transformers OPT unavailable")

    hf_cfg = HFConfig(
        vocab_size=VOCAB,
        hidden_size=HIDDEN,
        ffn_dim=FFN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        max_position_embeddings=32,
        do_layer_norm_before=True,
        word_embed_proj_dim=HIDDEN,
        attn_implementation="eager",
        dropout=0.0,
    )
    torch.manual_seed(5)
    hf = HFModel(hf_cfg).eval()

    cfg = OPTConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, ffn_dim=FFN,
        num_layers=LAYERS, num_heads=HEADS, max_positions=32,
    )
    model = OPTForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = opt_params_from_hf(sd, num_layers=LAYERS)
    return hf, model, params


def test_opt_logits_parity(pair, rng):
    import torch

    hf, model, params = pair
    ids = rng.randint(0, VOCAB, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)

    with torch.no_grad():
        want = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_opt_hidden_states_with_embeds(pair, rng):
    import torch

    hf, model, params = pair
    embeds = rng.randn(B, S, HIDDEN).astype(np.float32) * 0.05
    with torch.no_grad():
        want = hf.model.decoder(
            inputs_embeds=torch.from_numpy(embeds),
        ).last_hidden_state.numpy()
    got = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(embeds), method=model.hidden_states
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_blip2_opt_caption_loss_and_generate(rng):
    from sprc_tpu.models.cir_base import CirConfig
    from sprc_tpu.models.qformer import QFormerConfig
    from sprc_tpu.models.vit import ViTConfig
    from sprc_tpu.registry import registry

    IMG, Q, BV = 28, 4, 60
    vcfg = ViTConfig(image_size=IMG, patch_size=14, width=32, depth=2, num_heads=2,
                     mlp_hidden=64, qkv_fused_no_kbias=True, dtype=jnp.float32)
    qcfg = QFormerConfig(vocab_size=BV, hidden_size=32, num_layers=2, num_heads=2,
                         intermediate_size=64, encoder_width=32, query_length=Q,
                         dropout_rate=0.0)
    cfg = CirConfig(vit_model="eva_clip_g", image_size=IMG, num_query_token=Q,
                    max_txt_len=6, vocab_size=BV, vit_dtype=jnp.float32,
                    embed_dim=16, vit_config_override=vcfg,
                    qformer_config_override=qcfg)
    ocfg = OPTConfig(vocab_size=VOCAB, hidden_size=HIDDEN, ffn_dim=FFN,
                     num_layers=LAYERS, num_heads=HEADS, max_positions=32)
    model = registry.get_model_class("blip2_opt")(cfg, ocfg)

    Bm = 2
    images = jnp.asarray(rng.rand(Bm, IMG, IMG, 3), jnp.float32)
    ids = rng.randint(3, VOCAB, (Bm, 6)).astype(np.int32)
    mask = np.ones((Bm, 6), np.int32)
    ids[0, -1] = 1  # pad
    mask[0, -1] = 0
    variables = model.init(jax.random.PRNGKey(0), images, jnp.asarray(ids), jnp.asarray(mask))
    out = model.apply(
        variables, images, jnp.asarray(ids), jnp.asarray(mask), prompt_length=2
    )
    assert np.isfinite(float(out["loss"]))
    assert 1.0 < float(out["loss"]) < 10.0  # ~log(vocab) at random init

    gen = model.generate_ids(
        variables["params"], images, jnp.asarray(ids[:, :3]),
        jnp.asarray(np.ones((Bm, 3), np.int32)),
        eos_token_id=2, pad_token_id=1, max_new_tokens=4,
    )
    gen = np.asarray(gen)
    assert gen.shape == (Bm, 4)
    assert ((gen >= 0) & (gen < VOCAB)).all()

    # KV-cached path (default) == full-recompute path, token for token
    gen_uncached = np.asarray(model.generate_ids(
        variables["params"], images, jnp.asarray(ids[:, :3]),
        jnp.asarray(np.ones((Bm, 3), np.int32)),
        eos_token_id=2, pad_token_id=1, max_new_tokens=4, use_cache=False,
    ))
    np.testing.assert_array_equal(gen, gen_uncached)
