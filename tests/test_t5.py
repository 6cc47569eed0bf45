"""JAX T5 parity vs transformers.T5ForConditionalGeneration (tiny, offline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.t5 import T5Config, T5ForConditionalGeneration, t5_params_from_hf

VOCAB = 60
DM = 32
DKV = 8
DFF = 48
HEADS = 4
LAYERS = 2
B, S, ST = 2, 7, 5


def _build(gated, tied):
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFConfig
    from transformers import T5ForConditionalGeneration as HFModel

    hf_cfg = HFConfig(
        vocab_size=VOCAB,
        d_model=DM,
        d_kv=DKV,
        d_ff=DFF,
        num_layers=LAYERS,
        num_decoder_layers=LAYERS,
        num_heads=HEADS,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        dense_act_fn="gelu_new" if gated else "relu",
        is_gated_act=gated,
        tie_word_embeddings=tied,
        dropout_rate=0.0,
        decoder_start_token_id=0,
    )
    torch.manual_seed(2)
    hf = HFModel(hf_cfg).eval()
    cfg = T5Config(
        vocab_size=VOCAB, d_model=DM, d_kv=DKV, d_ff=DFF, num_heads=HEADS,
        num_layers=LAYERS, num_decoder_layers=LAYERS, relative_buckets=8,
        relative_max_distance=16, gated_act=gated, tie_word_embeddings=tied,
    )
    model = T5ForConditionalGeneration(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = t5_params_from_hf(
        sd, num_layers=LAYERS, num_decoder_layers=LAYERS, gated_act=gated,
        tie_word_embeddings=tied,
    )
    return hf, model, params


@pytest.mark.parametrize("gated,tied", [(True, False), (False, True)])
def test_t5_logits_parity(gated, tied, rng):
    import torch

    hf, model, params = _build(gated, tied)
    ids = rng.randint(0, VOCAB, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[0, -2:] = 0
    dec_ids = rng.randint(0, VOCAB, (B, ST)).astype(np.int32)

    with torch.no_grad():
        want = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            decoder_input_ids=torch.from_numpy(dec_ids).long(),
        ).logits.numpy()
    got = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(dec_ids),
            jnp.asarray(mask),
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_t5_encoder_with_embeds(rng):
    import torch

    hf, model, params = _build(True, False)
    embeds = rng.randn(B, S, DM).astype(np.float32) * 0.2
    with torch.no_grad():
        want = hf.encoder(inputs_embeds=torch.from_numpy(embeds)).last_hidden_state.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(embeds), method=model.encode)
    )
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_blip2_t5_loss_and_generate(rng):
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
    ccfg = CirConfig(vit_model="eva_clip_g", image_size=IMG, num_query_token=Q,
                     max_txt_len=6, vocab_size=BV, vit_dtype=jnp.float32,
                     embed_dim=16, vit_config_override=vcfg,
                     qformer_config_override=qcfg)
    tcfg = T5Config(vocab_size=VOCAB, d_model=DM, d_kv=DKV, d_ff=DFF,
                    num_heads=HEADS, num_layers=LAYERS, num_decoder_layers=LAYERS,
                    relative_buckets=8, relative_max_distance=16)
    model = registry.get_model_class("blip2_t5")(ccfg, tcfg)

    Bm = 2
    images = jnp.asarray(rng.rand(Bm, IMG, IMG, 3), jnp.float32)
    in_ids = jnp.asarray(rng.randint(2, VOCAB, (Bm, 5)), jnp.int32)
    in_mask = jnp.asarray(np.ones((Bm, 5)), jnp.int32)
    out_ids = np.asarray(rng.randint(2, VOCAB, (Bm, 4)), np.int32)
    out_ids[0, -1] = 0  # pad
    out_mask = np.ones((Bm, 4), np.int32)
    out_mask[0, -1] = 0

    variables = model.init(
        jax.random.PRNGKey(0), images, in_ids, in_mask,
        jnp.asarray(out_ids), jnp.asarray(out_mask),
    )
    out = model.apply(
        variables, images, in_ids, in_mask, jnp.asarray(out_ids), jnp.asarray(out_mask)
    )
    assert np.isfinite(float(out["loss"]))
    assert 1.0 < float(out["loss"]) < 12.0

    gen = model.generate_ids(
        variables["params"], images, in_ids, in_mask,
        eos_token_id=1, pad_token_id=0, max_new_tokens=4,
    )
    gen = np.asarray(gen)
    assert gen.shape == (Bm, 4)
    assert ((gen >= 0) & (gen < VOCAB)).all()
    assert registry.get_model_class("blip2_t5_instruct") is type(model)

    # KV-cached path (default) == full-recompute path, token for token
    gen_uncached = np.asarray(model.generate_ids(
        variables["params"], images, in_ids, in_mask,
        eos_token_id=1, pad_token_id=0, max_new_tokens=4, use_cache=False,
    ))
    np.testing.assert_array_equal(gen, gen_uncached)
