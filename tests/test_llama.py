"""JAX LLaMA parity vs transformers.LlamaForCausalLM (tiny config, offline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    llama_params_from_hf,
)

VOCAB = 64
HIDDEN = 32
INTER = 56
LAYERS = 2
HEADS = 4
B, S = 2, 7


@pytest.fixture(scope="module")
def pair():
    torch = pytest.importorskip("torch")
    try:
        from transformers import LlamaConfig as HFConfig
        from transformers import LlamaForCausalLM as HFModel
    except Exception:
        pytest.skip("transformers llama unavailable")

    hf_cfg = HFConfig(
        vocab_size=VOCAB,
        hidden_size=HIDDEN,
        intermediate_size=INTER,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        num_key_value_heads=HEADS,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(11)
    hf = HFModel(hf_cfg).eval()

    cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=INTER,
        num_layers=LAYERS, num_heads=HEADS, rms_eps=1e-6,
    )
    model = LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = llama_params_from_hf(sd, num_layers=LAYERS)
    return hf, model, params


def test_llama_logits_parity(pair, rng):
    import torch

    hf, model, params = pair
    ids = rng.randint(0, VOCAB, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[0, -2:] = 0

    with torch.no_grad():
        want = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    )
    # only unmasked positions are meaningful
    np.testing.assert_allclose(got[mask == 1], want[mask == 1], atol=3e-5)


def test_llama_hidden_states_with_embeds(pair, rng):
    import torch

    hf, model, params = pair
    embeds = rng.randn(B, S, HIDDEN).astype(np.float32) * 0.05
    with torch.no_grad():
        want = hf(
            inputs_embeds=torch.from_numpy(embeds),
            output_hidden_states=True,
        ).hidden_states[-1].numpy()
    got = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(embeds), method=model.hidden_states
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_llama_gqa(rng):
    cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=INTER,
        num_layers=1, num_heads=4, num_kv_heads=2,
    )
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(rng.randint(0, VOCAB, (1, 5)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    out = model.apply({"params": params}, ids)
    assert np.isfinite(np.asarray(out)).all()
