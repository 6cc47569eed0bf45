"""GPT-2 trunk parity vs HF transformers + GPTDialogue loss tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.gpt_dialogue import (
    GPT2Config,
    GPT2Model,
    GPTDialogue,
    GPTDialogueConfig,
    gpt2_params_from_hf,
)
from sprc_tpu.registry import registry

B, S, V, T, FT = 2, 10, 64, 3, 24

CFG = GPT2Config(vocab_size=V, n_embd=32, n_layer=2, n_head=2, n_positions=32)


@pytest.fixture(scope="module")
def hf_gpt2():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    hf_cfg = HFConfig(
        vocab_size=V, n_embd=32, n_layer=2, n_head=2, n_positions=32,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    torch.manual_seed(0)
    model = GPT2LMHeadModel(hf_cfg).eval()
    return torch, model


def test_gpt2_parity_vs_hf(hf_gpt2, rng):
    torch, hf = hf_gpt2
    ids = rng.randint(0, V, (B, S))
    mask = np.ones((B, S), np.int64)
    mask[0, -3:] = 0
    tt = rng.randint(0, V, (B, S))

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tt),
        ).logits.numpy()

    model = GPT2Model(CFG)
    params = gpt2_params_from_hf(
        {k: v.numpy() for k, v in hf.state_dict().items()}, n_layer=2
    )

    def fwd(p, ids, mask, tt):
        embs = model.apply({"params": p}, ids, method=model.embed)
        hidden = model.apply({"params": p}, embs, mask, tt)
        return model.apply({"params": p}, hidden, method=model.logits)

    got = np.asarray(jax.jit(fwd)(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt)
    ))
    # compare only non-pad query positions (HF pads differ arbitrarily)
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], atol=5e-5, rtol=1e-4)


def test_gpt_dialogue_losses(rng):
    cfg = GPTDialogueConfig(gpt=CFG, len_video_ft=FT)
    model = GPTDialogue(cfg)
    assert registry.get_model_class("gpt_dialogue") is GPTDialogue

    ids = jnp.asarray(rng.randint(0, V, (B, S)), jnp.int32)
    video = jnp.asarray(rng.rand(B, T, FT), jnp.float32)
    mask = jnp.ones((B, T + S), jnp.int32)
    tt = jnp.asarray(rng.randint(0, V, (B, T + S)), jnp.int32)
    labels = np.asarray(rng.randint(0, V, (B, T + S)), np.int32)
    labels[:, :T] = -1  # video prefix ignored in LM loss
    labels = jnp.asarray(labels)

    variables = model.init(jax.random.PRNGKey(0), ids, video, mask, tt)
    out = model.apply(variables, ids, video, mask, tt, labels)
    assert out["logits"].shape == (B, T + S, V)
    assert np.isfinite(float(out["loss"]))
    # loss without labels = video MSE only, strictly smaller
    out2 = model.apply(variables, ids, video, mask, tt)
    assert float(out2["loss"]) < float(out["loss"])


def test_gpt_dialogue_lm_loss_matches_torch_ce(rng):
    """Shifted CE with ignore_index=-1 semantics (reference :58-66)."""
    torch = pytest.importorskip("torch")
    cfg = GPTDialogueConfig(gpt=CFG, len_video_ft=FT)
    model = GPTDialogue(cfg)
    ids = jnp.asarray(rng.randint(0, V, (B, S)), jnp.int32)
    video = jnp.asarray(rng.rand(B, T, FT), jnp.float32)
    mask = jnp.ones((B, T + S), jnp.int32)
    tt = jnp.zeros((B, T + S), jnp.int32)
    labels_np = np.asarray(rng.randint(0, V, (B, T + S)), np.int64)
    labels_np[:, : T + 2] = -1

    variables = model.init(jax.random.PRNGKey(0), ids, video, mask, tt)
    out = model.apply(variables, ids, video, mask, tt, jnp.asarray(labels_np))
    logits = np.asarray(out["logits"], np.float32)

    ref_lm = torch.nn.functional.cross_entropy(
        torch.tensor(logits[:, :-1]).reshape(-1, V),
        torch.tensor(labels_np[:, 1:]).reshape(-1),
        ignore_index=-1,
    ).item()
    hidden_T = np.asarray(
        model.apply(variables, ids, video, mask, tt)["logits"]
    )  # just to assert determinism of apply
    np.testing.assert_allclose(hidden_T, logits, atol=0, rtol=0)

    video_np = np.asarray(video)
    # reconstruct video loss with the model's own head output
    lm_only = float(out["loss"]) - _video_mse(model, variables, ids, video, mask, tt, video_np)
    np.testing.assert_allclose(lm_only, ref_lm, atol=1e-5, rtol=1e-5)


def _video_mse(model, variables, ids, video, mask, tt, video_np):
    out = model.apply(variables, ids, video, mask, tt)  # no labels → video MSE only
    return float(out["loss"])
