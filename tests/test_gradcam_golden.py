"""Numerical golden test for the probe-gradient GradCAM (VERDICT r2 6c).

The reference computes GradCAM with stateful backward hooks on the torch
cross-attention module (blip_image_text_matching.py:151-199 + med.py
save_attention machinery). utils/gradcam.py reformulates it as the gradient
w.r.t. a zero-valued additive probe on the attention probs. This test runs
BOTH on the same tiny weights (reference med.py loaded standalone) and
requires the cams * relu(grads) maps — and the assembled per-token layout —
to agree numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

VOCAB, TH, TLAYERS, HEADS, TINTER, VW = 60, 24, 3, 2, 48, 16
B, TXT, P_IMG = 2, 6, 5
BLOCK = 1


def test_probe_gradcam_matches_reference_hooks(ref_med_module, rng):
    import torch

    from sprc_tpu.interop.torch_import import _layernorm, _linear
    from sprc_tpu.models.albef import MedEncoder
    from sprc_tpu.models.qformer import QFormerConfig

    mod = ref_med_module
    cfg = mod.BertConfig(
        vocab_size=VOCAB, hidden_size=TH, num_hidden_layers=TLAYERS,
        num_attention_heads=HEADS, intermediate_size=TINTER,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfg.encoder_width = VW
    cfg.add_cross_attention = True
    cfg.add_type_embeddings = False
    cfg.fusion_layer = 0  # BLIP flavor: cross-attention on every layer
    torch.manual_seed(11)
    tmodel = mod.BertModel(cfg, add_pooling_layer=False).eval()

    jcfg = QFormerConfig(vocab_size=VOCAB, hidden_size=TH, num_layers=TLAYERS,
                         num_heads=HEADS, intermediate_size=TINTER,
                         encoder_width=VW, dropout_rate=0.0)
    jmodel = MedEncoder(jcfg, TLAYERS, cross_from=0)

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

    ids = rng.randint(1, VOCAB, (B, TXT)).astype(np.int32)
    mask = np.ones((B, TXT), np.int32)
    mask[0, -2:] = 0
    img = rng.randn(B, P_IMG + 1, VW).astype(np.float32)  # [CLS | patches]
    head_w = rng.randn(TH, 2).astype(np.float32) * 0.2
    head_b = rng.randn(2).astype(np.float32) * 0.1

    # ---- reference: backward hooks (compute_gradcam :151-182) ----------
    attn = tmodel.encoder.layer[BLOCK].crossattention.self
    attn.save_attention = True
    t_ids = torch.from_numpy(ids).long()
    t_mask = torch.from_numpy(mask).long()
    t_img = torch.from_numpy(img)
    out = tmodel(
        t_ids, attention_mask=t_mask, encoder_hidden_states=t_img,
        mode="multimodal", return_dict=True,
    ).last_hidden_state
    logits = out[:, 0, :] @ torch.from_numpy(head_w) + torch.from_numpy(head_b)
    loss = logits[:, 1].sum()
    tmodel.zero_grad()
    loss.backward()
    with torch.no_grad():
        m = t_mask.view(B, 1, -1, 1).float()
        grads_t = attn.get_attn_gradients()
        cams_t = attn.get_attention_map()
        cams_r = cams_t[:, :, :, 1:] * m
        grads_r = grads_t[:, :, :, 1:].clamp(0) * m
        want_maps = (cams_r * grads_r).mean(1).numpy()  # [B, L, P_IMG]
        token_length = (t_mask.sum(dim=-1) - 2).numpy()
        want_full = []
        for b in range(B):
            g = torch.from_numpy(want_maps[b])
            n = int(token_length[b])
            want_full.append(torch.cat(
                (g[0:1], g[1: n + 1].sum(dim=0, keepdim=True) / n, g[1:])
            ).numpy())
        want_full = np.stack(want_full)

    # ---- ours: gradient w.r.t. a zero additive probe --------------------
    probe0 = jnp.zeros((B, HEADS, TXT, P_IMG + 1), jnp.float32)

    def f(probe):
        hidden, probs = jmodel.apply(
            {"params": params}, input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask), image_embeds=jnp.asarray(img),
            mode="multimodal", gradcam_layer=BLOCK, gradcam_probe=probe,
        )
        lg = hidden[:, 0, :] @ jnp.asarray(head_w) + jnp.asarray(head_b)
        return jnp.sum(lg[:, 1]), probs

    (_, probs), grads = jax.value_and_grad(f, has_aux=True)(probe0)
    mj = jnp.asarray(mask, jnp.float32)[:, None, :, None]
    got_maps = np.asarray(
        ((probs[:, :, :, 1:] * mj) * (jnp.clip(grads[:, :, :, 1:], 0.0) * mj)
         ).mean(axis=1))

    np.testing.assert_allclose(got_maps, want_maps, atol=2e-5)

    # assembled [CLS row | token average | per-token rows] layout
    got_full = []
    for b in range(B):
        g = got_maps[b]
        n = int(mask[b].sum() - 2)
        got_full.append(np.concatenate(
            [g[0:1], g[1: n + 1].sum(axis=0, keepdims=True) / n, g[1:]]))
    np.testing.assert_allclose(np.stack(got_full), want_full, atol=2e-5)
