"""Fused Q-Former layer kernel == unfused flax composition (interpret mode).

Covers the three inference pass shapes the kernel serves (reference hot
loop 2, validate_blip.py:359-410): fusion pass (queries+text, cross-attn
to image, dual FFN), prompt pass (no_img: text FFN everywhere), and the
queries-only target pass — plus padded text masks.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.qformer import QFormer, QFormerConfig

CFG = QFormerConfig(
    vocab_size=60, hidden_size=128, num_layers=2, num_heads=2,
    intermediate_size=128, encoder_width=128, query_length=4,
    dropout_rate=0.0, attention_dropout_rate=0.0, cross_attention_freq=1,
)
B, Q, L, SI = 4, 4, 6, 5


@pytest.fixture(scope="module")
def setup(rng):
    model = QFormer(CFG)
    ids = jnp.asarray(rng.randint(0, 60, (B, L)), jnp.int32)
    queries = jnp.asarray(rng.randn(B, Q, 128) * 0.1, jnp.float32)
    img = jnp.asarray(rng.randn(B, SI, 128) * 0.1, jnp.float32)
    mask = np.ones((B, Q + L), np.int32)
    mask[0, -2:] = 0
    mask = jnp.asarray(mask)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=ids, query_embeds=queries,
        attention_mask=mask, image_embeds=img,
    )["params"]
    return model, params, ids, queries, img, mask


def _run(model, params, flag, **kw):
    old = os.environ.get("SPRC_PALLAS_QF")
    os.environ["SPRC_PALLAS_QF"] = flag
    try:
        return np.asarray(model.apply({"params": params}, **kw))
    finally:
        if old is None:
            os.environ.pop("SPRC_PALLAS_QF", None)
        else:
            os.environ["SPRC_PALLAS_QF"] = old


@pytest.mark.parametrize("attn", ["batched", "f32", "padk", "perhead", "perhead_nomax"])
def test_fusion_pass_parity(setup, attn, monkeypatch):
    """All four SPRC_QF_ATTN in-kernel attention variants (added to isolate
    the Mosaic compile crash at real dims) must agree with the unfused
    composition — they differ in layout/padding, not math."""
    monkeypatch.setenv("SPRC_QF_ATTN", attn)
    model, params, ids, queries, img, mask = setup
    kw = dict(input_ids=ids, query_embeds=queries, attention_mask=mask,
              image_embeds=img)
    want = _run(model, params, "0", **kw)
    got = _run(model, params, "force", **kw)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_prompt_pass_no_img_parity(setup):
    model, params, ids, queries, img, mask = setup
    kw = dict(input_ids=ids, query_embeds=queries, attention_mask=mask,
              no_img=True)
    want = _run(model, params, "0", **kw)
    got = _run(model, params, "force", **kw)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_queries_only_pass_parity(setup):
    model, params, ids, queries, img, mask = setup
    kw = dict(query_embeds=queries, image_embeds=img)
    want = _run(model, params, "0", **kw)
    got = _run(model, params, "force", **kw)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("case", ["fusion", "prompt", "queries"])
def test_int8_kernel_close(setup, monkeypatch, case):
    """SPRC_QF_INT8=1 routes the fused layer's ten dense projections onto
    the int8 path (per-row dynamic act scales, per-out-channel weight
    scales). Pure quantization noise vs the fp composition — bounded
    relative error, not exact."""
    monkeypatch.setenv("SPRC_QF_INT8", "1")
    model, params, ids, queries, img, mask = setup
    kw = {
        "fusion": dict(input_ids=ids, query_embeds=queries,
                       attention_mask=mask, image_embeds=img),
        "prompt": dict(input_ids=ids, query_embeds=queries,
                       attention_mask=mask, no_img=True),
        "queries": dict(query_embeds=queries, image_embeds=img),
    }[case]
    want = _run(model, params, "0", **kw)
    got = _run(model, params, "force", **kw)
    err = np.abs(got - want) / np.maximum(np.abs(want), 1e-2)
    assert np.median(err) < 0.02, np.median(err)
    assert np.quantile(err, 0.99) < 0.15, np.quantile(err, 0.99)


def test_int8_rank_preserving(setup, monkeypatch, rng):
    """Retrieval-style A/B (mirrors test_quant.py's tower check): token-max
    scores from int8-QF features must mostly preserve fp top-1 rankings."""
    model, params, ids, queries, img, mask = setup
    n_g, n_q = 12, 6
    g_img = jnp.asarray(rng.randn(n_g, SI, 128) * 0.1, jnp.float32)
    q_img = jnp.asarray(rng.randn(n_q, SI, 128) * 0.1, jnp.float32)

    def feats(images, flag):
        qs = jnp.broadcast_to(queries[:1], (images.shape[0], Q, 128))
        if flag:
            monkeypatch.setenv("SPRC_QF_INT8", "1")
        else:
            monkeypatch.delenv("SPRC_QF_INT8", raising=False)
        out = _run(model, params, "force", query_embeds=qs,
                   image_embeds=images)
        out = out / np.linalg.norm(out, axis=-1, keepdims=True)
        return out  # [N, Q, W]

    ranks = {}
    for flag in (False, True):
        g, q = feats(g_img, flag), feats(q_img, flag)
        sim = np.einsum("nqw,mkw->nmqk", q, g).max(-1).mean(-1)  # token-max
        ranks[flag] = sim.argmax(-1)
    assert (ranks[False] == ranks[True]).mean() >= 0.75, ranks


def test_int8_flag_off_is_exact(setup, monkeypatch):
    """Without the opt-in the fused path must remain the fp kernel —
    bit-for-bit the existing parity contract."""
    monkeypatch.delenv("SPRC_QF_INT8", raising=False)
    model, params, ids, queries, img, mask = setup
    kw = dict(input_ids=ids, query_embeds=queries, attention_mask=mask,
              image_embeds=img)
    want = _run(model, params, "0", **kw)
    got = _run(model, params, "force", **kw)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_decoder_mode_falls_back(setup):
    """UniLM (decoder) masks are outside the kernel's contract: the flag ON
    must still produce the unfused decoder result (fallback, not garbage)."""
    model, params, ids, queries, img, mask = setup
    kw = dict(input_ids=ids, query_embeds=queries, attention_mask=mask,
              image_embeds=img, is_decoder=True)
    want = _run(model, params, "0", **kw)
    got = _run(model, params, "force", **kw)
    np.testing.assert_allclose(got, want, atol=1e-6)
