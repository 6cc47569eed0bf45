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


@pytest.mark.parametrize("attn", ["batched", "f32", "padk", "perhead"])
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


def test_decoder_mode_falls_back(setup):
    """UniLM (decoder) masks are outside the kernel's contract: the flag ON
    must still produce the unfused decoder result (fallback, not garbage)."""
    model, params, ids, queries, img, mask = setup
    kw = dict(input_ids=ids, query_embeds=queries, attention_mask=mask,
              image_embeds=img, is_decoder=True)
    want = _run(model, params, "0", **kw)
    got = _run(model, params, "force", **kw)
    np.testing.assert_allclose(got, want, atol=1e-6)
