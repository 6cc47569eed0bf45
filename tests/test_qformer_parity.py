"""Golden parity: our JAX Q-Former vs the reference torch fork, random weights.

This is the strongest correctness anchor available without the pretrained
checkpoints (zero-egress environment): instantiate the reference
``BertModel`` fork at a tiny config, port its random weights through
``qformer_params_from_torch``, and require logit-level agreement in every
operating mode the SPRC models use (SURVEY.md §7.2 "weight-exact Q-Former
port").
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sprc_tpu.models.qformer import QFormer, QFormerConfig
from sprc_tpu.interop.torch_import import (
    qformer_params_from_torch,
    torch_state_dict_to_numpy,
)

HIDDEN = 32
HEADS = 2
LAYERS = 4
INTER = 64
ENC_WIDTH = 48
Q = 4
VOCAB = 100
TXT = 6
B = 3
IMG_TOKENS = 5

ATOL = 2e-5


@pytest.fixture(scope="module")
def pair(ref_qformer_module):
    """(torch model, jax module, jax params)"""
    import torch

    mod = ref_qformer_module
    cfg = mod.BertConfig(
        vocab_size=VOCAB,
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=INTER,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    cfg.encoder_width = ENC_WIDTH
    cfg.add_cross_attention = True
    cfg.cross_attention_freq = 2
    cfg.query_length = Q
    torch.manual_seed(0)
    tmodel = mod.BertModel(cfg, add_pooling_layer=False).eval()

    jcfg = QFormerConfig(
        vocab_size=VOCAB,
        hidden_size=HIDDEN,
        num_layers=LAYERS,
        num_heads=HEADS,
        intermediate_size=INTER,
        encoder_width=ENC_WIDTH,
        cross_attention_freq=2,
        query_length=Q,
        dropout_rate=0.0,
        attention_dropout_rate=0.0,
    )
    jmodel = QFormer(jcfg)
    sd = torch_state_dict_to_numpy(tmodel.state_dict())
    params = qformer_params_from_torch(
        sd, prefix="", num_layers=LAYERS, cross_attention_freq=2
    )
    return tmodel, jmodel, {"params": params}


def _inputs(rng):
    ids = rng.randint(0, VOCAB, size=(B, TXT)).astype(np.int32)
    mask = np.ones((B, TXT), np.int32)
    mask[0, -2:] = 0  # real padding
    queries = rng.randn(B, Q, HIDDEN).astype(np.float32)
    img = rng.randn(B, IMG_TOKENS, ENC_WIDTH).astype(np.float32)
    return ids, mask, queries, img


def _torch_out(tmodel, **kw):
    import torch

    with torch.no_grad():
        kw = {
            k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
            for k, v in kw.items()
        }
        if "input_ids" in kw and kw["input_ids"] is not None:
            kw["input_ids"] = kw["input_ids"].long()
        if kw.get("attention_mask") is not None:
            kw["attention_mask"] = kw["attention_mask"].long()
        return tmodel(return_dict=True, **kw).last_hidden_state.numpy()


def test_fusion_pass_parity(pair, rng):
    """Queries + text with cross-attention into image (the fusion pass)."""
    tmodel, jmodel, variables = pair
    ids, mask, queries, img = _inputs(rng)
    full_mask = np.concatenate([np.ones((B, Q), np.int32), mask], axis=1)

    want = _torch_out(
        tmodel,
        input_ids=ids,
        query_embeds=queries,
        attention_mask=full_mask,
        encoder_hidden_states=img,
    )
    got = jmodel.apply(
        variables,
        input_ids=jnp.asarray(ids),
        query_embeds=jnp.asarray(queries),
        attention_mask=jnp.asarray(full_mask),
        image_embeds=jnp.asarray(img),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_text_pass_with_fused_queries_parity(pair, rng):
    """Fused queries re-fed as query_embeds, NO image: the fork routes ALL
    positions (queries included) through the text FFN (Qformer.py:434-435)."""
    tmodel, jmodel, variables = pair
    ids, mask, queries, _ = _inputs(rng)
    full_mask = np.concatenate([np.ones((B, Q), np.int32), mask], axis=1)

    want = _torch_out(
        tmodel, input_ids=ids, query_embeds=queries, attention_mask=full_mask
    )
    got = jmodel.apply(
        variables,
        input_ids=jnp.asarray(ids),
        query_embeds=jnp.asarray(queries),
        attention_mask=jnp.asarray(full_mask),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_query_only_image_pass_parity(pair, rng):
    """Queries-only pass over image embeds (target tower)."""
    tmodel, jmodel, variables = pair
    _, _, queries, img = _inputs(rng)

    want = _torch_out(tmodel, query_embeds=queries, encoder_hidden_states=img)
    got = jmodel.apply(
        variables,
        query_embeds=jnp.asarray(queries),
        image_embeds=jnp.asarray(img),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_no_img_insert_parity(pair, rng):
    """The SPRC ``no_img`` mode: queries spliced after CLS with position
    embeddings over the spliced sequence (Qformer.py:102-104)."""
    tmodel, jmodel, variables = pair
    ids, mask, queries, _ = _inputs(rng)
    full_mask = np.concatenate([np.ones((B, Q), np.int32), mask], axis=1)

    want = _torch_out(
        tmodel,
        input_ids=ids,
        query_embeds=queries,
        attention_mask=full_mask,
        no_img=True,
    )
    got = jmodel.apply(
        variables,
        input_ids=jnp.asarray(ids),
        query_embeds=jnp.asarray(queries),
        attention_mask=jnp.asarray(full_mask),
        no_img=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_plain_text_parity(pair, rng):
    """Plain BERT text encoding (used by rerank text tower)."""
    tmodel, jmodel, variables = pair
    ids, mask, _, _ = _inputs(rng)

    want = _torch_out(tmodel, input_ids=ids, attention_mask=mask)
    got = jmodel.apply(
        variables,
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_image_mask_parity(pair, rng):
    """Padding on the image side must mask cross-attention."""
    tmodel, jmodel, variables = pair
    import torch

    _, _, queries, img = _inputs(rng)
    img_mask = np.ones((B, IMG_TOKENS), np.int32)
    img_mask[:, -1] = 0

    with torch.no_grad():
        want = tmodel(
            query_embeds=torch.from_numpy(queries),
            encoder_hidden_states=torch.from_numpy(img),
            encoder_attention_mask=torch.from_numpy(img_mask).long(),
            return_dict=True,
        ).last_hidden_state.numpy()
    got = jmodel.apply(
        variables,
        query_embeds=jnp.asarray(queries),
        image_embeds=jnp.asarray(img),
        image_mask=jnp.asarray(img_mask),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)
