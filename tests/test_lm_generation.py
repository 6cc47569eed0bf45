"""Decoder-mode / LM-head parity vs reference BertLMHeadModel + greedy decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.lm import QFormerLM, greedy_generate, qformer_lm_params_from_torch
from sprc_tpu.models.qformer import QFormerConfig

HIDDEN = 32
HEADS = 2
LAYERS = 2
INTER = 64
ENC = 48
Q = 4
VOCAB = 50
TXT = 6
B = 2


@pytest.fixture(scope="module")
def pair(ref_qformer_module):
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
    cfg.encoder_width = ENC
    cfg.add_cross_attention = True
    cfg.cross_attention_freq = 2
    cfg.query_length = Q
    torch.manual_seed(3)
    tmodel = mod.BertLMHeadModel(cfg).eval()

    jcfg = QFormerConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=LAYERS, num_heads=HEADS,
        intermediate_size=INTER, encoder_width=ENC, cross_attention_freq=2,
        query_length=Q, dropout_rate=0.0,
    )
    jmodel = QFormerLM(jcfg)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = qformer_lm_params_from_torch(sd, prefix="", num_layers=LAYERS)
    return tmodel, jmodel, params


def test_decoder_logits_parity(pair, rng):
    import torch

    tmodel, jmodel, params = pair
    ids = rng.randint(0, VOCAB, (B, TXT)).astype(np.int32)
    mask = np.ones((B, TXT), np.int32)
    queries = rng.randn(B, Q, HIDDEN).astype(np.float32)
    img = rng.randn(B, 5, ENC).astype(np.float32)
    full_mask = np.concatenate([np.ones((B, Q), np.int32), mask], axis=1)

    with torch.no_grad():
        out = tmodel(
            input_ids=torch.from_numpy(ids).long(),
            query_embeds=torch.from_numpy(queries),
            attention_mask=torch.from_numpy(full_mask).long(),
            encoder_hidden_states=torch.from_numpy(img),
            is_decoder=True,
            return_dict=True,
        )
        want = out.logits.numpy()

    got = jmodel.apply(
        {"params": params},
        jnp.asarray(ids),
        jnp.asarray(queries),
        attention_mask=jnp.asarray(full_mask),
        image_embeds=jnp.asarray(img),
    )
    assert got.shape == want.shape == (B, TXT, VOCAB)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_greedy_generate_matches_reference_stepwise(pair, rng):
    """Greedy decode must follow the reference's per-step argmax."""
    import torch

    tmodel, jmodel, params = pair
    queries = rng.randn(B, Q, HIDDEN).astype(np.float32)
    img = rng.randn(B, 5, ENC).astype(np.float32)
    bos, eos, pad = 1, 2, 0
    max_len = 6

    ids = greedy_generate(
        jmodel, params, jnp.asarray(queries), jnp.asarray(img),
        bos_token_id=bos, eos_token_id=eos, pad_token_id=pad,
        max_length=max_len, min_length=2,
    )
    ids = np.asarray(ids)
    assert ids.shape == (B, max_len)
    assert (ids[:, 0] == bos).all()

    # reference stepwise greedy (equivalent to HF greedy with the same
    # min-length EOS suppression)
    t_ids = np.full((B, max_len), pad, np.int64)
    t_ids[:, 0] = bos
    fin = np.zeros(B, bool)
    for step in range(1, max_len):
        with torch.no_grad():
            out = tmodel(
                input_ids=torch.from_numpy(t_ids[:, :step]),
                query_embeds=torch.from_numpy(queries),
                encoder_hidden_states=torch.from_numpy(img),
                is_decoder=True,
                return_dict=True,
            )
        logits = out.logits[:, -1, :].numpy()
        if step < 2:
            logits[:, eos] = -1e9
        nxt = logits.argmax(-1)
        nxt = np.where(fin, pad, nxt)
        t_ids[:, step] = nxt
        fin |= nxt == eos
    np.testing.assert_array_equal(ids, t_ids)


def test_beam_generate_beats_or_matches_greedy(pair, rng):
    """Beam search must find sequences with >= greedy log-probability, and
    num_beams=1 must equal greedy exactly."""
    from sprc_tpu.models.lm import beam_generate, greedy_generate

    tmodel, jmodel, params = pair
    queries = rng.randn(B, Q, HIDDEN).astype(np.float32)
    img = rng.randn(B, 5, ENC).astype(np.float32)
    bos, eos, pad = 1, 2, 0
    kw = dict(bos_token_id=bos, eos_token_id=eos, pad_token_id=pad,
              max_length=6, min_length=2)

    greedy = np.asarray(greedy_generate(
        jmodel, params, jnp.asarray(queries), jnp.asarray(img), **kw))
    beam1 = np.asarray(beam_generate(
        jmodel, params, jnp.asarray(queries), jnp.asarray(img),
        num_beams=1, length_penalty=0.0, **kw))
    np.testing.assert_array_equal(greedy, beam1)

    beam3 = np.asarray(beam_generate(
        jmodel, params, jnp.asarray(queries), jnp.asarray(img),
        num_beams=3, length_penalty=0.0, **kw))
    assert beam3.shape == greedy.shape

    def seq_logprob(ids_row):
        import torch

        with torch.no_grad():
            out = jmodel.apply(
                {"params": params}, jnp.asarray(ids_row[None]),
                jnp.asarray(queries[:1]), image_embeds=jnp.asarray(img[:1]),
            )
        logits = np.asarray(out)[0]
        lp = logits - logits.max(-1, keepdims=True)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        total = 0.0
        for t in range(1, len(ids_row)):
            if ids_row[t] == pad:
                break
            total += lp[t - 1, ids_row[t]]
            if ids_row[t] == eos:
                break
        return total

    assert seq_logprob(beam3[0]) >= seq_logprob(greedy[0]) - 1e-6


def test_cached_greedy_matches_recompute():
    """KV-cached decode (reference Qformer.py past_key_values path) is
    stepwise-identical to the full-prefix recompute decoder."""
    from sprc_tpu.models.lm import cached_greedy_generate, greedy_generate
    from sprc_tpu.models.qformer import QFormerConfig
    from sprc_tpu.models.lm import QFormerLM

    cfg = QFormerConfig(
        vocab_size=40, hidden_size=24, num_layers=3, num_heads=2,
        intermediate_size=48, encoder_width=16, query_length=4,
        dropout_rate=0.0, attention_dropout_rate=0.0, cross_attention_freq=2,
    )
    lm = QFormerLM(cfg)
    rs = np.random.RandomState(0)
    qe = jnp.asarray(rs.randn(2, 4, 24) * 0.1, jnp.float32)
    ie = jnp.asarray(rs.randn(2, 7, 16) * 0.1, jnp.float32)
    params = lm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3), jnp.int32), qe[:1], None, ie[:1]
    )["params"]
    kw = dict(bos_token_id=2, eos_token_id=3, pad_token_id=0,
              max_length=12, min_length=4)
    a = greedy_generate(lm, params, qe, ie, **kw)
    b = cached_greedy_generate(lm, params, qe, ie, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cached_beam_matches_host_beam():
    """Device-side KV-cached beam search is token-identical to the host
    numpy beam loop it replaces (VERDICT r2 item 8)."""
    from sprc_tpu.models.lm import beam_generate, cached_beam_generate
    from sprc_tpu.models.qformer import QFormerConfig
    from sprc_tpu.models.lm import QFormerLM

    cfg = QFormerConfig(
        vocab_size=40, hidden_size=24, num_layers=3, num_heads=2,
        intermediate_size=48, encoder_width=16, query_length=4,
        dropout_rate=0.0, attention_dropout_rate=0.0, cross_attention_freq=2,
    )
    lm = QFormerLM(cfg)
    rs = np.random.RandomState(7)
    qe = jnp.asarray(rs.randn(2, 4, 24) * 0.1, jnp.float32)
    ie = jnp.asarray(rs.randn(2, 7, 16) * 0.1, jnp.float32)
    params = lm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3), jnp.int32), qe[:1], None, ie[:1]
    )["params"]
    for penalty in (0.0, 1.0):
        kw = dict(bos_token_id=2, eos_token_id=3, pad_token_id=0,
                  num_beams=3, max_length=10, min_length=3,
                  length_penalty=penalty)
        host = np.asarray(beam_generate(lm, params, qe, ie, **kw))
        dev = np.asarray(cached_beam_generate(lm, params, qe, ie, **kw))
        np.testing.assert_array_equal(dev, host)


def test_generate_captions_beam_and_greedy():
    """generate_captions drives the cached decoders end-to-end on a tiny CIR
    model (reference default num_beams=3, …cir_align_prompt.py:208)."""
    import jax
    from sprc_tpu.loader import build_model, init_params
    from sprc_tpu.models.lm import QFormerLM, generate_captions
    from sprc_tpu.models.qformer import QFormerConfig
    from sprc_tpu.models.vit import ViTConfig

    vcfg = ViTConfig(image_size=28, patch_size=14, width=24, depth=1,
                     num_heads=2, mlp_hidden=48, qkv_fused_no_kbias=True,
                     dtype=jnp.float32)
    qcfg = QFormerConfig(vocab_size=40, hidden_size=24, num_layers=2,
                         num_heads=2, intermediate_size=48, encoder_width=24,
                         query_length=3, dropout_rate=0.0)
    model = build_model("blip2_cir_align_prompt", image_size=28,
                        num_query_token=3, max_txt_len=6, vocab_size=40,
                        vit_dtype=jnp.float32, vit_config_override=vcfg,
                        qformer_config_override=qcfg)
    params = init_params(model)
    lm = QFormerLM(qcfg)
    lm_head = lm.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 2), jnp.int32),
        jnp.zeros((1, 3, 24)), None, jnp.zeros((1, 5, 24)),
    )["params"]["lm_head"]

    class Tok:
        bos_id, sep_id, pad_id = 2, 3, 0

        def decode(self, ids):
            return " ".join(str(int(i)) for i in ids
                            if int(i) not in (0, 2, 3))

    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 28, 28, 3), jnp.float32)
    for beams in (1, 3):
        caps = generate_captions(
            model, params, lm_head, imgs, Tok(),
            max_length=8, min_length=2, num_beams=beams)
        assert len(caps) == 2 and all(isinstance(c, str) for c in caps)


def test_cached_decode_reuses_compiled_programs():
    """A second generate call (even through a DIFFERENT but config-equal
    QFormerLM instance) must hit the module-level jit caches instead of
    retracing the per-token decode program — remote compiles cost minutes
    per retrace through the TPU tunnel."""
    from sprc_tpu.models import lm as lm_mod
    from sprc_tpu.models.lm import (
        QFormerLM, cached_beam_generate, cached_greedy_generate,
    )
    from sprc_tpu.models.qformer import QFormerConfig

    cfg = QFormerConfig(
        vocab_size=40, hidden_size=24, num_layers=2, num_heads=2,
        intermediate_size=48, encoder_width=16, query_length=4,
        dropout_rate=0.0, attention_dropout_rate=0.0, cross_attention_freq=2,
    )
    rs = np.random.RandomState(11)
    qe = jnp.asarray(rs.randn(2, 4, 24) * 0.1, jnp.float32)
    ie = jnp.asarray(rs.randn(2, 7, 16) * 0.1, jnp.float32)
    lm1 = QFormerLM(cfg)
    params = lm1.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3), jnp.int32), qe[:1], None,
        ie[:1],
    )["params"]
    kw = dict(bos_token_id=2, eos_token_id=3, pad_token_id=0,
              max_length=8, min_length=2)

    first = np.asarray(cached_greedy_generate(lm1, params, qe, ie, **kw))
    sizes = {
        name: getattr(lm_mod, name)._cache_size()
        for name in ("_qf_prefill", "_qf_step", "_qf_greedy_step",
                     "_qf_beam_step")
    }
    # fresh-but-equal module instance: still no retrace
    again = np.asarray(
        cached_greedy_generate(QFormerLM(cfg), params, qe, ie, **kw))
    np.testing.assert_array_equal(again, first)
    cached_beam_generate(lm1, params, qe, ie, num_beams=3, **kw)
    cached_beam_generate(QFormerLM(cfg), params, qe, ie, num_beams=3, **kw)
    after = {
        name: getattr(lm_mod, name)._cache_size()
        for name in sizes
    }
    # greedy entries unchanged; beam adds exactly one entry per jit (the
    # K-times-larger batch), not one per call
    assert after["_qf_greedy_step"] == sizes["_qf_greedy_step"]
    assert after["_qf_step"] == sizes["_qf_step"]
    assert after["_qf_prefill"] == sizes["_qf_prefill"] + 1
    assert after["_qf_beam_step"] <= sizes["_qf_beam_step"] + 1
