"""KV-cached decode == full-recompute decode, stepwise, for the LLM heads.

VERDICT r2 item 5: the Q-Former cached pattern (models/lm.py) generalized
to LLaMA / OPT / T5 (and FiD via the T5 decoder). Reference analogue:
``past_key_values`` plumbing in HF modeling_{llama,opt,t5}.py.

Each test greedy-decodes a tiny randomly-initialized model twice — full
prefix recompute per token vs prefill+cached steps — and requires token-
identical outputs (same argmax at every step), including right-padded
variable-length prompts for the decoder-only models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sprc_tpu.models.generation import cached_greedy_loop


def _uncached_greedy_rows(logits_fn, ids0, mask0, lengths, max_new, eos, pad):
    """Reference loop: per-row append into the padded buffer (the
    instruct_generate semantics - full recompute each token)."""
    B, total = ids0.shape
    ids = np.asarray(ids0).copy()
    mask = np.asarray(mask0).copy()
    lengths = np.asarray(lengths).copy()
    finished = np.zeros((B,), bool)
    out = np.full((B, max_new), pad, np.int32)
    for t in range(max_new):
        logits = np.asarray(logits_fn(jnp.asarray(ids), jnp.asarray(mask)))
        rows = np.arange(B)
        next_logits = logits[rows, lengths - 1]
        tok = next_logits.argmax(-1).astype(np.int32)
        tok = np.where(finished, pad, tok)
        out[:, t] = tok
        ids[rows, lengths] = tok
        mask[rows, lengths] = (~finished).astype(np.int32)
        lengths = lengths + 1
        finished |= tok == eos
        if finished.all():
            break
    return out


@pytest.fixture(scope="module")
def llama_tiny():
    from sprc_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(vocab_size=97, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=4, dtype=jnp.float32)
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))[
        "params"]
    return model, params, cfg


def test_llama_cached_equals_uncached(llama_tiny):
    model, params, cfg = llama_tiny
    B, P, max_new = 3, 6, 8
    rs = np.random.RandomState(0)
    lengths = np.asarray([6, 4, 5])
    total = P + max_new
    ids = np.zeros((B, total), np.int32)
    mask = np.zeros((B, total), np.int32)
    for b in range(B):
        ids[b, : lengths[b]] = rs.randint(1, 97, lengths[b])
        mask[b, : lengths[b]] = 1
    eos, pad = 2, 0

    logits_fn = jax.jit(
        lambda i, m: model.apply({"params": params}, i, m))
    want = _uncached_greedy_rows(
        logits_fn, ids, mask, lengths, max_new, eos, pad)

    s_max = total
    prefill = jax.jit(
        lambda p, i, m: model.apply(
            {"params": p}, i, m,
            method=lambda mdl, i_, m_: mdl.prefill(
                mdl.embed_tokens(i_), m_, s_max)))
    hidden, cache = prefill(params, jnp.asarray(ids[:, :P]),
                            jnp.asarray(mask[:, :P]))
    rows = jnp.arange(B)
    logits0 = model.apply(
        {"params": params},
        hidden[rows, jnp.asarray(lengths) - 1][:, None, :],
        method=lambda mdl, h: mdl.logits(h))[:, 0, :]

    step = jax.jit(
        lambda p, tok, pos, cache: model.apply(
            {"params": p}, tok, pos, cache,
            method=lambda mdl, *a: mdl.decode_step_logits(*a)))

    def step_fn(tok, pos, state):
        cache, p = state
        logits, cache = step(p, tok, pos, cache)
        return logits, (cache, p)

    got = cached_greedy_loop(
        logits0, (cache, params), jnp.asarray(lengths), step_fn,
        eos_token_id=eos, pad_token_id=pad, max_new_tokens=max_new)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.fixture(scope="module")
def opt_tiny():
    from sprc_tpu.models.opt import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(vocab_size=89, hidden_size=32, ffn_dim=64, num_layers=2,
                    num_heads=4, max_positions=64, dtype=jnp.float32)
    model = OPTForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32))[
        "params"]
    return model, params, cfg


def test_opt_cached_equals_uncached(opt_tiny):
    model, params, cfg = opt_tiny
    B, P, max_new = 3, 5, 7
    rs = np.random.RandomState(1)
    lengths = np.asarray([5, 3, 4])
    total = P + max_new
    ids = np.zeros((B, total), np.int32)
    mask = np.zeros((B, total), np.int32)
    for b in range(B):
        ids[b, : lengths[b]] = rs.randint(1, 89, lengths[b])
        mask[b, : lengths[b]] = 1
    eos, pad = 2, 1

    logits_fn = jax.jit(lambda i, m: model.apply({"params": params}, i, m))
    want = _uncached_greedy_rows(
        logits_fn, ids, mask, lengths, max_new, eos, pad)

    s_max = total
    prefill = jax.jit(
        lambda p, i, m: model.apply(
            {"params": p}, i, m,
            method=lambda mdl, i_, m_: mdl.prefill(
                mdl.embed(i_), m_, s_max)))
    hidden, cache = prefill(params, jnp.asarray(ids[:, :P]),
                            jnp.asarray(mask[:, :P]))
    rows = jnp.arange(B)
    logits0 = model.apply(
        {"params": params}, hidden[rows, jnp.asarray(lengths) - 1][:, None, :],
        method=lambda mdl, h: mdl.logits(h))[:, 0, :]

    step = jax.jit(
        lambda p, tok, pos, cache: model.apply(
            {"params": p}, tok, pos, cache,
            method=lambda mdl, *a: mdl.decode_step_logits(*a)))

    def step_fn(tok, pos, state):
        cache, p = state
        logits, cache = step(p, tok, pos, cache)
        return logits, (cache, p)

    got = cached_greedy_loop(
        logits0, (cache, params), jnp.asarray(lengths), step_fn,
        eos_token_id=eos, pad_token_id=pad, max_new_tokens=max_new)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.fixture(scope="module")
def t5_tiny():
    from sprc_tpu.models.t5 import T5Config, T5ForConditionalGeneration

    cfg = T5Config(vocab_size=83, d_model=32, d_kv=8, d_ff=64, num_heads=4,
                   num_layers=2, num_decoder_layers=2, dtype=jnp.float32,
                   tie_word_embeddings=True)
    model = T5ForConditionalGeneration(cfg)
    params = model.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32),
        jnp.zeros((1, 2), jnp.int32))["params"]
    return model, params, cfg


def test_t5_cached_equals_uncached(t5_tiny):
    model, params, cfg = t5_tiny
    B, Lenc, max_new = 3, 7, 8
    rs = np.random.RandomState(2)
    enc_ids = jnp.asarray(rs.randint(1, 83, (B, Lenc)), jnp.int32)
    enc_mask = jnp.asarray(
        (np.arange(Lenc)[None, :] < np.asarray([7, 5, 6])[:, None]).astype(
            np.int32))
    eos, pad = 1, 0

    enc_out = model.apply(
        {"params": params}, enc_ids, enc_mask,
        method=lambda mdl, i, m: mdl.encode_ids(i, m))

    # uncached: grow the decoder prefix, recompute every step
    dec = np.full((B, 1 + max_new), pad, np.int32)  # starts at pad (T5 bos)
    finished = np.zeros((B,), bool)
    want = np.full((B, max_new), pad, np.int32)
    decode_fn = jax.jit(
        lambda d, e, m: model.apply(
            {"params": params}, d, e, m,
            method=lambda mdl, d_, e_, m_: mdl.decode(d_, e_, m_)))
    for t in range(max_new):
        logits = np.asarray(decode_fn(jnp.asarray(dec[:, : t + 1]),
                                      enc_out, enc_mask))
        tok = logits[:, -1].argmax(-1).astype(np.int32)
        tok = np.where(finished, pad, tok)
        want[:, t] = tok
        dec[:, t + 1] = tok
        finished |= tok == eos
        if finished.all():
            break

    # cached
    s_max = 1 + max_new
    bos = jnp.full((B, 1), pad, jnp.int32)
    logits0, cache = model.apply(
        {"params": params}, bos, enc_out, enc_mask,
        method=lambda mdl, d, e, m: mdl.decode_prefill(d, e, m, s_max))

    step = jax.jit(
        lambda p, tok, t, cache, em: model.apply(
            {"params": p}, tok, t, cache, em,
            method=lambda mdl, *a: mdl.decode_step_logits(*a)))

    def step_fn(tok, pos, state):
        cache, p = state
        # uniform position: all rows decode in lockstep from bos
        logits, cache = step(p, tok, pos[0], cache, enc_mask)
        return logits, (cache, p)

    got = cached_greedy_loop(
        logits0, (cache, params), jnp.ones((B,), jnp.int32), step_fn,
        eos_token_id=eos, pad_token_id=pad, max_new_tokens=max_new)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_t5_cached_beam_one_equals_greedy(t5_tiny):
    """cached_beam_loop with num_beams=1 must reproduce the cached greedy
    decode exactly; beam-3 must be well-formed and reach >= greedy score."""
    from sprc_tpu.models.generation import cached_beam_loop

    model, params, cfg = t5_tiny
    B, Lenc, max_new = 2, 6, 7
    rs = np.random.RandomState(5)
    enc_ids = jnp.asarray(rs.randint(1, 83, (B, Lenc)), jnp.int32)
    enc_mask = jnp.ones((B, Lenc), jnp.int32)
    eos, pad = 1, 0

    enc_out = model.apply(
        {"params": params}, enc_ids, enc_mask,
        method=lambda mdl, i, m: mdl.encode_ids(i, m))

    step = jax.jit(
        lambda p, tok, t, cache, em: model.apply(
            {"params": p}, tok, t, cache, em,
            method=lambda mdl, *a: mdl.decode_step_logits(*a)))

    def run_beam(K):
        enc_rep = jnp.repeat(enc_out, K, axis=0)
        mask_rep = jnp.repeat(enc_mask, K, axis=0)
        s_max = 1 + max_new
        bos = jnp.full((B * K, 1), pad, jnp.int32)
        logits0, cache = model.apply(
            {"params": params}, bos, enc_rep, mask_rep,
            method=lambda mdl, d, e, m: mdl.decode_prefill(d, e, m, s_max))

        def step_fn(tok, pos, state):
            cache, p, em = state
            logits, cache = step(p, tok, pos[0], cache, em)
            return logits, (cache, p, em)

        def gather_fn(state, rows):
            cache, p, em = state
            return (jax.tree.map(lambda x: x[rows], cache), p, em[rows])

        return np.asarray(cached_beam_loop(
            logits0, (cache, params, mask_rep), jnp.ones((B * K,), jnp.int32),
            step_fn, gather_fn, num_beams=K, eos_token_id=eos,
            pad_token_id=pad, max_new_tokens=max_new, length_penalty=0.0))

    beam1 = run_beam(1)

    # greedy oracle: grow the decoder prefix, recompute every step
    dec = np.full((B, 1 + max_new), pad, np.int32)
    finished = np.zeros((B,), bool)
    want = np.full((B, max_new), pad, np.int32)
    for t in range(max_new):
        logits = np.asarray(model.apply(
            {"params": params}, jnp.asarray(dec[:, : t + 1]), enc_out,
            enc_mask, method=lambda mdl, d, e, m: mdl.decode(d, e, m)))
        tok = logits[:, -1].argmax(-1).astype(np.int32)
        tok = np.where(finished, pad, tok)
        want[:, t] = tok
        dec[:, t + 1] = tok
        finished |= tok == eos
    np.testing.assert_array_equal(beam1, want)

    beam3 = run_beam(3)
    assert beam3.shape == (B, max_new)

    def seq_logprob(row, b):
        dec_in = np.concatenate([[pad], row])
        logits = np.asarray(model.apply(
            {"params": params}, jnp.asarray(dec_in[None, :-1]),
            enc_out[b:b + 1], enc_mask[b:b + 1],
            method=lambda mdl, d, e, m: mdl.decode(d, e, m)))[0]
        lp = logits - logits.max(-1, keepdims=True)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        total = 0.0
        for t, tok in enumerate(row):
            if tok == pad:
                break
            total += lp[t, tok]
            if tok == eos:
                break
        return total

    for b in range(B):
        assert seq_logprob(beam3[b], b) >= seq_logprob(want[b], b) - 1e-5
