"""Generic autoregressive decoding helpers over a ``logits_fn``.

``logits_fn(ids) -> [B, L, V]`` runs the full (fixed-shape, padded) prefix
each call under one jitted program — the decode pattern documented in
models/lm.py (short sequences; recompute beats a KV cache through the
remote-TPU tunnel, and one compiled shape avoids per-length recompiles).

``sample_generate`` adds the HF-style stochastic decode the PNP-VQA /
Img2Prompt caption samplers need (reference pnp_vqa.py:145-160 generate
kwargs: do_sample, top_k, top_p, repetition_penalty).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

# jitted decode steps cached ON the logits_fn object (+ static hyperparams):
# a fresh @jax.jit inside every generate call would retrace/recompile the
# whole decode program per call (remote compiles cost minutes). Callers that
# want cross-call reuse must pass a long-lived logits_fn and thread per-call
# tensors (encoder memories, params) through ``memory`` instead of closing
# over them. Storing the table as a function attribute ties the compiled
# executables' lifetime to the logits_fn itself (a WeakKeyDictionary would
# be immortal here: the cached step closes over its own key).
_CACHE_ATTR = "__sprc_step_cache__"


def _cached_jit(logits_fn, key, build):
    try:
        table = getattr(logits_fn, _CACHE_ATTR, None)
        if table is None:
            table = {}
            setattr(logits_fn, _CACHE_ATTR, table)
    except (AttributeError, TypeError):  # non-writable callable: uncached
        return jax.jit(build())
    if key not in table:
        table[key] = jax.jit(build())
    return table[key]


def _apply_repetition_penalty(logits, ids, step, penalty):
    """HF semantics: seen tokens' logits divided by ``penalty`` when
    positive, multiplied when negative."""
    if penalty == 1.0:
        return logits
    B, V = logits.shape
    pos = jnp.arange(ids.shape[1])[None, :] < step
    # scatter-MAX: masked positions all index column 0 with False, which a
    # plain .set could let clobber a real token-0 occurrence's True
    # (duplicate-index scatter order is unspecified)
    seen = jnp.zeros((B, V), bool).at[
        jnp.arange(B)[:, None], jnp.where(pos, ids, 0)
    ].max(pos)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _filter_top_k(logits, k):
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    thresh = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < thresh, -jnp.inf, logits)


def _filter_top_p(logits, p):
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (always keep the top one)
    cutoff_mask = cum - probs > p
    cutoff_logit = jnp.min(
        jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True
    )
    return jnp.where(logits < cutoff_logit, -jnp.inf, logits)


def sample_generate(
    logits_fn: Callable,
    prompt_ids: jnp.ndarray,  # [B, P] (the fixed decode prefix, e.g. bos+prompt)
    *,
    rng: jax.Array,
    eos_token_id: int,
    pad_token_id: int,
    max_length: int = 20,
    min_length: int = 0,
    top_k: int = 50,
    top_p: float = 1.0,
    temperature: float = 1.0,
    repetition_penalty: float = 1.0,
    memory=None,
) -> jnp.ndarray:
    """Nucleus/top-k sampling -> token ids [B, max_length].

    ``logits_fn(ids)`` or, when ``memory`` is given, ``logits_fn(ids,
    memory)`` — pass per-call tensors (encoder memories) via ``memory`` so a
    long-lived logits_fn keeps one compiled decode step across calls."""
    B, P = prompt_ids.shape
    assert P < max_length
    ids = jnp.full((B, max_length), pad_token_id, jnp.int32)
    ids = ids.at[:, :P].set(prompt_ids)
    finished = jnp.zeros((B,), bool)

    def build():
        def step_fn(ids, finished, step, key, memory):
            raw = logits_fn(ids) if memory is None else logits_fn(ids, memory)
            logits = raw[:, step - 1, :].astype(jnp.float32)
            logits = _apply_repetition_penalty(
                logits, ids, step, repetition_penalty
            )
            logits = jnp.where(
                (step < min_length + P),
                logits.at[:, eos_token_id].set(-jnp.inf),
                logits,
            ) if min_length > 0 else logits
            logits = logits / max(temperature, 1e-6)
            logits = _filter_top_p(_filter_top_k(logits, top_k), top_p)
            tok = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
            tok = jnp.where(finished, pad_token_id, tok)
            ids = ids.at[:, step].set(tok)
            return ids, finished | (tok == eos_token_id)
        return step_fn

    key_ = ("sample", P, max_length, min_length, top_k, float(top_p),
            float(temperature), float(repetition_penalty), eos_token_id,
            pad_token_id, memory is None)
    step_fn = _cached_jit(logits_fn, key_, build)

    for step in range(P, max_length):
        rng, key = jax.random.split(rng)
        ids, finished = step_fn(ids, finished, step, key, memory)
        if bool(jnp.all(finished)):
            break
    return ids


def cached_greedy_loop(
    logits0: jnp.ndarray,  # [B, V] logits at each row's last prefix position
    cache,
    pos0: jnp.ndarray,  # [B] buffer position the NEXT token will occupy
    step_fn: Callable,  # (tok [B], pos [B], cache) -> (logits [B, V], cache)
    *,
    eos_token_id: int,
    pad_token_id: int,
    max_new_tokens: int,
    min_new_tokens: int = 0,
    readback_every: int = 4,
) -> jnp.ndarray:
    """KV-cached greedy decode over a model's ``prefill``/``decode_step``
    surface -> generated ids [B, max_new_tokens].

    Generalizes the Q-Former cached pattern (models/lm.py:302-449,
    reference past_key_values plumbing Qformer.py:976-1138 / HF generate in
    modeling_{t5,opt,llama}.py) to any model exposing a single-position
    step. Token selection + bookkeeping + the next cached step run in ONE
    jitted dispatch per token (the tunnel pays ~33 ms per dispatch), with an
    early-exit readback only every ``readback_every`` tokens. ``step_fn``
    must be long-lived for cross-call compile reuse (wrap with jax.jit
    once); this loop does not jit it again.
    """
    import numpy as np

    B = logits0.shape[0]
    ids = jnp.full((B, max_new_tokens), pad_token_id, jnp.int32)
    finished = jnp.zeros((B,), bool)

    def _select(logits, finished, ids, t, suppress_eos):
        logits = jnp.where(
            suppress_eos,
            logits.astype(jnp.float32).at[:, eos_token_id].set(-1e9),
            logits.astype(jnp.float32),
        )
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tok = jnp.where(finished, pad_token_id, tok)
        ids = ids.at[:, t].set(tok)
        return tok, finished | (tok == eos_token_id), ids

    def build_fused():
        def fused(logits, finished, ids, t, suppress, pos, cache):
            tok, finished, ids = _select(logits, finished, ids, t, suppress)
            logits, cache = step_fn(tok, pos, cache)
            return logits, finished, ids, pos + 1, cache
        return fused

    def build_last():
        def last(logits, finished, ids, t, suppress):
            _, finished, ids = _select(logits, finished, ids, t, suppress)
            return finished, ids
        return last

    key = ("cached_greedy", eos_token_id, pad_token_id)
    fused = _cached_jit(step_fn, key + ("step",), build_fused)
    last = _cached_jit(step_fn, key + ("last",), build_last)

    logits = logits0
    pos = pos0
    for t in range(max_new_tokens):
        suppress = t < min_new_tokens
        if t == max_new_tokens - 1:
            # final position: select WITHOUT a wasted cache step
            _, ids = last(logits, finished, ids, t, suppress)
            break
        logits, finished, ids, pos, cache = fused(
            logits, finished, ids, t, suppress, pos, cache)
        if t % readback_every == readback_every - 1 and bool(
            np.asarray(jnp.all(finished))
        ):
            break
    return ids


def cached_beam_loop(
    logits0: jnp.ndarray,  # [B*K, V] logits at the last prefix position
    state0,  # opaque step state (caches + params/memories), row dim = B*K
    pos0: jnp.ndarray,  # [B*K] buffer position the NEXT token will occupy
    step_fn: Callable,  # (tok [B*K], pos [B*K], state) -> (logits, state)
    gather_fn: Callable,  # (state, rows [B*K]) -> state with cache rows gathered
    *,
    num_beams: int,
    eos_token_id: int,
    pad_token_id: int,
    max_new_tokens: int,
    min_new_tokens: int = 0,
    length_penalty: float = 1.0,
    readback_every: int = 4,
) -> jnp.ndarray:
    """Device-side KV-cached beam search over a ``prefill``/``decode_step``
    surface -> best sequences [B, max_new_tokens].

    The caller prefit the model over B*K rows (each item's prefix repeated
    per beam — ``jnp.repeat(x, K, axis=0)``). Beam selection (log-softmax,
    top-K over K*V, reordering of ids and cache rows via ``gather_fn``) and
    the next cached step run as ONE jitted dispatch per token. Finalization
    applies the HF length penalty (sequence score / length**penalty,
    length counted over non-pad tokens incl. the implied bos).

    Companion of :func:`cached_greedy_loop`; the Q-Former captioner's
    dedicated version lives in models/lm.py (hand-rolled param math).
    """
    import numpy as np

    BK = logits0.shape[0]
    K = num_beams
    assert BK % K == 0
    B = BK // K

    ids = jnp.full((BK, max_new_tokens), pad_token_id, jnp.int32)
    scores = jnp.zeros((B, K), jnp.float32)
    scores = scores.at[:, 1:].set(-1e9)  # beams identical at t=0: keep one
    finished = jnp.zeros((BK,), bool)

    def _select(logits, ids, scores, finished, t, suppress_eos):
        # shapes derived from the traced args, NOT the enclosing call's
        # (the fused jit is cached across calls with different batch sizes)
        bk, V = logits.shape
        b = bk // K
        logits = logits.astype(jnp.float32)
        logits = jnp.where(
            suppress_eos, logits.at[:, eos_token_id].set(-1e9), logits
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        logp = jnp.where(finished[:, None], -1e9, logp)
        logp = logp.at[:, pad_token_id].set(
            jnp.where(finished, 0.0, logp[:, pad_token_id])
        )
        total = (scores.reshape(bk, 1) + logp).reshape(b, K * V)
        new_scores, top = jax.lax.top_k(total, K)
        src_beam = top // V
        tok = (top % V).astype(jnp.int32)
        rows = (jnp.arange(b)[:, None] * K + src_beam).reshape(-1)
        tok_flat = tok.reshape(-1)
        ids = ids[rows].at[:, t].set(tok_flat)
        finished = finished[rows] | (tok_flat == eos_token_id)
        return ids, new_scores, finished, rows, tok_flat

    def build_step():
        def fused(logits, ids, scores, finished, t, suppress, pos, state):
            ids, scores, finished, rows, tok = _select(
                logits, ids, scores, finished, t, suppress
            )
            state = gather_fn(state, rows)
            pos = pos[rows]
            logits, state = step_fn(tok, pos, state)
            return logits, ids, scores, finished, pos + 1, state
        return fused

    def build_last():
        def last(logits, ids, scores, finished, t, suppress):
            ids, scores, finished, _, _ = _select(
                logits, ids, scores, finished, t, suppress
            )
            return ids, scores, finished
        return last

    # gather_fn is baked into the compiled step; key on its code object so a
    # DIFFERENT gather implementation sharing one step-cache dict (e.g. the
    # persistent _qg_fused_cache) can't silently reuse the first one's
    # program, while per-call closures of the SAME source still hit the
    # cache. Contract: gather_fn must not close over per-call tensors —
    # thread them through ``state`` (same rule as step_fn above).
    key = ("cached_beam", K, eos_token_id, pad_token_id,
           getattr(gather_fn, "__code__", gather_fn))
    fused = _cached_jit(step_fn, key + ("step",), build_step)
    last = _cached_jit(step_fn, key + ("last",), build_last)

    logits = logits0
    pos = pos0
    state = state0
    for t in range(max_new_tokens):
        suppress = t < min_new_tokens
        if t == max_new_tokens - 1:
            ids, scores, finished = last(
                logits, ids, scores, finished, t, suppress)
            break
        logits, ids, scores, finished, pos, state = fused(
            logits, ids, scores, finished, t, suppress, pos, state)
        if t % readback_every == readback_every - 1 and bool(
            np.asarray(jnp.all(finished))
        ):
            break

    ids_np = np.asarray(ids)
    scores_np = np.asarray(scores, np.float64)
    out = np.full((B, max_new_tokens), pad_token_id, np.int32)
    for b in range(B):
        best_k, best_score = 0, -np.inf
        for k in range(K):
            row = ids_np[b * K + k]
            # +1 counts the implied bos/start token (HF length semantics)
            length = int((row != pad_token_id).sum()) + 1
            score = scores_np[b, k] / (length ** length_penalty)
            if score > best_score:
                best_k, best_score = k, score
        out[b] = ids_np[b * K + best_k]
    return jnp.asarray(out)


def greedy_generate_fn(
    logits_fn: Callable,
    prompt_ids: jnp.ndarray,
    *,
    eos_token_id: int,
    pad_token_id: int,
    max_length: int = 20,
    min_length: int = 0,
    memory=None,
) -> jnp.ndarray:
    """Greedy decode over a generic logits_fn -> [B, max_length]; pass
    per-call tensors via ``memory`` (see sample_generate)."""
    B, P = prompt_ids.shape
    ids = jnp.full((B, max_length), pad_token_id, jnp.int32)
    ids = ids.at[:, :P].set(prompt_ids)
    finished = jnp.zeros((B,), bool)

    def build():
        def step_fn(ids, finished, step, memory):
            raw = logits_fn(ids) if memory is None else logits_fn(ids, memory)
            logits = raw[:, step - 1, :].astype(jnp.float32)
            if min_length > 0:
                logits = jnp.where(
                    step < min_length + P,
                    logits.at[:, eos_token_id].set(-jnp.inf),
                    logits,
                )
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            tok = jnp.where(finished, pad_token_id, tok)
            ids = ids.at[:, step].set(tok)
            return ids, finished | (tok == eos_token_id)
        return step_fn

    key_ = ("greedy", P, max_length, min_length, eos_token_id, pad_token_id,
            memory is None)
    step_fn = _cached_jit(logits_fn, key_, build)

    for step in range(P, max_length):
        ids, finished = step_fn(ids, finished, step, memory)
        if bool(jnp.all(finished)):
            break
    return ids
