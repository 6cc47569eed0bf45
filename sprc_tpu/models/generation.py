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


def _apply_repetition_penalty(logits, ids, step, penalty):
    """HF semantics: seen tokens' logits divided by ``penalty`` when
    positive, multiplied when negative."""
    if penalty == 1.0:
        return logits
    B, V = logits.shape
    pos = jnp.arange(ids.shape[1])[None, :] < step
    seen = jnp.zeros((B, V), bool).at[
        jnp.arange(B)[:, None], jnp.where(pos, ids, 0)
    ].set(pos)
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
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
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
) -> jnp.ndarray:
    """Nucleus/top-k sampling -> token ids [B, max_length]."""
    B, P = prompt_ids.shape
    assert P < max_length
    ids = jnp.full((B, max_length), pad_token_id, jnp.int32)
    ids = ids.at[:, :P].set(prompt_ids)
    finished = jnp.zeros((B,), bool)

    @jax.jit
    def step_fn(ids, finished, step, key):
        logits = logits_fn(ids)[:, step - 1, :].astype(jnp.float32)
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

    for step in range(P, max_length):
        rng, key = jax.random.split(rng)
        ids, finished = step_fn(ids, finished, step, key)
        if bool(jnp.all(finished)):
            break
    return ids


def greedy_generate_fn(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    prompt_ids: jnp.ndarray,
    *,
    eos_token_id: int,
    pad_token_id: int,
    max_length: int = 20,
    min_length: int = 0,
) -> jnp.ndarray:
    """Greedy decode over a generic logits_fn -> [B, max_length]."""
    B, P = prompt_ids.shape
    ids = jnp.full((B, max_length), pad_token_id, jnp.int32)
    ids = ids.at[:, :P].set(prompt_ids)
    finished = jnp.zeros((B,), bool)

    @jax.jit
    def step_fn(ids, finished, step):
        logits = logits_fn(ids)[:, step - 1, :].astype(jnp.float32)
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

    for step in range(P, max_length):
        ids, finished = step_fn(ids, finished, step)
        if bool(jnp.all(finished)):
            break
    return ids
