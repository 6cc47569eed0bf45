"""Q-Former language-model head + caption generation.

TPU-native equivalent of the reference's ``BertLMHeadModel`` + ``generate``
path (reference Qformer.py:976-1138; used by the CIR models' ``generate``,
…cir_align_prompt.py:202-263): decoder-mode Q-Former (UniLM mask: queries
bidirectional among themselves, text causal with query prefix) feeding a
BERT prediction head (dense -> gelu -> LN -> vocab projection).

Decode runs the full prefix each step under one fixed-shape jitted program
(sequence padded to ``max_length``): at <=32 query + 30 text tokens,
recompute is cheaper than carrying a KV cache through host round trips, and
the single compiled shape avoids per-length recompilation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sprc_tpu.models.qformer import QFormer, QFormerConfig
from sprc_tpu.ops.layers import DenseGeneral, LayerNormFP32


class QFormerLMHead(nn.Module):
    """BertLMPredictionHead: transform dense -> gelu -> LN -> decoder."""

    config: QFormerConfig

    @nn.compact
    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        h = DenseGeneral(cfg.hidden_size, dtype=cfg.dtype, name="transform")(hidden)
        h = nn.gelu(h, approximate=False)
        h = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="ln")(h)
        return DenseGeneral(cfg.vocab_size, dtype=cfg.dtype, name="decoder")(h)


class QFormerLM(nn.Module):
    """Decoder Q-Former + LM head (BertLMHeadModel analogue)."""

    config: QFormerConfig

    def setup(self) -> None:
        self.qformer = QFormer(self.config)
        self.lm_head = QFormerLMHead(self.config)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        query_embeds: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        image_embeds: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """-> LM logits over the text positions [B, L, vocab]."""
        Q = query_embeds.shape[1]
        if attention_mask is None:
            B, L = input_ids.shape
            attention_mask = jnp.concatenate(
                [jnp.ones((B, Q), jnp.int32), jnp.ones((B, L), jnp.int32)], axis=1
            )
        hidden = self.qformer(
            input_ids=input_ids,
            query_embeds=query_embeds,
            attention_mask=attention_mask,
            image_embeds=image_embeds,
            is_decoder=True,
            deterministic=deterministic,
        )
        return self.lm_head(hidden[:, Q:, :])


def greedy_generate(
    lm: QFormerLM,
    params,
    query_embeds: jnp.ndarray,
    image_embeds: jnp.ndarray,
    *,
    bos_token_id: int,
    eos_token_id: int,
    pad_token_id: int,
    max_length: int = 30,
    min_length: int = 10,
) -> jnp.ndarray:
    """Greedy caption decode -> token ids [B, max_length].

    One jitted fixed-shape step scanned over decode positions; finished rows
    emit PAD. ``min_length`` suppresses EOS early (HF semantics).
    """
    B = query_embeds.shape[0]

    @jax.jit
    def logits_fn(ids, mask):
        return lm.apply(
            {"params": params}, ids, query_embeds, attention_mask=None,
            image_embeds=image_embeds,
        )

    ids = jnp.full((B, max_length), pad_token_id, jnp.int32)
    ids = ids.at[:, 0].set(bos_token_id)
    finished = jnp.zeros((B,), bool)
    for step in range(1, max_length):
        logits = logits_fn(ids, None)[:, step - 1, :]
        if step < min_length:
            logits = logits.at[:, eos_token_id].set(-1e9)
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(finished, pad_token_id, next_tok)
        ids = ids.at[:, step].set(next_tok)
        finished = finished | (next_tok == eos_token_id)
        if bool(jnp.all(finished)):
            break
    return ids


def beam_generate(
    lm: QFormerLM,
    params,
    query_embeds: jnp.ndarray,
    image_embeds: jnp.ndarray,
    *,
    bos_token_id: int,
    eos_token_id: int,
    pad_token_id: int,
    num_beams: int = 3,
    max_length: int = 30,
    min_length: int = 10,
    length_penalty: float = 1.0,
) -> jnp.ndarray:
    """Beam-search decode -> token ids [B, max_length].

    Standard beam search with HF-style length penalty (the reference
    generates with num_beams=3, …cir_align_prompt.py:208). The per-image
    conditioning (queries + image embeds) is repeated per beam; scoring runs
    the same fixed-shape jitted program as greedy.
    """
    import numpy as np

    B = query_embeds.shape[0]
    K = num_beams
    q_rep = jnp.repeat(query_embeds, K, axis=0)
    img_rep = jnp.repeat(image_embeds, K, axis=0)

    @jax.jit
    def logits_fn(ids):
        return lm.apply(
            {"params": params}, ids, q_rep, attention_mask=None, image_embeds=img_rep
        )

    ids = np.full((B * K, max_length), pad_token_id, np.int32)
    ids[:, 0] = bos_token_id
    beam_scores = np.zeros((B, K), np.float64)
    beam_scores[:, 1:] = -1e9  # all beams identical at step 0: keep one
    finished = np.zeros((B * K,), bool)

    for step in range(1, max_length):
        logits = np.asarray(logits_fn(jnp.asarray(ids))[:, step - 1, :], np.float64)
        if step < min_length:
            logits[:, eos_token_id] = -1e9
        # stable log-softmax
        m = logits.max(-1, keepdims=True)
        logp = logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))
        V = logp.shape[-1]
        # finished beams only extend with PAD at zero cost
        logp[finished] = -1e9
        logp[finished, pad_token_id] = 0.0

        total = beam_scores.reshape(B * K, 1) + logp  # [B*K, V]
        total = total.reshape(B, K * V)
        top_idx = np.argsort(-total, axis=-1)[:, : K]
        new_ids = np.empty_like(ids)
        new_finished = np.zeros_like(finished)
        new_scores = np.empty_like(beam_scores)
        for b in range(B):
            for k, flat in enumerate(top_idx[b]):
                src_beam, tok = divmod(int(flat), V)
                row = b * K + k
                src_row = b * K + src_beam
                new_ids[row] = ids[src_row]
                new_ids[row, step] = tok
                new_scores[b, k] = total[b, flat]
                new_finished[row] = finished[src_row] or tok == eos_token_id
        ids, beam_scores, finished = new_ids, new_scores, new_finished
        if finished.all():
            break

    # pick the best beam per item with length penalty
    out = np.full((B, max_length), pad_token_id, np.int32)
    for b in range(B):
        best_k, best_score = 0, -np.inf
        for k in range(K):
            row = ids[b * K + k]
            length = int((row != pad_token_id).sum())
            score = beam_scores[b, k] / (length ** length_penalty)
            if score > best_score:
                best_k, best_score = k, score
        out[b] = ids[b * K + best_k]
    return jnp.asarray(out)


def cached_beam_generate(
    lm: QFormerLM,
    params,
    query_embeds: jnp.ndarray,
    image_embeds: jnp.ndarray,
    *,
    bos_token_id: int,
    eos_token_id: int,
    pad_token_id: int,
    num_beams: int = 3,
    max_length: int = 30,
    min_length: int = 10,
    length_penalty: float = 1.0,
) -> jnp.ndarray:
    """Device-side KV-cached beam search -> token ids [B, max_length].

    Replaces the host numpy beam loop (:func:`beam_generate`, kept as the
    equality oracle): beam selection (log-softmax, top-K over K*V, beam
    reordering of ids AND K/V caches) plus the next cached decode step run
    as ONE jitted dispatch per token — the host loop paid one dispatch per
    token per beam set plus a host argsort between. Reference default is
    beam-3 (…cir_align_prompt.py:208; HF beam_search semantics with length
    penalty at finalization). Token-identical to :func:`beam_generate`
    (tests/test_lm_generation.py).
    """
    import numpy as np

    B = query_embeds.shape[0]
    K = num_beams
    q_rep = jnp.repeat(query_embeds, K, axis=0)
    img_rep = jnp.repeat(image_embeds, K, axis=0)

    logits0, k_cache, v_cache, _ = _cached_decode_setup(
        lm, params, q_rep, img_rep,
        bos_token_id=bos_token_id, max_length=max_length,
    )
    ids = jnp.full((B * K, max_length), pad_token_id, jnp.int32)
    ids = ids.at[:, 0].set(bos_token_id)
    scores = jnp.zeros((B, K), jnp.float32)
    scores = scores.at[:, 1:].set(-1e9)  # beams identical at t=0: keep one
    finished = jnp.zeros((B * K,), bool)

    logits = logits0
    Q = query_embeds.shape[1]
    for t in range(1, max_length):
        if t == max_length - 1:
            ids, scores, finished = _qf_beam_last(
                logits, ids, scores, finished, t, t < min_length,
                eos=eos_token_id, pad=pad_token_id,
            )
            break
        logits, ids, scores, finished, k_cache, v_cache = _qf_beam_step(
            lm, params, logits, ids, scores, finished, t, t < min_length,
            k_cache, v_cache, eos=eos_token_id, pad=pad_token_id, Q=Q,
        )
        if t % 4 == 0 and bool(np.asarray(jnp.all(finished))):
            break

    # finalize with HF length penalty (host; one readback)
    ids_np = np.asarray(ids)
    scores_np = np.asarray(scores, np.float64)
    out = np.full((B, max_length), pad_token_id, np.int32)
    for b in range(B):
        best_k, best_score = 0, -np.inf
        for k in range(K):
            row = ids_np[b * K + k]
            length = int((row != pad_token_id).sum())
            score = scores_np[b, k] / (length ** length_penalty)
            if score > best_score:
                best_k, best_score = k, score
        out[b] = ids_np[b * K + best_k]
    return jnp.asarray(out)


def generate_captions(
    cir_model,
    cir_params,
    lm_head_params,
    images: jnp.ndarray,
    tokenizer,
    *,
    max_length: int = 30,
    min_length: int = 10,
    num_beams: int = 3,
) -> list[str]:
    """Caption images with a CIR model's Q-Former + an LM head.

    Mirrors the reference ``generate`` (…cir_align_prompt.py:202-263,
    default num_beams=3; pass num_beams=1 for greedy): frozen ViT ->
    ln_vision -> query tokens decode with [DEC] bos, device-side KV-cached
    beam search. The LM head weights come from the stage-1 checkpoint
    (cls.predictions.*, importable via
    :func:`qformer_lm_params_from_torch`).
    """
    frozen = cir_model.apply(
        {"params": cir_params}, images, method=cir_model.encode_image
    )
    B = frozen.shape[0]
    Q = cir_model.cfg.num_query_token
    queries = jnp.broadcast_to(
        cir_params["query_tokens"], (B, Q, cir_params["query_tokens"].shape[2])
    )
    lm = QFormerLM(cir_model.cfg.qformer_config())
    params = {"qformer": cir_params["qformer"], "lm_head": lm_head_params}
    kw = dict(
        bos_token_id=tokenizer.bos_id,
        eos_token_id=tokenizer.sep_id,
        pad_token_id=tokenizer.pad_id,
        max_length=max_length, min_length=min_length,
    )
    if num_beams > 1:
        ids = cached_beam_generate(
            lm, params, queries, frozen, num_beams=num_beams, **kw)
    else:
        ids = cached_greedy_generate(lm, params, queries, frozen, **kw)
    return [tokenizer.decode(row) for row in np.asarray(ids)]


import numpy as np  # noqa: E402  (used by generate_captions)


# ------------------------------------------------------------------ interop


def qformer_lm_params_from_torch(sd, *, prefix: str = "Qformer.", num_layers: int,
                                 cross_attention_freq: int = 2):
    """Map BertLMHeadModel state_dict (bert.* + cls.predictions.*) into
    QFormerLM params."""
    import numpy as np

    from sprc_tpu.interop.torch_import import qformer_params_from_torch

    params = {
        "qformer": qformer_params_from_torch(
            sd,
            prefix=f"{prefix}bert.",
            num_layers=num_layers,
            cross_attention_freq=cross_attention_freq,
        ),
        "lm_head": {
            "transform": {
                "kernel": np.ascontiguousarray(
                    np.asarray(sd[f"{prefix}cls.predictions.transform.dense.weight"]).T
                ),
                "bias": np.asarray(sd[f"{prefix}cls.predictions.transform.dense.bias"]),
            },
            "ln": {
                "scale": np.asarray(sd[f"{prefix}cls.predictions.transform.LayerNorm.weight"]),
                "bias": np.asarray(sd[f"{prefix}cls.predictions.transform.LayerNorm.bias"]),
            },
            "decoder": {
                "kernel": np.ascontiguousarray(
                    np.asarray(sd[f"{prefix}cls.predictions.decoder.weight"]).T
                ),
                "bias": np.asarray(sd[f"{prefix}cls.predictions.bias"]),
            },
        },
    }
    return params


# ------------------------------------------------------------- cached decode


def _p_dense(p, x, dtype):
    y = x.astype(dtype) @ p["kernel"].astype(dtype)
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _p_ln(p, x, eps):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = jnp.square(x32 - mean).mean(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)


def _qf_head_logits_impl(lm, params, x):
    """LM head over [B, 1, hid] -> [B, V] logits."""
    cfg = lm.config
    dtype, eps = cfg.dtype, cfg.layer_norm_eps
    hp = params["lm_head"]
    y = _p_dense(hp["transform"], x, dtype)
    y = jax.nn.gelu(y, approximate=False)
    y = _p_ln(hp["ln"], y, eps).astype(dtype)
    return _p_dense(hp["decoder"], y, dtype)[:, 0, :]


def _qf_prefill_impl(lm, params, query_embeds, image_embeds,
                     bos_token_id, max_length):
    """Prefill over [queries | BOS]: per-layer K/V caches in padded
    [B, S_max, hid] buffers + the position-0 logits, one fused program."""
    cfg = lm.config
    qp = params["qformer"]
    dtype = cfg.dtype
    B, Q = query_embeds.shape[:2]
    hid = cfg.hidden_size
    S_max = Q + max_length

    bos = jnp.full((B, 1), bos_token_id, jnp.int32)
    prefill_hidden, state = lm.apply(
        {"params": params}, bos, query_embeds, None, image_embeds,
        mutable=["intermediates"],
        method=lambda m, ids, qe, am, ie: m.qformer(
            input_ids=ids, query_embeds=qe, attention_mask=am,
            image_embeds=ie, is_decoder=True, sow_hidden=True,
        ),
    )
    inter = state["intermediates"]["qformer"]

    k_cache = jnp.zeros((cfg.num_layers, B, S_max, hid), dtype)
    v_cache = jnp.zeros((cfg.num_layers, B, S_max, hid), dtype)
    for i in range(cfg.num_layers):
        h_in = inter[f"hidden_{i}"][0]  # [B, Q+1, hid]
        sp = qp[f"layer_{i}"]["self_attn"]
        k_cache = k_cache.at[i, :, : Q + 1].set(_p_dense(sp["key"], h_in, dtype))
        v_cache = v_cache.at[i, :, : Q + 1].set(_p_dense(sp["value"], h_in, dtype))

    logits0 = _qf_head_logits_impl(lm, params, prefill_hidden[:, Q:, :])
    return logits0, k_cache, v_cache


def _qf_step_impl(lm, params, tok, t, k_cache, v_cache, Q):
    """One cached decode step for text position t (0-based; its K/V goes
    to cache slot Q+t). Returns next-token logits + updated caches."""
    cfg = lm.config
    qp = params["qformer"]
    dtype, eps = cfg.dtype, cfg.layer_norm_eps
    H, Dh = cfg.num_heads, cfg.head_dim
    hid = cfg.hidden_size
    B = tok.shape[0]
    S_max = k_cache.shape[2]
    word = qp["embeddings"]["word_embeddings"]["embedding"]
    pos = qp["embeddings"]["position_embeddings"]["embedding"]

    def head_split(x):  # [B, S, hid] -> [B, S, H, Dh]
        return x.reshape(x.shape[0], x.shape[1], H, Dh)

    x = word[tok] + pos[t]  # [B, hid]
    x = _p_ln(qp["embeddings"]["ln"], x[:, None, :], eps).astype(dtype)
    valid = jnp.arange(S_max) <= (Q + t)  # queries + text <= t
    bias = jnp.where(valid, 0.0, -1e10)[None, None, None, :]
    for i in range(cfg.num_layers):
        lp = qp[f"layer_{i}"]
        sp = lp["self_attn"]
        q_ = _p_dense(sp["query"], x, dtype)
        k_new = _p_dense(sp["key"], x, dtype)
        v_new = _p_dense(sp["value"], x, dtype)
        k_cache = k_cache.at[i, :, Q + t].set(k_new[:, 0])
        v_cache = v_cache.at[i, :, Q + t].set(v_new[:, 0])
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", head_split(q_),
            head_split(k_cache[i]), preferred_element_type=jnp.float32,
        ) * (Dh ** -0.5)
        probs = jax.nn.softmax(scores + bias, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(dtype), head_split(v_cache[i])
        ).reshape(B, 1, hid)
        att = _p_ln(sp["ln"], _p_dense(sp["out"], ctx, dtype) + x, eps).astype(dtype)
        h = _p_dense(lp["ffn_text"]["fc1"], att, dtype)
        h = jax.nn.gelu(h, approximate=False)
        h = _p_dense(lp["ffn_text"]["fc2"], h, dtype)
        x = _p_ln(lp["ffn_text"]["ln"], h + att, eps).astype(dtype)
    return _qf_head_logits_impl(lm, params, x), k_cache, v_cache


# Module-level jits with the (hashable, value-equal) flax module + static
# ints as static args: the compiled programs are shared across generate
# CALLS and across model instances with equal configs. Per-call @jax.jit
# closures here would retrace/recompile the whole per-token decode program
# on every generate_captions call (remote compiles cost minutes — the
# anti-pattern models/generation.py:20-27 documents).
_qf_prefill = functools.partial(
    jax.jit, static_argnames=("lm", "bos_token_id", "max_length")
)(_qf_prefill_impl)
_qf_step = functools.partial(
    jax.jit, static_argnames=("lm", "Q")
)(_qf_step_impl)


def _qf_greedy_select(logits, finished, ids, t, suppress_eos, eos, pad):
    logits = jnp.where(suppress_eos, logits.at[:, eos].set(-1e9), logits)
    next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    next_tok = jnp.where(finished, pad, next_tok)
    ids = ids.at[:, t].set(next_tok)
    return next_tok, finished | (next_tok == eos), ids


def _qf_greedy_step_impl(lm, params, logits, finished, ids, t, suppress_eos,
                         k_cache, v_cache, eos, pad, Q):
    """Token selection + bookkeeping + one cached step in ONE dispatch
    (the unfused host loop paid ~6 small dispatches per token — ~250 ms
    of relay RTT each through the axon tunnel)."""
    next_tok, finished, ids = _qf_greedy_select(
        logits, finished, ids, t, suppress_eos, eos, pad)
    logits, k_cache, v_cache = _qf_step_impl(
        lm, params, next_tok, t, k_cache, v_cache, Q)
    return logits, finished, ids, k_cache, v_cache


def _qf_greedy_last_impl(logits, finished, ids, t, suppress_eos, eos, pad):
    """Final position: select the token WITHOUT running a wasted KV step
    whose logits nothing would consume."""
    _, finished, ids = _qf_greedy_select(
        logits, finished, ids, t, suppress_eos, eos, pad)
    return finished, ids


def _qf_beam_select(logits, ids, scores, finished, t, suppress_eos, eos, pad):
    B, K = scores.shape
    V = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    logits = jnp.where(suppress_eos, logits.at[:, eos].set(-1e9), logits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # finished beams only extend with PAD at zero cost
    logp = jnp.where(finished[:, None], -1e9, logp)
    logp = logp.at[:, pad].set(jnp.where(finished, 0.0, logp[:, pad]))
    total = (scores.reshape(B * K, 1) + logp).reshape(B, K * V)
    new_scores, top = jax.lax.top_k(total, K)  # [B, K]
    src_beam = top // V
    tok = (top % V).astype(jnp.int32)
    flat_src = (jnp.arange(B)[:, None] * K + src_beam).reshape(-1)
    tok_flat = tok.reshape(-1)
    ids = ids[flat_src].at[:, t].set(tok_flat)
    finished = finished[flat_src] | (tok_flat == eos)
    return ids, new_scores, finished, flat_src, tok_flat


def _qf_beam_step_impl(lm, params, logits, ids, scores, finished, t,
                       suppress_eos, k_cache, v_cache, eos, pad, Q):
    ids, scores, finished, flat_src, tok = _qf_beam_select(
        logits, ids, scores, finished, t, suppress_eos, eos, pad)
    # reorder the caches to the surviving beams, then one cached step
    k_cache = k_cache[:, flat_src]
    v_cache = v_cache[:, flat_src]
    logits, k_cache, v_cache = _qf_step_impl(
        lm, params, tok, t, k_cache, v_cache, Q)
    return logits, ids, scores, finished, k_cache, v_cache


def _qf_beam_last_impl(logits, ids, scores, finished, t, suppress_eos,
                       eos, pad):
    ids, scores, finished, _, _ = _qf_beam_select(
        logits, ids, scores, finished, t, suppress_eos, eos, pad)
    return ids, scores, finished


_qf_greedy_step = functools.partial(
    jax.jit, static_argnames=("lm", "eos", "pad", "Q")
)(_qf_greedy_step_impl)
_qf_greedy_last = functools.partial(
    jax.jit, static_argnames=("eos", "pad")
)(_qf_greedy_last_impl)
_qf_beam_step = functools.partial(
    jax.jit, static_argnames=("lm", "eos", "pad", "Q")
)(_qf_beam_step_impl)
_qf_beam_last = functools.partial(
    jax.jit, static_argnames=("eos", "pad")
)(_qf_beam_last_impl)


def _cached_decode_setup(
    lm: QFormerLM,
    params,
    query_embeds: jnp.ndarray,
    image_embeds: jnp.ndarray,
    *,
    bos_token_id: int,
    max_length: int,
):
    """Shared KV-cache scaffolding for greedy AND beam decode: prefill over
    [queries | BOS], per-layer K/V caches, and the jitted single-position
    ``step(tok, t, k_cache, v_cache) -> (logits, k_cache, v_cache)``.

    Returns ``(logits0, k_cache, v_cache, step)`` where logits0 are the
    position-0 logits from the prefill.
    """
    Q = query_embeds.shape[1]
    logits0, k_cache, v_cache = _qf_prefill(
        lm, params, query_embeds, image_embeds,
        bos_token_id=bos_token_id, max_length=max_length,
    )

    def step(tok, t, k_cache, v_cache):
        return _qf_step(lm, params, tok, t, k_cache, v_cache, Q=Q)

    return logits0, k_cache, v_cache, step


def cached_greedy_generate(
    lm: QFormerLM,
    params,
    query_embeds: jnp.ndarray,
    image_embeds: jnp.ndarray,
    *,
    bos_token_id: int,
    eos_token_id: int,
    pad_token_id: int,
    max_length: int = 30,
    min_length: int = 10,
) -> jnp.ndarray:
    """KV-cached greedy decode — the reference's ``past_key_values`` path
    (Qformer.py:83-95,976-1138) done functionally.

    Prefill runs the full Q-Former ONCE over [queries | BOS] (capturing each
    layer's input hidden states via sow); per-layer K/V caches are built from
    those with the layer's own projections, and each subsequent token runs a
    single-position step against the cache. Text positions use the text FFN
    and never cross-attend (the decoder contract), so the step needs only
    the self-attention + ffn_text weights. Stepwise-identical to
    :func:`greedy_generate` (tests/test_lm_generation.py).
    """
    B = query_embeds.shape[0]
    Q = query_embeds.shape[1]
    logits, k_cache, v_cache, _ = _cached_decode_setup(
        lm, params, query_embeds, image_embeds,
        bos_token_id=bos_token_id, max_length=max_length,
    )
    ids = jnp.full((B, max_length), pad_token_id, jnp.int32)
    ids = ids.at[:, 0].set(bos_token_id)
    finished = jnp.zeros((B,), bool)

    for t in range(1, max_length):
        if t == max_length - 1:
            _, ids = _qf_greedy_last(
                logits, finished, ids, t, t < min_length,
                eos=eos_token_id, pad=pad_token_id,
            )
            break
        logits, finished, ids, k_cache, v_cache = _qf_greedy_step(
            lm, params, logits, finished, ids, t, t < min_length,
            k_cache, v_cache, eos=eos_token_id, pad=pad_token_id, Q=Q,
        )
        # early-exit readback only every 4 tokens: each host sync costs a
        # full dispatch round trip
        if t % 4 == 0 and bool(jnp.all(finished)):
            break
    return ids
