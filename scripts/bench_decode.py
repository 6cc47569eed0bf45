"""Decode-throughput micro-bench: KV-cached vs full-recompute greedy decode.

Both paths (models/lm.py cached_greedy_generate vs greedy_generate) are
host-loop drivers — one device dispatch per generated token, the standard
serving pattern. Through the axon relay each dispatch pays ~33 ms RTT, so
absolute tokens/sec here is latency-bound; the cached-vs-recompute delta
shows the device-compute saving. Run on a pod for production numbers.

Prints one JSON line with tokens/sec for both paths at real Q-Former dims.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sprc_tpu.models.lm import QFormerLM, cached_greedy_generate, greedy_generate
    from sprc_tpu.models.qformer import QFormerConfig

    B = int(os.environ.get("SPRC_DECODE_BATCH", "64"))
    max_len = int(os.environ.get("SPRC_DECODE_LEN", "20"))
    cfg = QFormerConfig(dtype=jnp.bfloat16)  # real dims: 768x12, vocab 30522
    lm = QFormerLM(cfg)
    Q = 32

    shapes = jax.eval_shape(
        lm.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, Q, cfg.hidden_size)),
        None, jnp.zeros((1, 257, cfg.encoder_width)),
    )["params"]
    params = jax.jit(
        lambda: jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
    )()
    qe = jax.jit(
        lambda k: 0.1 * jax.random.normal(k, (B, Q, cfg.hidden_size), jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    ie = jax.jit(
        lambda k: 0.1 * jax.random.normal(k, (B, 257, cfg.encoder_width), jnp.bfloat16)
    )(jax.random.PRNGKey(2))
    jax.block_until_ready((qe, ie))

    kw = dict(bos_token_id=30522, eos_token_id=102, pad_token_id=0,
              max_length=max_len, min_length=max_len - 1)

    def run(fn):
        out = fn(lm, params, qe, ie, **kw)  # warm/compile
        _ = np.asarray(out)
        t0 = time.perf_counter()
        out = fn(lm, params, qe, ie, **kw)
        n = np.asarray(out).shape[1]
        dt = time.perf_counter() - t0
        return B * n / dt

    cached = run(cached_greedy_generate)
    recompute = run(greedy_generate)
    print(json.dumps({
        "cached_tokens_per_sec": round(cached, 1),
        "recompute_tokens_per_sec": round(recompute, 1),
        "batch": B, "max_length": max_len,
        "note": "host-loop decode; through the relay each step pays ~33ms RTT",
    }))


def main_t5() -> None:
    """T5 decoder: KV-cached (decode_prefill/decode_step) vs recompute, at
    flan-t5-xl-ish dims scaled by SPRC_DECODE_T5_LAYERS."""
    import jax
    import jax.numpy as jnp

    from sprc_tpu.models.generation import cached_greedy_loop
    from sprc_tpu.models.t5 import T5Config, T5ForConditionalGeneration

    B = int(os.environ.get("SPRC_DECODE_BATCH", "16"))
    max_new = int(os.environ.get("SPRC_DECODE_LEN", "20"))
    layers = int(os.environ.get("SPRC_DECODE_T5_LAYERS", "8"))
    Lenc = 64
    cfg = T5Config(d_model=2048, d_kv=64, d_ff=5120, num_heads=32,
                   num_layers=layers, num_decoder_layers=layers,
                   dtype=jnp.bfloat16)
    model = T5ForConditionalGeneration(cfg)

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
        jnp.zeros((1, 2), jnp.int32),
    )["params"]
    params = jax.jit(
        lambda: jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
    )()
    enc_ids = jax.jit(
        lambda k: jax.random.randint(k, (B, Lenc), 1, cfg.vocab_size, jnp.int32)
    )(jax.random.PRNGKey(1))
    enc_mask = jnp.ones((B, Lenc), jnp.int32)
    enc_out = jax.jit(
        lambda p, i, m: model.apply({"params": p}, i, m,
                                    method=lambda mdl, *a: mdl.encode_ids(*a))
    )(params, enc_ids, enc_mask)
    _ = np.asarray(enc_out[0, 0, 0])

    eos, pad = 1, 0
    s_max = 1 + max_new
    prefill = jax.jit(
        lambda p, d, e, m: model.apply(
            {"params": p}, d, e, m,
            method=lambda mdl, d_, e_, m_: mdl.decode_prefill(d_, e_, m_, s_max)))
    step = jax.jit(
        lambda p, tok, t, cache, em: model.apply(
            {"params": p}, tok, t, cache, em,
            method=lambda mdl, *a: mdl.decode_step_logits(*a)))

    def run_cached():
        bos = jnp.full((B, 1), pad, jnp.int32)
        logits0, cache = prefill(params, bos, enc_out, enc_mask)

        def step_fn(tok, pos, state):
            cache, p, em = state
            logits, cache = step(p, tok, pos[0], cache, em)
            return logits, (cache, p, em)
        run_cached.__dict__.setdefault("tbl", {})
        step_fn.__sprc_step_cache__ = run_cached.__dict__["tbl"]
        out = cached_greedy_loop(
            logits0, (cache, params, enc_mask), jnp.ones((B,), jnp.int32),
            step_fn, eos_token_id=eos, pad_token_id=pad,
            max_new_tokens=max_new, min_new_tokens=max_new - 1)
        return np.asarray(out).shape[1]

    decode_full = jax.jit(
        lambda p, d, e, m: model.apply(
            {"params": p}, d, e, m,
            method=lambda mdl, *a: mdl.decode(*a)))

    def run_recompute():
        dec = np.full((B, s_max), pad, np.int32)
        for t in range(max_new):
            logits = np.asarray(
                decode_full(params, jnp.asarray(dec), enc_out, enc_mask))
            dec[:, t + 1] = logits[:, t].argmax(-1)
        return max_new

    results = {}
    for name, fn in (("cached", run_cached), ("recompute", run_recompute)):
        fn()  # warm/compile
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        results[f"{name}_tokens_per_sec"] = round(B * n / dt, 1)
    results.update(batch=B, max_new=max_new, layers=layers, model="t5")
    print(json.dumps(results))


if __name__ == "__main__":
    if os.environ.get("SPRC_DECODE_MODEL") == "t5":
        main_t5()
    else:
        main()
