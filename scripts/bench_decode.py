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


if __name__ == "__main__":
    main()
