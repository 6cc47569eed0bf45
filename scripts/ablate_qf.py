"""Standalone compile/perf probe for the fused Q-Former layer kernel.

Modes (env SPRC_QF_ABL):
  full    - fusion-pass layer (cross-attn, dual FFN) at real dims
  nocross - self-attn + dual FFN only
  textffn - no_img variant (text FFN everywhere)
Env SPRC_QF_G picks G; SPRC_QF_I8=1 runs the int8 kernel variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _t(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(np.asarray(out.ravel()[0]))
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from sprc_tpu.ops.pallas_qformer import fused_qformer_layer

    mode = os.environ.get("SPRC_QF_ABL", "full")
    G = int(os.environ.get("SPRC_QF_G", "16"))
    i8 = os.environ.get("SPRC_QF_I8", "0") == "1"
    B, S, W, Q, H = 256, 64, 768, 32, 12
    Si, Wi = 257, 1024
    M = 3072
    K = 12
    rs = np.random.RandomState(0)

    def dense(i, o):
        return {"kernel": jnp.asarray(rs.randn(i, o) * 0.02, jnp.bfloat16),
                "bias": jnp.zeros((o,), jnp.float32)}

    def lnp():
        return {"scale": jnp.ones((W,), jnp.float32),
                "bias": jnp.zeros((W,), jnp.float32)}

    self_p = {"query": dense(W, W), "key": dense(W, W), "value": dense(W, W),
              "out": dense(W, W), "ln": lnp()}
    cross_p = {"query": dense(W, W), "key": dense(Wi, W),
               "value": dense(Wi, W), "out": dense(W, W), "ln": lnp()}
    ffn_q = {"fc1": dense(W, M), "fc2": dense(M, W), "ln": lnp()}
    ffn_t = {"fc1": dense(W, M), "fc2": dense(M, W), "ln": lnp()}

    gen = jax.jit(lambda k: 0.1 * jax.random.normal(k, (B, S, W), jnp.bfloat16))
    x = gen(jax.random.PRNGKey(0))
    img = jax.jit(
        lambda k: 0.1 * jax.random.normal(k, (B, Si, Wi), jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    cb = jnp.zeros((B, S), jnp.float32)
    jax.block_until_ready((x, img))

    if mode == "full":
        kw = dict(img=img, cross_p=cross_p, ffn_q_p=ffn_q, ffn_t_p=ffn_t,
                  text_ffn_all=False)
    elif mode == "nocross":
        kw = dict(img=None, cross_p=None, ffn_q_p=ffn_q, ffn_t_p=ffn_t,
                  text_ffn_all=False)
    else:  # textffn
        kw = dict(img=None, cross_p=None, ffn_q_p=None, ffn_t_p=ffn_t,
                  text_ffn_all=True)

    @jax.jit
    def chain(x):
        def body(i, h):
            return fused_qformer_layer(
                h, cb, self_p, heads=H, eps=1e-12, Q=Q, G=G, int8=i8, **kw)
        return jax.lax.fori_loop(0, K, body, x)

    tag = f"qf_{mode}_G{G}" + ("_i8" if i8 else "")
    try:
        _t(chain, x)
        dt = min(_t(chain, x) for _ in range(3))
        print(json.dumps({"mode": tag, "ms_per_layer": round(dt / K * 1e3, 3)}))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"mode": tag, "error": str(e)[:300]}))


if __name__ == "__main__":
    main()
