"""Round-2 perf ablations on the real chip. One mode per process (the
tunnel allows one client at a time); the runner script sequences them.

Modes:
  mm        - chained 4096^3 matmul peak: bf16 TFLOPs and int8 TOPS
  attn      - attention micro at ViT-L shapes (impl via SPRC_ATTN_* env)
  block     - per-block ablation at b256 (variant via SPRC_ABL_VARIANT)

Tunnel rules (MEASUREMENTS.md): scalar readback per step, distinct
device-generated inputs, everything amortized inside jit.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _t(fn, *args):
    """Time one jitted call with a forced scalar readback."""
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = out if not isinstance(out, tuple) else out[0]
    _ = float(np.asarray(leaf.ravel()[0] if leaf.ndim else leaf))
    return time.perf_counter() - t0


def mode_mm():
    import jax
    import jax.numpy as jnp

    n, K = 4096, 64
    rs = np.random.RandomState(0)

    # bf16 control
    b16 = jnp.asarray(rs.randn(n, n), jnp.bfloat16)

    @jax.jit
    def chain_bf16(x):
        def body(i, c):
            return jax.lax.dot(c, b16, preferred_element_type=jnp.bfloat16)
        return jax.lax.fori_loop(0, K, body, x)

    x0 = jnp.asarray(rs.randn(n, n), jnp.bfloat16)
    _t(chain_bf16, x0)  # compile+warm
    dt = min(_t(chain_bf16, x0) for _ in range(3))
    print(json.dumps({"mode": "mm_bf16", "tflops": round(2 * n**3 * K / dt / 1e12, 1)}))

    # int8: s8 x s8 -> s32 on the MXU; keep the chain data-dependent by
    # truncating the accumulator back to int8 each round
    b8 = jnp.asarray(rs.randint(-4, 4, (n, n)), jnp.int8)

    @jax.jit
    def chain_int8(x):
        def body(i, c):
            a = (c % 5).astype(jnp.int8)
            return jax.lax.dot(a, b8, preferred_element_type=jnp.int32)
        return jax.lax.fori_loop(0, K, body, x)

    x8 = jnp.asarray(rs.randint(-4, 4, (n, n)), jnp.int32)
    _t(chain_int8, x8)
    dt = min(_t(chain_int8, x8) for _ in range(3))
    print(json.dumps({"mode": "mm_int8", "tops": round(2 * n**3 * K / dt / 1e12, 1)}))


def mode_mm2():
    """Cleaner int8 peak: big-K rectangular matmul so the per-iteration
    requantize (elementwise over the output) is amortized against 8x the
    FLOPs of the square `mm` mode; bf16 control at the same shape."""
    import jax
    import jax.numpy as jnp

    n, kdim, K = 4096, 32768, 8

    # device-generated inputs: host->tunnel transfers of 256 MB hit the
    # remote body-size limit (HTTP 413)
    w16 = jax.jit(
        lambda key: jax.random.normal(key, (kdim, n), jnp.bfloat16) * 0.02
    )(jax.random.PRNGKey(1))

    @jax.jit
    def chain_bf16(x, w):
        def body(i, c):
            y = jax.lax.dot(c, w, preferred_element_type=jnp.bfloat16)
            return jnp.tile(y, (1, kdim // n))  # rebuild [n, kdim]
        return jax.lax.fori_loop(0, K, body, x)

    x0 = jax.jit(
        lambda key: jax.random.normal(key, (n, kdim), jnp.bfloat16)
    )(jax.random.PRNGKey(2))
    import numpy as _np
    _ = float(_np.asarray(x0[0, 0]))
    _t(chain_bf16, x0, w16)
    dt = min(_t(chain_bf16, x0, w16) for _ in range(3))
    print(json.dumps({"mode": "mm2_bf16", "tflops": round(2 * n * n * kdim * K / dt / 1e12, 1)}))

    w8 = jax.jit(
        lambda key: jax.random.randint(key, (kdim, n), -8, 8, jnp.int8)
    )(jax.random.PRNGKey(3))

    @jax.jit
    def chain_int8(x, w):
        def body(i, c):
            y = jax.lax.dot(c, w, preferred_element_type=jnp.int32)
            y8 = jax.lax.shift_right_arithmetic(y, 9).astype(jnp.int8)
            return jnp.tile(y8, (1, kdim // n))
        return jax.lax.fori_loop(0, K, body, x)

    x8 = jax.jit(
        lambda key: jax.random.randint(key, (n, kdim), -8, 8, jnp.int8)
    )(jax.random.PRNGKey(4))
    _ = float(_np.asarray(x8[0, 0]))
    _t(chain_int8, x8, w8)
    dt = min(_t(chain_int8, x8, w8) for _ in range(3))
    print(json.dumps({"mode": "mm2_int8", "tops": round(2 * n * n * kdim * K / dt / 1e12, 1)}))


def mode_attn():
    """Attention-only at ViT-L/b256 shapes; impl selected by env before
    import (SPRC_PALLAS_ATTN / SPRC_ATTN_V)."""
    import os

    import jax
    import jax.numpy as jnp

    from sprc_tpu.ops.attention import dot_product_attention

    B, S, H, D = 256, 257, 16, 64
    K = 20
    label = f"pallas{os.environ.get('SPRC_ATTN_V','4')}" if os.environ.get(
        "SPRC_PALLAS_ATTN", "1") == "1" else "xla"

    @jax.jit
    def chain(q, k, v):
        def body(i, q):
            return dot_product_attention(q, k, v)
        return jax.lax.fori_loop(0, K, body, q)

    gen = jax.jit(lambda key: tuple(
        jax.random.normal(k_, (B, S, H, D), jnp.bfloat16)
        for k_ in jax.random.split(key, 3)))
    q, k, v = gen(jax.random.PRNGKey(0))
    jax.block_until_ready((q, k, v))
    _t(chain, q, k, v)
    dt = min(_t(chain, q, k, v) for _ in range(3))
    print(json.dumps({"mode": f"attn_{label}", "ms_per_call": round(dt / K * 1e3, 3)}))


def mode_block():
    """One ViT-L block chained K times; variant via SPRC_ABL_VARIANT."""
    import os

    import jax
    import jax.numpy as jnp

    from sprc_tpu.ops.attention import dot_product_attention

    variant = os.environ.get("SPRC_ABL_VARIANT", "full")
    assert variant in ("full", "noln", "noattn", "nomlp", "mmonly", "int8",
                       "int8s", "fusedblk", "fusedblk8", "fusedblk2",
                       "fusedblk_i8", "megablk", "megablk4", "megablk16", "megablk_i8",
                       "megablk_eva")
    B, S, W, Hd, M = 256, 257, 1024, 16, 4096
    K = 12
    if variant == "megablk_eva":
        # EVA ViT-g block dims (width 1408, head_dim 88, mlp 6144): probes
        # Mosaic's handling of non-128-aligned head slices + VMEM pressure
        B, W, Hd, M = 128, 1408, 16, 6144
        variant = "megablk4"
    rs = np.random.RandomState(0)
    p = {
        "wqkv": jnp.asarray(rs.randn(W, 3 * W) * 0.02, jnp.bfloat16),
        "bqkv": jnp.zeros((3 * W,), jnp.bfloat16),
        "wproj": jnp.asarray(rs.randn(W, W) * 0.02, jnp.bfloat16),
        "w1": jnp.asarray(rs.randn(W, M) * 0.02, jnp.bfloat16),
        "w2": jnp.asarray(rs.randn(M, W) * 0.02, jnp.bfloat16),
        "s1": jnp.ones((W,), jnp.float32),
        "b1": jnp.zeros((W,), jnp.float32),
        "s2": jnp.ones((W,), jnp.float32),
        "b2": jnp.zeros((W,), jnp.float32),
    }

    def ln(x, s, b, eps=1e-5, io_bf16=False):
        x32 = x.astype(jnp.float32)
        m = x32.mean(-1, keepdims=True)
        v = jnp.square(x32 - m).mean(-1, keepdims=True)
        y = (x32 - m) * jax.lax.rsqrt(v + eps) * s + b
        return y.astype(jnp.bfloat16)

    use_ln = variant not in ("noln", "mmonly")
    use_attn = variant not in ("noattn", "mmonly")
    use_mlp = variant != "nomlp"
    mm_only = variant == "mmonly"
    int8 = variant == "int8"

    if variant == "int8s":
        from sprc_tpu.ops.quant import int8_dense_static

        # perf-only ablation: a constant per-tensor act scale (value is
        # irrelevant to throughput; calibration sets real values)
        mm = lambda h, w, b=None: int8_dense_static(h, w, 0.05, b)
    elif int8:
        from sprc_tpu.ops.quant import int8_dense_from_fp

        mm = lambda h, w, b=None: int8_dense_from_fp(h, w, b)
    else:
        mm = lambda h, w, b=None: (h @ w + b if b is not None else h @ w)

    if variant == "megablk_i8":
        from sprc_tpu.ops.pallas_block import fused_vit_block_i8
        from sprc_tpu.ops.quant import quantize_weight

        wq8, sq = quantize_weight(p["wqkv"])
        wp8, sp = quantize_weight(p["wproj"])
        w18, s1q = quantize_weight(p["w1"])
        w28, s2q = quantize_weight(p["w2"])
        acts = (0.05, 0.05, 0.05, 0.05)

        def block(x):
            return fused_vit_block_i8(
                x, p["s1"], p["b1"], wq8, sq, jnp.zeros((3 * W,), jnp.float32),
                wp8, sp, jnp.zeros((W,), jnp.float32), p["s2"], p["b2"],
                w18, s1q, jnp.zeros((M,), jnp.float32), w28, s2q,
                jnp.zeros((W,), jnp.float32), heads=Hd, eps=1e-5,
                scale=(W // Hd) ** -0.5, quick=True, acts=acts,
                G=int(os.environ.get("SPRC_FBLK_G", "4")),
            )

        @jax.jit
        def chain(x):
            def body(i, x):
                return block(x)
            return jax.lax.fori_loop(0, K, body, x)

        gen = jax.jit(lambda key: jax.random.normal(key, (B, S, W), jnp.bfloat16))
        x = gen(jax.random.PRNGKey(0))
        jax.block_until_ready(x)
        _t(chain, x)
        dt = min(_t(chain, x) for _ in range(3))
        print(json.dumps({"mode": f"block_{variant}", "ms_per_block": round(dt / K * 1e3, 3)}))
        return

    if variant.startswith("megablk"):
        from sprc_tpu.ops.pallas_block import fused_vit_block

        G = {"megablk": 8, "megablk4": 4, "megablk16": 16}[variant]

        def block(x):
            return fused_vit_block(
                x, p["s1"], p["b1"], p["wqkv"], p["bqkv"], p["wproj"],
                jnp.zeros((W,), jnp.float32), p["s2"], p["b2"], p["w1"],
                jnp.zeros((M,), jnp.float32), p["w2"],
                jnp.zeros((W,), jnp.float32), Hd, 1e-5, (W // Hd) ** -0.5,
                True, G,
            )

        @jax.jit
        def chain(x):
            def body(i, x):
                return block(x)
            return jax.lax.fori_loop(0, K, body, x)

        gen = jax.jit(lambda key: jax.random.normal(key, (B, S, W), jnp.bfloat16))
        x = gen(jax.random.PRNGKey(0))
        jax.block_until_ready(x)
        _t(chain, x)
        dt = min(_t(chain, x) for _ in range(3))
        print(json.dumps({"mode": f"block_{variant}", "ms_per_block": round(dt / K * 1e3, 3)}))
        return

    if variant.startswith("fusedblk"):
        from sprc_tpu.ops.pallas_block import fused_attn_block

        G = {"fusedblk": 4, "fusedblk8": 8, "fusedblk2": 2}.get(variant, 4)
        i8 = variant == "fusedblk_i8"
        if i8:
            from sprc_tpu.ops.quant import int8_dense_static

            mm = lambda h, w, b=None: int8_dense_static(h, w, 0.05, b)

        def block(x):
            x = fused_attn_block(
                x, p["s1"], p["b1"], p["wqkv"], p["bqkv"], p["wproj"],
                jnp.zeros((W,), jnp.float32), Hd, 1e-5, (W // Hd) ** -0.5, G,
            )
            h = ln(x, p["s2"], p["b2"])
            h = mm(h, p["w1"])
            h = h * jax.nn.sigmoid(1.702 * h)
            x = x + mm(h, p["w2"])
            return x.astype(jnp.bfloat16)

        @jax.jit
        def chain(x):
            def body(i, x):
                return block(x)
            return jax.lax.fori_loop(0, K, body, x)

        gen = jax.jit(lambda key: jax.random.normal(key, (B, S, W), jnp.bfloat16))
        x = gen(jax.random.PRNGKey(0))
        jax.block_until_ready(x)
        _t(chain, x)
        dt = min(_t(chain, x) for _ in range(3))
        print(json.dumps({"mode": f"block_{variant}", "ms_per_block": round(dt / K * 1e3, 3)}))
        return

    def block(x):
        h = ln(x, p["s1"], p["b1"]) if use_ln else x
        qkv = mm(h, p["wqkv"], p["bqkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if use_attn:
            q = q.reshape(B, S, Hd, W // Hd)
            k = k.reshape(B, S, Hd, W // Hd)
            v = v.reshape(B, S, Hd, W // Hd)
            ctx = dot_product_attention(q, k, v).reshape(B, S, W)
        else:
            ctx = v
        x = x + mm(ctx, p["wproj"])
        if use_mlp:
            h = ln(x, p["s2"], p["b2"]) if use_ln else x
            h = mm(h, p["w1"])
            if not mm_only:
                h = h * jax.nn.sigmoid(1.702 * h)  # quickgelu
            x = x + mm(h, p["w2"])
        return x.astype(jnp.bfloat16)

    @jax.jit
    def chain(x):
        def body(i, x):
            return block(x)
        return jax.lax.fori_loop(0, K, body, x)

    gen = jax.jit(lambda key: jax.random.normal(key, (B, S, W), jnp.bfloat16))
    x = gen(jax.random.PRNGKey(0))
    jax.block_until_ready(x)
    _t(chain, x)
    dt = min(_t(chain, x) for _ in range(3))
    print(json.dumps({"mode": f"block_{variant}", "ms_per_block": round(dt / K * 1e3, 3)}))


def mode_layout():
    """Cost of the BSHD->[B*H,S,D] layout change around the pallas kernel:
    (a) transpose+reshape of q/k/v, (b) einsum producing BHSD directly from
    the matmul, (c) matmul then transpose."""
    import jax
    import jax.numpy as jnp

    B, S, H, D = 256, 257, 16, 64
    C = H * D
    K = 20
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(C, H, D) * 0.02, jnp.bfloat16)

    # every body perturbs its input with the carry so the work can't be
    # hoisted out of the loop (loop-invariant code motion)
    @jax.jit
    def t_transpose(q, k, v):
        def body(c, _):
            qq = q + c.astype(q.dtype)
            qf = qq.transpose(0, 2, 1, 3).reshape(B * H, S, D)
            kf = (k + c.astype(k.dtype)).transpose(0, 2, 1, 3).reshape(B * H, S, D)
            vf = (v + c.astype(v.dtype)).transpose(0, 2, 1, 3).reshape(B * H, S, D)
            s = (qf[:, 0, 0] + kf[:, 0, 0] + vf[:, 0, 0]).sum().astype(jnp.float32)
            return s * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return acc

    @jax.jit
    def t_einsum_bhsd(x):
        def body(c, _):
            o = jnp.einsum("bsc,chd->bhsd", x + c.astype(x.dtype), w,
                           preferred_element_type=jnp.bfloat16)
            return o[:, 0, 0, 0].sum().astype(jnp.float32) * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return acc

    @jax.jit
    def t_mm_transpose(x):
        def body(c, _):
            o = ((x + c.astype(x.dtype)) @ w.reshape(C, C)).reshape(
                B, S, H, D).transpose(0, 2, 1, 3)
            return o[:, 0, 0, 0].sum().astype(jnp.float32) * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return acc

    gen = jax.jit(lambda key: jax.random.normal(key, (B, S, H, D), jnp.bfloat16))
    q = gen(jax.random.PRNGKey(0))
    k = gen(jax.random.PRNGKey(1))
    v = gen(jax.random.PRNGKey(2))
    x = q.reshape(B, S, C)
    jax.block_until_ready((q, k, v, x))
    for label, fn, args_ in [
        ("transpose3", t_transpose, (q, k, v)),
        ("einsum_bhsd", t_einsum_bhsd, (x,)),
        ("mm_transpose", t_mm_transpose, (x,)),
    ]:
        _t(fn, *args_)
        dt = min(_t(fn, *args_) for _ in range(3))
        print(json.dumps({"mode": f"layout_{label}", "ms": round(dt / K * 1e3, 3)}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["mm", "mm2", "attn", "block", "layout"])
    args = ap.parse_args()
    {"mm": mode_mm, "attn": mode_attn, "block": mode_block,
     "layout": mode_layout, "mm2": mode_mm2}[args.mode]()
