"""On-chip correctness A/B for the fused block kernels.

Interpret-mode tests (tests/test_pallas_kernels.py) validate kernel
*semantics*; this validates the *Mosaic-compiled* kernels on the real chip.
Both the pallas kernel and the XLA reference composition run inside ONE
jitted program (separate dispatches get deduped by the remote executor —
MEASUREMENTS.md pitfall #2 — which round-tripped as fake 0.0 diffs), and the
program returns the deltas directly.

Prints one JSON line with max-abs / mean-abs deltas for the bf16 megakernel
vs XLA and the int8 megakernel vs the int8 XLA composition.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sprc_tpu.ops.pallas_block import (
        _full_xla_ref,
        fused_vit_block,
        fused_vit_block_i8,
    )
    from sprc_tpu.ops.quant import int8_dense_static, quantize_weight

    B, S, W, H, M = 256, 257, 1024, 16, 4096
    scale = (W // H) ** -0.5

    def gen(key):
        ks = jax.random.split(key, 8)
        x = jax.random.normal(ks[0], (B, S, W), jnp.bfloat16)
        l1s = 1 + 0.1 * jax.random.normal(ks[1], (W,), jnp.float32)
        l1b = 0.1 * jax.random.normal(ks[2], (W,), jnp.float32)
        wqkv = 0.02 * jax.random.normal(ks[3], (W, 3 * W), jnp.float32)
        wproj = 0.02 * jax.random.normal(ks[4], (W, W), jnp.float32)
        l2s = 1 + 0.1 * jax.random.normal(ks[5], (W,), jnp.float32)
        w1 = 0.02 * jax.random.normal(ks[6], (W, M), jnp.float32)
        w2 = 0.02 * jax.random.normal(ks[7], (M, W), jnp.float32)
        return x, l1s, l1b, wqkv, wproj, l2s, w1, w2

    @jax.jit
    def compare(key):
        x, l1s, l1b, wqkv, wproj, l2s, w1, w2 = gen(key)
        zb3 = jnp.zeros((3 * W,), jnp.float32)
        zbW = jnp.zeros((W,), jnp.float32)
        zbM = jnp.zeros((M,), jnp.float32)
        args = (x, l1s, l1b, wqkv, zb3, wproj, zbW, l2s, zbW, w1, zbM, w2, zbW)

        fused = fused_vit_block(*args, H, 1e-5, scale, True, 4)
        ref = _full_xla_ref(*args, heads=H, eps=1e-5, scale=scale, quick=True)
        d_bf16 = jnp.abs(fused.astype(jnp.float32) - ref.astype(jnp.float32))

        wq8, sq = quantize_weight(wqkv)
        wp8, sp = quantize_weight(wproj)
        w18, s1 = quantize_weight(w1)
        w28, s2 = quantize_weight(w2)
        acts = (0.05, 0.05, 0.05, 0.05)
        q = fused_vit_block_i8(
            x, l1s, l1b, wq8, sq, zb3, wp8, sp, zbW, l2s, zbW,
            w18, s1, zbM, w28, s2, zbW, heads=H, eps=1e-5, scale=scale,
            quick=True, acts=acts, G=8,
        )
        # int8 XLA composition with the SAME static scales
        x32 = x.astype(jnp.float32)
        m = x32.mean(-1, keepdims=True)
        v = jnp.square(x32 - m).mean(-1, keepdims=True)
        h = ((x32 - m) * jax.lax.rsqrt(v + 1e-5) * l1s + l1b).astype(x.dtype)
        qkv = int8_dense_static(h, wqkv, 0.05, zb3)
        qh, kh, vh = jnp.split(qkv, 3, axis=-1)
        qh = qh.reshape(B, S, H, W // H)
        kh = kh.reshape(B, S, H, W // H)
        vh = vh.reshape(B, S, H, W // H)
        s_ = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s_ * scale, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p.astype(vh.dtype), vh).reshape(B, S, W)
        y = x + int8_dense_static(ctx, wproj, 0.05, zbW)
        y32 = y.astype(jnp.float32)
        m2 = y32.mean(-1, keepdims=True)
        v2 = jnp.square(y32 - m2).mean(-1, keepdims=True)
        u = ((y32 - m2) * jax.lax.rsqrt(v2 + 1e-5) * l2s).astype(x.dtype)
        hid = int8_dense_static(u, w1, 0.05, zbM).astype(jnp.float32)
        hid = hid * jax.nn.sigmoid(1.702 * hid)
        qref = y + int8_dense_static(hid.astype(x.dtype), w2, 0.05, zbW)
        d_i8 = jnp.abs(q.astype(jnp.float32) - qref.astype(jnp.float32))

        amax = jnp.max(jnp.abs(ref.astype(jnp.float32)))
        return (
            jnp.max(d_bf16), jnp.mean(d_bf16),
            jnp.max(d_i8), jnp.mean(d_i8), amax,
        )

    out = [float(np.asarray(t)) for t in compare(jax.random.PRNGKey(3))]
    print(json.dumps({
        "bf16_kernel_vs_xla_maxabs": out[0],
        "bf16_kernel_vs_xla_meanabs": out[1],
        "int8_kernel_vs_int8_xla_maxabs": out[2],
        "int8_kernel_vs_int8_xla_meanabs": out[3],
        "ref_maxabs_scale": out[4],
    }))


if __name__ == "__main__":
    main()
