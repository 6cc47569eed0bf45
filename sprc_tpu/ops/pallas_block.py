"""Fused attention half-block: LN -> QKV -> attention -> proj -> +residual.

Motivation (MEASUREMENTS.md round-2 ablation): the standalone pallas
attention kernel costs ~5.2 ms/call at ViT-L b256, of which ~3.5 ms is HBM
layout movement (BSHD -> [B*H,S,D] transposes) around the kernel boundary
and only ~1.5 ms is the fused scores/softmax/PV body. Fusing the whole
attention residual branch into ONE pallas_call removes every intermediate
HBM round trip: x is read once, the output written once, and the qkv/proj
weights stay VMEM-resident across the grid (constant index_map blocks are
fetched once, not per step).

Per grid step the kernel processes ``G`` images serially:

    x32 = f32(x[g*G:(g+1)*G])                 # [G, S, W]
    h   = bf16(LayerNorm_f32(x32))            # fp32 LN, matching LayerNormFP32
    per image g:
        qkv = h[g] @ Wqkv + bqkv              # [S, 3W], MXU, f32 accum
        per head: softmax(q k^T * scale) v    # exp2-domain, bf16 probs
        out = ctx @ Wproj + bproj             # [S, W]
        o[g] = x[g] + bf16(out)               # residual in model dtype

Weight layout note: Wqkv columns are [q | k | v] each W wide with head h at
columns h*D:(h+1)*D of its segment — the same packing the unfused path's
``jnp.split`` + reshape implies, so the param tree is unchanged (EVA's
q/v-only bias folds into bqkv with a zero k segment at the caller).

Backward: custom VJP recomputes through the XLA composition (the towers
this serves are frozen; only activations are needed upstream).

Reference being replaced: the per-block torch attention of
src/lavis/models/clip_vit.py:58-123 / eva_vit.py:118-148 (cuDNN path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LOG2E = 1.4426950408889634


def _attend(qkv, W, D, heads, scale, dtype, *, perhead: bool):
    """qkv [S, 3W] (packed q|k|v thirds) or [S, 3D] per-head -> ctx."""
    outs = []
    for hh in range(heads):
        if perhead:
            q = qkv[hh][:, :D] * (scale * _LOG2E)
            k = qkv[hh][:, D:2 * D]
            v = qkv[hh][:, 2 * D:]
        else:
            q = qkv[:, hh * D:(hh + 1) * D] * (scale * _LOG2E)
            k = qkv[:, W + hh * D:W + (hh + 1) * D]
            v = qkv[:, 2 * W + hh * D:2 * W + (hh + 1) * D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, S]
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - mx).astype(v.dtype)
        denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom  # [S, D]
        outs.append(o.astype(dtype))
    return jnp.concatenate(outs, axis=-1)  # [S, W]


def _kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            o_ref, *, G: int, heads: int, eps: float, scale: float,
            mode: str = ""):
    S = x_ref.shape[1]
    W = x_ref.shape[2]
    D = W // heads

    xb = x_ref[...]  # [G, S, W] bf16
    x32 = xb.astype(jnp.float32)
    m = x32.mean(-1, keepdims=True)
    var = jnp.square(x32 - m).mean(-1, keepdims=True)
    h = (x32 - m) * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]
    h = h.astype(xb.dtype)  # [G, S, W]

    wqkv = wqkv_ref[...]
    bqkv = bqkv_ref[0]
    wproj = wproj_ref[...]
    bproj = bproj_ref[0]

    for g in range(G):
        if mode == "perhead":
            # head-major weight layout: per head one [W, 3D] matmul whose
            # output is consumed immediately (no [S, 3W] buffer)
            qkv = [
                (jax.lax.dot_general(
                    h[g], wqkv[:, hh * 3 * D:(hh + 1) * 3 * D],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bqkv[hh * 3 * D:(hh + 1) * 3 * D]).astype(xb.dtype)
                for hh in range(heads)
            ]
            ctx = _attend(qkv, W, D, heads, scale, xb.dtype, perhead=True)
        else:
            qkv = jax.lax.dot_general(
                h[g], wqkv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bqkv  # [S, 3W] f32
            qkv = qkv.astype(xb.dtype)
            if mode == "noattn":
                ctx = qkv[:, :W]
            else:
                ctx = _attend(qkv, W, D, heads, scale, xb.dtype, perhead=False)
        out = jax.lax.dot_general(
            ctx, wproj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj
        o_ref[g] = xb[g] + out.astype(xb.dtype)


def _fwd_impl(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, *, heads, eps, scale, G):
    import os

    B, S, W = x.shape
    D = W // heads
    mode = os.environ.get("SPRC_FBLK_MODE", "")
    if mode == "perhead":
        # reorder packed [q|k|v] thirds into head-major [.. h: q_h|k_h|v_h ..]
        idx = jnp.concatenate([
            jnp.arange(hh * D + seg * W, hh * D + seg * W + D)
            for hh in range(heads) for seg in range(3)
        ])
        wqkv = wqkv[:, idx]
        bqkv = bqkv[idx]
    while B % G:
        G //= 2
    kwargs = {}
    if jax.default_backend() == "tpu":
        from jax.experimental.pallas import tpu as pltpu

        params_cls = getattr(pltpu, "CompilerParams", None) or getattr(
            pltpu, "TPUCompilerParams"
        )
        kwargs["compiler_params"] = params_cls(vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_kernel, G=G, heads=heads, eps=eps, scale=scale,
                          mode=mode),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, S, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
            pl.BlockSpec((W, 3 * W), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * W), lambda i: (0, 0)),
            pl.BlockSpec((W, W), lambda i: (0, 0)),
            pl.BlockSpec((1, W), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((G, S, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, W), x.dtype),
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(
        x,
        ln_s.astype(jnp.float32).reshape(1, W),
        ln_b.astype(jnp.float32).reshape(1, W),
        wqkv.astype(x.dtype),
        bqkv.astype(jnp.float32).reshape(1, 3 * W),
        wproj.astype(x.dtype),
        bproj.astype(jnp.float32).reshape(1, W),
    )


def _xla_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, *, heads, eps, scale):
    """Unfused composition (also the VJP recompute path)."""
    B, S, W = x.shape
    D = W // heads
    x32 = x.astype(jnp.float32)
    m = x32.mean(-1, keepdims=True)
    var = jnp.square(x32 - m).mean(-1, keepdims=True)
    h = ((x32 - m) * jax.lax.rsqrt(var + eps) * ln_s + ln_b).astype(x.dtype)
    qkv = (h @ wqkv.astype(x.dtype)).astype(jnp.float32) + bqkv
    q, k, v = jnp.split(qkv.astype(x.dtype), 3, axis=-1)
    q = q.reshape(B, S, heads, D)
    k = k.reshape(B, S, heads, D)
    v = v.reshape(B, S, heads, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v).reshape(B, S, W)
    out = (ctx @ wproj.astype(x.dtype)).astype(jnp.float32) + bproj
    return x + out.astype(x.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10)
)
def fused_attn_block(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                     heads: int, eps: float, scale: float, G: int = 4):
    """x: [B,S,W] -> x + proj(attn(LN(x) @ Wqkv + bqkv)) in one pallas call."""
    return _fwd_impl(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                     heads=heads, eps=eps, scale=scale, G=G)


def _vjp_fwd(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, heads, eps, scale, G):
    out = _fwd_impl(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                    heads=heads, eps=eps, scale=scale, G=G)
    return out, (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)


def _vjp_bwd(heads, eps, scale, G, res, g):
    x, ln_s, ln_b, wqkv, bqkv, wproj, bproj = res
    _, vjp = jax.vjp(
        lambda *a: _xla_ref(*a, heads=heads, eps=eps, scale=scale), x, ln_s,
        ln_b, wqkv, bqkv, wproj, bproj,
    )
    return vjp(g)


fused_attn_block.defvjp(_vjp_fwd, _vjp_bwd)
