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
    import os

    # default batched_nomax (round 4): eliding the [H,S,S] max pass is
    # softmax-identical in exact arithmetic (exp2(s)/sum == exp2(s-m)/sum)
    # and overflow-safe under the 120 clamp (|logits| < 83 — ViT attention
    # logits sit orders below); measured end-to-end encode bf16 880->892,
    # int8 1213->1268 imgs/s at b2048, with on-chip kernel-vs-XLA parity
    # unchanged (bf16 maxabs 0.03125/meanabs 0.00205, int8 0.090/0.011 —
    # identical to the `batched` record, MEASUREMENTS.md r4).
    # SPRC_FBLK_ATTN=batched restores the max-subtracting form.
    mode = os.environ.get("SPRC_FBLK_ATTN", "batched_nomax")
    if mode.startswith("batched") and not perhead:
        # stack heads into a leading batch dim (VMEM copies) so all score /
        # PV matmuls issue as ONE batched dot_general and the softmax
        # vectorizes over [H, S, S] at once.
        # "_sbf16" suffix: scores emitted/kept in bf16 — halves the VPU
        # elementwise traffic and VMEM footprint of the [H, S, S] softmax
        # passes; probs were already bf16, so the only numerics change is
        # 8-bit score mantissas (~0.4% relative on probs, within the
        # kernel's measured bf16 envelope).
        sdt = jnp.bfloat16 if mode.endswith("_sbf16") else jnp.float32
        q = jnp.stack([qkv[:, h * D:(h + 1) * D] for h in range(heads)])
        k = jnp.stack([qkv[:, W + h * D:W + (h + 1) * D] for h in range(heads)])
        v = jnp.stack([qkv[:, 2 * W + h * D:2 * W + (h + 1) * D] for h in range(heads)])
        s = jax.lax.dot_general(
            q * (scale * _LOG2E), k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,  # tpu.matmul must emit f32
        ).astype(sdt)  # [H, S, S]; the cast fuses into the dot epilogue
        if mode.startswith("batched_nomax"):
            # exp2 without max-subtraction saves a full [H,S,S] max pass;
            # clamp at 120 so scores past the assumed |s*log2e| < 127 bound
            # saturate instead of overflowing to inf (softmax then degrades
            # to uniform-over-clamped rather than NaN)
            p = jnp.exp2(jnp.minimum(s, jnp.asarray(120.0, sdt))).astype(dtype)
        else:
            p = jnp.exp2(s - jnp.max(s, axis=-1, keepdims=True)).astype(dtype)
        # guard the no-max denominator: if every row score sits under the
        # fp32 exp2 underflow point (~s < -126, i.e. logits < -87) all probs
        # are 0 and the divide would emit NaN/Inf where the max-subtracting
        # form stays finite; clamp so the variant degrades to ~zero output
        # instead (unreachable in the documented |logits| < 83 envelope)
        denom = jnp.maximum(
            jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True),
            jnp.float32(1e-30))
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / denom  # [H, S, D]
        return jnp.concatenate([o[h] for h in range(heads)], axis=-1).astype(dtype)
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


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7 — far below
    bf16 resolution). Mosaic has no erf/erfc lowering, so exact-GELU models
    (EVA ViT-g, BLIP-1 ViT-B) need this inside the kernel."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact_f32(x):
    """0.5 x (1 + erf(x / sqrt(2))) with the in-kernel erf."""
    return 0.5 * x * (1.0 + _erf_approx(x * 0.7071067811865476))


def _ln_f32(x32, s, b, eps):
    m = x32.mean(-1, keepdims=True)
    var = jnp.square(x32 - m).mean(-1, keepdims=True)
    return (x32 - m) * jax.lax.rsqrt(var + eps) * s + b


def _full_kernel(x_ref, l1s_ref, l1b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                 bproj_ref, l2s_ref, l2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 o_ref, *, G: int, heads: int, eps: float, scale: float,
                 quick: bool):
    """Whole transformer block per program: attention residual branch then
    MLP residual branch, per image, entirely in VMEM."""
    S = x_ref.shape[1]
    W = x_ref.shape[2]
    D = W // heads

    xb = x_ref[...]  # [G, S, W]
    x32 = xb.astype(jnp.float32)
    h1 = _ln_f32(x32, l1s_ref[0], l1b_ref[0], eps).astype(xb.dtype)

    wqkv = wqkv_ref[...]
    bqkv = bqkv_ref[0]
    wproj = wproj_ref[...]
    bproj = bproj_ref[0]
    w1 = w1_ref[...]
    b1 = b1_ref[0]
    w2 = w2_ref[...]
    b2 = b2_ref[0]

    import os

    if os.environ.get("SPRC_FBLK_DENSE", "pergroup") == "batched":
        # all G images' rows through ONE dot per dense op: M = G*S rows
        # instead of S=257 (= 2x128 + 1 remainder row, poor MXU tiling)
        h2 = h1.reshape(G * S, W)
        qkv_all = (jax.lax.dot_general(
            h2, wqkv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv).astype(xb.dtype)
        ctx_all = jnp.concatenate([
            _attend(qkv_all[g * S:(g + 1) * S], W, D, heads, scale,
                    xb.dtype, perhead=False)
            for g in range(G)
        ], axis=0)
        att = jax.lax.dot_general(
            ctx_all, wproj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj
        y = xb.reshape(G * S, W) + att.astype(xb.dtype)
        u = _ln_f32(y.astype(jnp.float32), l2s_ref[0], l2b_ref[0], eps).astype(xb.dtype)
        hid = jax.lax.dot_general(
            u, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1
        if quick:
            hid = hid * jax.nn.sigmoid(1.702 * hid)
        else:
            hid = _gelu_exact_f32(hid)
        out = jax.lax.dot_general(
            hid.astype(xb.dtype), w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2
        o_ref[...] = (y + out.astype(xb.dtype)).reshape(G, S, W)
        return

    for g in range(G):
        qkv = (jax.lax.dot_general(
            h1[g], wqkv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv).astype(xb.dtype)
        ctx = _attend(qkv, W, D, heads, scale, xb.dtype, perhead=False)
        att = jax.lax.dot_general(
            ctx, wproj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj
        y = xb[g] + att.astype(xb.dtype)  # [S, W] post-attention residual

        u = _ln_f32(y.astype(jnp.float32), l2s_ref[0], l2b_ref[0], eps).astype(xb.dtype)
        hid = jax.lax.dot_general(
            u, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1
        if quick:
            hid = hid * jax.nn.sigmoid(1.702 * hid)
        else:
            hid = _gelu_exact_f32(hid)  # Mosaic has no erf; see _erf_approx
        out = jax.lax.dot_general(
            hid.astype(xb.dtype), w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2
        o_ref[g] = y + out.astype(xb.dtype)


def _full_fwd_impl(x, l1s, l1b, wqkv, bqkv, wproj, bproj, l2s, l2b, w1, b1,
                   w2, b2, *, heads, eps, scale, quick, G):
    B, S, W = x.shape
    M = w1.shape[1]
    while B % G:
        G //= 2
    kwargs = {}
    if jax.default_backend() == "tpu":
        from jax.experimental.pallas import tpu as pltpu

        params_cls = getattr(pltpu, "CompilerParams", None) or getattr(
            pltpu, "TPUCompilerParams"
        )
        kwargs["compiler_params"] = params_cls(vmem_limit_bytes=112 * 1024 * 1024)
    full = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_full_kernel, G=G, heads=heads, eps=eps, scale=scale,
                          quick=quick),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, S, W), lambda i: (i, 0, 0)),
            full(1, W), full(1, W),
            full(W, 3 * W), full(1, 3 * W),
            full(W, W), full(1, W),
            full(1, W), full(1, W),
            full(W, M), full(1, M),
            full(M, W), full(1, W),
        ],
        out_specs=pl.BlockSpec((G, S, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, W), x.dtype),
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(
        x,
        l1s.astype(jnp.float32).reshape(1, W),
        l1b.astype(jnp.float32).reshape(1, W),
        wqkv.astype(x.dtype),
        bqkv.astype(jnp.float32).reshape(1, 3 * W),
        wproj.astype(x.dtype),
        bproj.astype(jnp.float32).reshape(1, W),
        l2s.astype(jnp.float32).reshape(1, W),
        l2b.astype(jnp.float32).reshape(1, W),
        w1.astype(x.dtype),
        b1.astype(jnp.float32).reshape(1, M),
        w2.astype(x.dtype),
        b2.astype(jnp.float32).reshape(1, W),
    )


def _full_xla_ref(x, l1s, l1b, wqkv, bqkv, wproj, bproj, l2s, l2b, w1, b1,
                  w2, b2, *, heads, eps, scale, quick):
    y = _xla_ref(x, l1s, l1b, wqkv, bqkv, wproj, bproj,
                 heads=heads, eps=eps, scale=scale)
    u = _ln_f32(y.astype(jnp.float32), l2s, l2b, eps).astype(x.dtype)
    hid = (u @ w1.astype(x.dtype)).astype(jnp.float32) + b1
    if quick:
        hid = hid * jax.nn.sigmoid(1.702 * hid)
    else:
        hid = jax.nn.gelu(hid, approximate=False)
    out = (hid.astype(x.dtype) @ w2.astype(x.dtype)).astype(jnp.float32) + b2
    return y + out.astype(x.dtype)


def _q8(x32, inv_scale):
    if isinstance(inv_scale, float) and inv_scale == 1.0:
        # pre-scaled producer (ln_folded): no quantize multiply pass
        return jnp.clip(jnp.round(x32), -127, 127).astype(jnp.int8)
    return jnp.clip(jnp.round(x32 * inv_scale), -127, 127).astype(jnp.int8)


def _full_kernel_i8(x_ref, l1s_ref, l1b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                    wproj_ref, sproj_ref, bproj_ref, l2s_ref, l2b_ref,
                    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                    o_ref, *, G: int, heads: int, eps: float, scale: float,
                    quick: bool, acts: tuple, ln_folded: bool = False):
    """Whole block with the four dense matmuls on the int8 MXU path:
    weights arrive pre-quantized (int8 + per-out-channel scale), activations
    are quantized in-VMEM with calibrated static per-tensor scales (``acts``
    = (qkv, proj, fc1, fc2)) so the int8 intermediates never touch HBM.

    ``ln_folded``: the wrapper pre-divided the LN1/LN2 affines by a_qkv /
    a_fc1, so those two LN outputs arrive already in the quant domain and
    their [G,S,W] f32 quantize multiplies are elided (the dequant rescales
    keep the original a_* factors, so the math is unchanged up to f32
    rounding)."""
    S = x_ref.shape[1]
    W = x_ref.shape[2]
    D = W // heads
    a_qkv, a_proj, a_fc1, a_fc2 = acts
    inv_qkv = 1.0 if ln_folded else 1.0 / a_qkv
    inv_fc1 = 1.0 if ln_folded else 1.0 / a_fc1

    xb = x_ref[...]
    x32 = xb.astype(jnp.float32)
    h1 = _ln_f32(x32, l1s_ref[0], l1b_ref[0], eps)  # f32 [G,S,W]

    wqkv = wqkv_ref[...]
    rqkv = sqkv_ref[0] * a_qkv  # [3W] f32 combined rescale
    bqkv = bqkv_ref[0]
    wproj = wproj_ref[...]
    rproj = sproj_ref[0] * a_proj
    bproj = bproj_ref[0]
    w1 = w1_ref[...]
    r1 = s1_ref[0] * a_fc1
    b1 = b1_ref[0]
    w2 = w2_ref[...]
    r2 = s2_ref[0] * a_fc2
    b2 = b2_ref[0]

    import os

    if os.environ.get("SPRC_FBLK_DENSE", "pergroup") == "batched":
        # one [G*S, W] dot per dense op (see _full_kernel): int8 MXU rates
        # collapse at M=257 (2x128 + 1 remainder row); G*S rows tile cleanly
        q8 = _q8(h1.reshape(G * S, W), inv_qkv)
        qkv_all = (jax.lax.dot_general(
            q8, wqkv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * rqkv + bqkv).astype(xb.dtype)
        ctx_all = jnp.concatenate([
            _attend(qkv_all[g * S:(g + 1) * S], W, D, heads, scale,
                    xb.dtype, perhead=False)
            for g in range(G)
        ], axis=0)
        c8 = _q8(ctx_all.astype(jnp.float32), 1.0 / a_proj)
        att = jax.lax.dot_general(
            c8, wproj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * rproj + bproj
        y = xb.reshape(G * S, W) + att.astype(xb.dtype)
        u = _ln_f32(y.astype(jnp.float32), l2s_ref[0], l2b_ref[0], eps)
        u8 = _q8(u, inv_fc1)
        hid = jax.lax.dot_general(
            u8, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * r1 + b1
        if quick:
            hid = hid * jax.nn.sigmoid(1.702 * hid)
        else:
            hid = _gelu_exact_f32(hid)
        h8 = _q8(hid, 1.0 / a_fc2)
        out = jax.lax.dot_general(
            h8, w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * r2 + b2
        o_ref[...] = (y + out.astype(xb.dtype)).reshape(G, S, W)
        return

    for g in range(G):
        q8 = _q8(h1[g], inv_qkv)
        qkv = jax.lax.dot_general(
            q8, wqkv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * rqkv + bqkv
        qkv = qkv.astype(xb.dtype)
        ctx = _attend(qkv, W, D, heads, scale, xb.dtype, perhead=False)
        c8 = _q8(ctx.astype(jnp.float32), 1.0 / a_proj)
        att = jax.lax.dot_general(
            c8, wproj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * rproj + bproj
        y = xb[g] + att.astype(xb.dtype)

        u = _ln_f32(y.astype(jnp.float32), l2s_ref[0], l2b_ref[0], eps)
        u8 = _q8(u, inv_fc1)
        hid = jax.lax.dot_general(
            u8, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * r1 + b1
        if quick:
            hid = hid * jax.nn.sigmoid(1.702 * hid)
        else:
            hid = _gelu_exact_f32(hid)  # Mosaic has no erf; see _erf_approx
        h8 = _q8(hid, 1.0 / a_fc2)
        out = jax.lax.dot_general(
            h8, w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * r2 + b2
        o_ref[g] = y + out.astype(xb.dtype)


def fused_vit_block_i8(x, l1s, l1b, wqkv8, sqkv, bqkv, wproj8, sproj, bproj,
                       l2s, l2b, w18, s1, b1, w28, s2, b2, *, heads: int,
                       eps: float, scale: float, quick: bool,
                       acts: tuple, G: int = 8):
    """Int8 whole-block kernel (serving-only; no VJP — the towers using the
    int8 path are frozen). Weights pre-quantized via quant.quantize_weight.

    SPRC_FBLK_I8_LNFOLD=1 (opt-in A/B): fold the static quantize scales of
    the LN-fed matmuls (1/a_qkv into LN1's affine, 1/a_fc1 into LN2's) at
    trace time, eliding two [G,S,W] f32 quantize-multiply passes per block;
    the dequant rescales keep the original a_* factors so the composition
    is identical up to f32 rounding."""
    import os

    B, S, W = x.shape
    M = w18.shape[1]
    while B % G:
        G //= 2
    ln_folded = os.environ.get("SPRC_FBLK_I8_LNFOLD", "0") == "1"
    if ln_folded:
        a_qkv, _, a_fc1, _ = tuple(map(float, acts))
        l1s = l1s.astype(jnp.float32) / a_qkv
        l1b = l1b.astype(jnp.float32) / a_qkv
        l2s = l2s.astype(jnp.float32) / a_fc1
        l2b = l2b.astype(jnp.float32) / a_fc1
    kwargs = {}
    if jax.default_backend() == "tpu":
        from jax.experimental.pallas import tpu as pltpu

        params_cls = getattr(pltpu, "CompilerParams", None) or getattr(
            pltpu, "TPUCompilerParams"
        )
        kwargs["compiler_params"] = params_cls(vmem_limit_bytes=112 * 1024 * 1024)
    full = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_full_kernel_i8, G=G, heads=heads, eps=eps,
                          scale=scale, quick=quick,
                          acts=tuple(map(float, acts)), ln_folded=ln_folded),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, S, W), lambda i: (i, 0, 0)),
            full(1, W), full(1, W),
            full(W, 3 * W), full(1, 3 * W), full(1, 3 * W),
            full(W, W), full(1, W), full(1, W),
            full(1, W), full(1, W),
            full(W, M), full(1, M), full(1, M),
            full(M, W), full(1, W), full(1, W),
        ],
        out_specs=pl.BlockSpec((G, S, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, W), x.dtype),
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(
        x,
        l1s.astype(jnp.float32).reshape(1, W),
        l1b.astype(jnp.float32).reshape(1, W),
        wqkv8,
        sqkv.astype(jnp.float32).reshape(1, 3 * W),
        bqkv.astype(jnp.float32).reshape(1, 3 * W),
        wproj8,
        sproj.astype(jnp.float32).reshape(1, W),
        bproj.astype(jnp.float32).reshape(1, W),
        l2s.astype(jnp.float32).reshape(1, W),
        l2b.astype(jnp.float32).reshape(1, W),
        w18,
        s1.astype(jnp.float32).reshape(1, M),
        b1.astype(jnp.float32).reshape(1, M),
        w28,
        s2.astype(jnp.float32).reshape(1, W),
        b2.astype(jnp.float32).reshape(1, W),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def fused_vit_block(x, l1s, l1b, wqkv, bqkv, wproj, bproj, l2s, l2b, w1, b1,
                    w2, b2, heads: int, eps: float, scale: float,
                    quick: bool = False, G: int = 8):
    """Whole ViT block (attn + MLP residual branches) in one pallas call."""
    return _full_fwd_impl(x, l1s, l1b, wqkv, bqkv, wproj, bproj, l2s, l2b,
                          w1, b1, w2, b2, heads=heads, eps=eps, scale=scale,
                          quick=quick, G=G)


def _full_vjp_fwd(x, l1s, l1b, wqkv, bqkv, wproj, bproj, l2s, l2b, w1, b1,
                  w2, b2, heads, eps, scale, quick, G):
    out = _full_fwd_impl(x, l1s, l1b, wqkv, bqkv, wproj, bproj, l2s, l2b,
                         w1, b1, w2, b2, heads=heads, eps=eps, scale=scale,
                         quick=quick, G=G)
    return out, (x, l1s, l1b, wqkv, bqkv, wproj, bproj, l2s, l2b, w1, b1, w2, b2)


def _full_vjp_bwd(heads, eps, scale, quick, G, res, g):
    _, vjp = jax.vjp(
        lambda *a: _full_xla_ref(*a, heads=heads, eps=eps, scale=scale,
                                 quick=quick), *res,
    )
    return vjp(g)


fused_vit_block.defvjp(_full_vjp_fwd, _full_vjp_bwd)


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
