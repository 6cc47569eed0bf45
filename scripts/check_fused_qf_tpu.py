"""On-chip Mosaic parity for the fused Q-Former layer kernel.

``tests/test_pallas_qformer.py`` validates the kernel's *semantics* in
interpret mode; this validates the *Mosaic-compiled* kernel on the real
chip, at real Q-Former dims (W=768, H=12, M=3072, Q=32, EVA image memory
257x1408), for all three inference pass shapes the kernel serves
(reference hot loop, validate_blip.py:359-410):

  fusion   — queries+text, cross-attn into per-item image embeds, dual FFN
  prompt   — the no_img rtc/sentence-prompt pass (text FFN everywhere)
  queries  — queries-only target/gallery encode pass

Two comparisons per shape, both inside ONE jitted program each (separate
dispatches get deduped by the remote executor — MEASUREMENTS.md pitfall
#2 — which round-tripped as fake 0.0 diffs):

  trunk  — the full 12-layer QFormer module, fused gate ON vs OFF. The
           SPRC_PALLAS_QF env var is read at *trace* time inside each
           QFormerLayer call, so toggling it between the two ``apply``
           calls while tracing one jitted function puts both paths in the
           same program. bf16, the serving default.
  layer  — ``fused_qformer_layer`` vs an exact-math XLA recomposition
           built from the kernel's own helper functions (_mm/_mm_i8/
           _attend_bias/_ln_f32/_gelu_exact_f32 are pure jnp and run fine
           outside pallas). Any delta isolates Mosaic codegen, not math.
           Run in bf16 AND the SPRC_QF_INT8 int8 projection variant.

Prints one JSON line per comparison plus a summary; exits non-zero if any
trunk max-abs exceeds the gate (default 0.05, ~the block-kernel's measured
compiled-only drift envelope; override SPRC_QF_GATE).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

W, H, M, Q, L, SI, WI = 768, 12, 3072, 32, 32, 257, 1408
EPS = 1e-12


def _mk_layer_params(rng, key_shapes):
    import jax.numpy as jnp

    def dense(kin, kout):
        return {
            "kernel": jnp.asarray(rng.randn(kin, kout) * 0.02, jnp.float32),
            "bias": jnp.asarray(rng.randn(kout) * 0.02, jnp.float32),
        }

    def ln():
        return {
            "scale": jnp.asarray(1 + 0.1 * rng.randn(W), jnp.float32),
            "bias": jnp.asarray(0.1 * rng.randn(W), jnp.float32),
        }

    self_p = {
        "query": dense(W, W), "key": dense(W, W), "value": dense(W, W),
        "out": dense(W, W), "ln": ln(),
    }
    cross_p = {
        "query": dense(W, W), "key": dense(WI, W), "value": dense(WI, W),
        "out": dense(W, W), "ln": ln(),
    }
    ffn_q = {"fc1": dense(W, M), "fc2": dense(M, W), "ln": ln()}
    ffn_t = {"fc1": dense(W, M), "fc2": dense(M, W), "ln": ln()}
    return self_p, cross_p, ffn_q, ffn_t


def _xla_ref_layer(x, col_bias, self_p, img, cross_p, ffn_q_p, ffn_t_p,
                   *, heads, eps, Qn, text_ffn_all, int8):
    """Exact-math recomposition of _qf_layer_kernel(_i8) on plain arrays."""
    import jax.numpy as jnp

    from sprc_tpu.ops.pallas_qformer import (
        _attend_bias, _gelu_exact_f32, _ln_f32, _mm, _mm_i8,
    )

    B, S, Wd = x.shape
    scale = (Wd // heads) ** -0.5
    dtype = x.dtype
    x2 = x.reshape(B * S, Wd)

    if int8:
        from sprc_tpu.ops.quant import quantize_weight

        def proj(rows, p):
            w8, ws = quantize_weight(p["kernel"].astype(dtype))
            return _mm_i8(rows, w8, ws.astype(jnp.float32)[None, :],
                          p["bias"].astype(jnp.float32)[None, :])
    else:
        def proj(rows, p):
            return _mm(rows, p["kernel"].astype(dtype),
                       p["bias"].astype(jnp.float32)[None, :])

    def lnp(rows32, p):
        return _ln_f32(rows32, p["scale"].astype(jnp.float32)[None, :],
                       p["bias"].astype(jnp.float32)[None, :], eps)

    q_all = proj(x2, self_p["query"]).astype(dtype)
    k_all = proj(x2, self_p["key"]).astype(dtype)
    v_all = proj(x2, self_p["value"]).astype(dtype)
    ctxs = []
    for g in range(B):
        sl = slice(g * S, (g + 1) * S)
        ctxs.append(_attend_bias(
            (q_all[sl], k_all[sl], v_all[sl]), S, S, Wd, heads, scale,
            dtype, col_bias[g].astype(jnp.float32)))
    ctx = jnp.concatenate(ctxs, axis=0)
    out = proj(ctx, self_p["out"])
    attn = lnp(out + x2.astype(jnp.float32), self_p["ln"]).astype(dtype)
    attn3 = attn.reshape(B, S, Wd)

    if img is not None and cross_p is not None:
        Si = img.shape[1]
        q_rows = attn3[:, :Qn, :].reshape(B * Qn, Wd)
        cq_all = proj(q_rows, cross_p["query"]).astype(dtype)
        img2 = img.astype(dtype)
        crs = []
        for g in range(B):
            ck = proj(img2[g], cross_p["key"]).astype(dtype)
            cv = proj(img2[g], cross_p["value"]).astype(dtype)
            crs.append(_attend_bias(
                (cq_all[g * Qn:(g + 1) * Qn], ck, cv), Qn, Si, Wd, heads,
                scale, dtype, None))
        cctx = jnp.concatenate(crs, axis=0)
        cout = proj(cctx, cross_p["out"])
        q_part = lnp(cout + q_rows.astype(jnp.float32),
                     cross_p["ln"]).astype(dtype)
    else:
        q_part = attn3[:, :Qn, :].reshape(B * Qn, Wd)

    def ffn(rows, p):
        h = proj(rows, p["fc1"])
        h32 = _gelu_exact_f32(h)
        h2 = proj(h32 if int8 else h32.astype(dtype), p["fc2"])
        return lnp(h2 + rows.astype(jnp.float32), p["ln"]).astype(dtype)

    if text_ffn_all:
        return ffn(attn, ffn_t_p).reshape(B, S, Wd)
    q_out = ffn(q_part, ffn_q_p).reshape(B, Qn, Wd)
    if S > Qn:
        t_out = ffn(attn3[:, Qn:, :].reshape(B * (S - Qn), Wd),
                    ffn_t_p).reshape(B, S - Qn, Wd)
        return jnp.concatenate([q_out, t_out], axis=1)
    return q_out


def layer_check(case: str, int8: bool, B: int = 16) -> dict:
    import jax
    import jax.numpy as jnp

    from sprc_tpu.ops.pallas_qformer import fused_qformer_layer

    rng = np.random.RandomState(7)
    self_p, cross_p, ffn_q, ffn_t = _mk_layer_params(rng, None)
    if case == "fusion":
        S, img_on, tfa = Q + L, True, False
    elif case == "prompt":
        S, img_on, tfa = Q + L, False, True
    else:  # queries
        S, img_on, tfa = Q, True, False
    x = jnp.asarray(rng.randn(B, S, W) * 0.5, jnp.bfloat16)
    cb = np.zeros((B, S), np.float32)
    if case != "queries":  # pad the last 5 text slots on half the rows
        cb[: B // 2, -5:] = -10000.0
    cb = jnp.asarray(cb)
    img = (jnp.asarray(rng.randn(B, SI, WI) * 0.5, jnp.bfloat16)
           if img_on else None)
    cp = cross_p if img_on else None
    fq = None if tfa else ffn_q
    ft = ffn_t if (tfa or S > Q) else (ffn_q if fq is not None else ffn_t)

    if int8:
        os.environ["SPRC_QF_INT8"] = "1"

    @jax.jit
    def compare():
        got = fused_qformer_layer(
            x, cb, self_p, img, cp, fq, ft, heads=H, eps=EPS, Q=Q,
            text_ffn_all=tfa, G=16, int8=int8)
        want = _xla_ref_layer(
            x, cb, self_p, img, cp, fq, ft, heads=H, eps=EPS, Qn=Q,
            text_ffn_all=tfa, int8=int8)
        d = jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))
        return (jnp.max(d), jnp.mean(d),
                jnp.max(jnp.abs(want.astype(jnp.float32))))

    try:
        mx, mn, sc = [float(np.asarray(t)) for t in compare()]
    finally:
        os.environ.pop("SPRC_QF_INT8", None)
    return {"check": "layer_vs_xla", "case": case,
            "dtype": "int8" if int8 else "bf16",
            "maxabs": mx, "meanabs": mn, "ref_scale": sc}


def trunk_check(case: str, B: int = 32) -> dict:
    import jax
    import jax.numpy as jnp

    from sprc_tpu.models.qformer import QFormer, QFormerConfig

    cfg = QFormerConfig(dtype=jnp.bfloat16, dropout_rate=0.0,
                        attention_dropout_rate=0.0)
    model = QFormer(cfg)
    rng = np.random.RandomState(11)
    ids = jnp.asarray(rng.randint(999, 9999, (B, L)), jnp.int32)
    queries = jnp.asarray(rng.randn(B, Q, W) * 0.1, jnp.float32)
    img = jnp.asarray(rng.randn(B, SI, WI) * 0.5, jnp.bfloat16)
    mask_np = np.ones((B, Q + L), np.int32)
    mask_np[: B // 2, -5:] = 0
    mask = jnp.asarray(mask_np)
    kw = {
        "fusion": dict(input_ids=ids, query_embeds=queries,
                       attention_mask=mask, image_embeds=img),
        "prompt": dict(input_ids=ids, query_embeds=queries,
                       attention_mask=mask, no_img=True),
        "queries": dict(query_embeds=queries, image_embeds=img),
    }[case]
    os.environ["SPRC_PALLAS_QF"] = "0"
    params = model.init(jax.random.PRNGKey(0), **kw)["params"]

    def sims(out):
        """Retrieval-style ranking off the first Q positions: normalize,
        token-max sims between the two batch halves — the signal the
        serving contract actually depends on (validate_blip.py:359)."""
        f = out[:, :Q, :].astype(jnp.float32)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        qh, gh = f[: B // 2], f[B // 2:]
        return jnp.einsum("nqw,mkw->nmqk", qh, gh).max(-1).mean(-1)

    @jax.jit
    def compare(params):
        # trace-time env toggling: the gate in QFormerLayer reads
        # SPRC_PALLAS_QF while tracing, so both paths land in ONE program
        os.environ["SPRC_PALLAS_QF"] = "1"
        got = model.apply({"params": params}, **kw)
        os.environ["SPRC_PALLAS_QF"] = "0"
        want = model.apply({"params": params}, **kw)
        d = jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))
        sg, sw = sims(got), sims(want)
        match = jnp.argmax(sg, axis=-1) == jnp.argmax(sw, axis=-1)
        agree = jnp.mean(match.astype(jnp.float32))
        # random-weight sims are near-degenerate: a top-2 margin below the
        # drift envelope flips argmax on numerically-legitimate bf16 noise.
        # The contract-relevant number counts only decisive rows (reference
        # margin > 1% of the sim scale).
        top2 = jax.lax.top_k(sw, 2)[0]
        margin = top2[:, 0] - top2[:, 1]
        decisive = margin > 0.01 * jnp.max(jnp.abs(sw))
        agree_m = jnp.where(
            jnp.any(decisive),
            jnp.sum((match | ~decisive).astype(jnp.float32) * decisive)
            / jnp.maximum(jnp.sum(decisive.astype(jnp.float32)), 1.0),
            1.0)
        return (jnp.max(d), jnp.mean(d),
                jnp.max(jnp.abs(want.astype(jnp.float32))), agree, agree_m,
                jnp.sum(decisive.astype(jnp.int32)))

    try:
        out = [float(np.asarray(t)) for t in compare(params)]
        mx, mn, sc, agree, agree_m, n_dec = out
    finally:
        os.environ.pop("SPRC_PALLAS_QF", None)
    return {"check": "trunk_fused_vs_unfused", "case": case,
            "dtype": "bf16", "maxabs": mx, "meanabs": mn, "ref_scale": sc,
            "top1_agreement": agree, "top1_agreement_decisive": agree_m,
            "n_decisive": int(n_dec)}


def main(argv) -> None:
    """Usage: check_fused_qf_tpu.py [trunk|layer] [fusion|prompt|queries]
    [bf16|int8].  No args = all nine comparisons (slow on the tunnel:
    ~5 min compile each; results stream incrementally).

    Gates: the single-layer kernel-vs-exact-math-XLA deltas isolate Mosaic
    codegen and must sit at bf16 rounding (SPRC_QF_GATE_LAYER, default
    0.07 ~ 2 ulp at the post-LN output scale ~5-8; measured 0.031 = 1 ulp,
    meanabs 5e-4 — r4 on-chip run. int8 gate 0.15: it re-quantizes f32
    intermediates whose values already differ at bf16 rounding). The
    12-layer trunk compares two *different compositions* in bf16 (exp2
    softmax + concat layouts vs the flax modules), so its maxabs compounds
    and is recorded as data; the gate there is rank stability on DECISIVE
    rows — random-weight sims are near-degenerate, so rows whose reference
    top-2 margin sits below 1% of the sim scale flip argmax on legitimate
    bf16 noise and are excluded: top1_agreement_decisive >=
    SPRC_QF_GATE_RANK (0.97)."""
    which = argv[1] if len(argv) > 1 else None
    case_f = argv[2] if len(argv) > 2 else None
    dt_f = argv[3] if len(argv) > 3 else None
    gate_layer_bf16 = float(os.environ.get("SPRC_QF_GATE_LAYER", "0.07"))
    gate_layer_int8 = float(os.environ.get("SPRC_QF_GATE_LAYER_I8", "0.15"))
    gate_rank = float(os.environ.get("SPRC_QF_GATE_RANK", "0.97"))
    results = []
    for case in ("fusion", "prompt", "queries"):
        if case_f and case != case_f:
            continue
        jobs = []
        if which in (None, "trunk") and dt_f in (None, "bf16"):
            jobs.append(lambda c=case: trunk_check(c))
        if which in (None, "layer"):
            if dt_f in (None, "bf16"):
                jobs.append(lambda c=case: layer_check(c, int8=False))
            if dt_f in (None, "int8"):
                jobs.append(lambda c=case: layer_check(c, int8=True))
        for fn in jobs:
            r = fn()
            results.append(r)
            print(json.dumps(r), flush=True)
    fails = []
    for r in results:
        if r["check"] == "layer_vs_xla":
            gate = gate_layer_int8 if r["dtype"] == "int8" else gate_layer_bf16
            if r["maxabs"] > gate:
                fails.append(f"layer:{r['case']}:{r['dtype']} maxabs "
                             f"{r['maxabs']:.4f} > {gate}")
        elif r.get("top1_agreement_decisive",
                   r["top1_agreement"]) < gate_rank:
            v = r.get("top1_agreement_decisive", r["top1_agreement"])
            fails.append(f"trunk:{r['case']} top1_agreement_decisive "
                         f"{v:.3f} < {gate_rank}")
    print(json.dumps({"summary": True, "n": len(results),
                      "fails": fails, "pass": not fails}), flush=True)
    if fails:
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv)
