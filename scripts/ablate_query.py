"""Query-path residual budget (VERDICT r4 #6 deliverable).

bf16 query scoring stands at ~4.7k q/s against the 5k bar; this script
decomposes the composed-query scoring pass (`model.inference`, reference
`validate_blip.py:359-410` -> `blip2_qformer_cir_align_prompt.py:312-361`)
into its stages at the bench tile (b2048 vs a 10k gallery) so the gap is
attributed per-op the way `ablate_encode.py budget` did for the encode
path:

  full   - inference(): fuse_reference + token-max sim   (the bench path)
  fuse   - fusion_feature(): QF pass 1 (queries+text cross-attend the ref
           image) + QF pass 2 (fused queries re-fed as query_embeds with
           the text) + text_proj + L2 norm
  pass1  - QF fusion pass alone (cross-attn into staged ref embeds)
  pass2  - QF prompt pass alone from staged fused queries + text_proj
  sim    - token_max_sim alone: [B,256] x [N,Q,256] einsum + max epilogue

  residual_full  = full - (fuse + sim)        (dispatch / layout overlap)
  residual_fuse  = fuse - (pass1 + pass2)

Env: SPRC_ABL_BATCH (default 2048), SPRC_ABL_GALLERY (10000),
SPRC_ABL_STEPS (8), SPRC_ABL_REPS (3); SPRC_QF_INT8=1 decomposes the int8
Q-Former serving variant instead. Tunnel rules (MEASUREMENTS.md): scalar
readback per step, distinct device-generated inputs, median of REPS
compiled-loop reps.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPRC_PALLAS_BLOCK", "1")
os.environ.setdefault("SPRC_PALLAS_QF", "1")

BATCH = int(os.environ.get("SPRC_ABL_BATCH", "2048"))
GALLERY = int(os.environ.get("SPRC_ABL_GALLERY", "10000"))
STEPS = int(os.environ.get("SPRC_ABL_STEPS", "8"))
REPS = int(os.environ.get("SPRC_ABL_REPS", "3"))


def _cache():
    import jax

    path = os.path.join(os.path.expanduser("~"), ".cache", "sprc_tpu", "xla_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _readback(x):
    return float(np.asarray(x.ravel()[0] if x.ndim else x))


def _emit(row):
    print(json.dumps(row), flush=True)


def _timed(fn, args_list, label, n_items):
    _readback(fn(*args_list[0]))  # compile + warm

    vals = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(STEPS):
            acc += _readback(fn(*args_list[i % len(args_list)]))
        vals.append(n_items * STEPS / (time.perf_counter() - t0))
        assert np.isfinite(acc)
    vals.sort()
    med = vals[len(vals) // 2]
    spread = 100.0 * (vals[-1] - vals[0]) / med
    _emit({"case": label, "q_per_sec": round(med, 1),
           "best": round(vals[-1], 2), "spread_pct": round(spread, 2),
           "ms_per_batch": round(1000.0 * n_items / med, 2)})
    return 1000.0 * n_items / med  # ms/batch


def main():
    _cache()
    import jax
    import jax.numpy as jnp

    import bench
    from sprc_tpu.models.cir_base import l2_normalize

    model = bench._build()
    params = bench._fill_params(model, *bench._encode_dummy_args(model))
    vcfg = model.cfg.vit_config()
    S, W = vcfg.seq_len, vcfg.width
    Q = model.cfg.num_query_token
    H = model.cfg.qformer_config().hidden_size
    L = model.cfg.max_txt_len
    E = 256
    _emit({"mode": "query_budget", "batch": BATCH, "gallery": GALLERY,
           "steps": STEPS, "reps": REPS,
           "qf_int8": os.environ.get("SPRC_QF_INT8", "0")})

    # staged device-generated inputs (2 distinct sets; tunnel dedup rule);
    # reference embeds are the fp32 post-ln_vision rows encode_image returns
    gen_emb = jax.jit(lambda k: jax.random.normal(k, (BATCH, S, W), jnp.float32))
    gen_txt = jax.jit(lambda k: (
        jax.random.randint(k, (BATCH, L), 0, 30000),
        jnp.ones((BATCH, L), jnp.int32)))
    gen_fq = jax.jit(
        lambda k: 0.02 * jax.random.normal(k, (BATCH, Q, H), jnp.float32))
    gen_ft = jax.jit(lambda k: l2_normalize(
        jax.random.normal(k, (BATCH, E), jnp.float32)))
    gal = jax.jit(lambda k: l2_normalize(
        jax.random.normal(k, (GALLERY, Q, E), jnp.float32)))(jax.random.PRNGKey(7))
    embs, txts, fqs, fts = [], [], [], []
    for i in range(2):
        embs.append(gen_emb(jax.random.PRNGKey(10 + i)))
        txts.append(gen_txt(jax.random.PRNGKey(20 + i)))
        fqs.append(gen_fq(jax.random.PRNGKey(30 + i)))
        fts.append(gen_ft(jax.random.PRNGKey(40 + i)))
    jax.block_until_ready((embs, txts, fqs, fts, gal))

    full = jax.jit(lambda p, emb, ids, mask: model.apply(
        {"params": p}, emb, gal, ids, mask, method=model.inference))
    fuse = jax.jit(lambda p, emb, ids, mask: model.apply(
        {"params": p}, emb, ids, mask, method=model.fusion_feature))

    def _amask(m, mask):
        return jnp.concatenate(
            [jnp.ones((mask.shape[0], Q), dtype=mask.dtype), mask], axis=1)

    def _pass1(m, emb, ids, mask):
        hidden = m.qformer(
            input_ids=ids, query_embeds=m._queries(ids.shape[0]),
            attention_mask=_amask(m, mask), image_embeds=emb,
            deterministic=True)
        return hidden[:, :Q, :]

    def _pass2(m, fq, ids, mask):
        hidden = m.qformer(
            input_ids=ids, query_embeds=fq, attention_mask=_amask(m, mask),
            deterministic=True)
        return l2_normalize(m.text_proj(hidden[:, Q, :]))

    pass1 = jax.jit(lambda p, emb, ids, mask: model.apply(
        {"params": p}, emb, ids, mask, method=_pass1))
    pass2 = jax.jit(lambda p, fq, ids, mask: model.apply(
        {"params": p}, fq, ids, mask, method=_pass2))
    sim = jax.jit(lambda ft: model.token_max_sim(ft, gal))

    args3 = [(params, embs[i], *txts[i]) for i in range(2)]
    t_full = _timed(full, args3, "full_inference", BATCH)
    t_fuse = _timed(fuse, args3, "fuse_reference+proj", BATCH)
    t_p1 = _timed(pass1, args3, "qf_pass1_fusion", BATCH)
    t_p2 = _timed(
        pass2, [(params, fqs[i], *txts[i]) for i in range(2)],
        "qf_pass2_prompt+proj", BATCH)
    t_sim = _timed(sim, [(fts[i],) for i in range(2)], "token_max_sim", BATCH)

    _emit({"case": "attribution_ms_per_batch",
           "full": round(t_full, 1), "fuse": round(t_fuse, 1),
           "pass1": round(t_p1, 1), "pass2": round(t_p2, 1),
           "sim": round(t_sim, 1),
           "residual_full_minus_fuse_sim": round(t_full - t_fuse - t_sim, 1),
           "residual_fuse_minus_passes": round(t_fuse - t_p1 - t_p2, 1)})


if __name__ == "__main__":
    main()
