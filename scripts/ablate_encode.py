"""Round-4 encode residual budget + block-kernel A/B at the b2048 tile.

VERDICT r3 #3: bf16 encode sits at 877 imgs/s vs its own measured
1100-1200 imgs/s matmul floor. This script (a) decomposes the end-to-end
encode pass into its stages so the gap is attributed per-op, and (b) A/Bs
the remaining megakernel knobs (softmax max-pass elision, batched dense,
group size) END-TO-END at the bench tile, where the r3 per-block probes
were inside noise.

Modes (one per process; the tunnel serves one client):
  budget   - stage decomposition at b2048 bf16:
               full      extract_target_features (the bench path)
               tower     ViT trunk only (patchify+pos+blocks)
               blocks    23-block fused-kernel chain from staged [B,S,W]
               post      ln_vision + QF queries pass + vision_proj + norm
                         from staged tower rows
             residual = full - (tower + post); tower - blocks = patchify
             + pos-embed + scan overhead.
  variants - end-to-end encode bf16 x {attn default/batched_nomax} x
             {dense pergroup/batched} x {G 8/16}  (SPRC_FBLK_* read at
             trace time; each combo is a fresh jit).
  int8     - same A/B on the calibrated static-int8 serving path.
  budget_int8 - the `budget` stage decomposition on the INT8 serving path
             (VERDICT r4 #2): full int8 encode (towers int8_static +
             SPRC_QF_INT8), int8 tower only, the 23-block int8 megakernel
             chain alone, and the post stage, so the gap from the measured
             imgs/s to the repo's best int8 envelope (266 TOPS at 16k^3,
             148-153 at encode shapes — scripts/ablate_int8.py) is
             attributed per stage like round 4 did for bf16.

Timing: tunnel rules (MEASUREMENTS.md) — scalar readback per step,
distinct device-generated batches, median of 3 compiled-loop reps.
Reference hot loop being optimized: eva_vit.py:324-352 / encode path
src/utils.py:46-77.
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


def _median_rate(run_once, n_items):
    vals = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run_once()
        vals.append(n_items / (time.perf_counter() - t0))
    vals.sort()
    med = vals[len(vals) // 2]
    spread = 100.0 * (vals[-1] - vals[0]) / med
    return med, round(vals[-1], 2), round(spread, 2)


def _emit(row):
    print(json.dumps(row), flush=True)


def _model(quant=None, scales=None):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    return bench._build(vit_quant=quant, act_scales=scales)


def _params(model):
    import bench

    return bench._fill_params(model, *bench._encode_dummy_args(model))


def _batches(shape, n=2):
    import jax
    import jax.numpy as jnp

    gen = jax.jit(lambda k: jax.random.uniform(k, shape, jnp.float32))
    out = [gen(jax.random.PRNGKey(i)) for i in range(n)]
    jax.block_until_ready(out)
    return out


def _timed(fn, params, batches, label, n_items):
    import jax  # noqa: F401

    _readback(fn(params, batches[0]))  # compile + warm

    def once():
        acc = 0.0
        for i in range(STEPS):
            acc += _readback(fn(params, batches[i % len(batches)]))
        assert np.isfinite(acc)

    med, best, spread = _median_rate(once, n_items * STEPS)
    _emit({"case": label, "imgs_per_sec": round(med, 1), "best": best,
           "spread_pct": spread,
           "ms_per_batch": round(1000.0 * n_items / med, 2)})
    return med


def mode_budget(quant=False):
    import jax
    import jax.numpy as jnp

    if quant:
        # the full int8 serving config the bench measures: calibrated
        # static-int8 towers + int8 Q-Former dense path
        base = _model()
        base_params = _params(base)
        calib = _model(quant="int8_calib")
        cal = jax.random.uniform(
            jax.random.PRNGKey(99), (16, 224, 224, 3), jnp.float32)
        from sprc_tpu.models.vit import calibrate_act_scales

        scales = calibrate_act_scales(
            calib, base_params, cal, method=calib.extract_target_features)
        os.environ["SPRC_QF_INT8"] = "1"
        model = _model(quant="int8_static", scales=scales)
        del base, calib
    else:
        model = _model()
    params = _params(model)
    vcfg = model.cfg.vit_config()
    S, W = vcfg.seq_len, vcfg.width

    full = jax.jit(lambda p, im: model.apply(
        {"params": p}, im, method=model.extract_target_features)[0])
    tower = jax.jit(lambda p, im: model.apply(
        {"params": p}, im, method=model.encode_tower))

    # post: staged tower rows -> ln_vision + QF queries pass + proj + norm.
    # extract_target_features already accepts rank-3 tower rows (the
    # feature-cache dispatch), so this IS the production post stage.
    post = jax.jit(lambda p, rows: model.apply(
        {"params": p}, rows, method=model.extract_target_features)[0])

    # 2 staged batches per stage (4 img + 4 row batches at b2048 OOM the
    # 16 GB chip next to the 1 GB tower outputs); imgs freed before the
    # row-fed stages run
    img_batches = _batches((BATCH, 224, 224, 3), n=2)

    # blocks: the 23-block fused-kernel chain alone, scanned over stacked
    # constant-filled per-layer params (timing only; values irrelevant)
    from sprc_tpu.ops.pallas_block import fused_vit_block, fused_vit_block_i8

    D = vcfg.depth
    M = vcfg.mlp_hidden
    G = int(os.environ.get("SPRC_PALLAS_BLOCK_G", "8"))
    if quant:
        stack = {
            "l1s": jnp.full((D, W), 1.0, jnp.float32),
            "l1b": jnp.full((D, W), 0.01, jnp.float32),
            "wqkv8": jnp.full((D, W, 3 * W), 3, jnp.int8),
            "sqkv": jnp.full((D, 3 * W), 7e-4, jnp.float32),
            "bqkv": jnp.full((D, 3 * W), 0.01, jnp.float32),
            "wproj8": jnp.full((D, W, W), 3, jnp.int8),
            "sproj": jnp.full((D, W), 7e-4, jnp.float32),
            "bproj": jnp.full((D, W), 0.01, jnp.float32),
            "l2s": jnp.full((D, W), 1.0, jnp.float32),
            "l2b": jnp.full((D, W), 0.01, jnp.float32),
            "w18": jnp.full((D, W, M), 3, jnp.int8),
            "s1": jnp.full((D, M), 7e-4, jnp.float32),
            "b1": jnp.full((D, M), 0.01, jnp.float32),
            "w28": jnp.full((D, M, W), 3, jnp.int8),
            "s2": jnp.full((D, W), 7e-4, jnp.float32),
            "b2": jnp.full((D, W), 0.01, jnp.float32),
        }

        def chain(_, x, stack):
            def body(h, lp):
                return fused_vit_block_i8(
                    h, lp["l1s"], lp["l1b"], lp["wqkv8"], lp["sqkv"],
                    lp["bqkv"], lp["wproj8"], lp["sproj"], lp["bproj"],
                    lp["l2s"], lp["l2b"], lp["w18"], lp["s1"], lp["b1"],
                    lp["w28"], lp["s2"], lp["b2"], heads=vcfg.num_heads,
                    eps=vcfg.layer_norm_eps, scale=vcfg.head_dim ** -0.5,
                    quick=vcfg.quick_gelu, acts=(0.2, 0.2, 0.2, 0.2), G=G,
                ), None
            out, _ = jax.lax.scan(body, x, stack)
            return out
    else:
        stack = {
            "l1s": jnp.full((D, W), 1.0, jnp.float32),
            "l1b": jnp.full((D, W), 0.01, jnp.float32),
            "wqkv": jnp.full((D, W, 3 * W), 0.002, jnp.float32),
            "bqkv": jnp.full((D, 3 * W), 0.01, jnp.float32),
            "wproj": jnp.full((D, W, W), 0.002, jnp.float32),
            "bproj": jnp.full((D, W), 0.01, jnp.float32),
            "l2s": jnp.full((D, W), 1.0, jnp.float32),
            "l2b": jnp.full((D, W), 0.01, jnp.float32),
            "w1": jnp.full((D, W, M), 0.002, jnp.float32),
            "b1": jnp.full((D, M), 0.01, jnp.float32),
            "w2": jnp.full((D, M, W), 0.002, jnp.float32),
            "b2": jnp.full((D, W), 0.01, jnp.float32),
        }

        def chain(_, x, stack):
            def body(h, lp):
                return fused_vit_block(
                    h, lp["l1s"], lp["l1b"], lp["wqkv"], lp["bqkv"],
                    lp["wproj"], lp["bproj"], lp["l2s"], lp["l2b"],
                    lp["w1"], lp["b1"], lp["w2"], lp["b2"], vcfg.num_heads,
                    vcfg.layer_norm_eps, vcfg.head_dim ** -0.5,
                    vcfg.quick_gelu, G,
                ), None
            out, _ = jax.lax.scan(body, x, stack)
            return out

    blocks = jax.jit(lambda p, x: chain(p, x, stack))

    _emit({"mode": "budget_int8" if quant else "budget", "batch": BATCH,
           "steps": STEPS, "G": G,
           "vit": "eva" if os.environ.get("SPRC_BENCH_VIT") == "eva" else "vitL"})
    t_full = _timed(full, params, img_batches, "full_encode", BATCH)
    t_tower = _timed(tower, params, img_batches, "tower_only", BATCH)
    del img_batches
    gen_rows = jax.jit(lambda k: jax.random.normal(k, (BATCH, S, W), jnp.bfloat16))
    row_batches = [gen_rows(jax.random.PRNGKey(100 + i)) for i in range(2)]
    jax.block_until_ready(row_batches)
    t_blocks = _timed(blocks, params, row_batches, "blocks_only", BATCH)
    t_post = _timed(post, params, row_batches, "post_only", BATCH)

    ms = lambda r: 1000.0 * BATCH / r
    _emit({"case": "attribution_ms_per_batch",
           "full": round(ms(t_full), 1),
           "tower": round(ms(t_tower), 1),
           "blocks": round(ms(t_blocks), 1),
           "patchify_pos_scan": round(ms(t_tower) - ms(t_blocks), 1),
           "post_ln_qf_proj": round(ms(t_post), 1),
           "residual_full_minus_parts": round(
               ms(t_full) - ms(t_tower) - ms(t_post), 1)})


def _combo_runs(quant):
    combos_env = os.environ.get(
        "SPRC_ABL_COMBOS", "default,nomax,sbf16,nomax_sbf16")
    named = {
        "default": {},
        "nomax": {"SPRC_FBLK_ATTN": "batched_nomax"},
        "sbf16": {"SPRC_FBLK_ATTN": "batched_sbf16"},
        "nomax_sbf16": {"SPRC_FBLK_ATTN": "batched_nomax_sbf16"},
        "bdense": {"SPRC_FBLK_DENSE": "batched"},
        "nomax_sbf16+bdense": {"SPRC_FBLK_ATTN": "batched_nomax_sbf16",
                               "SPRC_FBLK_DENSE": "batched"},
        "nomax+bdense": {"SPRC_FBLK_ATTN": "batched_nomax",
                         "SPRC_FBLK_DENSE": "batched"},
        "G16": {"SPRC_PALLAS_BLOCK_G": "16"},
        "nomax_sbf16+G16": {"SPRC_FBLK_ATTN": "batched_nomax_sbf16",
                            "SPRC_PALLAS_BLOCK_G": "16"},
        "G8": {"SPRC_PALLAS_BLOCK_G": "8"},  # EVA default is G=4
        "nomax+G8": {"SPRC_FBLK_ATTN": "batched_nomax",
                     "SPRC_PALLAS_BLOCK_G": "8"},
        # EVA bf16 G=8 repro ladder (VERDICT r4 #4): the r4 failure was the
        # BATCHED attention form (HTTP 500 from the remote Mosaic helper);
        # per-head 2-D matmuls compiled where batched SIGABRTed for the
        # Q-Former kernel (MEASUREMENTS.md r3), so try that form at G=8,
        # and the head-major per-head weight layout as a second fallback
        "G8_perheadattn": {"SPRC_PALLAS_BLOCK_G": "8",
                           "SPRC_FBLK_ATTN": "loop"},
        "G4_perheadattn": {"SPRC_PALLAS_BLOCK_G": "4",
                           "SPRC_FBLK_ATTN": "loop"},
        "G8_perheadmode": {"SPRC_PALLAS_BLOCK_G": "8",
                           "SPRC_FBLK_MODE": "perhead"},
        # int8 LN-folded quantize scales (round 5): elide the qkv/fc1
        # [G,S,W] f32 quantize multiplies by pre-dividing the LN affines
        "lnfold": {"SPRC_FBLK_I8_LNFOLD": "1"},
        "G16_i8": {"SPRC_PALLAS_BLOCK_G": "16"},
    }
    combos = [(c, named[c]) for c in combos_env.split(",") if c in named]
    import jax

    scales = None
    if quant:
        import jax.numpy as jnp

        import bench
        from sprc_tpu.models.vit import calibrate_act_scales

        base = _model()
        params = _params(base)
        calib = _model(quant="int8_calib")
        cal = jax.random.uniform(jax.random.PRNGKey(99), (16, 224, 224, 3), jnp.float32)
        scales = calibrate_act_scales(
            calib, params, cal, method=calib.extract_target_features)
        os.environ["SPRC_QF_INT8"] = "1"

    img_batches = _batches((BATCH, 224, 224, 3))
    for label, env in combos:
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            model = _model(quant="int8_static" if quant else None, scales=scales)
            params = _params(model)
            fn = jax.jit(lambda p, im, m=model: m.apply(
                {"params": p}, im, method=m.extract_target_features)[0])
            try:
                _timed(fn, params, img_batches,
                       f"encode_{'int8' if quant else 'bf16'}_{label}", BATCH)
            except Exception as e:  # compile failures are data too
                _emit({"case": label, "error": f"{type(e).__name__}: {e}"[:160]})
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    os.environ.pop("SPRC_QF_INT8", None)


def main():
    _cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "budget"
    _emit({"mode": mode, "batch": BATCH, "steps": STEPS, "reps": REPS})
    if mode == "budget":
        mode_budget()
    elif mode == "budget_int8":
        mode_budget(quant=True)
    elif mode == "variants":
        _combo_runs(quant=False)
    elif mode == "int8":
        _combo_runs(quant=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
