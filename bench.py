"""Headline benchmarks for the three hot paths (BASELINE.md targets).

Modes (env SPRC_BENCH_MODE or --mode; default "all"):
  encode      - gallery encode, ViT-L bf16 (imgs/sec/chip)
  encode_int8 - gallery encode, calibrated static-int8 tower
  query       - composed-query scoring: fuse_reference + token-max sim
                against a 10k gallery (queries/sec/chip)
  train       - full SPRC train step fwd+bwd+update (imgs/sec/chip)
  train_cached - cached frozen-feature train step (Q-Former-only; exact for
                the reference recipe — see train/feature_cache.py)
  encode_eva  - EVA ViT-g int8 gallery encode (paper headline backbone)
  rerank      - two-stage ITM rerank scoring over [ref; cand] 2x257-token
                memory (candidates/sec/chip), CIRR val tile top=50 step=15
                (reference blip2_qformer_cir_rerank.py:399-445)

Prints the headline JSON line INCREMENTALLY — once after every completed
mode (the last line printed is always a complete, parseable record of
everything measured so far), so a driver timeout can no longer erase the
round's numbers (BENCH_r03 was rc=124/parsed=null). A total wall-clock
budget (env SPRC_BENCH_BUDGET_S, default 1500 s) skips remaining modes
with "skipped_budget" markers instead of running past the driver's kill.
The headline metric/value is the best encode path, with every measured
number under "extras". Each timed mode runs its compiled loop >=3 times
and reports the MEDIAN throughput, with best and min-max spread under
"<name>_best"/"<name>_spread_pct" (round-over-round deltas inside the
spread are noise).

Tunnel rules (MEASUREMENTS.md): scalar readback per step (block_until_ready
does not wait through the relay), distinct device-generated inputs
(identical inputs get deduped), eval_shape+fill instead of real init.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# fused whole-block pallas kernel (ops/pallas_block.py): 20.0 -> 14.1 ms/block
# bf16, 10.8 ms int8 at ViT-L b256. FORCED on (not setdefault): a parent that
# imported __graft_entry__ exports SPRC_PALLAS_BLOCK=0 into child envs, which
# would silently bench the unfused path. SPRC_BENCH_PALLAS=0 opts out.
os.environ["SPRC_PALLAS_BLOCK"] = os.environ.get("SPRC_BENCH_PALLAS", "1")
# fused whole-layer Q-Former kernel (ops/pallas_qformer.py): on chip it
# moved query 2008->3693 q/s, rerank 2782->4642 cand/s, encode int8
# 1023->1116 imgs/s. Forced for the same parent-env reason as above;
# SPRC_BENCH_PALLAS_QF=0 opts out.
os.environ["SPRC_PALLAS_QF"] = os.environ.get("SPRC_BENCH_PALLAS_QF", "1")


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: a fresh `python bench.py` process
    otherwise recompiles every mode's programs (~45 min through the remote
    compiler); with the disk cache, warmed programs reload in seconds. No-op
    if this backend's executables don't serialize."""
    import jax

    try:
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "sprc_tpu", "xla_cache")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


_enable_compile_cache()

BASELINE_IMGS_PER_SEC = 5000.0


def _fill_params(model, *example_args):
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *example_args)[
        "params"
    ]
    return jax.jit(
        lambda: jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), shapes)
    )()


def _readback(x):
    return float(np.asarray(x.ravel()[0] if x.ndim else x))


N_REPS = int(os.environ.get("SPRC_BENCH_REPS", "3"))


def _reps(timed_loop, reps=None):
    """Run a compiled timed loop ``reps`` times -> (median, stats dict).

    The loop is already compiled/warmed by its first (untimed) call inside
    the bench fn, so repetitions cost only execution time. Median is the
    reported value; best and spread land in extras so round-over-round
    deltas can be told from run noise (VERDICT r2 weak #8)."""
    vals = sorted(timed_loop() for _ in range(reps or N_REPS))
    med = vals[len(vals) // 2]
    spread = 100.0 * (vals[-1] - vals[0]) / med if med else 0.0
    return med, {"best": round(vals[-1], 2), "spread_pct": round(spread, 2)}


def _build(vit_quant=None, act_scales=None, remat=False):
    import dataclasses

    import jax.numpy as jnp

    import sprc_tpu  # noqa: F401
    from sprc_tpu.models.cir_base import CirConfig
    from sprc_tpu.registry import registry

    # SPRC_BENCH_VIT=eva benches the ViT-g ("pretrain") flagship tower
    vit = "eva_clip_g" if os.environ.get("SPRC_BENCH_VIT") == "eva" else "clip_L"
    cfg = CirConfig(
        vit_model=vit, vit_dtype=jnp.bfloat16, qformer_dtype=jnp.bfloat16,
        qformer_remat=remat,
    )
    if vit_quant:
        vcfg = dataclasses.replace(
            cfg.vit_config(), quant=vit_quant, act_scales=act_scales
        )
        cfg = dataclasses.replace(cfg, vit_config_override=vcfg)
    return registry.get_model_class("blip2_cir_align_prompt")(cfg)


def _encode_throughput(model, params, batch, steps):
    import jax
    import jax.numpy as jnp

    encode = jax.jit(
        lambda p, imgs: model.apply(
            {"params": p}, imgs, method=model.extract_target_features
        )[0]
    )
    gen = jax.jit(lambda k: jax.random.uniform(k, (batch, 224, 224, 3), jnp.float32))
    batches = [gen(jax.random.PRNGKey(i)) for i in range(4)]
    jax.block_until_ready(batches)
    _readback(encode(params, batches[0]))  # compile + warm

    def timed():
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(steps):
            acc += _readback(encode(params, batches[i % len(batches)]))
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return batch * steps / dt

    return _reps(timed)


def bench_encode(batch, steps):
    model = _build()
    dummy_args = _encode_dummy_args(model)
    params = _fill_params(model, *dummy_args)
    return _encode_throughput(model, params, batch, steps)


def _encode_dummy_args(model):
    import jax.numpy as jnp

    L = model.cfg.max_txt_len
    return (
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, L), jnp.int32),
        jnp.ones((1, L), jnp.int32),
    )


def _with_env(key, val, fn, *a, **kw):
    """Run ``fn`` with env ``key=val`` (the kernel opt-in knobs are read at
    trace time, so the env must cover the fn's jit tracing)."""
    old = os.environ.get(key)
    os.environ[key] = val
    try:
        return fn(*a, **kw)
    finally:
        if old is None:
            os.environ.pop(key, None)
        else:
            os.environ[key] = old


def bench_encode_int8(batch, steps):
    # whole-pipeline int8 serving: towers on the calibrated static-int8
    # megakernel AND the Q-Former fusion pass's dense projections on the
    # int8 kernel path (SPRC_QF_INT8; measured on chip: 1122.7 -> 1150.4
    # imgs/s, rankings preserved — tests/test_pallas_qformer.py)
    return _with_env("SPRC_QF_INT8", "1", _bench_encode_int8_impl, batch, steps)


def _bench_encode_int8_impl(batch, steps):
    import jax
    import jax.numpy as jnp

    from sprc_tpu.models.vit import calibrate_act_scales

    base = _build()
    params = _fill_params(base, *_encode_dummy_args(base))
    # calibration: one small batch through the sowing tower
    calib = _build(vit_quant="int8_calib")
    cal_imgs = jax.random.uniform(
        jax.random.PRNGKey(99), (16, 224, 224, 3), jnp.float32
    )
    scales = calibrate_act_scales(
        calib, params, cal_imgs, method=calib.extract_target_features
    )
    model = _build(vit_quant="int8_static", act_scales=scales)
    return _encode_throughput(model, params, batch, steps)


def bench_encode_eva_int8(batch, steps):
    """EVA ViT-g int8 gallery encode — the paper's headline backbone
    (reference eva_vit.py:428-455) in the int8 G=8 serving config from the
    r4 sweep. Runs at b1024 (b2048 G=8 EVA compiles time out; the bf16
    G-ladder record is in MEASUREMENTS.md r5)."""
    return _with_env("SPRC_BENCH_VIT", "eva", bench_encode_int8, batch, steps)


def bench_query(batch, steps, n_gallery=10000, qf_int8=False):
    if qf_int8:
        # int8-QF serving variant (per-row dynamic act scales in-kernel;
        # measured on chip: 3413.8 -> 4748.4 q/s, +39%)
        return _with_env(
            "SPRC_QF_INT8", "1", bench_query, batch, steps, n_gallery)
    import jax
    import jax.numpy as jnp

    model = _build()
    params = _fill_params(model, *_encode_dummy_args(model))
    L = model.cfg.max_txt_len
    E = 256
    Q = model.cfg.num_query_token

    score = jax.jit(
        lambda p, ref, ids, mask, gal: model.apply(
            {"params": p}, ref, gal, ids, mask, method=model.inference
        )
    )
    gen = jax.jit(
        lambda k: (
            jax.random.uniform(k, (batch, 224, 224, 3), jnp.float32),
            jax.random.randint(jax.random.fold_in(k, 1), (batch, L), 0, 30000),
            jnp.ones((batch, L), jnp.int32),
        )
    )
    gal = jax.jit(
        lambda k: jax.random.normal(k, (n_gallery, Q, E), jnp.float32)
    )(jax.random.PRNGKey(7))
    # inference() takes frozen reference embeds; encode once per batch set
    encode_img = jax.jit(
        lambda p, imgs: model.apply({"params": p}, imgs, method=model.encode_image)
    )
    qs = []
    for i in range(3):
        ref, ids, mask = gen(jax.random.PRNGKey(i))
        qs.append((encode_img(params, ref), ids, mask))
    jax.block_until_ready(qs)
    _readback(score(params, *qs[0][:3], gal))

    def timed():
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(steps):
            emb, ids, mask = qs[i % len(qs)]
            acc += _readback(score(params, emb, ids, mask, gal))
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return batch * steps / dt

    return _reps(timed)


def bench_index(batch, n_images):
    """Bytes -> index throughput: C++ JPEG decode (prefetch thread) +
    on-device preprocess + encode, pipelined (VERDICT r1 item 8: done when
    within 20% of the pure-encode number)."""
    import io

    import jax.numpy as jnp
    from PIL import Image

    from sprc_tpu.data import native
    from sprc_tpu.retrieval.engine import RetrievalEngine

    model = _build()
    params = _fill_params(model, *_encode_dummy_args(model))

    # distinct in-memory JPEGs (reused cyclically; decode cost is per image)
    rs = np.random.RandomState(0)
    jpegs = []
    for i in range(64):
        arr = (rs.rand(240 + (i % 3) * 8, 300, 3) * 255).astype(np.uint8)
        bio = io.BytesIO()
        Image.fromarray(arr).save(bio, format="JPEG", quality=85)
        jpegs.append(bio.getvalue())

    D = 256  # uniform decode buffer edge

    def batches():
        for s in range(0, n_images, batch):
            b = min(batch, n_images - s)
            buf = np.zeros((b, D, D, 3), np.uint8)
            sizes = np.zeros((b, 2), np.int32)
            for j in range(b):
                img = native.decode(jpegs[(s + j) % len(jpegs)])
                h, w = img.shape[:2]
                buf[j, :h, :w] = img[:D, :D]
                sizes[j] = (min(h, D), min(w, D))
            yield [f"g{s + j}" for j in range(b)], buf, sizes

    engine = RetrievalEngine(
        model, params, encode_batch=batch, frozen_host_dtype=jnp.bfloat16
    )
    # warm the compiled program on one batch
    first = next(batches())
    engine.build_index_raw(iter([first]), decode_size=D)
    t0 = time.perf_counter()
    index = engine.build_index_raw(batches(), decode_size=D)
    dt = time.perf_counter() - t0
    assert index.n == n_images
    # single pass (tunnel-bandwidth-bound; reps would re-upload ~100 MB/rep)
    return n_images / dt, {}


def bench_index_local(batch, steps):
    """Dataplane at its LOCAL rate (VERDICT r3 #6). The tunnel-bound
    ``index_build`` number measures axon relay bandwidth (~4 MB/s), not the
    framework; this decomposes the raw-bytes pipeline into
      (a) host C++ JPEG decode + pack rate (native/dataplane.cpp), and
      (b) device preprocess+encode rate from PRE-STAGED raw uint8 device
          buffers (no per-batch upload),
    and reports min(a, b) — the steady-state rate of the prefetch-overlapped
    build (`build_index_raw`) on hardware where the host feeds the chip
    directly. (a) is single-thread; the loader runs one decode thread per
    prefetch slot, so multiply by host cores for multi-worker rates."""
    import io

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sprc_tpu.data import native
    from sprc_tpu.data.transforms import device_preprocess

    model = _build()
    params = _fill_params(model, *_encode_dummy_args(model))

    rs = np.random.RandomState(0)
    jpegs = []
    for i in range(64):
        arr = (rs.rand(240 + (i % 3) * 8, 300, 3) * 255).astype(np.uint8)
        bio = io.BytesIO()
        Image.fromarray(arr).save(bio, format="JPEG", quality=85)
        jpegs.append(bio.getvalue())
    D = 256

    def decode_pack(n):
        buf = np.zeros((n, D, D, 3), np.uint8)
        sizes = np.zeros((n, 2), np.int32)
        for j in range(n):
            img = native.decode(jpegs[j % len(jpegs)])
            h, w = img.shape[:2]
            buf[j, :h, :w] = img[:D, :D]
            sizes[j] = (min(h, D), min(w, D))
        return buf, sizes

    decode_pack(8)  # warm (thread pools, allocator)
    n_dec = 4 * batch
    t0 = time.perf_counter()
    decode_pack(n_dec)
    host_rate = n_dec / (time.perf_counter() - t0)

    # (b): the same fused preprocess+encode program build_index_raw runs,
    # fed from device-resident buffers
    pre = device_preprocess(dim=model.cfg.image_size, target_ratio=1.25)

    def encode_raw(p, raw, sizes):
        images = pre(raw, sizes)
        feats, frozen = model.apply(
            {"params": p}, images, method=model.extract_target_features
        )
        return feats, frozen.astype(jnp.bfloat16)

    encode = jax.jit(encode_raw)
    buf, sizes = decode_pack(batch)
    staged = [
        (jnp.asarray(buf), jnp.asarray(sizes)),
        (jnp.asarray(np.roll(buf, 1, axis=0)), jnp.asarray(np.roll(sizes, 1, axis=0))),
    ]
    jax.block_until_ready(staged)
    _readback(encode(params, *staged[0])[0])  # compile + warm

    def timed():
        t0 = time.perf_counter()
        out = None
        for i in range(steps):
            out = encode(params, *staged[i % 2])
        jax.block_until_ready(out)
        return batch * steps / (time.perf_counter() - t0)

    dev_rate, stats = _reps(timed)
    return min(host_rate, dev_rate), {
        "host_decode_imgs_per_sec_1thread": round(host_rate, 2),
        "device_encode_imgs_per_sec": round(dev_rate, 2),
        **stats,
    }


def bench_rerank(steps, *, top=50, step_q=15, qf_int8=False):
    """ITM rerank scoring throughput (candidates/sec) at the CIRR tile:
    ``inference_rerank`` over concat [reference; candidate] 2x257-token
    cross-attn memory, top candidates per query x step_q queries per
    dispatch (reference blip2_qformer_cir_rerank.py:399-445 driven by
    validate_blip_rerank.py:197-221 / cirr_test_submission.py:87-112)."""
    if qf_int8:
        # int8-QF serving variant (4943.9 -> 6303.0 cand/s on chip, +27%)
        return _with_env(
            "SPRC_QF_INT8", "1", bench_rerank, steps, top=top, step_q=step_q)
    import jax
    import jax.numpy as jnp

    from sprc_tpu.registry import registry
    from sprc_tpu.models.cir_base import CirConfig

    vit = "eva_clip_g" if os.environ.get("SPRC_BENCH_VIT") == "eva" else "clip_L"
    cfg = CirConfig(vit_model=vit, vit_dtype=jnp.bfloat16,
                    qformer_dtype=jnp.bfloat16)
    model = registry.get_model_class("blip2_cir_rerank")(cfg)
    params = _fill_params(model, *_encode_dummy_args(model))

    N = top * step_q  # candidates per dispatch
    S = model.cfg.vit_config().seq_len  # 257
    D = model.cfg.vit_config().width
    L = model.cfg.max_txt_len

    score = jax.jit(
        lambda p, refs, cands, ids, mask: model.apply(
            {"params": p}, refs, cands, ids, mask,
            method=model.inference_rerank,
        )
    )
    gen = jax.jit(
        lambda k: (
            jax.random.normal(k, (N, S, D), jnp.bfloat16),
            jax.random.normal(jax.random.fold_in(k, 1), (N, S, D), jnp.bfloat16),
            jax.random.randint(jax.random.fold_in(k, 2), (N, L), 0, 30000),
        )
    )
    tiles = []
    for i in range(3):
        refs, cands, ids = gen(jax.random.PRNGKey(i))
        tiles.append((refs, cands, ids, jnp.ones((N, L), jnp.int32)))
    jax.block_until_ready(tiles)
    _readback(score(params, *tiles[0]))  # compile + warm

    def timed():
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(steps):
            acc += _readback(score(params, *tiles[i % len(tiles)]))
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return N * steps / dt

    return _reps(timed)


def bench_train_cached(batch, steps):
    """Cached frozen-feature train step (train/feature_cache.py): the batch
    carries precomputed encode_tower outputs, so the step is Q-Former-only
    fwd+bwd+update. Exact for the reference recipe (deterministic transform
    + frozen eval-mode tower); throughput in triplets(imgs)/sec as in the
    ``train`` mode. The one-time cache build runs at the encode rate and
    amortizes over epochs (50 for CIRR)."""
    import jax
    import jax.numpy as jnp

    from sprc_tpu.train.loop import TrainConfig, create_train_state, make_train_step

    model = _build()
    params = _fill_params(model, *_encode_dummy_args(model))
    tcfg = TrainConfig(
        learning_rate=1e-5, total_steps=100,
        grad_accum_steps=int(os.environ.get("SPRC_BENCH_TRAIN_ACCUM", "1")),
    )
    state, tx = create_train_state(params, tcfg)
    step = make_train_step(model, tx, tcfg, donate=True, from_embeds=True)
    S = model.cfg.vit_config().seq_len
    D = model.cfg.vit_config().width
    L = model.cfg.max_txt_len
    gen = jax.jit(
        lambda k: {
            "reference_embeds": jax.random.normal(k, (batch, S, D), jnp.bfloat16),
            "target_embeds": jax.random.normal(
                jax.random.fold_in(k, 1), (batch, S, D), jnp.bfloat16
            ),
            "input_ids": jax.random.randint(
                jax.random.fold_in(k, 2), (batch, L), 0, 30000
            ),
            "text_mask": jnp.ones((batch, L), jnp.int32),
        }
    )
    batches = [gen(jax.random.PRNGKey(i)) for i in range(3)]
    jax.block_until_ready(batches)
    state, metrics = step(state, batches[0])  # compile + warm
    _readback(metrics["loss"])

    def timed():
        nonlocal state
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = step(state, batches[i % len(batches)])
        # one readback at the end: each step consumes the previous (donated)
        # state, so the chain cannot be deduped or skipped — the final loss
        # forces all `steps` dispatches; reading every step only added the
        # tunnel RTT per step (measured 362.9 -> 392.8 imgs/s at b128)
        loss = _readback(metrics["loss"])
        dt = time.perf_counter() - t0
        assert np.isfinite(loss)
        return batch * steps / dt

    return _reps(timed)


def bench_train(batch, steps, int8=False):
    import jax
    import jax.numpy as jnp

    from sprc_tpu.train.loop import TrainConfig, create_train_state, make_train_step

    # SPRC_BENCH_TRAIN_REMAT=1: activation-checkpoint the Q-Former layers
    # (the b128 memory item: saved cross-attn K/V + prob residuals)
    remat = os.environ.get("SPRC_BENCH_TRAIN_REMAT") == "1"
    model = _build(remat=remat)
    params = _fill_params(model, *_encode_dummy_args(model))
    if int8 or os.environ.get("SPRC_BENCH_TRAIN_INT8") == "1":
        # int8 FROZEN-tower forwards in the train step (numerics opt-in:
        # the towers are excluded from autodiff, so quantization only
        # perturbs the Q-Former's inputs — MEASUREMENTS.md round-3 SOL
        # table puts the two ViT forwards at ~165 of ~315 ms/step)
        from sprc_tpu.models.vit import calibrate_act_scales

        calib = _build(vit_quant="int8_calib")
        cal_imgs = jax.random.uniform(
            jax.random.PRNGKey(99), (16, 224, 224, 3), jnp.float32
        )
        scales = calibrate_act_scales(
            calib, params, cal_imgs, method=calib.extract_target_features
        )
        model = _build(vit_quant="int8_static", act_scales=scales, remat=remat)
    tcfg = TrainConfig(
        learning_rate=1e-5, total_steps=100,
        # effective batch = batch * accum; default b64 x 2 = the reference
        # recipe's 128 (blip_fine_tune_2.py:251), measured BEST at 210.7
        # imgs/s bf16 (b128 dense OOMs the 16 GB chip)
        grad_accum_steps=int(os.environ.get("SPRC_BENCH_TRAIN_ACCUM", "2")),
    )
    state, tx = create_train_state(params, tcfg)
    # donate: the old state is dead after each step; double-buffering the
    # ~2.6 GB fp32 train state costs real headroom at b128 on 16 GB
    step = make_train_step(model, tx, tcfg, donate=True)
    L = model.cfg.max_txt_len
    gen = jax.jit(
        lambda k: {
            "reference": jax.random.uniform(k, (batch, 224, 224, 3), jnp.float32),
            "target": jax.random.uniform(
                jax.random.fold_in(k, 1), (batch, 224, 224, 3), jnp.float32
            ),
            "input_ids": jax.random.randint(
                jax.random.fold_in(k, 2), (batch, L), 0, 30000
            ),
            "text_mask": jnp.ones((batch, L), jnp.int32),
        }
    )
    batches = [gen(jax.random.PRNGKey(i)) for i in range(3)]
    jax.block_until_ready(batches)
    state, metrics = step(state, batches[0])  # compile + warm
    _readback(metrics["loss"])

    def timed():
        nonlocal state
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = step(state, batches[i % len(batches)])
        # final-only readback: the donated-state chain forces every step
        # (see bench_train_cached note)
        loss = _readback(metrics["loss"])
        dt = time.perf_counter() - t0
        assert np.isfinite(loss)
        return batch * steps / dt

    return _reps(timed)


# metric names each mode contributes (for skip/timeout markers)
_MODE_METRICS = {
    "encode": ["encode_bf16_imgs_per_sec"],
    "encode_int8": ["encode_int8_imgs_per_sec"],
    "query": ["query_scoring_queries_per_sec"],
    "train": ["train_step_imgs_per_sec"],
    "train_cached": ["train_cached_step_imgs_per_sec"],
    "rerank": ["rerank_candidates_per_sec"],
    "encode_eva": ["encode_eva_int8_imgs_per_sec"],
    "index": ["index_build_imgs_per_sec_local",
              "index_build_imgs_per_sec_tunnel_bound"],
    # int8 serving variants as standalone modes so the isolation pass can
    # give the CORE list first claim on the budget (VERDICT r4 #1: two
    # rounds of starved core modes) and spend only the leftover here
    "query_int8": ["query_scoring_int8_queries_per_sec"],
    "train_int8": ["train_step_int8_frozen_imgs_per_sec"],
    "rerank_int8": ["rerank_int8_candidates_per_sec"],
}
_CORE_MODES = ["encode", "encode_int8", "query", "train", "train_cached",
               "rerank", "encode_eva", "index"]
_VARIANT_MODES = ["query_int8", "rerank_int8", "train_int8"]
# PRIORITY-ordered singleton children. Two r5 findings drive this shape:
# (1) big-program setup through the remote tunnel is 100-900 s EACH and
# wildly session-variable whether the persistent cache hits or misses
# (tracing ~30-60 s + executable build-or-upload at relay bandwidth
# dominates; a whole-list rehearsal saw encode alone blow a 900 s child),
# so on a congested day the 1500 s budget cannot hold the full list and
# whatever runs FIRST is what gets recorded; (2) per-child process toll is
# only ~30-40 s, so singleton children cost little and bound a tunnel
# wedge to one mode's slice. Order = the modes absent from every driver
# record (VERDICT r4 #1: train/rerank/index starved two rounds running)
# first, the r4-recorded encode/query family last, int8 serving variants
# on leftover only. Estimates are warm-cache child walls.
_CHILD_GROUPS = [
    (["train"], 330.0),
    (["train_cached"], 200.0),
    # encode_int8 third: it IS the headline (int8 serving config, r5:
    # 1277 vs bf16's 896 imgs/s) — the two r5 full rehearsals showed the
    # budget holds 5-7 children depending on tunnel state, and a starved
    # encode family dropped the record's top-line to the vitG fallback
    (["encode_int8"], 350.0),
    (["rerank"], 260.0),
    # the index child's tunnel_bound pass self-skips when its budget is
    # short (relay-bandwidth-bound ~550 s alone; environmental anyway)
    (["index"], 280.0),
    (["query"], 300.0),
    (["encode"], 300.0),
    # EVA after the seven core modes (VERDICT's "additionally"): lands on
    # fast-tunnel days, and both r5 rehearsals recorded 420 imgs/s in
    # MEASUREMENTS.md regardless
    (["encode_eva"], 350.0),
    (_VARIANT_MODES, 450.0),
]


def _spawn_group(group, timeout, extras):
    """Run ``group``'s modes in one timeout-bounded child process; merge its
    incremental JSON record into ``extras``. Returns the child's tag
    ("rc_N" or "timeout_killed")."""
    import subprocess
    import sys

    env = dict(
        os.environ, SPRC_BENCH_CHILD="1",
        # child budget sits 30 s under the kill timeout so the child
        # emits its own skip markers before the parent's hard kill
        SPRC_BENCH_BUDGET_S=str(int(max(timeout - 30.0, 60.0))),
    )
    out = ""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--mode", ",".join(group)],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
        out = proc.stdout or ""
        tag = f"rc_{proc.returncode}"
    except subprocess.TimeoutExpired as e:
        raw = e.stdout or b""
        out = raw.decode("utf-8", "replace") if isinstance(raw, bytes) else raw
        tag = "timeout_killed"
    json_lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    if json_lines:
        try:
            child = json.loads(json_lines[-1])
            for k, v in child.get("extras", {}).items():
                if k != "bench_wall_s":
                    extras[k] = v
        except ValueError:
            pass
    for m in group:
        for name in _MODE_METRICS[m]:
            extras.setdefault(name, tag)
    return tag


def _mode_unmeasured(extras, m):
    return not any(
        isinstance(extras.get(name), (int, float))
        for name in _MODE_METRICS[m]
    )


def _isolated_all(budget_s, t_start, extras, emit, probe=False):
    """Run the full mode list as priority-ordered child processes.

    Each child reloads the persistent XLA disk cache (warm compiles cost
    seconds when the tunnel cooperates), self-budgets its own modes through
    the in-process up-front allocation, and prints the same incremental
    JSON record this parent merges after every child. A wedged tunnel
    holding one mode for 20+ min (r5 rehearsals: encode 1354 s, then a
    whole 900 s child) now forfeits only that mode's slice. After a timeout
    kill the parent cools down 20 s (killing a client mid-remote-op is
    exactly what wedges the tunnel for the next process), and modes lost to
    kills/crashes get ONE retry on leftover budget — wedges are transient,
    so a retry after cooldown often lands the number."""
    import subprocess
    import sys

    if probe:
        # Tunnel-health stamp (r5: big-program setup through the relay
        # swung 100->900+ s within one day — record the infra state so a
        # starved record is interpretable): small-op RTT + one mid-size
        # fresh compile, in a bounded child so a dead tunnel can't hang
        # the parent.
        probe_src = (
            "import time,jax,jax.numpy as jnp\n"
            "t=time.time();x=jax.jit(lambda a:(a@a).sum())(jnp.ones((256,256)))"
            ";jax.block_until_ready(x);print('rtt %.3f'%(time.time()-t))\n"
            "def f(a):\n"
            "  for i in range(8): a=jnp.tanh(a@a)+float(i)\n"
            "  return a.sum()\n"
            "t=time.time();x=jax.jit(f)(jnp.ones((1024,1024)))"
            ";jax.block_until_ready(x);print('midcompile %.3f'%(time.time()-t))\n"
        )
        try:
            p = subprocess.run([sys.executable, "-c", probe_src], timeout=150,
                               capture_output=True, text=True)
            for ln in (p.stdout or "").splitlines():
                if ln.startswith("rtt "):
                    extras["tunnel_smallop_s"] = round(float(ln.split()[1]), 3)
                elif ln.startswith("midcompile "):
                    extras["tunnel_midcompile_s"] = round(
                        float(ln.split()[1]), 3)
        except (subprocess.TimeoutExpired, ValueError):
            extras["tunnel_smallop_s"] = "probe_timeout"
        emit()

    for gi, (group, est) in enumerate(_CHILD_GROUPS):
        remaining = budget_s - (time.time() - t_start)
        # later groups get whatever the earlier ones left; a group runs iff
        # 65% of its warm estimate fits (the r5 full rehearsal burned a
        # 155 s slice on a query child that needed ~200 s warm — a doomed
        # spawn wastes exactly the budget a skip would have banked) — its
        # child then skips individual modes against the tighter real
        # budget it is handed
        if remaining < 0.65 * est:
            for m in group:
                for name in _MODE_METRICS[m]:
                    extras.setdefault(name, "skipped_budget")
            print(f"[bench] group {gi} {group} skipped_budget "
                  f"({remaining:.0f}s left < {0.65 * est:.0f}s floor)",
                  file=sys.stderr, flush=True)
            emit()
            continue
        timeout = min(remaining, max(1.8 * est, 420.0))
        print(f"[bench] group {gi} {group} (timeout {timeout:.0f}s) ...",
              file=sys.stderr, flush=True)
        t0 = time.time()
        tag = _spawn_group(group, timeout, extras)
        print(f"[bench] group {gi} done ({time.time()-t0:.0f}s, {tag})",
              file=sys.stderr, flush=True)
        emit()
        if tag == "timeout_killed":
            time.sleep(20.0)

    # retry pass: modes that were killed or crashed (NOT budget-skipped —
    # skipping was a deliberate allocation) get one more child each while
    # budget remains, core modes first
    for group, est in _CHILD_GROUPS:
        retry = [m for m in group
                 if _mode_unmeasured(extras, m)
                 and extras.get(_MODE_METRICS[m][0]) != "skipped_budget"]
        if not retry:
            continue
        remaining = budget_s - (time.time() - t_start)
        if remaining < 0.65 * est:
            continue
        timeout = min(remaining, max(1.8 * est, 420.0))
        print(f"[bench] retry {retry} (timeout {timeout:.0f}s) ...",
              file=sys.stderr, flush=True)
        t0 = time.time()
        tag = _spawn_group(retry, timeout, extras)
        print(f"[bench] retry {retry} done ({time.time()-t0:.0f}s, {tag})",
              file=sys.stderr, flush=True)
        emit()
        if tag == "timeout_killed":
            time.sleep(20.0)


def main() -> None:
    import argparse

    import jax

    valid = ["all"] + _CORE_MODES + _VARIANT_MODES

    def mode_list(s):
        parts = [p for p in s.split(",") if p]
        bad = [p for p in parts if p not in valid]
        if bad or not parts:
            raise argparse.ArgumentTypeError(
                f"invalid mode(s) {bad or [s]}; choose from {valid}")
        return s

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", type=mode_list,
        default=os.environ.get("SPRC_BENCH_MODE", "all"),
        help="one of %s or a comma-separated list" % valid,
    )
    args = ap.parse_args()

    backend = jax.default_backend()
    tpu = backend == "tpu"
    # total wall-clock budget: skip (not kill) the remaining modes once
    # spent, so the driver always gets a parsed headline (VERDICT r3 #1)
    budget_s = float(os.environ.get("SPRC_BENCH_BUDGET_S", "1500"))
    t_start = time.time()
    # b2048 measured best on chip: int8 1150.4 (b512) -> 1183.8 (b1024) ->
    # 1210.0 (b2048); bf16 830.3 -> 877.3 — the larger tile amortizes
    # dispatch and pipelines more groups per megakernel call
    enc_batch = int(os.environ.get("SPRC_BENCH_BATCH", "2048" if tpu else "2"))
    enc_steps = 10 if tpu else 2
    # the index bench keeps a smaller batch: it uploads decoded pixels over
    # the tunnel (~100 MB per 512-image batch), so enc_batch would make it
    # a pure bandwidth soak
    idx_batch = int(os.environ.get("SPRC_BENCH_INDEX_BATCH", "512" if tpu else "2"))
    extras = {}

    def emit():
        """Print the full headline JSON line from what's measured so far.
        Called after EVERY mode: the last stdout line is always a complete
        record, so a mid-run kill loses at most the in-flight mode."""
        int8_v = extras.get("encode_int8_imgs_per_sec")
        bf16_v = extras.get("encode_bf16_imgs_per_sec")
        eva_v = extras.get("encode_eva_int8_imgs_per_sec")
        int8_v = int8_v if isinstance(int8_v, (int, float)) else None
        bf16_v = bf16_v if isinstance(bf16_v, (int, float)) else None
        eva_v = eva_v if isinstance(eva_v, (int, float)) else None
        tower = "vitG" if os.environ.get("SPRC_BENCH_VIT") == "eva" else "vitL"
        if int8_v and (not bf16_v or int8_v >= bf16_v):
            metric, value = f"gallery_encode_{tower}_int8_{backend}", int8_v
        elif bf16_v:
            metric, value = f"gallery_encode_{tower}_bf16_{backend}", bf16_v
        elif eva_v:
            # ViT-L encode starved this run (priority order favors the
            # never-recorded modes) — the EVA gallery encode is still a
            # real encode headline, better than reporting 0
            metric, value = f"gallery_encode_vitG_int8_{backend}", eva_v
        else:
            metric, value = f"gallery_encode_{tower}_bf16_{backend}", 0.0
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": value,
                    "unit": "imgs/sec/chip",
                    "vs_baseline": round((value or 0.0) / BASELINE_IMGS_PER_SEC, 4),
                    "extras": extras,
                }
            ),
            flush=True,
        )

    # Up-front budget allocation (VERDICT r4 #1): every mode gets a
    # reserved slice sized by its measured WARM-cache cost on chip (the
    # persistent XLA disk cache makes repeat rounds warm; cold compiles
    # through the remote tunnel ran 380-530 s/mode and starved the back
    # half of the list two rounds running). A mode runs iff the remaining
    # budget covers its own estimate — one overrunning (cold) mode no
    # longer poisons the floor for everything after it the way the old
    # 0.7*max(mode_times) heuristic did, and the hard elapsed>budget stop
    # plus incremental emit() bound the damage of a fully cold run.
    est_warm_s = {
        "encode_bf16_imgs_per_sec": 120.0,
        "encode_int8_imgs_per_sec": 150.0,  # + calibration pass
        "query_scoring_queries_per_sec": 90.0,
        "query_scoring_int8_queries_per_sec": 90.0,
        "train_step_imgs_per_sec": 120.0,
        "train_step_int8_frozen_imgs_per_sec": 140.0,
        "train_cached_step_imgs_per_sec": 90.0,
        "rerank_candidates_per_sec": 90.0,
        "rerank_int8_candidates_per_sec": 90.0,
        "encode_eva_int8_imgs_per_sec": 150.0,
        "index_build_imgs_per_sec_local": 120.0,
        "index_build_imgs_per_sec_tunnel_bound": 600.0,  # relay-bandwidth
    }

    def run(name, fn, *a, **kw):
        import sys

        elapsed = time.time() - t_start
        remaining = budget_s - elapsed
        if elapsed > budget_s or remaining < est_warm_s.get(name, 60.0):
            extras[name] = "skipped_budget"
            print(f"[bench] {name} skipped_budget "
                  f"({elapsed:.0f}s/{budget_s:.0f}s spent)",
                  file=sys.stderr, flush=True)
            emit()
            return
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
        t0 = time.time()
        try:
            value, stats = fn(*a, **kw)
            extras[name] = round(value, 2)
            for k, v in stats.items():
                extras[f"{name}_{k}"] = v
            print(f"[bench] {name} = {extras[name]} ({time.time()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
        except Exception as e:  # keep the bench alive if one mode breaks
            extras[name] = None
            extras[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
            print(f"[bench] {name} FAILED {extras[f'{name}_error']}",
                  file=sys.stderr, flush=True)
        emit()

    modes = (
        _CORE_MODES + _VARIANT_MODES if args.mode == "all"
        else args.mode.split(",")
    )
    # Mode isolation (VERDICT r4 #1 root cause): a wedged tunnel can hold a
    # single in-process mode for 20+ min (r5 rehearsal: encode 1354 s vs its
    # 120 s warm estimate) and starve every mode after it — the up-front
    # budget allocation cannot bound a mode once started. So "--mode all"
    # runs the list as four timeout-bounded child-process groups (each
    # reloads the persistent XLA disk cache; the core modes get first claim
    # on the budget, the int8 variants group runs last on leftover) and
    # merges the children's incremental JSON records. A hog mode now loses
    # only its group's slice. SPRC_BENCH_ISOLATE=0 opts out.
    if (
        args.mode == "all"
        and os.environ.get("SPRC_BENCH_ISOLATE", "1") == "1"
        and os.environ.get("SPRC_BENCH_CHILD") != "1"
    ):
        _isolated_all(budget_s, t_start, extras, emit, probe=tpu)
        extras["bench_wall_s"] = round(time.time() - t_start, 1)
        emit()
        return
    qb = int(os.environ.get("SPRC_BENCH_QUERY_BATCH", "2048")) if tpu else 2
    train_batch = int(
        os.environ.get("SPRC_BENCH_TRAIN_BATCH", "64")) if tpu else 2
    if "encode" in modes:
        run("encode_bf16_imgs_per_sec", bench_encode, enc_batch, enc_steps)
    if "encode_int8" in modes:
        run("encode_int8_imgs_per_sec", bench_encode_int8, enc_batch, enc_steps)
    if "query" in modes:
        # batch sweep on chip (fused QF): 3693 (b512) -> 4097 (b1024) ->
        # 4279 q/s (b2048); int8 QF 4748 -> 5242 -> 5651 — the larger
        # tile amortizes dispatch against the fixed 10k gallery
        run("query_scoring_queries_per_sec", bench_query,
            qb, 10 if tpu else 2, 10000 if tpu else 16)
    if "query_int8" in modes:
        # int8-QF serving opt-in (rankings preserved; see
        # tests/test_pallas_qformer.py + MEASUREMENTS.md round 3)
        run("query_scoring_int8_queries_per_sec", bench_query,
            qb, 10 if tpu else 2, 10000 if tpu else 16, qf_int8=True)
    if "train" in modes:
        # b64 measured best (204 imgs/s vs 164 at b32; b128 OOMs the 16 GB
        # chip without remat — reference effective-128 = b64 + grad_accum 2)
        run("train_step_imgs_per_sec", bench_train, train_batch,
            6 if tpu else 2)
    if "train_int8" in modes:
        # int8 FROZEN-tower forwards (numerics opt-in for real training,
        # +15-19% measured; towers are outside autodiff so quantization
        # only perturbs the Q-Former's inputs)
        run("train_step_int8_frozen_imgs_per_sec", bench_train,
            train_batch, 6 if tpu else 2, int8=True)
    if "train_cached" in modes:
        # cached frozen-feature step (exact for the reference recipe):
        # Q-Former-only fwd+bwd — no ViT activations, so the full reference
        # batch 128 fits the 16 GB chip dense
        run("train_cached_step_imgs_per_sec", bench_train_cached,
            int(os.environ.get("SPRC_BENCH_TRAIN_CACHED_BATCH", "128"))
            if tpu else 2,
            10 if tpu else 2)
    if "rerank" in modes:
        run("rerank_candidates_per_sec", bench_rerank,
            6 if tpu else 2,
            top=50 if tpu else 2, step_q=15 if tpu else 2)
    if "rerank_int8" in modes:
        run("rerank_int8_candidates_per_sec", bench_rerank,
            6 if tpu else 2,
            top=50 if tpu else 2, step_q=15 if tpu else 2, qf_int8=True)
    if "encode_eva" in modes:
        # EVA ViT-g in the official record (VERDICT r4 #4): int8 G=8
        # serving config at its measured-best b1024 tile
        run("encode_eva_int8_imgs_per_sec", bench_encode_eva_int8,
            int(os.environ.get("SPRC_BENCH_EVA_BATCH", "1024"))
            if tpu else 2,
            enc_steps)
    if "index" in modes:
        # the local-rate decomposition first (compute-bound, fast); the
        # tunnel-bound end-to-end pass last (relay-bandwidth-bound, slow)
        run("index_build_imgs_per_sec_local", bench_index_local,
            idx_batch, 6 if tpu else 2)
        # through the axon HTTP relay this measures tunnel bandwidth, not
        # the framework: each batch uploads ~100 MB of decoded pixels at
        # ~4 MB/s (MEASUREMENTS.md); labeled accordingly
        run("index_build_imgs_per_sec_tunnel_bound", bench_index,
            idx_batch, 4 * idx_batch if tpu else 4)

    extras["bench_wall_s"] = round(time.time() - t_start, 1)
    emit()
    if os.environ.get("SPRC_BENCH_CHILD") == "1":
        # hard-exit: the remote-backend client can hang in atexit teardown
        # (an r5 index child finished its work, emitted, then lingered to
        # its kill timeout — wasting ~150 s of the parent's budget). All
        # output is already flushed; nothing here needs cleanup.
        import sys

        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


if __name__ == "__main__":
    main()
