"""Fine-tune CLI — mirrors the reference ``blip_fine_tune_2.py``.

Usage:
  python -m sprc_tpu.cli.finetune --dataset CIRR --data-path /data/cirr_dataset \
      --vocab-path vocab.txt --batch-size 128 --num-epochs 50 --learning-rate 1e-5

Reference recipe (blip_fine_tune_2.py:196-354, README.md:89-102): AdamW
(0.9, 0.98, eps 1e-7, wd 0.05), OneCycle over 80 scheduled epochs with
pct_start 1/50, loss = itc + 0.4*rtc + 0.4*align, targetpad 1.25,
per-epoch validation with best-checkpoint selection by arithmetic mean
(CIRR) / avg recall (FashionIQ). Improvements over the reference: full
optimizer-state resume, data-parallel mesh support, CSV + JSONL logging.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import numpy as np


def _prepare_batch(batch, tokenizer, processor, max_txt_len, caption_key, fiq_rng=None):
    """Host-side: captions -> token arrays; images already stacked."""
    from sprc_tpu.text.processors import randomize_fiq_captions

    if caption_key == "caption":  # CIRR
        captions = [processor(c) for c in batch["caption"]]
    else:  # FashionIQ: 2 captions/triplet, randomized 4-way (utils.py:117-138)
        flat = [c for pair in batch["captions"] for c in pair]
        captions = [processor(c) for c in randomize_fiq_captions(flat, fiq_rng)]
    tok = tokenizer(captions, max_length=max_txt_len)
    return {
        "reference": batch["reference_image"].astype(np.float32),
        "target": batch["target_image"].astype(np.float32),
        "input_ids": tok["input_ids"],
        "text_mask": tok["attention_mask"],
    }


def _prepare_batch_cached(
    batch, cache, tokenizer, processor, max_txt_len, caption_key, fiq_rng=None
):
    """Host-side: names -> cached tower features, captions -> tokens."""
    from sprc_tpu.text.processors import randomize_fiq_captions

    if caption_key == "caption":
        captions = [processor(c) for c in batch["caption"]]
    else:
        flat = [c for pair in batch["captions"] for c in pair]
        captions = [processor(c) for c in randomize_fiq_captions(flat, fiq_rng)]
    tok = tokenizer(captions, max_length=max_txt_len)
    return {
        "reference_embeds": cache.gather(batch["reference_name"]),
        "target_embeds": cache.gather(batch["target_name"]),
        "input_ids": tok["input_ids"],
        "text_mask": tok["attention_mask"],
    }


def _build_or_load_cache(args, model, params, tfm):
    """One encode_tower pass over the train split's unique images (or load a
    previously saved cache from <output_dir>/feature_cache.npz)."""
    import numpy as np

    from sprc_tpu.data.datasets import CIRRDataset, FashionIQDataset
    from sprc_tpu.data.loader import DataLoader
    from sprc_tpu.train.feature_cache import FeatureCache, build_feature_cache

    path = args.feature_cache_path or os.path.join(
        args.output_dir, "feature_cache"
    )
    if os.path.exists(path + ".npz") and os.path.exists(path + ".names.json"):
        cache = FeatureCache.load(path)
        print(f"loaded feature cache ({len(cache)} images) from {path}.npz")
        return cache
    if args.dataset == "CIRR":
        classic = CIRRDataset(args.data_path, "train", "classic", tfm)
    else:
        classic = FashionIQDataset(
            args.data_path, "train", args.dress_types, "classic", tfm
        )
    loader = DataLoader(
        classic, batch_size=args.encode_batch, num_workers=args.workers
    )
    t0 = time.time()
    cache = build_feature_cache(
        model, params,
        ((b["image_name"], b["image"].astype(np.float32)) for b in loader),
    )
    print(
        f"built feature cache: {len(cache)} images in {time.time() - t0:.1f}s"
    )
    os.makedirs(args.output_dir, exist_ok=True)
    cache.save(path)
    return cache


def finetune(args) -> None:
    import jax
    import jax.numpy as jnp

    from sprc_tpu.data.datasets import CIRRDataset, FashionIQDataset
    from sprc_tpu.data.loader import DataLoader
    from sprc_tpu.data.transforms import targetpad_transform
    from sprc_tpu.loader import load_model
    from sprc_tpu.text.processors import CaptionProcessor
    from sprc_tpu.text.tokenizer import BertWordPieceTokenizer
    from sprc_tpu.train.checkpoint import BestCheckpointKeeper, restore_state, save_state
    from sprc_tpu.train.loop import TrainConfig, create_train_state, make_train_step
    from sprc_tpu.utils.logging import MetricsLogger

    model, params = load_model(
        args.model_name,
        args.model_type,
        checkpoint_path=args.model_path,
        vit_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        vit_remat=getattr(args, "remat", False),
        qformer_remat=getattr(args, "remat", False),
    )
    from sprc_tpu.utils.artifacts import ensure_bert_vocab

    tokenizer = BertWordPieceTokenizer.from_vocab_file(
        ensure_bert_vocab(args.vocab_path)
    )
    processor = CaptionProcessor()
    tfm = targetpad_transform(args.target_ratio, model.cfg.image_size)

    # --cache-features: the recipe's transform is deterministic and the ViT
    # frozen, so one encode_tower pass per unique image replaces both tower
    # forwards in every step of every epoch (exact; train/feature_cache.py)
    train_tfm = None if args.cache_features else tfm
    if args.dataset == "CIRR":
        train_ds = CIRRDataset(
            args.data_path, "train", "relative", train_tfm, skip_errors=True
        )
        caption_key = "caption"
    else:
        train_ds = FashionIQDataset(
            args.data_path, "train", args.dress_types, "relative", train_tfm,
            skip_errors=True,
        )
        caption_key = "captions"

    feature_cache = None
    if args.cache_features:
        if not hasattr(model, "forward_cached"):
            raise SystemExit(
                f"--cache-features: {args.model_name} has no cached training "
                "forward (forward_cached); supported for the flagship "
                "blip2_cir_align_prompt"
            )
        feature_cache = _build_or_load_cache(args, model, params, tfm)

    loader = DataLoader(
        train_ds,
        batch_size=args.batch_size,
        shuffle=True,
        drop_last=True,
        num_workers=1 if args.cache_features else args.workers,
        seed=args.seed,
    )
    steps_per_epoch = len(loader)

    mesh = None
    if args.mesh:
        from sprc_tpu.parallel.mesh import make_mesh, replicate

        mesh = make_mesh()

    # the reference schedules OneCycle over a hardcoded 80 epochs even when
    # training fewer (blip_fine_tune_2.py:261) — reproduce that
    tcfg = TrainConfig(
        learning_rate=args.learning_rate,
        total_steps=steps_per_epoch * args.schedule_epochs,
        pct_start=1.0 / 50.0,
        loss_weights={"loss_rtc": args.loss_rtc, "loss_align": args.loss_align},
        grad_accum_steps=args.grad_accum,
        # the model's own frozen partition (visual_encoder for the flagship;
        # rerank/instruct variants freeze more) — autodiff skips these
        frozen_prefixes=tuple(
            getattr(model, "FROZEN_PREFIXES", ("visual_encoder",))),
    )
    state, tx = create_train_state(params, tcfg, jax.random.PRNGKey(args.seed))
    if args.resume and os.path.isdir(args.resume):
        state = restore_state(args.resume, state)
        print(f"resumed from {args.resume} at step {int(state.step)}")
    if mesh is not None:
        from sprc_tpu.parallel.mesh import replicate

        state = replicate(mesh, state)
    step_fn = make_train_step(
        model, tx, tcfg, mesh=mesh, from_embeds=args.cache_features,
        skip_nonfinite=args.skip_nonfinite,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "training_hyperparameters.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)
    logger = MetricsLogger(args.output_dir)
    keeper = BestCheckpointKeeper(args.output_dir, args.selection_metric)
    fiq_rng = np.random.RandomState(args.seed)
    # lazily-built frozen-tower caches for the VAL gallery (one per split/
    # dress type): with --cache-features the per-epoch re-index only re-runs
    # the trainable ln_vision + Q-Former over cached tower rows
    val_caches = {}

    start_epoch = int(state.step) // max(1, steps_per_epoch)
    consec_skips = 0
    for epoch in range(start_epoch, args.num_epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        running = {}
        n_seen = 0
        for batch in loader:
            if feature_cache is not None:
                prepared = _prepare_batch_cached(
                    batch, feature_cache, tokenizer, processor,
                    model.cfg.max_txt_len, caption_key, fiq_rng,
                )
            else:
                prepared = _prepare_batch(
                    batch, tokenizer, processor, model.cfg.max_txt_len,
                    caption_key, fiq_rng,
                )
            if mesh is not None:
                from sprc_tpu.parallel.mesh import shard_batch

                prepared = shard_batch(mesh, prepared)
            state, metrics = step_fn(state, prepared)
            bs = prepared["input_ids"].shape[0]
            n_seen += bs
            for k, v in metrics.items():
                running[k] = running.get(k, 0.0) + float(v) * bs
            if args.skip_nonfinite:
                # in-step guard (train/loop.py skip_nonfinite): a NaN batch
                # was a no-op update; abort only on sustained divergence —
                # last_state is then itself the last-finite state
                if float(metrics["skipped_nonfinite"]) > 0.0:
                    consec_skips += 1
                    print(f"non-finite step skipped ({consec_skips} in a row)")
                    if consec_skips >= 10:
                        save_state(
                            os.path.join(args.output_dir, "last_state"), state)
                        raise RuntimeError(
                            "training diverged: 10 consecutive non-finite "
                            "steps; last-finite state saved")
                else:
                    consec_skips = 0
        epoch_metrics = {k: v / max(1, n_seen) for k, v in running.items()}
        epoch_metrics.update(epoch=epoch, seconds=round(time.time() - t0, 1))
        logger.log_train(epoch_metrics)
        print(json.dumps(epoch_metrics))

        if args.validate_every and (epoch + 1) % args.validate_every == 0:
            results = _run_validation(
                args, model, state.params, tokenizer, mesh,
                val_caches if args.cache_features else None,
            )
            logger.log_validation({**results, "epoch": epoch})
            print(json.dumps(results, indent=2))
            metric = results.get(args.selection_metric)
            if metric is not None and keeper.maybe_save(metric, state.params, epoch):
                print(f"new best {args.selection_metric}={metric:.3f}")

        save_state(os.path.join(args.output_dir, "last_state"), state)


def _run_validation(args, model, params, tokenizer, mesh, val_caches=None):
    from sprc_tpu.retrieval.engine import RetrievalEngine
    from sprc_tpu.cli import validate as v

    engine = RetrievalEngine(
        model, params, tokenizer, mesh=mesh,
        encode_batch=args.encode_batch, query_batch=args.query_batch,
    )
    # reuse the validate module's dataset plumbing via a shim namespace
    class _A:
        pass

    a = _A()
    for key, val in vars(args).items():
        setattr(a, key, val)
    if args.dataset == "CIRR":
        return _validate_with_engine_cirr(a, model, engine, val_caches)
    return _validate_with_engine_fiq(a, model, engine, val_caches)


def _index_stream(args, model, engine, classic, val_caches, cache_key):
    """Index-build input stream: cached tower rows when --cache-features
    (the frozen tower is epoch-invariant; only ln_vision + Q-Former re-run
    via the rank-dispatched encode_image), else decoded images."""
    from sprc_tpu.cli.validate import index_batches
    from sprc_tpu.train.feature_cache import build_feature_cache

    if val_caches is None:
        return index_batches(classic, args.encode_batch, args.workers)
    if cache_key not in val_caches:
        val_caches[cache_key] = build_feature_cache(
            model, engine.params,
            index_batches(classic, args.encode_batch, args.workers),
        )
    cache = val_caches[cache_key]

    def batches():
        for s in range(0, len(cache.names), args.encode_batch):
            names = cache.names[s : s + args.encode_batch]
            yield names, cache.gather(names)

    return batches()


def _validate_with_engine_cirr(args, model, engine, val_caches=None):
    from sprc_tpu.data.datasets import CIRRDataset
    from sprc_tpu.data.transforms import targetpad_transform
    from sprc_tpu.retrieval.metrics import compute_cirr_metrics
    from sprc_tpu.text.processors import CaptionProcessor

    tfm = targetpad_transform(args.target_ratio, model.cfg.image_size)
    classic = CIRRDataset(args.data_path, "val", "classic", tfm)
    index = engine.build_index(
        _index_stream(args, model, engine, classic, val_caches, "cirr_val")
    )
    relative = CIRRDataset(args.data_path, "val", "relative")
    proc = CaptionProcessor()
    refs, targets, captions, groups = [], [], [], []
    for i in range(len(relative)):
        item = relative[i]
        refs.append(item["reference_name"])
        targets.append(item["target_name"])
        captions.append(proc(item["caption"]))
        groups.append(item["group_members"])
    sims = engine.score_queries(index, refs, captions)
    return compute_cirr_metrics(sims, index.names, refs, targets, groups)


def _validate_with_engine_fiq(args, model, engine, val_caches=None):
    from sprc_tpu.data.datasets import FashionIQDataset
    from sprc_tpu.data.transforms import targetpad_transform
    from sprc_tpu.retrieval.metrics import compute_fiq_metrics
    from sprc_tpu.text.processors import CaptionProcessor, combine_fiq_captions

    tfm = targetpad_transform(args.target_ratio, model.cfg.image_size)
    proc = CaptionProcessor()
    out = {}
    for dress_type in args.dress_types:
        classic = FashionIQDataset(args.data_path, "val", [dress_type], "classic", tfm)
        index = engine.build_index(
            _index_stream(
                args, model, engine, classic, val_caches, f"fiq_{dress_type}"
            )
        )
        relative = FashionIQDataset(args.data_path, "val", [dress_type], "relative")
        refs, targets, captions = [], [], []
        for i in range(len(relative)):
            item = relative[i]
            refs.append(item["reference_name"])
            targets.append(item["target_name"])
            captions.append(proc(combine_fiq_captions(list(item["captions"]))[0]))
        sims = engine.score_queries(index, refs, captions)
        r10, r50 = compute_fiq_metrics(sims, index.names, targets)
        out[f"{dress_type}_recall_at10"] = r10
        out[f"{dress_type}_recall_at50"] = r50
    vals = list(out.values())
    out["average_recall"] = float(np.mean(vals))
    return out


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True, choices=["CIRR", "fashionIQ"])
    p.add_argument("--data-path", required=True)
    p.add_argument("--vocab-path", default=None, help="bert vocab.txt; defaults to the sprc_tpu cache (see utils/artifacts.py)")
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--model-name", default="blip2_cir_align_prompt")
    p.add_argument("--model-type", default="pretrain")
    p.add_argument("--model-path", default=None, help="initial weights (.pt or orbax)")
    p.add_argument("--resume", default=None, help="train-state dir to resume")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--num-epochs", type=int, default=50)
    p.add_argument("--schedule-epochs", type=int, default=80)
    p.add_argument("--learning-rate", type=float, default=1e-5)
    p.add_argument("--loss-rtc", type=float, default=0.4)
    p.add_argument("--loss-align", type=float, default=0.4)
    p.add_argument("--grad-accum", type=int, default=1)
    p.add_argument("--target-ratio", type=float, default=1.25)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--remat", action="store_true",
                   help="activation-checkpoint the ViT blocks (needed for "
                        "the reference b128 recipe on 16 GB chips when the "
                        "ViT is trainable; frozen-ViT runs skip the ViT "
                        "backward entirely and rarely need it)")
    p.add_argument("--cache-features", action="store_true",
                   help="precompute the frozen ViT tower outputs once (one "
                        "encode pass over the split's unique images) and "
                        "train the Q-Former from the cache — numerically "
                        "exact for the reference recipe (deterministic "
                        "transform + frozen tower) at a fraction of the "
                        "step time; see train/feature_cache.py")
    p.add_argument("--feature-cache-path", default=None,
                   help="save/load the feature cache here (default "
                        "<output-dir>/feature_cache)")
    p.add_argument("--skip-nonfinite", action="store_true", default=True,
                   help="skip (no-op) optimizer updates on NaN/Inf loss or "
                        "grads in-step, aborting after 10 consecutive skips "
                        "(the GradScaler-skip analogue; train/loop.py)")
    p.add_argument("--no-skip-nonfinite", dest="skip_nonfinite",
                   action="store_false")
    p.add_argument("--mesh", action="store_true")
    p.add_argument("--validate-every", type=int, default=1)
    p.add_argument("--encode-batch", type=int, default=64)
    p.add_argument("--query-batch", type=int, default=32)
    p.add_argument("--selection-metric", default="arithmetic_mean")
    p.add_argument("--dress-types", nargs="+", default=["dress", "shirt", "toptee"])
    return p


def main(argv: Optional[list] = None) -> None:
    finetune(make_parser().parse_args(argv))


if __name__ == "__main__":
    main()
