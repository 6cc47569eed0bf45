"""Evaluate-only entry over YAML run configs (the LAVIS ``evaluate.py``).

Usage:
  python -m sprc_tpu.cli.evaluate --cfg-path configs/runs/eval/caption_coco_eval.yaml \
      [--model-path ckpt.pt|orbax-dir] [--vocab-path vocab.txt] \
      [--split test] [--options key=value ...]

Reference: ``evaluate.py`` builds the same task/model/datasets as train.py
and calls ``runner.evaluate(skip_reload=True)`` (runner_base.py:576-608);
each task's valid_step drives the model's generate/predict surface and
``after_evaluation`` reports metrics. CIR datasets keep their dedicated
CLIs (cli/validate.py, cli/validate_rerank.py, cli/submission.py).
"""

from __future__ import annotations

import argparse
import json
from typing import Optional


def evaluate(cfg, args) -> dict:
    import numpy as np

    import sprc_tpu.data.builders  # noqa: F401  (register builders)
    import sprc_tpu.data.processors  # noqa: F401  (register processors)
    import sprc_tpu.models  # noqa: F401  (register models)
    from sprc_tpu.loader import build_model
    from sprc_tpu.registry import registry
    from sprc_tpu.text.tokenizer import BertWordPieceTokenizer
    from sprc_tpu.train import eval_tasks
    from sprc_tpu.train.eval_glue import (
        GLUE_FACTORIES,
        collate_eval,
        eval_loader,
    )
    from sprc_tpu.utils.artifacts import ensure_bert_vocab

    run = dict(cfg.run)
    task_name = run.get("task")
    model_cfg = dict(cfg.model)
    arch = model_cfg.pop("arch")
    model_type = model_cfg.pop("model_type", "pretrain")
    if args.vocab_path and arch in ("pnp_vqa", "img2prompt_vqa"):
        model_cfg.setdefault("vocab_path", args.vocab_path)
    model = build_model(arch, model_type, **model_cfg)

    from sprc_tpu.models.pnp_vqa import PnpVqaPipeline

    if isinstance(model, PnpVqaPipeline):
        # composed pipelines carry their submodel params; released weights
        # load per-submodel via `finetuned: <path>` in each sub-section of
        # the model config (PnpVqaPipeline.from_config)
        assert not args.model_path, (
            "pnp pipelines load per-submodel checkpoints: put "
            "`finetuned: <path>` inside each model sub-section of the YAML "
            "instead of --model-path")
        params = None
    elif args.model_path:
        from sprc_tpu.interop.torch_import import load_checkpoint_auto

        params = load_checkpoint_auto(args.model_path, model)
    else:
        import jax
        import jax.numpy as jnp

        from sprc_tpu.loader import init_params
        from sprc_tpu.train.generic import TASK_ADAPTERS

        rng = jax.random.PRNGKey(int(run.get("seed", 42)))
        image_size = getattr(model.cfg, "image_size", 224)
        from sprc_tpu.models.clip import Clip

        from sprc_tpu.models.blip2_opt import Blip2OPT
        from sprc_tpu.models.blip2_t5 import Blip2T5

        if isinstance(model, (Blip2T5, Blip2OPT)):
            img = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
            ids = jnp.zeros((1, 4), jnp.int32)
            ones = jnp.ones((1, 4), jnp.int32)
            extra = (ids, ones) if isinstance(model, Blip2T5) else ()
            params = model.init(rng, img, ids, ones, *extra)["params"]
        elif arch.startswith("alpro"):  # video models: [B, T, H, W, 3]
            T = model.cfg.num_frames
            vid = jnp.zeros((1, T, image_size, image_size, 3), jnp.float32)
            ids = jnp.zeros((1, 4), jnp.int32)
            mask = jnp.ones((1, 4), jnp.int32)
            extra = (jnp.zeros((1,), jnp.int32),) if arch == "alpro_qa" else ()
            params = model.init(rng, vid, ids, mask, *extra)["params"]
        elif isinstance(model, Clip):  # (images, input_ids, eot_positions)
            ctx = int(getattr(model.cfg.text, "context_length", 77))
            params = model.init(
                rng,
                jnp.zeros((1, image_size, image_size, 3), jnp.float32),
                jnp.zeros((1, ctx), jnp.int32), jnp.zeros((1,), jnp.int32),
            )["params"]
        elif task_name == "retrieval" and hasattr(
                model, "extract_target_features"):
            # BLIP-2 stage-1 (ITC+ITM+LM forward with hard-neg sampling)
            params = model.init(
                {"params": rng, "sample": jax.random.PRNGKey(1)},
                jnp.zeros((1, image_size, image_size, 3), jnp.float32),
                jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
            )["params"]
        else:
            # family-specific init through the task adapter when it has one
            adapter_cls = TASK_ADAPTERS.get(task_name)
            adapter = None
            if adapter_cls is not None:
                tokenizer0 = BertWordPieceTokenizer.from_vocab_file(
                    ensure_bert_vocab(args.vocab_path))
                adapter = adapter_cls(
                    tokenizer0, max_txt_len=int(run.get("max_txt_len", 35)))
                if hasattr(adapter, "specialize"):
                    adapter = adapter.specialize(model)
            if adapter is not None and hasattr(adapter, "init_params"):
                params = adapter.init_params(model, rng, image_size)
            else:
                try:
                    params = model.init(
                        rng, *type(adapter).example_init(image_size))["params"]
                except (AttributeError, TypeError):
                    params = init_params(model)

    datasets_cfg = dict(cfg.datasets or {})
    assert len(datasets_cfg) == 1, "one dataset builder per eval config"
    (ds_name, ds_cfg), = datasets_cfg.items()
    datasets = registry.get("dataset", ds_name)(dict(ds_cfg)).build()
    splits = run.get("test_splits") or run.get("valid_splits") or ["val"]
    split = args.split or splits[0]
    assert split in datasets, (
        f"builder '{ds_name}' produced splits {sorted(datasets)}; "
        f"'{split}' not among them")
    ds = datasets[split]

    tokenizer = BertWordPieceTokenizer.from_vocab_file(
        ensure_bert_vocab(args.vocab_path))
    batch_size = int(run.get("batch_size_eval", run.get("batch_size", 8)))

    if task_name == "retrieval":
        # feature-matrix path (reference tasks/retrieval.py): no valid_step
        from sprc_tpu.train.tasks import ImageTextRetrievalTask

        def _image_stream(chunk: int = 64):
            # stream gallery pixels (a COCO test split would be ~8 GB fully
            # materialized); the eval paths keep only the encoded features
            for s in range(0, len(ds), chunk):
                yield np.stack([
                    np.asarray(ds[i]["image"], np.float32)
                    for i in range(s, min(s + chunk, len(ds)))])

        images = _image_stream()
        task = ImageTextRetrievalTask(
            tokenizer, k_test=int(run.get("k_test", 128)),
            max_txt_len=int(run.get("max_txt_len", 35)))
        from sprc_tpu.models.clip import Clip as _Clip

        if isinstance(model, _Clip):  # cosine-only protocol
            tok_path = run.get("clip_tokenizer_json")
            tokenize = None
            if tok_path:
                from sprc_tpu.text.llm_tokenizers import (
                    clip_tokenize,
                    clip_tokenizer,
                )

                bpe = clip_tokenizer(tok_path)
                ctx = int(getattr(model.cfg.text, "context_length", 77))
                tokenize = lambda t: clip_tokenize(bpe, t, ctx)  # noqa: E731
            metrics = task.evaluate_pairs_clip(
                model, params, images, ds.text, ds.img2txt, ds.txt2img,
                tokenize=tokenize)
        elif hasattr(model, "vtm_score"):  # ALPRO video-text
            metrics = task.evaluate_pairs_video(
                model, params, images, ds.text, ds.img2txt, ds.txt2img)
        elif hasattr(model, "extract_target_features"):  # BLIP-2 family
            metrics = task.evaluate_pairs(
                model, params, images, ds.text, ds.img2txt, ds.txt2img)
        else:  # BLIP-1 / ALBEF: ITC sims + ITM rescore
            metrics = task.evaluate_pairs_itc(
                model, params, images, ds.text, ds.img2txt, ds.txt2img)
        metrics["agg_metrics"] = metrics["r_mean"]
        return metrics

    def _llm_tokenizer(default):
        """run.tokenizer={t5|opt|llama: tokenizer.json} -> LLM tokenizer."""
        tok_cfg = run.get("tokenizer")
        if not isinstance(tok_cfg, dict):
            return default
        from sprc_tpu.text.llm_tokenizers import (
            llama_tokenizer,
            opt_tokenizer,
            t5_tokenizer,
        )

        (kind, tok_path), = tok_cfg.items()
        return {"t5": t5_tokenizer, "opt": opt_tokenizer,
                "llama": llama_tokenizer}[kind](tok_path)

    task_kw = {}
    if task_name == "captioning":
        task = eval_tasks.CaptionTask(
            num_beams=int(run.get("num_beams", 3)),
            max_len=int(run.get("max_len", 30)),
            min_len=int(run.get("min_len", 10)),
            report_metric=bool(run.get("report_metric", True)),
            output_dir=args.output_dir)
        glue = GLUE_FACTORIES[task_name](
            model, params, _llm_tokenizer(tokenizer),
            prompt=run.get("prompt", "a picture of "))
        # ground truth for CIDEr/Bleu when the annotations carry captions
        gt = {}
        for ann in getattr(ds, "annotation", []):
            if "caption" in ann and "image_id" in ann:
                caps = ann["caption"]
                gt.setdefault(int(ann["image_id"]), []).extend(
                    [caps] if isinstance(caps, str) else list(caps))
        task_kw["ground_truth"] = gt or None
    elif task_name in ("vqa", "gqa", "aok_vqa"):
        cls = {"vqa": eval_tasks.VQATask, "gqa": eval_tasks.GQATask,
               "aok_vqa": eval_tasks.AOKVQATask}[task_name]
        annotations = {
            ann.get("question_id", ann.get("instance_id")): {
                "answers": ann.get("answers", ann.get("answer", [])),
                "question_type": ann.get("question_type", ""),
                "answer_type": ann.get("answer_type", ""),
            }
            for ann in getattr(ds, "annotation", [])
            if "answers" in ann or "answer" in ann
        }
        answer_list = run.get("answer_list")
        task = cls(
            num_beams=int(run.get("num_beams", 3)),
            max_len=int(run.get("max_len", 10)),
            min_len=int(run.get("min_len", 1)),
            num_ans_candidates=int(run.get("num_ans_candidates", 128)),
            inference_method=run.get("inference_method", "rank"),
            prompt=run.get("prompt", ""),
            answer_list=answer_list,
            annotations=annotations,
            output_dir=args.output_dir)
        if isinstance(model, PnpVqaPipeline):
            # PNP-VQA / Img2Prompt: gradcam-localized captions -> FiD reader
            # (reference pnp_vqa.py predict_answers via
            # projects/pnp-vqa/eval/*.yaml)
            def glue(samples, *, max_len=10, min_len=1, **kw):
                answers, _, _ = model.predict_answers(
                    np.asarray(samples["image"]),
                    list(samples["text_input"]),
                    num_captions=int(run.get("num_captions", 50)),
                    num_captions_fid=int(run.get("num_captions_fid", 1)),
                    num_patches=int(run.get("num_patches", 20)),
                    block_num=int(run.get("block_num", 7)),
                    max_len=max_len, min_len=min_len,
                )
                return answers
        elif hasattr(model, "generate_ids") and not hasattr(
                model, "rank_answers"):
            # BLIP-2 LLM heads: zero-shot generative VQA. For real runs pass
            # the LLM's tokenizer via run.tokenizer={t5|opt: tokenizer.json}
            from sprc_tpu.train.eval_glue import make_blip2_vqa_predict_fn

            glue = make_blip2_vqa_predict_fn(
                model, params, _llm_tokenizer(tokenizer))
        else:
            glue = GLUE_FACTORIES[task_name](model, params, tokenizer)
    elif task_name == "multimodal_classification":
        task = eval_tasks.MultimodalClassificationTask(
            output_dir=args.output_dir)
        if not hasattr(model, "predict"):  # CLIP zero-shot protocol
            from sprc_tpu.models.clip_zero_shot import (
                make_zero_shot_predict_fn,
                zero_shot_classifier,
            )
            from sprc_tpu.text.llm_tokenizers import (
                clip_tokenize,
                clip_tokenizer,
            )

            classnames = run.get("classnames")
            if classnames is None and run.get("classnames_path"):
                classnames = [
                    line.strip()
                    for line in open(run["classnames_path"])
                    if line.strip()]
            if classnames is None:
                # fallback: derive from labels. Columns must align with the
                # integer targets, so labels must be exactly 0..C-1 —
                # anything else needs an explicit classnames list.
                labels = sorted(
                    {ann["label"] for ann in getattr(ds, "annotation", [])})
                assert labels == list(range(len(labels))), (
                    "zero-shot eval needs run.classnames or "
                    "run.classnames_path (labels are not a dense 0..C-1 "
                    "integer range, so column order cannot be derived)")
                classnames = [str(label) for label in labels]
            assert classnames, "zero-shot eval needs run.classnames[_path]"
            ctx = int(getattr(model.cfg.text, "context_length", 77))
            if run.get("clip_tokenizer_json"):
                tok = clip_tokenizer(run["clip_tokenizer_json"])
            else:  # wordpiece fallback (synthetic / smoke runs)
                tok = tokenizer
            clf = zero_shot_classifier(
                model, params, classnames,
                lambda texts: clip_tokenize(tok, texts, ctx))
            glue = make_zero_shot_predict_fn(model, params, clf)
        else:
            glue = GLUE_FACTORIES[task_name](
                model, params, tokenizer,
                max_txt_len=int(run.get("max_txt_len", 35)))
    elif task_name == "dialogue":
        # per-batch LM loss (reference tasks/dialogue.py:20-66)
        import jax

        from sprc_tpu.train.generic import DialogueAdapter

        task = eval_tasks.DialogueTask()
        adapter = DialogueAdapter()
        adapter.attach(ds)
        apply_fn = adapter.loss_fn(model)
        rng0 = jax.random.PRNGKey(0)

        def glue(samples):
            return float(apply_fn(params, samples, rng0)["loss"])
    else:
        raise ValueError(
            f"task '{task_name}' has no evaluate-only path here "
            f"(supported: retrieval, captioning, vqa, gqa, aok_vqa, "
            f"multimodal_classification, dialogue; CIR -> cli/validate.py)")

    collate = adapter.collate if task_name == "dialogue" else collate_eval
    results = []
    for idx, items in eval_loader(ds, batch_size):
        if task_name == "dialogue":
            # the dialogue metric is a per-batch scalar loss: padded
            # duplicates cannot be dropped afterwards, so feed the real
            # items (one extra compile for the final partial batch)
            items = items[: len(idx)]
        samples = collate(items)
        if task_name != "dialogue" and "instance_id" not in samples:
            samples["instance_id"] = [str(i) for i in range(
                idx[0], idx[0] + len(items))]
        if (task_name == "multimodal_classification"
                and "label" not in samples and "answers" in samples):
            # video-QA-as-classification (reference alpro msrvtt/msvd_qa):
            # targets index into the closed answer vocabulary
            answer_list = list(run.get("answer_list") or [])
            assert answer_list, (
                "QA-as-classification eval needs run.answer_list")
            samples["label"] = [
                answer_list.index(a[0]) if a and a[0] in answer_list else -1
                for a in samples["answers"]]
        rows = task.valid_step(glue, samples)
        results.extend(rows[: len(idx)])  # drop final-batch padding
    return task.after_evaluation(results, split, **task_kw)


def main(argv: Optional[list] = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cfg-path", required=True)
    parser.add_argument("--model-path", default=None)
    parser.add_argument("--vocab-path", default=None)
    parser.add_argument("--output-dir", default="./output")
    parser.add_argument("--split", default=None,
                        help="dataset split (default: run.test_splits[0])")
    parser.add_argument("--options", nargs="*", default=[],
                        help="dotlist overrides key=value")
    args = parser.parse_args(argv)

    from sprc_tpu.config import Config

    cfg = Config(args.cfg_path, overrides=args.options)
    metrics = evaluate(cfg, args)
    print(json.dumps({k: v for k, v in metrics.items()
                      if isinstance(v, (int, float, str))}))


if __name__ == "__main__":
    main()
