"""Checkpoint validation CLI — mirrors the reference ``blip_validate.py``.

Usage:
  python -m sprc_tpu.cli.validate --dataset CIRR --data-path /data/cirr_dataset \
      --model-path sprc_cirr.pt --vocab-path vocab.txt [--model-type pretrain]

Loads a checkpoint (torch ``.pt`` or orbax dir), builds the gallery index
with the sharded engine, scores all validation queries, and prints the
metric suite as JSON (reference blip_validate.py:103-137 plus the summary
dict of blip_fine_tune_2.py:330-343).
"""

from __future__ import annotations

import argparse
import json
from typing import Optional

import numpy as np


def parse_model_overrides(pairs) -> dict:
    """``key=value`` config overrides with YAML-parsed values — the
    reference's OmegaConf dotlist (common/config.py:27-41,114-126). Nested
    dataclass fields take inline-YAML dicts, e.g.
    ``'vit_config_override={width: 32, depth: 2, ...}'``."""
    import yaml

    out = {}
    for pair in pairs or []:
        key, sep, value = pair.partition("=")
        if not sep or not key:
            raise ValueError(f"--model-overrides entry {pair!r} is not key=value")
        out[key] = yaml.safe_load(value)
    return out


def build_engine(args, mesh=None):
    import jax.numpy as jnp

    from sprc_tpu.loader import load_model
    from sprc_tpu.retrieval.engine import RetrievalEngine
    from sprc_tpu.text.tokenizer import BertWordPieceTokenizer

    overrides = parse_model_overrides(getattr(args, "model_overrides", []))
    overrides.setdefault(
        "vit_dtype", jnp.bfloat16 if args.bf16 else jnp.float32)
    model, params = load_model(
        args.model_name,
        args.model_type,
        checkpoint_path=args.model_path,
        **overrides,
    )
    from sprc_tpu.utils.artifacts import ensure_bert_vocab

    tokenizer = BertWordPieceTokenizer.from_vocab_file(
        ensure_bert_vocab(args.vocab_path)
    )
    engine = RetrievalEngine(
        model,
        params,
        tokenizer,
        mesh=mesh,
        encode_batch=args.encode_batch,
        query_batch=args.query_batch,
    )
    return model, engine


def index_batches(dataset, batch_size: int, num_workers: int = 4):
    """Stream (names, images) batches from a classic-mode dataset."""
    from sprc_tpu.data.loader import DataLoader

    loader = DataLoader(dataset, batch_size=batch_size, num_workers=num_workers)
    for batch in loader:
        yield batch["image_name"], batch["image"].astype(np.float32)


def validate_cirr(args, mesh=None) -> dict:
    from sprc_tpu.data.datasets import CIRRDataset
    from sprc_tpu.data.transforms import targetpad_transform, squarepad_transform
    from sprc_tpu.retrieval.metrics import compute_cirr_metrics
    from sprc_tpu.text.processors import CaptionProcessor

    model, engine = build_engine(args, mesh)
    if args.transform == "targetpad":
        tfm = targetpad_transform(args.target_ratio, model.cfg.image_size)
    else:
        tfm = squarepad_transform(model.cfg.image_size)

    classic = CIRRDataset(args.data_path, "val", "classic", tfm)
    index = engine.build_index(index_batches(classic, args.encode_batch, args.workers))

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
    results = compute_cirr_metrics(sims, index.names, refs, targets, groups)
    return results


def validate_fiq(args, mesh=None) -> dict:
    from sprc_tpu.data.datasets import FashionIQDataset
    from sprc_tpu.data.transforms import targetpad_transform, squarepad_transform
    from sprc_tpu.retrieval.metrics import compute_fiq_metrics
    from sprc_tpu.text.processors import CaptionProcessor, combine_fiq_captions

    model, engine = build_engine(args, mesh)
    if args.transform == "targetpad":
        tfm = targetpad_transform(args.target_ratio, model.cfg.image_size)
    else:
        tfm = squarepad_transform(model.cfg.image_size)

    proc = CaptionProcessor()
    results = {}
    recalls = []
    for dress_type in args.dress_types:
        classic = FashionIQDataset(args.data_path, "val", [dress_type], "classic", tfm)
        index = engine.build_index(index_batches(classic, args.encode_batch, args.workers))

        relative = FashionIQDataset(args.data_path, "val", [dress_type], "relative")
        refs, targets, captions = [], [], []
        for i in range(len(relative)):
            item = relative[i]
            refs.append(item["reference_name"])
            targets.append(item["target_name"])
            flat = [c for c in item["captions"]]
            captions.append(proc(combine_fiq_captions(flat)[0]))

        sims = engine.score_queries(index, refs, captions)
        r10, r50 = compute_fiq_metrics(sims, index.names, targets)
        results[f"{dress_type}_recall_at10"] = r10
        results[f"{dress_type}_recall_at50"] = r50
        recalls.extend([r10, r50])
    results["average_recall_at10"] = float(
        np.mean([v for k, v in results.items() if "at10" in k])
    )
    results["average_recall_at50"] = float(
        np.mean([v for k, v in results.items() if "at50" in k])
    )
    results["average_recall"] = float(np.mean(recalls))
    return results


def validate_circo(args, mesh=None) -> dict:
    """CIRCO val mAP@K (the eval the reference leaves unwired)."""
    from sprc_tpu.data.datasets import CIRCODataset
    from sprc_tpu.data.transforms import targetpad_transform, squarepad_transform
    from sprc_tpu.retrieval.metrics import compute_circo_metrics
    from sprc_tpu.text.processors import CaptionProcessor

    model, engine = build_engine(args, mesh)
    if args.transform == "targetpad":
        tfm = targetpad_transform(args.target_ratio, model.cfg.image_size)
    else:
        tfm = squarepad_transform(model.cfg.image_size)

    classic = CIRCODataset(args.data_path, "val", "classic", tfm)

    def circo_batches():
        from sprc_tpu.data.loader import DataLoader

        loader = DataLoader(classic, batch_size=args.encode_batch, num_workers=args.workers)
        for batch in loader:
            yield batch["img_id"], batch["image"].astype(np.float32)

    index = engine.build_index(circo_batches())

    relative = CIRCODataset(args.data_path, "val", "relative", load_images=False)
    proc = CaptionProcessor()
    refs, captions, gts = [], [], []
    for i in range(len(relative)):
        item = relative[i]
        refs.append(item["reference_img_id"])
        captions.append(proc(item["relative_caption"]))
        gts.append(item["gt_img_ids"])

    sims = engine.score_queries(index, refs, captions)
    return compute_circo_metrics(sims, index.names, gts)


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True, choices=["CIRR", "fashionIQ", "CIRCO"])
    p.add_argument("--data-path", required=True)
    p.add_argument("--model-path", default=None)
    p.add_argument("--model-name", default="blip2_cir_align_prompt")
    p.add_argument("--model-type", default="pretrain")
    p.add_argument("--vocab-path", default=None, help="bert vocab.txt; defaults to the sprc_tpu cache (see utils/artifacts.py)")
    p.add_argument("--transform", default="targetpad", choices=["targetpad", "squarepad"])
    p.add_argument("--target-ratio", type=float, default=1.25)
    p.add_argument("--encode-batch", type=int, default=64)
    p.add_argument("--query-batch", type=int, default=32)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument(
        "--dress-types", nargs="+", default=["dress", "shirt", "toptee"]
    )
    p.add_argument("--mesh", action="store_true", help="shard gallery over all devices")
    p.add_argument(
        "--model-overrides", nargs="*", default=[], metavar="KEY=YAML",
        help="model-config overrides as key=value with YAML-parsed values "
             "(the reference's OmegaConf dotlist); applies to the rerank "
             "model too in the two-stage CLIs",
    )
    return p


def main(argv: Optional[list] = None) -> None:
    args = make_parser().parse_args(argv)
    mesh = None
    if args.mesh:
        from sprc_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if args.dataset == "CIRR":
        results = validate_cirr(args, mesh)
    elif args.dataset == "CIRCO":
        results = validate_circo(args, mesh)
    else:
        results = validate_fiq(args, mesh)
    print(json.dumps(results, indent=4))


if __name__ == "__main__":
    main()
