"""Two-stage retrieve -> rerank validation CLI.

Mirrors the reference ``validate_blip_rerank.py``: stage-1 ranking with the
retrieval model, then ITM reranking of each query's top-K (CIRR: top=200
step=15; FashionIQ: top=40 step=40, reference :48-71,197-221), then the
usual metric suites. The dead CLIP4Cir combiner path of the reference's
``main()`` (broken imports, :8,17) is intentionally not reproduced.

Usage:
  python -m sprc_tpu.cli.validate_rerank --dataset CIRR --data-path ... \
      --model-path sprc_cirr.pt --rerank-model-path rerank.pt --vocab-path vocab.txt
"""

from __future__ import annotations

import argparse
import json
from typing import Optional

import numpy as np


def validate_rerank_cirr(args, mesh=None) -> dict:
    from sprc_tpu.cli.validate import build_engine, index_batches
    from sprc_tpu.cli.submission import _load_rerank_model
    from sprc_tpu.data.datasets import CIRRDataset
    from sprc_tpu.data.transforms import targetpad_transform
    from sprc_tpu.retrieval.metrics import (
        drop_reference,
        recall_at,
        sort_gallery,
    )
    from sprc_tpu.retrieval.rerank import ItmRerankScorer, rerank_rankings
    from sprc_tpu.text.processors import CaptionProcessor

    model, engine = build_engine(args, mesh)
    tfm = targetpad_transform(args.target_ratio, model.cfg.image_size)
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

    # the val path drops the reference BEFORE reranking
    # (validate_blip_rerank.py:189-196)
    sorted_names = sort_gallery(sims, index.names)
    sorted_names = drop_reference(sorted_names, refs)

    rerank_model, rerank_params = _load_rerank_model(args, mesh)
    scorer = ItmRerankScorer(
        rerank_model, rerank_params, engine.tokenizer,
        top=args.rerank_top, step=args.rerank_step,
    )
    sorted_names = rerank_rankings(
        sorted_names, refs, captions, scorer, index.reference_embeds,
        top=args.rerank_top, step=args.rerank_step,
    )

    labels = sorted_names == np.asarray(targets)[:, None]
    groups_arr = np.asarray(groups)
    group_mask = (sorted_names[..., None] == groups_arr[:, None, :]).sum(-1).astype(bool)
    group_labels = labels[group_mask].reshape(labels.shape[0], -1)
    return {
        "group_recall_at1": recall_at(group_labels, 1),
        "group_recall_at2": recall_at(group_labels, 2),
        "group_recall_at3": recall_at(group_labels, 3),
        "recall_at1": recall_at(labels, 1),
        "recall_at5": recall_at(labels, 5),
        "recall_at10": recall_at(labels, 10),
        "recall_at50": recall_at(labels, 50),
    }


def validate_rerank_fiq(args, mesh=None) -> dict:
    from sprc_tpu.cli.validate import build_engine, index_batches
    from sprc_tpu.cli.submission import _load_rerank_model
    from sprc_tpu.data.datasets import FashionIQDataset
    from sprc_tpu.data.transforms import targetpad_transform
    from sprc_tpu.retrieval.metrics import recall_at, sort_gallery
    from sprc_tpu.retrieval.rerank import ItmRerankScorer, rerank_rankings
    from sprc_tpu.text.processors import CaptionProcessor, combine_fiq_captions

    model, engine = build_engine(args, mesh)
    tfm = targetpad_transform(args.target_ratio, model.cfg.image_size)
    rerank_model, rerank_params = _load_rerank_model(args, mesh)
    scorer = ItmRerankScorer(
        rerank_model, rerank_params, engine.tokenizer,
        top=args.rerank_top, step=args.rerank_step,
    )
    proc = CaptionProcessor()
    out = {}
    for dress_type in args.dress_types:
        classic = FashionIQDataset(args.data_path, "val", [dress_type], "classic", tfm)
        index = engine.build_index(index_batches(classic, args.encode_batch, args.workers))
        relative = FashionIQDataset(args.data_path, "val", [dress_type], "relative")
        refs, targets, captions = [], [], []
        for i in range(len(relative)):
            item = relative[i]
            refs.append(item["reference_name"])
            targets.append(item["target_name"])
            captions.append(proc(combine_fiq_captions(list(item["captions"]))[0]))
        sims = engine.score_queries(index, refs, captions)
        sorted_names = sort_gallery(sims, index.names)
        sorted_names = rerank_rankings(
            sorted_names, refs, captions, scorer, index.reference_embeds,
            top=args.rerank_top, step=args.rerank_step,
        )
        labels = sorted_names == np.asarray(targets)[:, None]
        out[f"{dress_type}_recall_at10"] = recall_at(labels, 10)
        out[f"{dress_type}_recall_at50"] = recall_at(labels, 50)
    out["average_recall"] = float(np.mean(list(out.values())))
    return out


def make_parser() -> argparse.ArgumentParser:
    from sprc_tpu.cli.validate import make_parser as base_parser

    p = base_parser()
    p.add_argument("--rerank-model-name", default="blip2_cir_rerank")
    p.add_argument("--rerank-model-path", default=None)
    # reference defaults: CIRR top=200 step=15 (:199-200); FiQ top=40 step=40 (:50-51)
    p.add_argument("--rerank-top", type=int, default=None)
    p.add_argument("--rerank-step", type=int, default=None)
    return p


def main(argv: Optional[list] = None) -> None:
    args = make_parser().parse_args(argv)
    if args.rerank_top is None:
        args.rerank_top = 200 if args.dataset == "CIRR" else 40
    if args.rerank_step is None:
        args.rerank_step = 15 if args.dataset == "CIRR" else 40
    mesh = None
    if args.mesh:
        from sprc_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if args.dataset == "CIRR":
        results = validate_rerank_cirr(args, mesh)
    else:
        results = validate_rerank_fiq(args, mesh)
    print(json.dumps(results, indent=4))


if __name__ == "__main__":
    main()
