"""CIRR test submission CLI — mirrors the reference ``cirr_test_submission.py``.

Usage:
  python -m sprc_tpu.cli.submission --data-path /data/cirr_dataset \
      --model-path sprc_cirr.pt --vocab-path vocab.txt \
      --submission-name sprc_tpu [--rerank] [--rerank-model-path rerank.pt]
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np


def generate_submission(args) -> tuple[str, str]:
    from sprc_tpu.cli.validate import build_engine, index_batches
    from sprc_tpu.data.datasets import CIRRDataset
    from sprc_tpu.data.transforms import targetpad_transform
    from sprc_tpu.retrieval.rerank import ItmRerankScorer, rerank_rankings
    from sprc_tpu.retrieval.submission import (
        build_submission_dicts,
        write_submission_files,
    )
    from sprc_tpu.text.processors import CaptionProcessor

    mesh = None
    if args.mesh:
        from sprc_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    model, engine = build_engine(args, mesh)
    tfm = targetpad_transform(args.target_ratio, model.cfg.image_size)

    classic = CIRRDataset(args.data_path, "test1", "classic", tfm)
    index = engine.build_index(index_batches(classic, args.encode_batch, args.workers))

    relative = CIRRDataset(args.data_path, "test1", "relative")
    proc = CaptionProcessor()
    pair_ids, refs, captions, groups = [], [], [], []
    for i in range(len(relative)):
        item = relative[i]
        pair_ids.append(item["pair_id"])
        refs.append(item["reference_name"])
        captions.append(proc(item["caption"]))
        groups.append(item["group_members"])

    sims = engine.score_queries(index, refs, captions)

    rerank_fn = None
    if args.rerank:
        rerank_model, rerank_params = _load_rerank_model(args, mesh)
        scorer = ItmRerankScorer(
            rerank_model,
            rerank_params,
            engine.tokenizer,
            top=args.rerank_top,
            step=args.rerank_step,
        )

        def rerank_fn(sorted_names):
            from sprc_tpu.retrieval.rerank import rerank_rankings

            return rerank_rankings(
                sorted_names,
                refs,
                captions,
                scorer,
                index.reference_embeds,
                top=args.rerank_top,
                step=args.rerank_step,
            )

    predictions, group_predictions = build_submission_dicts(
        sims, index.names, refs, groups, pair_ids, rerank_fn=rerank_fn
    )
    return write_submission_files(
        args.output_dir, args.submission_name, predictions, group_predictions
    )


def generate_circo_submission(args) -> str:
    """CIRCO test-split submission: score every test query against the
    COCO-unlabeled gallery and write ``circo_submission_<name>.json``
    ({query_id: top-50 img ids} — the CIRCO server format). Beyond the
    reference, which never wires CIRCO (data_utils.py:289-426)."""
    from sprc_tpu.cli.validate import build_engine
    from sprc_tpu.data.datasets import CIRCODataset
    from sprc_tpu.data.transforms import targetpad_transform
    from sprc_tpu.retrieval.rerank import ItmRerankScorer, rerank_rankings
    from sprc_tpu.retrieval.submission import (
        build_circo_submission,
        write_circo_submission,
    )
    from sprc_tpu.text.processors import CaptionProcessor

    mesh = None
    if args.mesh:
        from sprc_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    model, engine = build_engine(args, mesh)
    tfm = targetpad_transform(args.target_ratio, model.cfg.image_size)

    classic = CIRCODataset(args.data_path, "test", "classic", tfm)

    def circo_batches():
        from sprc_tpu.data.loader import DataLoader

        loader = DataLoader(
            classic, batch_size=args.encode_batch, num_workers=args.workers)
        for batch in loader:
            yield batch["img_id"], batch["image"].astype(np.float32)

    index = engine.build_index(circo_batches())

    relative = CIRCODataset(args.data_path, "test", "relative", load_images=False)
    proc = CaptionProcessor()
    query_ids, refs, captions = [], [], []
    for i in range(len(relative)):
        item = relative[i]
        query_ids.append(item["query_id"])
        refs.append(item["reference_img_id"])
        captions.append(proc(item["relative_caption"]))

    sims = engine.score_queries(index, refs, captions)

    rerank_fn = None
    if args.rerank:
        rerank_model, rerank_params = _load_rerank_model(args, mesh)
        scorer = ItmRerankScorer(
            rerank_model,
            rerank_params,
            engine.tokenizer,
            top=args.rerank_top,
            step=args.rerank_step,
        )

        def rerank_fn(sorted_ids):
            return rerank_rankings(
                sorted_ids,
                refs,
                captions,
                scorer,
                index.reference_embeds,
                top=args.rerank_top,
                step=args.rerank_step,
            )

    predictions = build_circo_submission(
        sims, index.names, query_ids, rerank_fn=rerank_fn
    )
    return write_circo_submission(
        args.output_dir, args.submission_name, predictions
    )


def _load_rerank_model(args, mesh):
    """The rerank stage uses the dedicated ITM model (blip2_cir_rerank) when
    a separate checkpoint is given, else the retrieval model itself."""
    if not args.rerank_model_path:
        from sprc_tpu.cli.validate import build_engine

        model, engine = build_engine(args, mesh)
        return model, engine.params
    import jax.numpy as jnp

    from sprc_tpu.cli.validate import parse_model_overrides
    from sprc_tpu.loader import load_model

    overrides = parse_model_overrides(getattr(args, "model_overrides", []))
    overrides.setdefault(
        "vit_dtype", jnp.bfloat16 if args.bf16 else jnp.float32)
    model, params = load_model(
        args.rerank_model_name,
        args.model_type,
        checkpoint_path=args.rerank_model_path,
        **overrides,
    )
    return model, params


def make_parser() -> argparse.ArgumentParser:
    from sprc_tpu.cli.validate import make_parser as base_parser

    p = base_parser()
    # submission-specific knobs (--dataset CIRR -> test1 recall JSONs,
    # --dataset CIRCO -> test mAP-server JSON)
    p.set_defaults(dataset="CIRR")
    p.add_argument("--submission-name", required=True)
    p.add_argument("--output-dir", default="submission/CIRR")
    p.add_argument("--rerank", action="store_true")
    p.add_argument("--rerank-model-name", default="blip2_cir_rerank")
    p.add_argument("--rerank-model-path", default=None)
    p.add_argument("--rerank-top", type=int, default=50)
    p.add_argument("--rerank-step", type=int, default=50)
    return p


def main(argv: Optional[list] = None) -> None:
    args = make_parser().parse_args(argv)
    if args.dataset == "CIRCO":
        print(f"wrote {generate_circo_submission(args)}")
        return
    p1, p2 = generate_submission(args)
    print(f"wrote {p1}\nwrote {p2}")


if __name__ == "__main__":
    main()
