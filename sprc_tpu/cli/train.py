"""YAML-config train entry (the LAVIS ``train.py`` analogue).

Usage:
  python -m sprc_tpu.cli.train --cfg-path configs/runs/cirr_finetune.yaml \
      --data-path /data/cirr_dataset --vocab-path vocab.txt \
      --options run.learning_rate=2e-5 model.vit_model=clip_L

Resolves run/model sections through :mod:`sprc_tpu.config` (deep merge +
dotlist overrides, the OmegaConf pattern of the reference's train.py) and
drives the same fine-tune machinery as ``cli.finetune``.
"""

from __future__ import annotations

import argparse
from typing import Optional


def main(argv: Optional[list] = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cfg-path", required=True)
    parser.add_argument("--data-path", required=False, default=None,
                        help="dataset root (CIR runs; generic runs carry "
                             "paths in their datasets section)")
    parser.add_argument("--vocab-path", default=None)
    parser.add_argument("--output-dir", default="./output")
    parser.add_argument("--model-path", default=None)
    parser.add_argument("--resume", default=None)
    parser.add_argument("--mesh", action="store_true")
    parser.add_argument(
        "--options", nargs="*", default=[], help="dotlist overrides key=value"
    )
    args = parser.parse_args(argv)

    from sprc_tpu.cli.finetune import finetune, make_parser
    from sprc_tpu.config import Config

    cfg = Config(args.cfg_path, overrides=args.options)
    run = cfg.run
    model_cfg = cfg.model

    # generic (non-CIR) tasks route through the builder/adapter runner
    # (the reference's projects/* configs over RunnerBase; train/generic.py)
    from sprc_tpu.train.generic import TASK_ADAPTERS, run_generic

    if run.get("task") in TASK_ADAPTERS:
        best = run_generic(cfg, args)
        print({"task": run.get("task"), "best": best})
        return

    if args.data_path is None:
        parser.error("--data-path is required for CIR runs")

    # translate config sections into the finetune CLI's namespace
    ft = make_parser().parse_args(
        [
            "--dataset", str(run.get("dataset", "CIRR")),
            "--data-path", args.data_path,
            *(("--vocab-path", args.vocab_path) if args.vocab_path else ()),
        ]
    )
    ft.output_dir = args.output_dir
    ft.model_path = args.model_path
    ft.resume = args.resume
    ft.mesh = args.mesh
    ft.model_name = model_cfg.get("arch", "blip2_cir_align_prompt")
    ft.model_type = (
        "pretrain_vitL" if model_cfg.get("vit_model") == "clip_L" else "pretrain"
    )
    # every finetune flag is addressable from the run section by its argparse
    # dest — derived from the parser, so new flags need no mirroring here
    known = {a.dest for a in make_parser()._actions if a.dest != "help"}
    handled = {"dataset"}  # consumed above
    for key, value in run.items():
        if key in handled:
            continue
        if key in known:
            setattr(ft, key, value)
        else:
            import logging

            logging.getLogger(__name__).warning(
                "run.%s is not a finetune flag; ignored (known: %s)",
                key, ", ".join(sorted(known - handled)),
            )
    finetune(ft)


if __name__ == "__main__":
    main()
