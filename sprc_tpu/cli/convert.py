"""Checkpoint conversion CLI: torch ``.pt`` <-> orbax, both directions.

The reference ecosystem's artifacts are torch ``state_dict`` files (released
``sprc_cirr.pt``/``sprc_fiq.pt``, stage-1 ``blip2_pretrained.pth``, tower
weights — reference utils.py:208-222, base_model.py:81-102); this framework
trains/serves from orbax pytrees. Convert either way so users can move
between the two stacks freely:

  # torch -> orbax (auto-detects the artifact format, interop/torch_import)
  python -m sprc_tpu.cli.convert --model-name blip2_cir_align_prompt \
      --input sprc_cirr.pt --output /ckpts/sprc_cirr_orbax

  # orbax -> torch state_dict keyed like the reference save_model
  python -m sprc_tpu.cli.convert --model-name blip2_cir_align_prompt \
      --input /ckpts/run/last_state --output sprc_cirr_export.pt

Direction is inferred from the paths (an orbax checkpoint is a directory; a
torch file ends in .pt/.pth) unless --to is given.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional


def _is_orbax(path: str) -> bool:
    return os.path.isdir(path)


def convert(args) -> None:
    import jax.numpy as jnp

    from sprc_tpu.loader import build_model, init_params

    model = build_model(
        args.model_name, args.model_type,
        vit_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    to = args.to
    if to is None:
        to = "torch" if args.output.endswith((".pt", ".pth")) else "orbax"

    if to == "orbax":
        from sprc_tpu.interop.torch_import import load_checkpoint_auto
        from sprc_tpu.train.checkpoint import save_params

        params = load_checkpoint_auto(args.input, model)
        save_params(os.path.abspath(args.output), params)
        print(f"wrote orbax params to {args.output}")
    else:
        import numpy as np

        from sprc_tpu.interop.torch_export import params_to_torch_state_dict
        from sprc_tpu.train.checkpoint import restore_params, restore_state
        from sprc_tpu.train.loop import TrainConfig, create_train_state

        path = args.input
        if os.path.isdir(os.path.join(path, "params")):
            params = restore_params(path)
        else:
            try:
                params = restore_params(path)
            except Exception:
                # a full train-state dir (finetune's last_state): restore
                # against a template and take .params
                template, _ = create_train_state(
                    init_params(model), TrainConfig()
                )
                params = restore_state(path, template).params
        sd = params_to_torch_state_dict(params, model)
        try:
            import torch

            torch.save(
                {model.__class__.__name__: {
                    k: torch.from_numpy(np.asarray(v, np.float32))
                    for k, v in sd.items()
                }},
                args.output,
            )
        except ImportError:
            np.savez(args.output + ".npz", **{k: np.asarray(v) for k, v in sd.items()})
            print("torch unavailable; wrote .npz with torch-keyed arrays")
            return
        print(
            f"wrote torch checkpoint ({len(sd)} tensors, key "
            f"{model.__class__.__name__!r}) to {args.output}"
        )


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-name", default="blip2_cir_align_prompt")
    p.add_argument("--model-type", default="pretrain")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--to", choices=["orbax", "torch"], default=None,
                   help="target format (default: inferred from --output)")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    return p


def main(argv: Optional[list] = None) -> None:
    convert(make_parser().parse_args(argv))


if __name__ == "__main__":
    main()
