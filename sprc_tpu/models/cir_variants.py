"""Ablation-variant registry slots for the CIR model zoo.

The reference ships ~10 sibling variants of the flagship model (SURVEY.md
§2.2; reference src/lavis/models/blip2_models/blip2_qformer_cir_*.py).
They are implemented incrementally here; every registry name exists from the
start so configs resolve, and unimplemented ones raise a clear error.
"""

from __future__ import annotations

from sprc_tpu.registry import registry


def _placeholder(name: str, ref_file: str):
    class _NotYetImplemented:
        REGISTRY_NAME = name
        REFERENCE = ref_file

        def __init__(self, *a, **k):
            raise NotImplementedError(
                f"model '{name}' (reference {ref_file}) is not implemented yet"
            )

    _NotYetImplemented.__name__ = f"Placeholder_{name}"
    return registry.register_model(name)(_NotYetImplemented)


for _name, _ref in [
    ("blip2_cir_cat", "blip2_qformer_cir_cat.py"),
    ("blip2_cir_rerank", "blip2_qformer_cir_rerank.py"),
    ("blip2_cir_full", "blip2_qformer_cir_full.py"),
    ("blip2_cir_neg", "blip2_qformer_cir_neg.py"),
    ("blip2_cir_neg_rel", "blip2_qformer_cir_neg_rel.py"),
    ("blip2_cir_rel", "blip2_qformer_cir_rel.py"),
    ("blip2_cir_z_learn_pos_align", "blip2_qformer_cir_z_learn_pos_align.py"),
    ("blip2_cir_cls", "blip2_qformer_cir_cls.py"),
    ("blip2_cir_slt", "blip2_qformer_cir_slt.py"),
    ("blip2_cir_prompt", "blip2_qformer_prompt.py"),
]:
    _placeholder(_name, _ref)
