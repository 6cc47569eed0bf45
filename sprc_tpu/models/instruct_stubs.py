"""Registry slots for the LLM-backed instruct CIR variants.

The reference ships two InstructBLIP-style CIR models that route Q-Former
outputs through a frozen Vicuna/LLaMA LM (blip2_instruct_cir.py,
blip2_vicuna_instruct.py — SURVEY.md §2.2). They require multi-GB LLM
weights that cannot be fetched in this environment; the registry names
exist so configs resolve, and instantiation explains what is missing.
"""

from __future__ import annotations

from sprc_tpu.registry import registry


def _stub(name: str, ref_file: str, needs: str):
    class _RequiresLLM:
        REGISTRY_NAME = name
        REFERENCE = ref_file

        def __init__(self, *a, **k):
            raise NotImplementedError(
                f"model '{name}' (reference {ref_file}) needs {needs}; "
                "supply local LLM weights and see sprc_tpu.models.lm for the "
                "Q-Former decoder plumbing it builds on"
            )

    _RequiresLLM.__name__ = f"Stub_{name}"
    return registry.register_model(name)(_RequiresLLM)


_stub(
    "blip2_instruct_cir",
    "blip2_instruct_cir.py",
    "a JAX LLaMA/Vicuna decoder + its pretrained weights",
)
_stub(
    "blip2_vicuna_instruct",
    "blip2_vicuna_instruct.py",
    "a JAX LLaMA/Vicuna decoder + its pretrained weights (l2q retrieval head)",
)
