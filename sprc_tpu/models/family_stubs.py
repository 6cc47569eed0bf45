"""Registry slots for the non-CIR LAVIS model families.

The reference vendors the full LAVIS zoo (SURVEY.md §2.3): BLIP-1, ALBEF,
CLIP, ALPRO/TimeSformer video models, PNP-VQA, Img2Prompt, GPT-dialogue and
the BLIP-2 T5/OPT LLM heads. SPRC's CIR workload touches none of them
(SURVEY.md §7.3 scopes them out), but their registry names must resolve so
LAVIS-style configs don't break. Each stub raises with the reference file
and what a real port would need.
"""

from __future__ import annotations

from sprc_tpu.registry import registry


def _stub(name: str, ref_file: str, family: str):
    class _OutOfScope:
        REGISTRY_NAME = name
        REFERENCE = ref_file
        FAMILY = family

        def __init__(self, *a, **k):
            raise NotImplementedError(
                f"model '{name}' ({family}; reference {ref_file}) is outside "
                "the SPRC CIR scope (SURVEY.md §7.3). The BLIP-2 CIR family "
                "is fully implemented; port this family on demand."
            )

    _OutOfScope.__name__ = f"Stub_{name.replace('-', '_')}"
    return registry.register_model(name)(_OutOfScope)


_FAMILIES = {
    "BLIP-1": [
        # blip_classification: implemented in models/classification.py
        # blip_nlvr: implemented in models/nlvr.py
        # blip_pretrain: implemented in models/blip1.py
        # blip_vqa: implemented in models/vqa.py
    ],
    "ALBEF": [
        # albef_classification: implemented in models/classification.py
        # albef_nlvr: implemented in models/nlvr.py
        # albef_pretrain: implemented in models/albef.py
        # albef_vqa: implemented in models/vqa.py
    ],
    "video": [
        # alpro_qa / alpro_retrieval / timesformer: implemented in
        # models/alpro.py and models/timesformer.py
    ],
    "BLIP-2 LLM heads": [
    ],
    "misc": [
        # pnp_vqa / img2prompt_vqa: implemented in models/pnp_vqa.py
        # gpt_dialogue: implemented for real in models/gpt_dialogue.py
    ],
}

for _family, _entries in _FAMILIES.items():
    for _name, _ref in _entries:
        _stub(_name, f"src/lavis/models/{_ref}", _family)
