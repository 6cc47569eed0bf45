"""Model + preprocess loading, mirroring the reference entry point.

``load_model_and_preprocess(name, model_type, ...)`` is the reference's main
factory (src/lavis/models/__init__.py:204-249). Here it resolves the model
class from the registry, builds its config, initializes (or loads) params and
returns host-side processors.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from sprc_tpu.registry import registry

MODEL_TYPES = {
    # model_type -> vit_model, mirroring PRETRAINED_MODEL_CONFIG_DICT
    # (reference blip2_qformer_cir_align_prompt.py:38-42)
    "pretrain": "eva_clip_g",
    "pretrain_vitL": "clip_L",
    "coco": "eva_clip_g",
}

# generation-time keys carried by model YAMLs for fidelity with the
# reference configs (blip2_caption_opt2.7b.yaml `prompt`, ...); they
# configure decoding, not module construction, and are re-read from the
# YAML by the caption/eval glue (cli/evaluate.py).
GENERATION_KEYS = ("prompt", "max_output_txt_len", "num_beams")

# bookkeeping keys in reference-shaped model YAMLs that have no module
# field here (checkpoint URLs resolve through interop/artifacts instead).
_BOOKKEEPING_KEYS = (
    "arch", "model_type", "load_finetuned", "load_pretrained",
    "pretrained", "finetuned", "drop_path_rate",
)

_PRECISIONS = {"fp32": jnp.float32, "fp16": jnp.bfloat16, "bf16": jnp.bfloat16}


def yaml_model_defaults(name: str, model_type: str):
    """``configs/models/<name>/<model_type>.yaml`` model section as
    build_model defaults, or (None, {}) when absent.

    This is the reference's PRETRAINED_MODEL_CONFIG_DICT resolution
    (src/lavis/models/base_model.py:70-95 via load_model_and_preprocess):
    every (arch, model_type) pair maps to a shipped YAML whose model section
    seeds the config. Returns ``(field_defaults, extra_module_kwargs)``;
    the latter carries LLM tower configs resolved from the reference's HF
    names (``t5_model``/``opt_model``/``llm_model``) through
    :mod:`sprc_tpu.models.llm_presets`.
    """
    import os as _os

    from sprc_tpu.config import load_yaml, model_config_path
    from sprc_tpu.models.llm_presets import LLM_KEYS

    path = model_config_path(name, model_type)
    if not _os.path.exists(path):
        cfg_dir = _os.path.dirname(path)
        if _os.path.isdir(cfg_dir) and model_type not in MODEL_TYPES:
            avail = sorted(
                f[:-5] for f in _os.listdir(cfg_dir) if f.endswith(".yaml"))
            raise ValueError(
                f"model '{name}' has no model_type '{model_type}' "
                f"(available: {avail})")
        return None, {}
    mcfg = dict(load_yaml(path).get("model", {}))
    declared = mcfg.get("arch", name)
    if declared != name:
        raise ValueError(
            f"{path}: arch '{declared}' does not match model name '{name}'")
    for key in _BOOKKEEPING_KEYS + GENERATION_KEYS:
        mcfg.pop(key, None)
    extra = {}
    for key, (field, resolver) in LLM_KEYS.items():
        if key in mcfg:
            extra[field] = resolver(mcfg.pop(key))
    # precision/name translations shared with the reference YAML shape
    if "vit_precision" in mcfg:
        mcfg["vit_dtype"] = _PRECISIONS[mcfg.pop("vit_precision")]
    if "qformer_precision" in mcfg:
        mcfg["qformer_dtype"] = _PRECISIONS[mcfg.pop("qformer_precision")]
    if "use_grad_checkpoint" in mcfg:
        mcfg["vit_remat"] = bool(mcfg.pop("use_grad_checkpoint"))
    return mcfg, extra


def _family_config_class(cls):
    """Resolve the config dataclass of a flax model from its ``cfg`` /
    ``config`` field annotation (every family here follows that shape)."""
    import dataclasses
    import typing

    if not dataclasses.is_dataclass(cls):
        return None
    try:
        hints = typing.get_type_hints(cls)
    except Exception:
        hints = {}
    for field in dataclasses.fields(cls):
        if field.name in ("cfg", "config"):
            ann = hints.get(field.name, field.type)
            if dataclasses.is_dataclass(ann):
                return ann
    return None


_UNSET = object()


def _model_cfg(model):
    """The model's config object, whether the field is ``cfg`` or ``config``."""
    for attr in ("cfg", "config"):
        try:
            return getattr(model, attr)
        except AttributeError:
            continue
    return None


def build_model(
    name: str,
    model_type: str = "pretrain",
    *,
    vit_dtype=_UNSET,
    qformer_dtype=_UNSET,
    **overrides: Any,
):
    """Return an (uninitialized) model module for a registry name.

    BLIP-2/CIR names resolve ``model_type`` to a vision tower like the
    reference's PRETRAINED_MODEL_CONFIG_DICT; every other family builds its
    own config dataclass from defaults + ``overrides`` (the analogue of the
    reference's per-model ``from_config``,
    src/lavis/models/__init__.py:204-249)."""
    import dataclasses

    from sprc_tpu.models.cir_base import CirConfig

    cls = registry.get_model_class(name)

    cfg_cls = _family_config_class(cls)
    yaml_kw, extra_module_kwargs = yaml_model_defaults(name, model_type)
    merged = {**(yaml_kw or {}), **overrides}
    # LLM towers directly in overrides: HF names (the YAML keys) or explicit
    # config dicts/objects on the module's config field
    if any(key in merged for key in (
            "t5_model", "opt_model", "llm_model",
            "t5_config", "opt_config", "llama_config")):
        from sprc_tpu.models.llama import LlamaConfig
        from sprc_tpu.models.llm_presets import LLM_KEYS
        from sprc_tpu.models.opt import OPTConfig
        from sprc_tpu.models.t5 import T5Config

        for key, (field, resolver) in LLM_KEYS.items():
            if key in merged:
                extra_module_kwargs[field] = resolver(merged.pop(key))
        for fname, fcls in (("t5_config", T5Config), ("opt_config", OPTConfig),
                            ("llama_config", LlamaConfig)):
            if fname in merged:
                value = merged.pop(fname)
                extra_module_kwargs[fname] = (
                    fcls(**value) if isinstance(value, dict) else value)

    def _coerce(cfg_cls_, kw):
        """YAML-friendly overrides: a dict value for a dataclass-typed field
        (e.g. ``vit_config_override``) is constructed into that dataclass."""
        import typing

        try:
            hints = typing.get_type_hints(cfg_cls_)
        except Exception:
            hints = {}
        for f in dataclasses.fields(cfg_cls_):
            if f.name in kw and isinstance(kw[f.name], dict):
                ann = hints.get(f.name, f.type)
                for cand in (ann,) + tuple(typing.get_args(ann)):
                    if dataclasses.is_dataclass(cand):
                        sub = dict(kw[f.name])
                        for k, v in sub.items():
                            if k.endswith("dtype") and isinstance(v, str):
                                sub[k] = _PRECISIONS[v]
                        kw[f.name] = cand(**sub)
                        break
        # YAML spells precisions as strings on any *dtype field
        for k, v in kw.items():
            if k.endswith("dtype") and isinstance(v, str):
                kw[k] = _PRECISIONS[v]
        return kw

    if cfg_cls is not None and cfg_cls is not CirConfig:
        valid = {f.name for f in dataclasses.fields(cfg_cls)}
        kw = {k: v for k, v in merged.items() if k in valid}
        kw = _coerce(cfg_cls, kw)
        unknown = set(merged) - valid
        if unknown:
            raise TypeError(
                f"{name}: unknown config fields {sorted(unknown)} "
                f"(valid: {sorted(valid)})"
            )
        # family configs keep their OWN dtype defaults (e.g. the T5 QA
        # reader is fp32 in the reference). An EXPLICIT vit_dtype maps onto
        # the family's vision-precision field (``vit_dtype`` where the
        # family has one, else ``dtype``) — silently dropping it would hand
        # back a wrong-precision model with no error.
        if vit_dtype is not _UNSET and not ({"dtype", "vit_dtype"} & set(kw)):
            v = _PRECISIONS[vit_dtype] if isinstance(vit_dtype, str) else vit_dtype
            if "vit_dtype" in valid:
                kw["vit_dtype"] = v
            elif "dtype" in valid:
                kw["dtype"] = v
            else:
                raise TypeError(
                    f"{name}: config {cfg_cls.__name__} has no dtype field; "
                    "vit_dtype is not applicable"
                )
        if qformer_dtype is not _UNSET and not (
                {"text_dtype", "qformer_dtype"} & set(kw)):
            v = (_PRECISIONS[qformer_dtype]
                 if isinstance(qformer_dtype, str) else qformer_dtype)
            if "text_dtype" in valid:
                kw["text_dtype"] = v
            elif "qformer_dtype" in valid:
                kw["qformer_dtype"] = v
            else:
                raise TypeError(
                    f"{name}: config {cfg_cls.__name__} has no text/qformer "
                    "dtype field; qformer_dtype is not applicable"
                )
        # an LLM preset resolving to the PRIMARY config type (e.g. the FiD
        # reader, whose whole config IS a T5Config via `t5_model:`) seeds
        # the config instead of riding a separate module field
        base_cfg = None
        module_fields = {f.name for f in dataclasses.fields(cls)}
        for key in list(extra_module_kwargs):
            if key not in module_fields and isinstance(
                    extra_module_kwargs[key], cfg_cls):
                base_cfg = extra_module_kwargs.pop(key)
        cfg = dataclasses.replace(base_cfg, **kw) if base_cfg else cfg_cls(**kw)
        return cls(cfg, **extra_module_kwargs)
    if cfg_cls is None and not hasattr(cls, "cfg"):
        if hasattr(cls, "from_config"):
            # composed pipelines (pnp_vqa / img2prompt_vqa) assemble their
            # submodels from the RAW model section (nested sub-sections);
            # the returned object is a ready pipeline (params included), not
            # a bare flax module
            import os as _os

            from sprc_tpu.config import load_yaml, model_config_path

            path = model_config_path(name, model_type)
            raw = (
                dict(load_yaml(path).get("model", {}))
                if _os.path.exists(path) else {}
            )
            raw.update(overrides)
            for key in ("arch", "model_type"):
                raw.pop(key, None)
            if "image_question_matching_model" not in raw:
                raise TypeError(
                    f"model '{name}' is a composed pipeline; pass a "
                    f"model_type with a shipped YAML (configs/models/{name}/)"
                    " or construct it from submodel sections "
                    f"(see {cls.__module__}.from_config)"
                )
            fc_kw = {
                key: raw.pop(key)
                for key in ("vocab_path", "qa_tokenizer", "rng", "tagger")
                if key in raw
            }
            return cls.from_config(raw, **fc_kw)
        raise TypeError(
            f"model '{name}' is a composed pipeline; construct it directly "
            f"from its submodels (see {cls.__module__})"
        )

    vit_model = merged.pop("vit_model", MODEL_TYPES.get(model_type, model_type))
    if vit_dtype is not _UNSET:
        merged["vit_dtype"] = vit_dtype
    elif "vit_dtype" not in merged:
        merged["vit_dtype"] = jnp.bfloat16
    if qformer_dtype is not _UNSET:
        merged["qformer_dtype"] = qformer_dtype
    elif "qformer_dtype" not in merged:
        merged["qformer_dtype"] = jnp.float32
    cfg = CirConfig(vit_model=vit_model, **_coerce(CirConfig, merged))
    return cls(cfg, **extra_module_kwargs)


def init_params(model, rng: Optional[jax.Array] = None,
                image_size: Optional[int] = None):
    """Initialize a full parameter pytree with dummy inputs.

    Covers the CIR init contract (reference image, target image, text ids,
    mask) plus the VQA family's (images, question, answers, mapping) so
    ``load_model_and_preprocess`` reaches the whole blip_question surface
    (reference load_preprocess, src/lavis/models/__init__.py:152-201)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if image_size is None:  # the model's own configured size
        image_size = getattr(_model_cfg(model), "image_size", 224)
    from sprc_tpu.models.vqa import VQAModel

    if isinstance(model, VQAModel):
        image_size = model.cfg.image_size
        img = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        q_ids = jnp.zeros((1, 8), jnp.int32)
        a_ids = jnp.zeros((1, 4), jnp.int32)
        ones_q = jnp.ones((1, 8), jnp.int32)
        ones_a = jnp.ones((1, 4), jnp.int32)
        variables = model.init(
            rng, img, q_ids, ones_q, a_ids, ones_a,
            jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.float32),
        )
        return variables["params"]
    dummy_img = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    dummy_ids = jnp.zeros((1, model.cfg.max_txt_len), jnp.int32)
    dummy_mask = jnp.ones((1, model.cfg.max_txt_len), jnp.int32)
    variables = model.init(rng, dummy_img, dummy_img, dummy_ids, dummy_mask)
    return variables["params"]


def load_model(
    name: str,
    model_type: str = "pretrain",
    checkpoint_path: Optional[str] = None,
    **kw: Any,
):
    """Build a model and load params (from a torch ``.pt`` or orbax dir)."""
    model = build_model(name, model_type, **kw)
    if checkpoint_path is None:
        try:
            params = init_params(model)
        except (TypeError, AttributeError) as e:
            raise TypeError(
                f"model '{name}' does not follow the CIR init contract "
                "(reference image, target image, text ids, mask); initialize "
                "its params with family-specific inputs via model.init(...) "
                f"(see tests/test_{type(model).__module__.split('.')[-1]}.py) "
                f"or pass checkpoint_path. Underlying error: {e}"
            ) from e
    else:
        from sprc_tpu.interop.torch_import import load_checkpoint_auto

        params = load_checkpoint_auto(checkpoint_path, model)
    return model, params


def load_model_and_preprocess(
    name: str,
    model_type: str = "pretrain",
    checkpoint_path: Optional[str] = None,
    vocab_path: Optional[str] = None,
    **kw: Any,
) -> Tuple[Any, Any, dict, dict]:
    """Returns ``(model, params, vis_processors, txt_processors)``.

    Mirrors the reference factory's return shape: processors are dicts with
    'train'/'eval' callables.
    """
    from sprc_tpu.data.transforms import targetpad_transform
    from sprc_tpu.text.processors import CaptionProcessor

    model, params = load_model(name, model_type, checkpoint_path, **kw)
    cfg = _model_cfg(model)
    image_size = getattr(cfg, "image_size", 224)

    # per-family default preprocess, mirroring the reference's per-model
    # YAML-resolved processors (src/lavis/models/__init__.py:152-201):
    # CIR models keep the targetpad eval contract (data_utils.py:91-105);
    # video families get the ALPRO clip processors; everything else gets
    # the BLIP train/eval image processors.
    if name.startswith(("alpro", "timesformer")):
        from sprc_tpu.data.video_processors import (
            AlproVideoEvalProcessor,
            AlproVideoTrainProcessor,
        )

        vis = {
            "train": AlproVideoTrainProcessor(image_size=image_size),
            "eval": AlproVideoEvalProcessor(image_size=image_size),
        }
    elif "cir" in name or name.startswith("blip2"):
        vis = {
            "train": targetpad_transform(1.25, image_size),
            "eval": targetpad_transform(1.25, image_size),
        }
    else:
        from sprc_tpu.data.processors import (
            BlipImageEvalProcessor,
            BlipImageTrainProcessor,
        )

        vis = {
            "train": BlipImageTrainProcessor(image_size=image_size),
            "eval": BlipImageEvalProcessor(image_size=image_size),
        }
    # per-family text processors, mirroring the reference's YAML-resolved
    # text_processor entries (src/lavis/models/__init__.py:152-201): the VQA
    # families resolve "blip_question" for BOTH train and eval
    # (configs/models/blip_vqav2.yaml, albef_vqav2.yaml), everything else
    # "blip_caption" (configs survey: 31x blip_caption vs 8x blip_question).
    if name in ("blip_vqa", "albef_vqa"):
        from sprc_tpu.text.processors import QuestionProcessor

        txt = {"train": QuestionProcessor(), "eval": QuestionProcessor()}
    else:
        txt = {"train": CaptionProcessor(), "eval": CaptionProcessor()}
    return model, params, vis, txt


class ModelZoo:
    """String listing of every (architecture, model_type) pair resolvable by
    :func:`build_model` — the reference ``lavis.models.model_zoo`` surface
    (src/lavis/models/__init__.py:252-291). Types are enumerated from the
    YAML config library (``configs/models/<arch>/<type>.yaml``), this
    framework's equivalent of ``PRETRAINED_MODEL_CONFIG_DICT``."""

    def __init__(self) -> None:
        import os

        from sprc_tpu.config import CONFIG_ROOT

        root = os.path.join(CONFIG_ROOT, "models")
        zoo = {}
        for arch in sorted(os.listdir(root)):
            adir = os.path.join(root, arch)
            if not os.path.isdir(adir):
                continue
            types = sorted(
                f[: -len(".yaml")] for f in os.listdir(adir) if f.endswith(".yaml")
            )
            if types:
                zoo[arch] = types
        self.model_zoo = zoo

    def __str__(self) -> str:
        return (
            "=" * 50
            + "\n"
            + f"{'Architectures':<30} {'Types'}\n"
            + "=" * 50
            + "\n"
            + "\n".join(
                f"{name:<30} {', '.join(types)}"
                for name, types in self.model_zoo.items()
            )
        )

    def __iter__(self):
        return iter(self.model_zoo.items())

    def __len__(self) -> int:
        return sum(len(v) for v in self.model_zoo.values())


model_zoo = ModelZoo()
