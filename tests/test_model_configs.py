"""Model-config YAML library (reference configs/models/* +
PRETRAINED_MODEL_CONFIG_DICT resolution, src/lavis/models/base_model.py:70-95).

Every shipped ``configs/models/<arch>/<model_type>.yaml`` must build a module
through ``build_model(arch, model_type)`` — the same path
``load_model_and_preprocess`` takes — with the reference's dims resolved from
the YAML (LLM towers via :mod:`sprc_tpu.models.llm_presets`)."""

import glob
import os

import jax.numpy as jnp
import pytest
import yaml

import sprc_tpu.models  # noqa: F401  (register everything)
from sprc_tpu.loader import build_model

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs", "models")
ALL_YAMLS = sorted(glob.glob(os.path.join(CONFIG_ROOT, "*", "*.yaml")))

# composed pipelines: build_model() initializes FULL-dims params for these,
# far too heavy for the default lane — their YAML shape is validated below
# and the tiny end-to-end build in test_pipeline_from_config
PIPELINES = ("pnp_vqa", "img2prompt_vqa")


def _ids(paths):
    return [os.path.join(*p.split(os.sep)[-2:]) for p in paths]


@pytest.mark.parametrize("path", ALL_YAMLS, ids=_ids(ALL_YAMLS))
def test_every_model_yaml_builds(path):
    arch_dir = os.path.basename(os.path.dirname(path))
    model_type = os.path.basename(path)[:-5]
    mcfg = yaml.safe_load(open(path))["model"]
    assert mcfg["arch"] == arch_dir, "config dir must match the registry name"
    if arch_dir in PIPELINES:
        # sub-sections must point at real (arch, model_type) YAMLs
        for section in ("image_question_matching_model",
                        "image_captioning_model",
                        "question_answering_model"):
            sub = mcfg[section]
            if sub["arch"] == "t5":
                continue
            sub_path = os.path.join(
                CONFIG_ROOT, sub["arch"],
                f"{sub.get('model_type', 'pretrain')}.yaml")
            assert os.path.exists(sub_path), sub_path
        return
    model = build_model(arch_dir, model_type)
    assert model is not None


def test_resolved_llm_dims():
    """The reference YAML's HF names pin the tower architecture."""
    m = build_model("blip2_t5", "pretrain_flant5xl")
    assert (m.t5_config.d_model, m.t5_config.d_ff) == (2048, 5120)
    m = build_model("blip2_t5", "pretrain_flant5xxl")
    assert (m.t5_config.d_model, m.t5_config.num_heads) == (4096, 64)
    assert m.t5_config.gated_act and not m.t5_config.tie_word_embeddings
    m = build_model("blip2_opt", "pretrain_opt2.7b")
    assert (m.opt_config.hidden_size, m.opt_config.ffn_dim) == (2560, 10240)
    m = build_model("blip2_vicuna_instruct", "vicuna13b")
    assert (m.llama_config.hidden_size, m.llama_config.num_layers) == (5120, 40)
    assert m.llama_config.vocab_size == 32001  # vicuna pad token
    # unifiedqa-v2 = original T5 (v1.0: relu, tied embeddings)
    m = build_model("pnp_unifiedqav2_fid", "3b")
    assert (m.config.d_model, m.config.d_kv, m.config.d_ff) == (1024, 128, 16384)
    assert not m.config.gated_act and m.config.tie_word_embeddings


def test_resolved_vision_dims():
    m = build_model("blip2_t5", "caption_coco_flant5xl")
    assert m.cfg.image_size == 364 and not m.cfg.freeze_vit
    assert m.cfg.vit_dtype == jnp.float32
    m = build_model("clip", "vit_large14_336")
    assert m.cfg.vision.width == 1024 and m.cfg.vision.image_size == 336
    assert m.cfg.embed_dim == 768 and m.cfg.text.width == 768
    m = build_model("blip_caption", "large_coco")
    vit = m.cfg.vit_config()
    assert (vit.width, vit.depth, vit.image_size) == (1024, 24, 384)
    m = build_model("blip2_cir_align_prompt", "pretrain_vitL")
    assert m.cfg.vit_model == "clip_L"


def test_explicit_overrides_beat_yaml():
    m = build_model("blip2_t5", "pretrain_flant5xl", image_size=336)
    assert m.cfg.image_size == 336
    assert m.t5_config.d_model == 2048  # YAML tower untouched


def test_unknown_model_type_lists_available():
    with pytest.raises(ValueError, match="available"):
        build_model("blip2_t5", "nonexistent_type")


TINY_VIT = {"image_size": 32, "patch_size": 16, "width": 24, "depth": 1,
            "num_heads": 2, "mlp_hidden": 48, "final_norm": True,
            "dtype": "fp32"}
TINY_TXT = {"vocab_size": 30524, "hidden_size": 24, "num_layers": 1,
            "num_heads": 2, "intermediate_size": 48, "encoder_width": 24,
            "dropout_rate": 0.0}
TINY_T5 = {"d_model": 16, "d_kv": 8, "d_ff": 32, "num_heads": 2,
           "num_layers": 1, "num_decoder_layers": 1, "vocab_size": 32}


@pytest.fixture()
def tiny_vocab(tmp_path):
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "cat",
              "picture", "of"]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(tokens))
    return str(path)


def test_pipeline_from_config(tiny_vocab):
    """pnp_vqa / img2prompt_vqa assemble end-to-end from their YAML shape
    (tiny towers via sub-section overrides)."""
    itm = {"arch": "blip_image_text_matching", "image_size": 32,
           "vit_dtype": "fp32", "vit_config_override": TINY_VIT,
           "text_config_override": TINY_TXT}
    cap = dict(itm, arch="blip_caption")
    pipe = build_model(
        "pnp_vqa", "base", vocab_path=tiny_vocab,
        image_question_matching_model=itm, image_captioning_model=cap,
        question_answering_model=dict(TINY_T5, arch="pnp_unifiedqav2_fid"),
    )
    from sprc_tpu.models.pnp_vqa import Img2PromptVqaPipeline, PnpVqaPipeline

    assert isinstance(pipe, PnpVqaPipeline)
    assert type(pipe.qa_model).__name__ == "FiDT5"
    im = build_model(
        "img2prompt_vqa", "base", vocab_path=tiny_vocab,
        image_question_matching_model=itm, image_captioning_model=cap,
        question_answering_model=dict(TINY_T5, arch="t5", t5_model="t5-base"),
    )
    assert isinstance(im, Img2PromptVqaPipeline)
    assert type(im.qa_model).__name__ == "T5ForConditionalGeneration"


def test_model_zoo_listing():
    """model_zoo mirrors the reference lavis.models.model_zoo surface
    (src/lavis/models/__init__.py:252-291): every YAML-library (arch, type)
    pair, printable, iterable, countable."""
    import sprc_tpu

    zoo = sprc_tpu.model_zoo
    pairs = dict(iter(zoo))
    assert len(zoo) == sum(len(v) for v in pairs.values()) > 70
    assert "blip2_cir_align_prompt" in pairs
    assert "coco" in pairs["albef_retrieval"]
    s = str(zoo)
    assert "Architectures" in s and "alpro_retrieval" in s


def test_pnp_finetuned_submodel_loading(tiny_vocab, tmp_path):
    """Per-submodel ``finetuned:`` paths in the pnp_vqa config load released
    torch weights through the class-dispatched importer (the reference
    YAMLs' per-submodel checkpoint URLs, configs/models/pnp-vqa/*.yaml)."""
    import numpy as np
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration as HFT5

    hf = HFT5(HFT5Config(
        vocab_size=32, d_model=16, d_kv=8, d_ff=32, num_layers=1,
        num_decoder_layers=1, num_heads=2, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, dropout_rate=0.0,
        decoder_start_token_id=0, pad_token_id=0,
    ))
    path = tmp_path / "fid_reader.pth"
    torch.save(hf.state_dict(), str(path))

    itm = {"arch": "blip_image_text_matching", "image_size": 32,
           "vit_dtype": "fp32", "vit_config_override": TINY_VIT,
           "text_config_override": TINY_TXT}
    cap = dict(itm, arch="blip_caption")
    pipe = build_model(
        "pnp_vqa", "base", vocab_path=tiny_vocab,
        image_question_matching_model=itm, image_captioning_model=cap,
        question_answering_model=dict(
            TINY_T5, arch="pnp_unifiedqav2_fid", finetuned=str(path)
        ),
    )
    got = np.asarray(pipe.qa_params["t5"]["shared"]["embedding"])
    want = hf.state_dict()["shared.weight"].numpy()
    np.testing.assert_allclose(got, want, atol=0)
