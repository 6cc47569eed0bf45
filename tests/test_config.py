"""Config system tests: YAML load, merge, dotlist overrides, model build."""

import numpy as np
import pytest

from sprc_tpu.config import (
    Config,
    apply_dotlist,
    build_model_from_config,
    deep_merge,
    load_yaml,
    model_config_path,
)


def test_deep_merge():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    out = deep_merge(base, {"a": {"c": 9, "e": 4}})
    assert out == {"a": {"b": 1, "c": 9, "e": 4}, "d": 3}
    assert base["a"]["c"] == 2  # no mutation


def test_dotlist_overrides():
    cfg = {"run": {"lr": 1e-5, "epochs": 50}}
    out = apply_dotlist(cfg, ["run.lr=2e-4", "run.epochs=10", "model.arch=blip2_cir_cat"])
    assert out["run"]["lr"] == 2e-4
    assert out["run"]["epochs"] == 10
    assert out["model"]["arch"] == "blip2_cir_cat"
    with pytest.raises(ValueError):
        apply_dotlist(cfg, ["no_equals_sign"])


def test_load_all_model_configs():
    import glob
    import os

    from sprc_tpu.config import CONFIG_ROOT
    from sprc_tpu.registry import registry

    paths = glob.glob(os.path.join(CONFIG_ROOT, "models", "*", "*.yaml"))
    assert len(paths) >= 22  # 11 archs x 2 types
    for p in paths:
        cfg = load_yaml(p)
        arch = cfg["model"]["arch"]
        registry.get_model_class(arch)  # raises if not registered


def test_build_model_from_yaml():
    path = model_config_path("blip2_cir_align_prompt", "pretrain_vitL")
    cfg = Config(path)
    model = build_model_from_config(cfg.model)
    assert model.cfg.vit_model == "clip_L"
    assert model.cfg.num_query_token == 32


def test_run_config():
    path = model_config_path("blip2_cir_align_prompt", "pretrain")
    cfg = Config(path, overrides=["model.image_size=112", "run.batch_size=8"])
    assert cfg.get("model.image_size") == 112
    assert cfg.run["batch_size"] == 8
    assert cfg.get("missing.key", "fallback") == "fallback"


def test_train_cli_yaml_wiring(monkeypatch):
    """cli.train resolves the YAML recipe into the finetune namespace."""
    import sprc_tpu.cli.train as tcli
    import sprc_tpu.cli.finetune as fcli

    captured = {}
    monkeypatch.setattr(fcli, "finetune", lambda args: captured.update(vars(args)))
    # cli.train imports finetune by name at call time
    monkeypatch.setattr(tcli, "main", tcli.main)
    import sys

    tcli.main([
        "--cfg-path", "configs/runs/cirr_finetune.yaml",
        "--data-path", "/data/cirr", "--vocab-path", "/data/vocab.txt",
        "--options", "run.learning_rate=5e-6", "model.vit_model=clip_L",
    ])
    assert captured["dataset"] == "CIRR"
    assert captured["batch_size"] == 128
    assert captured["num_epochs"] == 50
    assert captured["schedule_epochs"] == 80
    assert captured["learning_rate"] == 5e-6  # dotlist override applied
    assert captured["model_type"] == "pretrain_vitL"  # vit_model override
    assert captured["selection_metric"] == "arithmetic_mean"


def test_factory_builds_every_registry_model():
    """build_model resolves a family-appropriate config for every registered
    name (reference load_model_and_preprocess works for the whole zoo,
    src/lavis/models/__init__.py:204-249); composed pipelines raise a
    directing error instead of mis-constructing."""
    import pytest

    import sprc_tpu
    from sprc_tpu.loader import build_model

    pipelines = set()
    for name in sorted(sprc_tpu.registry.list("model")):
        try:
            model = build_model(name)
        except TypeError as e:
            assert "pipeline" in str(e)
            pipelines.add(name)
            continue
        assert model is not None, name
    assert pipelines == {"pnp_vqa", "img2prompt_vqa"}

    with pytest.raises(TypeError, match="unknown config fields"):
        build_model("albef_retrieval", not_a_field=1)


def test_vqa_families_get_question_processor():
    """VQA families resolve blip_question for train AND eval through the
    factory (reference configs/models/blip_vqav2.yaml + load_preprocess,
    src/lavis/models/__init__.py:152-201); CIR keeps blip_caption."""
    import jax.numpy as jnp
    from sprc_tpu.loader import load_model_and_preprocess
    from sprc_tpu.models.qformer import QFormerConfig
    from sprc_tpu.models.vit import ViTConfig
    from sprc_tpu.text.processors import CaptionProcessor, QuestionProcessor

    tiny_vit = ViTConfig(image_size=28, patch_size=14, width=32, depth=1,
                         num_heads=2, mlp_hidden=64, dtype=jnp.float32)
    tiny_txt = QFormerConfig(vocab_size=60, hidden_size=32, num_layers=1,
                             num_heads=2, intermediate_size=64,
                             encoder_width=32, dropout_rate=0.0)
    model, params, vis, txt = load_model_and_preprocess(
        "blip_vqa", image_size=28, vocab_size=60,
        vit_config_override=tiny_vit, text_config_override=tiny_txt,
    )
    assert isinstance(txt["train"], QuestionProcessor)
    assert isinstance(txt["eval"], QuestionProcessor)
    assert "visual_encoder" in params

    # CIR path unchanged
    from sprc_tpu.models.cir_base import CirConfig  # noqa: F401
    import dataclasses
    vcfg = ViTConfig(image_size=28, patch_size=14, width=32, depth=1,
                     num_heads=2, mlp_hidden=64, qkv_fused_no_kbias=True,
                     dtype=jnp.float32)
    qcfg = QFormerConfig(vocab_size=60, hidden_size=32, num_layers=1,
                         num_heads=2, intermediate_size=64, encoder_width=32,
                         query_length=4, dropout_rate=0.0)
    _, _, _, txt2 = load_model_and_preprocess(
        "blip2_cir_align_prompt", image_size=28, num_query_token=4,
        max_txt_len=8, vocab_size=60, vit_config_override=vcfg,
        qformer_config_override=qcfg,
    )
    assert isinstance(txt2["eval"], CaptionProcessor)
