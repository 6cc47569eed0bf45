"""Turnkey golden-weights rehearsal (the weights-present repro, dry-run).

Fabricates checkpoints with the EXACT released layout — ``{epoch,
"Blip2QformerCirAlignPrompt": state_dict}`` with reference-named torch
tensors including the ViT tower keys and strict=False extras (reference
src/utils.py:208-222, blip_validate.py:107-109) — plus miniature on-disk
CIRR/FashionIQ trees, and drives ``scripts/repro_baseline.sh`` end to end:
validate x4, two-stage rerank, CIRR test1 submission, then
``scripts/check_baseline.py`` including the 0.1-point hard gate. A
weights-present environment should need zero debugging beyond swapping in
the real files.

Tiny dims ride the ``--model-overrides`` dotlist so the REAL loader /
importer / engine / metric code paths run unpatched.
"""

import json
import os
import pathlib
import shutil
import subprocess
import sys

import numpy as np
import pytest

from test_data import cirr_root, fiq_root  # noqa: F401  (fixtures)

REPO = pathlib.Path(__file__).resolve().parent.parent

# one override per line: repro_baseline.sh splits SPRC_MODEL_OVERRIDES on
# newlines because the inline-YAML values contain spaces
OVERRIDES = [
    "image_size=28",
    "num_query_token=4",
    "max_txt_len=8",
    "embed_dim=16",
    "vit_dtype=fp32",
    "qformer_dtype=fp32",
    ("vit_config_override={image_size: 28, patch_size: 14, width: 32, "
     "depth: 2, num_heads: 2, mlp_hidden: 64, qkv_fused_no_kbias: true, "
     "dtype: fp32}"),
    ("qformer_config_override={vocab_size: 60, hidden_size: 32, "
     "num_layers: 2, num_heads: 2, intermediate_size: 64, "
     "encoder_width: 32, query_length: 4, dropout_rate: 0.0, "
     "attention_dropout_rate: 0.0, dtype: fp32}"),
]

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[DEC]",
    "caption", "is", "red", "long", "dress", "shirt", "and",
    "0", "1", "2", "3", "4", "5",
]


def _overrides_dict():
    from sprc_tpu.cli.validate import parse_model_overrides

    return parse_model_overrides(OVERRIDES)


def _wrap(torch, class_name, sd, extras=True):
    """{epoch, ClassName: tensors} — the released fine-tuned layout
    (reference utils.py:219-222), plus strict=False extras the torch
    state_dict carries but this param tree does not materialize."""
    tensors = {
        # reshape: torch.from_numpy promotes 0-d arrays to [1]; the released
        # checkpoints carry temp as a true scalar (0.07 * torch.ones([]))
        k: torch.from_numpy(
            np.ascontiguousarray(np.asarray(v)).copy()
        ).reshape(np.asarray(v).shape)
        for k, v in sd.items()
    }
    if extras:
        # LM head + an unused buffer: present in real checkpoints, dropped
        # by the strict=False template filter
        tensors["Qformer.cls.predictions.bias"] = torch.zeros(60)
        tensors["Qformer.bert.embeddings.position_ids"] = (
            torch.arange(512).unsqueeze(0))
        if "itm_head.weight" not in tensors:
            tensors["itm_head.weight"] = torch.zeros(2, 32)
            tensors["itm_head.bias"] = torch.zeros(2)
    return {"epoch": 5, class_name: tensors}


@pytest.fixture(scope="module")
def fabricated(tmp_path_factory):
    torch = pytest.importorskip("torch")
    import jax

    from sprc_tpu.interop.torch_export import params_to_torch_state_dict
    from sprc_tpu.loader import build_model, init_params

    root = tmp_path_factory.mktemp("rehearsal")
    ckpt_dir = root / "ckpts"
    ckpt_dir.mkdir()

    ovr = _overrides_dict()
    model = build_model("blip2_cir_align_prompt", "pretrain", **ovr)
    params = init_params(model, rng=jax.random.PRNGKey(3))
    sd = params_to_torch_state_dict(params, model)
    wrap = _wrap(torch, "Blip2QformerCirAlignPrompt", sd)
    for name in ("sprc_cirr.pt", "sprc_fiq.pt",
                 "sprc_cirr_vitl.pt", "sprc_fiq_vitl.pt"):
        torch.save(wrap, ckpt_dir / name)

    # rerank twin checkpoint (Fformer under Fformer.bert.*, reference
    # blip2_qformer_cir_rerank.py:90-117)
    rmodel = build_model("blip2_cir_rerank", "pretrain", **ovr)
    img = np.zeros((1, 28, 28, 3), np.float32)
    ids = np.zeros((1, 8), np.int32)
    mask = np.ones((1, 8), np.int32)
    variables = rmodel.init(
        {"params": jax.random.PRNGKey(4), "sample": jax.random.PRNGKey(5)},
        img, img, ids, mask)
    rparams = rmodel.sync_fformer(dict(variables["params"]))
    rsd = params_to_torch_state_dict(rparams, rmodel)
    assert any(k.startswith("Fformer.bert.") for k in rsd)
    torch.save(_wrap(torch, "Blip2QformerCirRerank", rsd),
               ckpt_dir / "sprc_cirr_rerank.pt")

    vocab = root / "vocab.txt"
    vocab.write_text("\n".join(VOCAB) + "\n")
    return {"ckpt_dir": ckpt_dir, "vocab": vocab, "root": root}


@pytest.fixture(scope="module")
def data_root(tmp_path_factory, cirr_root, fiq_root):  # noqa: F811
    data = tmp_path_factory.mktemp("data")
    os.symlink(cirr_root, data / "cirr_dataset")
    os.symlink(fiq_root, data / "fashionIQ_dataset")
    return data


def test_roundtrip_import_matches_export(fabricated):
    """The fabricated .pt round-trips through the REAL import path and
    reproduces the source params (incl. the rerank fformer twin)."""
    import jax

    from sprc_tpu.loader import build_model, load_model

    ovr = _overrides_dict()
    model, params = load_model(
        "blip2_cir_align_prompt", "pretrain",
        checkpoint_path=str(fabricated["ckpt_dir"] / "sprc_cirr.pt"), **ovr)
    assert "visual_encoder" in params and "prompt_tokens" in params
    rmodel, rparams = load_model(
        "blip2_cir_rerank", "pretrain",
        checkpoint_path=str(fabricated["ckpt_dir"] / "sprc_cirr_rerank.pt"),
        **ovr)
    assert "fformer" in rparams and "query_tokens_f" in rparams
    # twin == trainable tower after sync (the fabrication synced them)
    a = jax.tree.leaves(rparams["fformer"])
    b = jax.tree.leaves(rparams["qformer"])
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_repro_baseline_end_to_end(fabricated, data_root, tmp_path):
    pytest.importorskip("torch")
    out = tmp_path / "out"
    env = dict(
        os.environ,
        SPRC_CKPT_DIR=str(fabricated["ckpt_dir"]),
        SPRC_DATA_DIR=str(data_root),
        SPRC_OUT_DIR=str(out),
        SPRC_MODEL_OVERRIDES="\n".join(OVERRIDES),
        SPRC_VOCAB_PATH=str(fabricated["vocab"]),
        SPRC_DRESS_TYPES="dress",
        SPRC_ENCODE_BATCH="4",
        SPRC_QUERY_BATCH="2",
        SPRC_RERANK_ARGS="--rerank-top 3 --rerank-step 2",
        JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "repro_baseline.sh")],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"

    # all six legs produced artifacts
    for name in ("cirr_vitg", "fiq_vitg", "cirr_vitl", "fiq_vitl",
                 "cirr_vitg_rerank"):
        got = json.loads((out / f"{name}.json").read_text())
        assert got, name
        assert all(np.isfinite(v) for v in got.values()), (name, got)
    subs = sorted((out / "submission").glob("*.json"))
    assert len(subs) == 2, subs
    # 6-image fixture gallery: every target inside top-5
    cirr = json.loads((out / "cirr_vitg.json").read_text())
    assert cirr["recall_at5"] == 100.0

    # hard 0.1-gate leg: a matching local reference run must PASS ...
    shutil.copy(out / "cirr_vitg.json", out / "reference_cirr_vitg.json")
    check = [sys.executable, str(REPO / "scripts" / "check_baseline.py"),
             str(out)]
    proc2 = subprocess.run(check, env=env, capture_output=True, text=True)
    assert proc2.returncode == 0, proc2.stdout
    assert "[PASS] cirr_vitg.recall_at1" in proc2.stdout

    # ... and a 1.0-point discrepancy must FAIL
    ref = dict(cirr)
    ref["recall_at1"] = float(ref["recall_at1"]) + 1.0
    (out / "reference_cirr_vitg.json").write_text(json.dumps(ref))
    proc3 = subprocess.run(check, env=env, capture_output=True, text=True)
    assert proc3.returncode == 1
    assert "[FAIL] cirr_vitg.recall_at1" in proc3.stdout
