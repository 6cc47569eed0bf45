"""End-to-end CLI flow over synthetic CIRR fixtures with a tiny model
(build_engine monkeypatched to avoid full-size init on CPU)."""

import argparse
import json

import numpy as np
import pytest

import sprc_tpu.cli.validate as vcli
from sprc_tpu.retrieval.engine import RetrievalEngine
from sprc_tpu.text.tokenizer import BertWordPieceTokenizer

from test_variants import build
from sprc_tpu.loader import init_params
from test_data import cirr_root  # fixture


VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "caption", "0", "1", "2", "3"]


@pytest.fixture()
def tiny_engine(monkeypatch):
    model = build("blip2_cir_align_prompt")
    params = init_params(model, image_size=28)
    tok = BertWordPieceTokenizer({t: i for i, t in enumerate(VOCAB)})

    def fake_build_engine(args, mesh=None):
        engine = RetrievalEngine(
            model, params, tok, mesh=mesh,
            encode_batch=args.encode_batch, query_batch=args.query_batch,
        )
        return model, engine

    monkeypatch.setattr(vcli, "build_engine", fake_build_engine)
    return model


def _args(cirr_root, **kw):
    ns = argparse.Namespace(
        dataset="CIRR",
        data_path=str(cirr_root),
        model_path=None,
        model_name="blip2_cir_align_prompt",
        model_type="pretrain",
        vocab_path="unused",
        transform="targetpad",
        target_ratio=1.25,
        encode_batch=4,
        query_batch=2,
        workers=2,
        bf16=False,
        dress_types=["dress"],
        mesh=False,
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_validate_cirr_cli_flow(tiny_engine, cirr_root):
    results = vcli.validate_cirr(_args(cirr_root))
    expected = {
        "group_recall_at1", "group_recall_at2", "group_recall_at3",
        "recall_at1", "recall_at5", "recall_at10", "recall_at50",
        "mean(R@5+R_s@1)", "arithmetic_mean", "harmonic_mean", "geometric_mean",
    }
    assert expected <= set(results)
    for k, v in results.items():
        assert np.isfinite(v), k
    # 6-image gallery: everything must be found within top-5/top-50
    assert results["recall_at5"] == 100.0
    assert results["group_recall_at3"] == 100.0
