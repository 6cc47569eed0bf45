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


def test_validate_rerank_cli_flow(tiny_engine, cirr_root, monkeypatch):
    """Two-stage CLI flow: stage-1 + ITM rerank over synthetic CIRR."""
    import sprc_tpu.cli.validate_rerank as rcli
    import sprc_tpu.cli.submission as scli

    model = tiny_engine

    def fake_load_rerank(args, mesh=None):
        from sprc_tpu.loader import init_params
        from test_variants import build

        rmodel = build("blip2_cir_rerank")
        import jax

        b = jax.random.PRNGKey(0)
        ref = jax.numpy.zeros((2, 28, 28, 3))
        ids = jax.numpy.zeros((2, 8), "int32")
        mask = jax.numpy.ones((2, 8), "int32")
        variables = rmodel.init({"params": b, "sample": jax.random.PRNGKey(1)},
                                ref, ref, ids, mask)
        params = rmodel.sync_fformer(dict(variables["params"]))
        return rmodel, params

    monkeypatch.setattr(scli, "_load_rerank_model", fake_load_rerank)

    args = _args(cirr_root, rerank_top=3, rerank_step=2,
                 rerank_model_name="blip2_cir_rerank", rerank_model_path=None)
    results = rcli.validate_rerank_cirr(args)
    for k in ("recall_at1", "recall_at5", "group_recall_at1"):
        assert k in results and np.isfinite(results[k])
    assert results["recall_at5"] == 100.0  # 6-image gallery
