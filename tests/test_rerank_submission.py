"""Two-stage rerank driver + submission writer tests."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.retrieval.rerank import ItmRerankScorer, rerank_rankings
from sprc_tpu.retrieval.submission import build_submission_dicts, write_submission_files
from sprc_tpu.text.tokenizer import BertWordPieceTokenizer

from test_variants import build
from sprc_tpu.loader import init_params


def test_rerank_rewrites_top_prefix(rng):
    names = np.array([[f"g{j}" for j in range(6)] for _ in range(5)])
    refs = [f"r{i}" for i in range(5)]
    caps = [f"c{i}" for i in range(5)]

    def name_to_embed(batch_names):
        return np.zeros((len(batch_names), 2, 3), np.float32)

    def score_fn(r, c, captions):
        # reverse the candidate order deterministically
        s = r.shape[0]
        return np.tile(np.arange(4, dtype=np.float32), s)

    out = rerank_rankings(
        names, refs, caps, score_fn, name_to_embed, top=4, step=2
    )
    # scores ascending -> best is last candidate -> order reversed in top-4
    assert out[0, :4].tolist() == ["g3", "g2", "g1", "g0"]
    assert out[0, 4:].tolist() == ["g4", "g5"]  # tail untouched
    assert out.shape == names.shape


def test_itm_scorer_with_rerank_model(rng):
    model = build("blip2_cir_rerank")
    B, IMG, TXT = 2, 28, 8
    batch = (
        jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        jnp.asarray(rng.randint(0, 60, (B, TXT)), jnp.int32),
        jnp.asarray(np.ones((B, TXT)), jnp.int32),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, *batch
    )
    params = model.sync_fformer(dict(variables["params"]))

    tok = BertWordPieceTokenizer(
        {t: i for i, t in enumerate(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "red", "dress"])}
    )
    scorer = ItmRerankScorer(model, params, tok, top=3, step=2)
    refs = rng.rand(2, 5, 32).astype(np.float32)
    cands = rng.rand(6, 5, 32).astype(np.float32)
    scores = scorer(refs, cands, ["red dress", "red"])
    assert scores.shape == (6,)
    assert ((scores >= 0) & (scores <= 1)).all()

    # padded final tile (1 query only)
    scores_1 = scorer(refs[:1], cands[:3], ["red dress"])
    assert scores_1.shape == (3,)
    np.testing.assert_allclose(scores_1, scores[:3], atol=1e-5)


def test_submission_dicts_and_files(tmp_path, rng):
    n_gallery, n_query = 60, 4
    names = [f"g{i}" for i in range(n_gallery)]
    sims = rng.randn(n_query, n_gallery).astype(np.float32)
    refs, groups, pair_ids = [], [], []
    for q in range(n_query):
        members = rng.choice(n_gallery, size=7, replace=False)
        refs.append(names[members[0]])
        groups.append([names[m] for m in members[1:]])
        pair_ids.append(q + 100)

    preds, group_preds = build_submission_dicts(sims, names, refs, groups, pair_ids)
    assert set(preds) == {str(p) for p in pair_ids}
    for pid, row in preds.items():
        assert len(row) == 50
        # reference must not appear
        assert refs[pair_ids.index(int(pid))] not in row
    for pid, row in group_preds.items():
        assert len(row) == 3
        assert set(row) <= set(groups[pair_ids.index(int(pid))])

    p1, p2 = write_submission_files(str(tmp_path), "testrun", preds, group_preds)
    with open(p1) as f:
        sub = json.load(f)
    assert sub["version"] == "rc2" and sub["metric"] == "recall"
    with open(p2) as f:
        sub2 = json.load(f)
    assert sub2["metric"] == "recall_subset"


def test_circo_submission_dict_and_file(tmp_path):
    from sprc_tpu.retrieval.submission import (
        build_circo_submission,
        write_circo_submission,
    )

    ids = [str(1000 + i) for i in range(6)]
    # query 0 ranks id 1003 first; query 1 ranks id 1000 first
    sims = np.array(
        [[0.1, 0.2, 0.3, 0.9, 0.0, 0.4],
         [0.8, 0.1, 0.2, 0.3, 0.4, 0.5]], np.float32)
    preds = build_circo_submission(sims, ids, ["7", "9"], top_k=3)
    assert preds["7"] == ["1003", "1005", "1002"]
    assert preds["9"] == ["1000", "1005", "1004"]

    path = write_circo_submission(str(tmp_path), "unit", preds)
    with open(path) as f:
        loaded = json.load(f)
    assert loaded == preds
    assert path.endswith("circo_submission_unit.json")


def test_circo_submission_cli_flow(tmp_path, monkeypatch):
    """End-to-end CIRCO test-split submission over a synthetic fixture with
    the tiny model (the reference never wires CIRCO; this pins our
    beyond-parity CLI: gallery encode -> query scoring -> server JSON)."""
    import argparse

    import PIL.Image

    import sprc_tpu.cli.validate as vcli
    from sprc_tpu.cli.submission import generate_circo_submission
    from sprc_tpu.retrieval.engine import RetrievalEngine

    rng_ = np.random.RandomState(7)
    root = tmp_path / "circo"
    (root / "COCO2017_unlabeled" / "annotations").mkdir(parents=True)
    (root / "COCO2017_unlabeled" / "unlabeled2017").mkdir()
    (root / "annotations").mkdir()
    infos = []
    for i in range(5):
        fname = f"{i:012d}.jpg"
        arr = (rng_.rand(30, 40, 3) * 255).astype(np.uint8)
        PIL.Image.fromarray(arr).save(
            root / "COCO2017_unlabeled" / "unlabeled2017" / fname)
        infos.append({"id": 1000 + i, "file_name": fname})
    (root / "COCO2017_unlabeled" / "annotations"
     / "image_info_unlabeled2017.json").write_text(
        json.dumps({"images": infos}))
    # test split: query-only annotations (no target/gt fields)
    anns = [
        {"id": q, "reference_img_id": 1000 + q,
         "relative_caption": f"caption {q}", "shared_concept": "thing"}
        for q in range(3)
    ]
    (root / "annotations" / "test.json").write_text(json.dumps(anns))

    model = build("blip2_cir_align_prompt")
    params = init_params(model, image_size=28)
    tok = BertWordPieceTokenizer(
        {t: i for i, t in enumerate(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "caption", "0", "1", "2"])})

    def fake_build_engine(args, mesh=None):
        engine = RetrievalEngine(
            model, params, tok, mesh=mesh,
            encode_batch=args.encode_batch, query_batch=args.query_batch)
        return model, engine

    monkeypatch.setattr(vcli, "build_engine", fake_build_engine)
    args = argparse.Namespace(
        dataset="CIRCO", data_path=str(root), model_path=None,
        model_name="blip2_cir_align_prompt", model_type="pretrain",
        vocab_path="unused", transform="targetpad", target_ratio=1.25,
        encode_batch=4, query_batch=2, workers=2, bf16=False,
        dress_types=[], mesh=False, submission_name="e2e",
        output_dir=str(tmp_path / "out"), rerank=False,
        rerank_model_name="blip2_cir_rerank", rerank_model_path=None,
        rerank_top=3, rerank_step=3, model_overrides=[],
    )
    path = generate_circo_submission(args)
    with open(path) as f:
        preds = json.load(f)
    assert set(preds) == {"0", "1", "2"}
    gallery_ids = {str(1000 + i) for i in range(5)}
    for row in preds.values():
        # full 5-image gallery ranked (top_k=50 > N), all ids valid, no dups
        assert len(row) == 5 and set(row) <= gallery_ids
        assert len(set(row)) == len(row)
