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
