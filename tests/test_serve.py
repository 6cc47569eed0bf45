"""Serving surface: index save/load roundtrip + the HTTP retrieval service
end-to-end (tiny model, synthetic CIRR gallery, real sockets)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.cli.serve import RetrievalService, make_server
from sprc_tpu.loader import init_params
from sprc_tpu.retrieval.engine import RetrievalEngine
from sprc_tpu.text.tokenizer import BertWordPieceTokenizer

from test_variants import IMG, TXT, VOCAB, build

TOKENS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "red", "dress", "long"]


@pytest.fixture(scope="module")
def engine_index(rng):
    model = build("blip2_cir_align_prompt")
    params = init_params(model, image_size=IMG)
    tok = BertWordPieceTokenizer({t: i for i, t in enumerate(TOKENS)})
    engine = RetrievalEngine(model, params, tok, encode_batch=4, query_batch=2)
    names = [f"g{i}" for i in range(7)]  # odd size: pads the last batch
    imgs = rng.rand(7, IMG, IMG, 3).astype(np.float32)
    batches = [
        (names[s : s + 4], imgs[s : s + 4]) for s in range(0, 7, 4)
    ]
    index = engine.build_index(iter(batches))
    return engine, index, names


def test_index_save_load_roundtrip(engine_index, tmp_path):
    engine, index, names = engine_index
    path = str(tmp_path / "gallery_index")
    index.save(path)
    loaded = engine.load_index(path)
    assert loaded.names == index.names and loaded.n == index.n
    np.testing.assert_array_equal(
        np.asarray(loaded.frozen_embeds, np.float32),
        np.asarray(index.frozen_embeds, np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(index.target_feats)[: index.n],
        np.asarray(loaded.target_feats)[: loaded.n],
    )
    # scoring through the reloaded index matches the fresh one exactly
    sims_a = engine.score_queries(index, [names[0]], ["red dress"])
    sims_b = engine.score_queries(loaded, [names[0]], ["red dress"])
    np.testing.assert_array_equal(sims_a, sims_b)


def test_index_save_load_bf16_host_dtype(rng, tmp_path):
    model = build("blip2_cir_align_prompt")
    params = init_params(model, image_size=IMG)
    engine = RetrievalEngine(
        model, params, encode_batch=2, frozen_host_dtype=jnp.bfloat16
    )
    names = ["a", "b"]
    index = engine.build_index(
        iter([(names, rng.rand(2, IMG, IMG, 3).astype(np.float32))])
    )
    assert index.frozen_embeds.dtype == jnp.bfloat16
    path = str(tmp_path / "bf16_index")
    index.save(path)
    loaded = engine.load_index(path)
    assert loaded.frozen_embeds.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(loaded.frozen_embeds, np.float32),
        np.asarray(index.frozen_embeds, np.float32),
    )


def test_service_query_ranks_and_masks_reference(engine_index):
    engine, index, names = engine_index
    service = RetrievalService(engine, index)
    service.warm()
    results = service.query([(names[0], "red dress"), (names[3], "long")], k=3)
    assert len(results) == 2
    for res, ref in zip(results, [names[0], names[3]]):
        assert len(res) == 3
        assert all(r["name"] != ref for r in res)  # reference masked
        scores = [r["score"] for r in res]
        assert scores == sorted(scores, reverse=True)
    with pytest.raises(KeyError):
        service.query([("nope", "red")], k=1)


def test_http_server_end_to_end(engine_index):
    engine, index, names = engine_index
    service = RetrievalService(engine, index)
    service.warm()
    server = make_server(service, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        health = json.loads(urllib.request.urlopen(f"{base}/health").read())
        assert health == {"status": "ok", "gallery": 7}

        req = urllib.request.Request(
            f"{base}/query",
            data=json.dumps(
                {"reference": names[1], "caption": "red dress", "k": 2}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        out = json.loads(urllib.request.urlopen(req).read())
        assert len(out["results"]) == 1 and len(out["results"][0]) == 2

        # batch form
        req = urllib.request.Request(
            f"{base}/query",
            data=json.dumps(
                {
                    "queries": [
                        {"reference": names[0], "caption": "red"},
                        {"reference": names[2], "caption": "long dress"},
                    ],
                    "k": 1,
                }
            ).encode(),
        )
        out = json.loads(urllib.request.urlopen(req).read())
        assert len(out["results"]) == 2

        # bad reference -> 400 with an error body
        req = urllib.request.Request(
            f"{base}/query",
            data=json.dumps({"reference": "missing", "caption": "x"}).encode(),
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "unknown reference" in json.loads(e.read())["error"]
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_service_rerank_second_stage(rng):
    """Two-stage serving: /query rerank=true reorders the top-`top` prefix
    by ITM scores from the model's inference_rerank (reference flow
    cirr_test_submission.py:87-112) while preserving the candidate set."""
    from sprc_tpu.retrieval.rerank import ItmRerankScorer

    model = build("blip2_cir_cat")  # rerank-capable variant
    params = init_params(model, image_size=IMG)
    tok = BertWordPieceTokenizer({t: i for i, t in enumerate(TOKENS)})
    engine = RetrievalEngine(model, params, tok, encode_batch=4, query_batch=2)
    names = [f"g{i}" for i in range(7)]
    imgs = rng.rand(7, IMG, IMG, 3).astype(np.float32)
    index = engine.build_index(
        iter([(names[s : s + 4], imgs[s : s + 4]) for s in range(0, 7, 4)])
    )
    scorer = ItmRerankScorer(model, params, tok, top=4, step=2)
    service = RetrievalService(engine, index, rerank_scorer=scorer)
    service.warm()

    pairs = [(names[0], "red dress"), (names[3], "long")]
    stage1 = service.query(pairs, k=4)
    reranked = service.query(pairs, k=4, rerank=True)
    for s1, s2, ref in zip(stage1, reranked, [names[0], names[3]]):
        # same candidate set over the reranked prefix, reference still masked
        assert {r["name"] for r in s1} == {r["name"] for r in s2}
        assert all(r["name"] != ref for r in s2)
        # returned scores remain the stage-1 similarities
        scores = {r["name"]: r["score"] for r in s1}
        assert all(r["score"] == scores[r["name"]] for r in s2)

    # rerank without a scorer -> clear error (HTTP layer maps it to 400)
    bare = RetrievalService(engine, index)
    with pytest.raises(ValueError, match="rerank requested"):
        bare.query(pairs, k=2, rerank=True)

    # gallery smaller than the compiled tile -> clear error
    big = ItmRerankScorer(model, params, tok, top=50, step=2)
    svc = RetrievalService(engine, index, rerank_scorer=big)
    with pytest.raises(ValueError, match="gallery too small"):
        svc.query(pairs, k=2, rerank=True)
