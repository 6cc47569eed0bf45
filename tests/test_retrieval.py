"""Retrieval engine + metrics tests.

- engine vs direct model application (sharded-mesh index path included)
- CIRR metric suite vs a torch re-derivation of the reference formulas
  (validate_blip.py:232-285)
- top-K path masks gallery padding correctly
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.retrieval.engine import RetrievalEngine
from sprc_tpu.retrieval.metrics import (
    compute_cirr_metrics,
    compute_fiq_metrics,
    cirr_topk_lists,
)
from sprc_tpu.text.tokenizer import BertWordPieceTokenizer

from test_train import tiny_model
from sprc_tpu.loader import init_params

VOCAB_TOKENS = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "red", "blue", "dress", "shirt", "same", "but", "longer", "shorter",
]


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    params = init_params(model, image_size=28)
    tok = BertWordPieceTokenizer({t: i for i, t in enumerate(VOCAB_TOKENS)})
    return model, params, tok


def gallery_batches(rng, n=10, bs=4, img=28):
    names = [f"img{i}" for i in range(n)]
    images = rng.rand(n, img, img, 3).astype(np.float32)
    for i in range(0, n, bs):
        yield names[i : i + bs], images[i : i + bs]


def test_engine_matches_direct(setup, rng):
    model, params, tok = setup
    engine = RetrievalEngine(model, params, tok, encode_batch=4, query_batch=3)
    batches = list(gallery_batches(rng, n=10))
    index = engine.build_index(iter(batches))
    assert index.n == 10 and len(index.names) == 10

    # direct single-shot reference computation
    all_images = np.concatenate([b[1] for b in batches], axis=0)
    feats_direct, frozen_direct = model.apply(
        {"params": params}, jnp.asarray(all_images),
        method=model.extract_target_features,
    )
    # atol: the engine encodes in batches of 4 while the reference is one
    # batch of 10; XLA-CPU (oneDNN) reduction order varies with batch shape
    # and machine load, so exact 1e-6 agreement is not guaranteed
    np.testing.assert_allclose(
        np.asarray(index.target_feats)[:10], np.asarray(feats_direct), atol=1e-5
    )
    np.testing.assert_allclose(index.frozen_embeds, np.asarray(frozen_direct), atol=1e-5)

    captions = ["same dress but red", "shorter shirt", "blue dress", "longer"]
    refs = ["img0", "img3", "img5", "img9"]
    sims = engine.score_queries(index, refs, captions)
    assert sims.shape == (4, 10)

    tok_batch = tok(captions, max_length=8)
    sims_direct = model.apply(
        {"params": params},
        jnp.asarray(index.reference_embeds(refs)),
        feats_direct,
        jnp.asarray(tok_batch["input_ids"]),
        jnp.asarray(tok_batch["attention_mask"]),
        method=model.inference,
    )
    np.testing.assert_allclose(sims, np.asarray(sims_direct), atol=1e-5)


def test_engine_sharded_matches_unsharded(setup, rng):
    from sprc_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model, params, tok = setup
    batches = list(gallery_batches(rng, n=10))

    plain = RetrievalEngine(model, params, tok, encode_batch=4, query_batch=3)
    sharded = RetrievalEngine(
        model, params, tok, mesh=make_mesh(8), encode_batch=4, query_batch=3
    )
    idx_a = plain.build_index(iter(batches))
    idx_b = sharded.build_index(iter(batches))
    assert idx_b.target_feats.shape[0] == 16  # padded to 8-multiple

    captions = ["same dress but red", "shorter shirt"]
    refs = ["img0", "img7"]
    sims_a = plain.score_queries(idx_a, refs, captions)
    sims_b = sharded.score_queries(idx_b, refs, captions)
    np.testing.assert_allclose(sims_a, sims_b, atol=1e-5)

    # top-K must mask the padded rows
    feats = plain._fuse(
        params,
        jnp.asarray(idx_b.reference_embeds(refs)),
        jnp.asarray(tok(captions, max_length=8)["input_ids"]),
        jnp.asarray(tok(captions, max_length=8)["attention_mask"]),
    )
    sims_dev = sharded._sim(feats, idx_b.target_feats)
    vals, ids = sharded.topk(idx_b, sims_dev, k=10)
    assert ids.max() < 10
    order = np.argsort(-sims_a, axis=-1, kind="stable")
    np.testing.assert_array_equal(np.sort(ids, -1), np.sort(order[:, :10], -1))


def _torch_reference_cirr(sims, index_names, reference_names, target_names, group_members):
    """The reference metric math re-derived with torch ops
    (validate_blip.py:252-285)."""
    torch = pytest.importorskip("torch")

    distances = 1 - torch.from_numpy(sims)
    sorted_indices = torch.argsort(distances, dim=-1).cpu()
    sorted_index_names = np.array(index_names)[sorted_indices]
    n = len(index_names)
    reference_mask = torch.tensor(
        sorted_index_names != np.repeat(np.array(reference_names), n).reshape(len(target_names), -1)
    )
    sorted_index_names = sorted_index_names[reference_mask].reshape(
        sorted_index_names.shape[0], sorted_index_names.shape[1] - 1
    )
    labels = torch.tensor(
        sorted_index_names == np.repeat(np.array(target_names), n - 1).reshape(len(target_names), -1)
    )
    group_members = np.array(group_members)
    group_mask = (sorted_index_names[..., None] == group_members[:, None, :]).sum(-1).astype(bool)
    group_labels = labels[group_mask].reshape(labels.shape[0], -1)
    out = {}
    for k in (1, 5, 10, 50):
        out[f"recall_at{k}"] = (torch.sum(labels[:, :k]) / len(labels)).item() * 100
    for k in (1, 2, 3):
        out[f"group_recall_at{k}"] = (
            torch.sum(group_labels[:, :k]) / len(group_labels)
        ).item() * 100
    return out


def test_cirr_metrics_match_reference_formulas(rng):
    n_gallery, n_query, group = 60, 20, 6
    names = [f"g{i}" for i in range(n_gallery)]
    sims = rng.randn(n_query, n_gallery).astype(np.float32)
    refs, targets, groups = [], [], []
    for q in range(n_query):
        members = list(rng.choice(n_gallery, size=group + 1, replace=False))
        ref = names[members[0]]
        member_names = [names[m] for m in members[1:]]
        refs.append(ref)
        targets.append(member_names[0])
        groups.append(member_names)

    got = compute_cirr_metrics(sims, names, refs, targets, groups)
    want = _torch_reference_cirr(sims, names, refs, targets, groups)
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, atol=1e-9, err_msg=k)


def test_fiq_metrics_and_ties(rng):
    names = ["a", "b", "c", "d"]
    sims = np.array(
        [[0.5, 0.5, 0.9, 0.1], [0.2, 0.2, 0.2, 0.2]], np.float32
    )
    r10, r50 = compute_fiq_metrics(sims, names, ["c", "a"])
    assert r10 == 100.0 and r50 == 100.0
    # ties broken stably: equal sims keep gallery order
    r10_first, _ = compute_fiq_metrics(sims[1:], names, ["a"])
    assert r10_first == 100.0


def test_cirr_topk_lists(rng):
    names = [f"g{i}" for i in range(10)]
    sims = rng.randn(2, 10).astype(np.float32)
    refs = ["g0", "g1"]
    groups = [["g2", "g3", "g4", "g5", "g6", "g7"], ["g2", "g3", "g4", "g5", "g6", "g7"]]
    top50, top3 = cirr_topk_lists(sims, names, refs, groups, k_global=5, k_subset=3)
    assert len(top50[0]) == 5 and len(top3[0]) == 3
    assert refs[0] not in top50[0] and refs[1] not in top50[1]
    assert set(top3[0]) <= set(groups[0])


def test_circo_map(rng):
    from sprc_tpu.retrieval.metrics import compute_circo_metrics

    names = [f"g{i}" for i in range(8)]
    # query 0: ranks by sim -> g0 best...; GTs at ranks 1 and 3
    sims = np.array([[8, 7, 6, 5, 4, 3, 2, 1]], np.float32)
    res = compute_circo_metrics(sims, names, [["g0", "g2", ""]], ks=(5,))
    # AP@5 = (1/1 + 2/3) / 2
    np.testing.assert_allclose(res["map_at5"], (1.0 + 2 / 3) / 2 * 100, atol=1e-6)
    # no GT in top-k
    res2 = compute_circo_metrics(sims, names, [["g7", ""]], ks=(5,))
    assert res2["map_at5"] == 0.0


def test_instruct_models_registered():
    from sprc_tpu.registry import registry
    from sprc_tpu.models.instruct_cir import InstructCir, VicunaInstructCir

    assert registry.get_model_class("blip2_vicuna_instruct") is VicunaInstructCir
    assert registry.get_model_class("blip2_instruct_cir") is InstructCir


def test_build_index_raw_device_preprocess(setup, rng):
    """Raw uint8 + on-device preprocess path produces features close to the
    host-PIL path."""
    import PIL.Image

    from sprc_tpu.data.transforms import targetpad_transform

    model, params, tok = setup
    engine = RetrievalEngine(model, params, tok, encode_batch=4, query_batch=2)

    n, H, W = 6, 40, 56
    raws = (rng.rand(n, H, W, 3) * 255).astype(np.uint8)
    sizes = np.tile(np.asarray([[H, W]], np.int32), (n, 1))
    names = [f"r{i}" for i in range(n)]

    def raw_batches():
        for s in range(0, n, 4):
            yield names[s:s+4], raws[s:s+4], sizes[s:s+4]

    index = engine.build_index_raw(raw_batches())
    assert index.n == n

    # host-PIL reference index
    tfm = targetpad_transform(1.25, model.cfg.image_size)
    imgs = np.stack([tfm(PIL.Image.fromarray(r)) for r in raws])

    def host_batches():
        for s in range(0, n, 4):
            yield names[s:s+4], imgs[s:s+4]

    host_index = engine.build_index(host_batches())
    # bicubic impls differ slightly; features must still be close
    diff = np.abs(np.asarray(index.target_feats)[:n] - np.asarray(host_index.target_feats)[:n])
    assert float(diff.mean()) < 0.05, float(diff.mean())
