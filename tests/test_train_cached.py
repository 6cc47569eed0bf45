"""Cached frozen-feature training: exactness + the cached train step.

The SPRC recipe freezes the ViT and uses a deterministic transform
(reference blip_fine_tune_2.py:251, data_utils.py:91-105), so precomputing
``encode_tower`` outputs once and training from the cache must be
NUMERICALLY IDENTICAL to the live two-tower forward — losses and gradients.

The bitwise assertions pin ``SPRC_PAIR_ENCODE=0`` (two separate tower
calls — also the default). The ``SPRC_PAIR_ENCODE=1`` opt-in batches both
towers into ONE call (``encode_image_pair``), which computes the same
function but lets XLA:CPU pick a different dot reduction order at batch
2B — ``test_pair_encode_matches_cached_tightly`` bounds that drift
(observed on XLA:CPU: losses ≤1 fp32 ulp, grads ≤1.1e-5 absolute).
"""

import os

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _bitwise_live_path():
    """Pin the separate-tower live path for the bit-equality tests."""
    old = os.environ.get("SPRC_PAIR_ENCODE")
    os.environ["SPRC_PAIR_ENCODE"] = "0"
    yield
    if old is None:
        os.environ.pop("SPRC_PAIR_ENCODE", None)
    else:
        os.environ["SPRC_PAIR_ENCODE"] = old

import jax
import jax.numpy as jnp

from sprc_tpu.loader import init_params
from sprc_tpu.train.feature_cache import (
    FeatureCache,
    build_feature_cache,
    cached_batches,
)
from sprc_tpu.train.loop import TrainConfig, create_train_state, make_train_step

from test_data import cirr_root  # noqa: F401  (fixture)
from test_variants import IMG, TXT, VOCAB, B, build


@pytest.fixture(scope="module")
def setup(rng):
    model = build("blip2_cir_align_prompt")
    params = init_params(model, image_size=IMG)
    batch = {
        "reference": jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        "target": jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        "input_ids": jnp.asarray(rng.randint(0, VOCAB, (B, TXT)), jnp.int32),
        "text_mask": jnp.ones((B, TXT), jnp.int32),
    }
    return model, params, batch


def _tower(model, params, imgs):
    return model.apply({"params": params}, imgs, method=model.encode_tower)


def test_cached_losses_equal_live(setup):
    model, params, batch = setup
    live = model.apply(
        {"params": params},
        batch["reference"], batch["target"],
        batch["input_ids"], batch["text_mask"],
        deterministic=True,
    )
    cached = model.apply(
        {"params": params},
        _tower(model, params, batch["reference"]),
        _tower(model, params, batch["target"]),
        batch["input_ids"], batch["text_mask"],
        deterministic=True,
        method=model.forward_cached,
    )
    assert set(live) == set(cached)
    for key in live:
        np.testing.assert_array_equal(np.asarray(live[key]), np.asarray(cached[key]))


VARIANTS = [
    "blip2_cir_align_prompt", "blip2_cir_cat", "blip2_cir_rel",
    "blip2_cir_z_learn_pos_align", "blip2_cir_neg", "blip2_cir_neg_rel",
    "blip2_cir_full", "blip2_cir_rerank", "blip2_cir_cls", "blip2_cir_slt",
    "blip2_cir_prompt",
]


@pytest.mark.parametrize("name", VARIANTS)
def test_cached_forward_equal_live_all_variants(name, setup):
    """forward_cached(encode_tower(x)) == __call__(x) for EVERY CIR variant
    (the generic rank-dispatched encode_image path)."""
    _, _, batch = setup
    model = build(name)
    # init with the real batch: cir_cls needs bs >= NUM_CANDIDATES at init
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["reference"], batch["target"],
        batch["input_ids"], batch["text_mask"],
    )["params"]
    live = model.apply(
        {"params": params},
        batch["reference"], batch["target"],
        batch["input_ids"], batch["text_mask"],
        deterministic=True,
    )
    cached = model.apply(
        {"params": params},
        _tower(model, params, batch["reference"]),
        _tower(model, params, batch["target"]),
        batch["input_ids"], batch["text_mask"],
        deterministic=True,
        method=model.forward_cached,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        live, cached,
    )


def test_cached_grads_equal_live(setup):
    """d(loss)/d(train params) identical between cached and live forwards."""
    model, params, batch = setup
    frozen_keys = {"visual_encoder"}
    train = {k: v for k, v in params.items() if k not in frozen_keys}
    frozen = {k: v for k, v in params.items() if k in frozen_keys}
    ref_t = _tower(model, params, batch["reference"])
    tgt_t = _tower(model, params, batch["target"])

    def live_loss(tp):
        losses = model.apply(
            {"params": {**tp, **frozen}},
            batch["reference"], batch["target"],
            batch["input_ids"], batch["text_mask"],
            deterministic=True,
        )
        return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

    def cached_loss(tp):
        losses = model.apply(
            {"params": {**tp, **frozen}},
            ref_t, tgt_t,
            batch["input_ids"], batch["text_mask"],
            deterministic=True,
            method=model.forward_cached,
        )
        return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

    g_live = jax.grad(live_loss)(train)
    g_cached = jax.grad(cached_loss)(train)
    flat_l, _ = jax.tree_util.tree_flatten_with_path(g_live)
    flat_c, _ = jax.tree_util.tree_flatten_with_path(g_cached)
    assert len(flat_l) == len(flat_c) > 0
    for (path, gl), (_, gc) in zip(flat_l, flat_c):
        np.testing.assert_allclose(
            np.asarray(gl), np.asarray(gc), rtol=0, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pair_encode_matches_cached_tightly(setup):
    """The SPRC_PAIR_ENCODE=1 opt-in live path (one 2B-row tower call,
    cir_base.py ``encode_image_pair``; two separate calls are the default
    after the r4 on-chip measurement) vs cached: same function,
    reduction-order drift only — losses within 1e-6 relative, trainable
    grads within 2e-5."""
    model, params, batch = setup
    os.environ["SPRC_PAIR_ENCODE"] = "1"  # autouse fixture restores

    live = model.apply(
        {"params": params},
        batch["reference"], batch["target"],
        batch["input_ids"], batch["text_mask"],
        deterministic=True,
    )
    cached = model.apply(
        {"params": params},
        _tower(model, params, batch["reference"]),
        _tower(model, params, batch["target"]),
        batch["input_ids"], batch["text_mask"],
        deterministic=True,
        method=model.forward_cached,
    )
    for key in live:
        np.testing.assert_allclose(
            np.asarray(live[key]), np.asarray(cached[key]),
            rtol=1e-6, atol=0, err_msg=key,
        )

    frozen_keys = {"visual_encoder"}
    train = {k: v for k, v in params.items() if k not in frozen_keys}
    frozen = {k: v for k, v in params.items() if k in frozen_keys}
    ref_t = _tower(model, params, batch["reference"])
    tgt_t = _tower(model, params, batch["target"])

    def live_loss(tp):
        losses = model.apply(
            {"params": {**tp, **frozen}},
            batch["reference"], batch["target"],
            batch["input_ids"], batch["text_mask"],
            deterministic=True,
        )
        return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

    def cached_loss(tp):
        losses = model.apply(
            {"params": {**tp, **frozen}},
            ref_t, tgt_t,
            batch["input_ids"], batch["text_mask"],
            deterministic=True,
            method=model.forward_cached,
        )
        return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

    g_live = jax.grad(live_loss)(train)
    g_cached = jax.grad(cached_loss)(train)
    for (path, gl), (_, gc) in zip(
        jax.tree_util.tree_flatten_with_path(g_live)[0],
        jax.tree_util.tree_flatten_with_path(g_cached)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(gl), np.asarray(gc), rtol=0, atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_cached_train_step_runs_and_skips_towers(setup):
    model, params, batch = setup
    tcfg = TrainConfig(learning_rate=1e-3, total_steps=10)
    state, tx = create_train_state(params, tcfg)
    step = make_train_step(model, tx, tcfg, donate=False, from_embeds=True)
    emb_batch = {
        "reference_embeds": _tower(model, params, batch["reference"]),
        "target_embeds": _tower(model, params, batch["target"]),
        "input_ids": batch["input_ids"],
        "text_mask": batch["text_mask"],
    }
    new_state, metrics = step(state, emb_batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # frozen tower untouched; trainable subtree moved
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.params["visual_encoder"])[0]),
        np.asarray(jax.tree.leaves(new_state.params["visual_encoder"])[0]),
    )
    moved = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree.leaves(state.params["qformer"]),
            jax.tree.leaves(new_state.params["qformer"]),
        )
    ]
    assert max(moved) > 0


def test_feature_cache_build_gather_roundtrip(setup, tmp_path, rng):
    model, params, batch = setup
    names = [f"img{i}" for i in range(6)]
    imgs = jnp.asarray(rng.rand(6, IMG, IMG, 3), jnp.float32)
    # duplicate names across batches keep the first row
    stream = [
        (names[:3], np.asarray(imgs[:3])),
        ([names[2]] + names[3:], np.asarray(imgs[2:])),
    ]
    cache = build_feature_cache(model, params, iter(stream), host_dtype=jnp.float32)
    assert len(cache) == 6 and set(cache.names) == set(names)
    direct = np.asarray(_tower(model, params, imgs))
    np.testing.assert_allclose(cache.gather(names), direct, atol=1e-6)
    # gather in shuffled order
    order = [4, 0, 5, 2]
    np.testing.assert_allclose(
        cache.gather([names[i] for i in order]), direct[order], atol=1e-6
    )
    # save/load roundtrip (bf16 rows go through the uint16 view)
    bf = FeatureCache(cache.names, cache.rows.astype(jnp.bfloat16))
    path = str(tmp_path / "cache")
    bf.save(path)
    loaded = FeatureCache.load(path)
    assert loaded.names == bf.names
    np.testing.assert_array_equal(
        np.asarray(loaded.rows, np.float32), np.asarray(bf.rows, np.float32)
    )


def test_cached_batches_stream(setup, rng):
    model, params, _ = setup
    from sprc_tpu.text.tokenizer import BertWordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "red", "dress", "shirt"]
    tok = BertWordPieceTokenizer({t: i for i, t in enumerate(vocab)})
    names = [f"g{i}" for i in range(5)]
    imgs = np.asarray(rng.rand(5, IMG, IMG, 3), np.float32)
    cache = build_feature_cache(
        model, params, iter([(names, imgs)]), host_dtype=jnp.float32
    )
    triplets = [
        {"reference_name": names[i], "target_name": names[(i + 1) % 5],
         "caption": "red dress"}
        for i in range(5)
    ]
    out = list(cached_batches(
        cache, triplets, tok, lambda s: s, TXT, batch_size=2,
        shuffle_rng=np.random.RandomState(0),
    ))
    assert len(out) == 2  # drop_last on 5 items / b2
    for b in out:
        assert b["reference_embeds"].shape[0] == 2
        assert b["input_ids"].shape == (2, TXT)
    # non-drop_last keeps the tail
    out_all = list(cached_batches(
        cache, triplets, tok, lambda s: s, TXT, batch_size=2, drop_last=False,
    ))
    assert sum(b["input_ids"].shape[0] for b in out_all) == 5


def test_finetune_cli_cache_features(cirr_root, tmp_path, monkeypatch):
    """The --cache-features CLI path end-to-end over synthetic CIRR data:
    cache built + saved, cached steps run, logs written, cache reloaded on a
    second invocation."""
    import sprc_tpu.loader as loader_mod
    from sprc_tpu.cli import finetune as ft

    root = cirr_root
    model = build("blip2_cir_align_prompt")
    params = init_params(model, image_size=IMG)
    # hand out a fresh copy per invocation: the train step donates the state,
    # which deletes the param buffers — the real load_model builds fresh
    # params every call
    monkeypatch.setattr(
        loader_mod, "load_model",
        lambda *a, **kw: (model, jax.tree.map(jnp.array, params)),
    )
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "caption", "0", "1", "2", "3"]
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(vocab))
    out = tmp_path / "out"
    argv = [
        "--dataset", "CIRR", "--data-path", str(root),
        "--vocab-path", str(vocab_path), "--output-dir", str(out),
        "--batch-size", "2", "--num-epochs", "2", "--learning-rate", "5e-3",
        "--workers", "1", "--encode-batch", "4", "--validate-every", "2",
        "--query-batch", "2",
        "--cache-features",
    ]
    ft.main(argv)
    assert (out / "feature_cache.npz").exists()
    assert (out / "last_state").exists()
    # second run loads the saved cache (fresh output dir, shared cache path)
    out2 = tmp_path / "out2"
    argv2 = argv[:-1] + [
        "--feature-cache-path", str(out / "feature_cache"), "--cache-features"
    ]
    argv2[argv2.index(str(out))] = str(out2)
    ft.main(argv2)
    assert (out2 / "last_state").exists()
