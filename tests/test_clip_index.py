"""Flat CLIP gallery helpers (retrieval/clip_index.py).

Covers the reference's CLIP-index utilities: extract_index_features
(`src/utils.py:20-43`) and element_wise_sum (`:107-114`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.clip import Clip, ClipConfig, ClipTextConfig
from sprc_tpu.models.vit import ViTConfig
from sprc_tpu.retrieval.clip_index import (
    element_wise_sum,
    extract_clip_index_features,
)

IMG = 32
PATCH = 16


@pytest.fixture(scope="module")
def clip_model():
    cfg = ClipConfig(
        embed_dim=24,
        image_size=IMG,
        vision=ViTConfig(
            image_size=IMG, patch_size=PATCH, width=32, depth=2,
            num_heads=2, mlp_hidden=128, layer_norm_eps=1e-5,
            use_ln_pre=True, quick_gelu=True, final_norm=True,
            patch_bias=False, dtype=jnp.float32,
        ),
        text=ClipTextConfig(
            vocab_size=70, width=32, layers=2, heads=2, context_length=12,
        ),
    )
    model = Clip(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    eot = jnp.zeros((1,), jnp.int32)
    img = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, ids, eot)["params"]
    return model, params


def test_element_wise_sum_normalized(rng):
    img = jnp.asarray(rng.randn(4, 8).astype(np.float32)) * 3.0
    txt = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    got = np.asarray(element_wise_sum(img, txt))
    want = np.asarray(img) + np.asarray(txt)
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=-1), np.ones(4), atol=1e-6
    )


def test_extract_clip_index_features(clip_model, rng):
    model, params = clip_model
    images = rng.rand(5, IMG, IMG, 3).astype(np.float32)
    names = [f"img{i}" for i in range(5)]
    # trailing partial batch (3 + 2) exercises the pad-to-encode_batch path
    batches = [(names[:3], images[:3]), (names[3:], images[3:])]

    feats, got_names = extract_clip_index_features(
        batches, model, params, encode_batch=3
    )
    assert got_names == names
    assert feats.shape == (5, 24) and feats.dtype == np.float32

    direct = np.asarray(
        model.apply({"params": params}, jnp.asarray(images),
                    method=model.encode_image)
    )
    np.testing.assert_allclose(feats, direct, atol=1e-5)
    # reference keeps index features NON-normalized (utils.py:31)
    assert not np.allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-3)

    normed, _ = extract_clip_index_features(
        batches, model, params, encode_batch=3, normalize=True
    )
    np.testing.assert_allclose(
        np.linalg.norm(normed, axis=-1), np.ones(5), atol=1e-5
    )


def test_extract_oversize_batch_rechunked(clip_model, rng):
    """A stream batch LARGER than encode_batch is split into encode_batch
    chunks (one compiled shape serves the gallery — no per-shape recompile),
    with results identical to the direct whole-array encode."""
    model, params = clip_model
    images = rng.rand(7, IMG, IMG, 3).astype(np.float32)
    names = [f"img{i}" for i in range(7)]
    feats, got_names = extract_clip_index_features(
        [(names, images)], model, params, encode_batch=3
    )
    assert got_names == names and feats.shape == (7, 24)
    direct = np.asarray(
        model.apply({"params": params}, jnp.asarray(images),
                    method=model.encode_image)
    )
    np.testing.assert_allclose(feats, direct, atol=1e-5)


def test_extract_empty_stream(clip_model):
    model, params = clip_model
    feats, names = extract_clip_index_features([], model, params)
    # empty stream still reports the model's feature dim, not (0, 0)
    assert feats.shape == (0, 24) and names == []
