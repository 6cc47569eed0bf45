"""Generic i2t/t2i retrieval eval tests (compute_sim_matrix + recalls)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.retrieval.sim_matrix import compute_sim_matrix, retrieval_recalls

from test_variants import build
from sprc_tpu.loader import init_params


def test_sim_matrix_and_recalls(rng):
    model = build("blip2_cir_neg")  # has itm_head materialized
    B, IMG, TXT = 3, 28, 8
    batch = (
        jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32),
        jnp.asarray(rng.randint(0, 60, (B, TXT)), jnp.int32),
        jnp.asarray(np.ones((B, TXT)), jnp.int32),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, *batch
    )
    params = variables["params"]

    n_img, n_txt = 4, 4
    images = jnp.asarray(rng.rand(n_img, IMG, IMG, 3), jnp.float32)
    feats, frozen = model.apply(
        {"params": params}, images, method=model.extract_target_features
    )
    ids = rng.randint(0, 60, (n_txt, TXT)).astype(np.int32)
    mask = np.ones((n_txt, TXT), np.int32)
    text_feats = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
            method=model.encode_text_cls,
        )
    )

    s_i2t, s_t2i = compute_sim_matrix(
        model, params, np.asarray(frozen), np.asarray(feats),
        ids, mask, text_feats, k_test=2, itm_batch=2,
    )
    assert s_i2t.shape == (n_img, n_txt) and s_t2i.shape == (n_txt, n_img)
    # exactly k_test entries per row rescored above the -100 floor
    assert ((s_i2t > -100).sum(axis=1) == 2).all()
    assert ((s_t2i > -100).sum(axis=1) == 2).all()

    img2txt = {i: [i] for i in range(n_img)}
    txt2img = {i: i for i in range(n_txt)}
    recalls = retrieval_recalls(s_i2t, s_t2i, img2txt, txt2img)
    for k in ("txt_r1", "txt_r5", "img_r1", "img_r10", "r_mean"):
        assert 0.0 <= recalls[k] <= 100.0


def test_recalls_perfect_ranking():
    eye = np.eye(3) * 10.0
    recalls = retrieval_recalls(eye, eye.T, {i: [i] for i in range(3)}, {i: i for i in range(3)})
    assert recalls["txt_r1"] == 100.0 and recalls["img_r1"] == 100.0
