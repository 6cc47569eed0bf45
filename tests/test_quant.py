"""Int8 PTQ path: numerics of the quant ops, param-tree invariance, and an
encode A/B between the int8 and fp32 towers (tiny dims, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.ops.quant import int8_matmul, quantize_act, quantize_weight


def test_weight_roundtrip_error_bounded():
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(64, 32) * 0.05, jnp.float32)
    w8, s = quantize_weight(w)
    assert w8.dtype == jnp.int8 and s.shape == (32,)
    deq = w8.astype(jnp.float32) * s
    assert float(jnp.abs(deq - w).max()) <= float(s.max()) * 0.5 + 1e-7


def test_act_scale_per_token():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(3, 5, 16), jnp.float32)
    x8, s = quantize_act(x)
    assert x8.shape == x.shape and s.shape == (3, 5, 1)
    assert int(jnp.abs(x8).max()) <= 127
    # the max-magnitude element of each token maps to +-127 exactly
    deq = x8.astype(jnp.float32) * s
    assert float(jnp.abs(deq - x).max()) < float(s.max()) * 0.51


def test_int8_matmul_close_to_fp32():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(8, 64), jnp.float32)
    w = jnp.asarray(rs.randn(64, 32) * 0.05, jnp.float32)
    b = jnp.asarray(rs.randn(32) * 0.01, jnp.float32)
    w8, ws = quantize_weight(w)
    y_q = int8_matmul(x, w8, ws, b, out_dtype=jnp.float32)
    y = x @ w + b
    rel = float(jnp.linalg.norm(y_q - y) / jnp.linalg.norm(y))
    assert rel < 0.02, rel


@pytest.fixture(scope="module")
def tiny_pair():
    """(fp32 model, int8 model, shared params) at tiny dims."""
    import dataclasses

    from sprc_tpu.loader import init_params
    from sprc_tpu.models.cir_base import CirConfig
    from sprc_tpu.models.qformer import QFormerConfig
    from sprc_tpu.models.vit import ViTConfig
    from sprc_tpu.registry import registry

    vcfg = ViTConfig(
        image_size=28, patch_size=14, width=32, depth=2, num_heads=2,
        mlp_hidden=64, qkv_fused_no_kbias=True, dtype=jnp.float32,
    )
    qcfg = QFormerConfig(
        vocab_size=60, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, encoder_width=32, query_length=4,
        dropout_rate=0.0,
    )
    mk = lambda v: CirConfig(
        vit_model="eva_clip_g", image_size=28, num_query_token=4,
        max_txt_len=8, vocab_size=60, vit_dtype=jnp.float32,
        vit_config_override=v, qformer_config_override=qcfg,
    )
    cls = registry.get_model_class("blip2_cir_align_prompt")
    m_fp = cls(mk(vcfg))
    m_q = cls(mk(dataclasses.replace(vcfg, quant="int8")))
    params = init_params(m_fp, image_size=28)
    return m_fp, m_q, params


def test_param_tree_identical(tiny_pair):
    m_fp, m_q, params = tiny_pair
    from sprc_tpu.loader import init_params

    params_q = init_params(m_q, image_size=28)
    paths_fp = {"/".join(map(str, p)) for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    paths_q = {"/".join(map(str, p)) for p, _ in jax.tree_util.tree_leaves_with_path(params_q)}
    assert paths_fp == paths_q


def test_int8_encode_close_and_rank_preserving(tiny_pair):
    m_fp, m_q, params = tiny_pair
    rs = np.random.RandomState(3)
    gallery = jnp.asarray(rs.rand(8, 28, 28, 3), jnp.float32)

    f_fp, _ = m_fp.apply({"params": params}, gallery, method=m_fp.extract_target_features)
    f_q, _ = m_q.apply({"params": params}, gallery, method=m_q.extract_target_features)
    # features are l2-normalized; cosine agreement per query token
    cos = jnp.sum(f_fp * f_q, axis=-1)
    assert float(cos.min()) > 0.99, float(cos.min())

    # ranking A/B: score 4 queries against the gallery with both towers
    ids = jnp.asarray(rs.randint(0, 60, (4, 8)), jnp.int32)
    mask = jnp.ones((4, 8), jnp.int32)
    refs = jnp.asarray(rs.rand(4, 28, 28, 3), jnp.float32)
    emb_fp = m_fp.apply({"params": params}, refs, method=m_fp.encode_image)
    emb_q = m_q.apply({"params": params}, refs, method=m_q.encode_image)
    s_fp = m_fp.apply({"params": params}, emb_fp, f_fp, ids, mask, method=m_fp.inference)
    s_q = m_q.apply({"params": params}, emb_q, f_q, ids, mask, method=m_q.inference)
    top1_fp = np.argmax(np.asarray(s_fp), axis=1)
    top1_q = np.argmax(np.asarray(s_q), axis=1)
    assert (top1_fp == top1_q).mean() >= 0.75


def test_int8_static_calibrated_close(tiny_pair):
    import dataclasses

    m_fp, m_q, params = tiny_pair
    from sprc_tpu.models.vit import calibrate_act_scales
    from sprc_tpu.models.cir_base import CirConfig
    from sprc_tpu.registry import registry

    rs = np.random.RandomState(5)
    gallery = jnp.asarray(rs.rand(6, 28, 28, 3), jnp.float32)

    vcfg = m_q.cfg.vit_config()
    calib_cfg = dataclasses.replace(m_q.cfg, vit_config_override=dataclasses.replace(vcfg, quant="int8_calib"))
    cls = registry.get_model_class("blip2_cir_align_prompt")
    m_cal = cls(calib_cfg)
    scales = calibrate_act_scales(
        m_cal, params, gallery, method=m_cal.extract_target_features
    )
    assert {k for k, _ in scales} == {"qkv", "proj", "mlp_fc1", "mlp_fc2"}
    assert all(v > 0 for _, v in scales)

    static_cfg = dataclasses.replace(
        m_q.cfg,
        vit_config_override=dataclasses.replace(
            vcfg, quant="int8_static", act_scales=scales
        ),
    )
    m_st = cls(static_cfg)
    f_fp, _ = m_fp.apply({"params": params}, gallery, method=m_fp.extract_target_features)
    f_st, _ = m_st.apply({"params": params}, gallery, method=m_st.extract_target_features)
    cos = jnp.sum(f_fp * f_st, axis=-1)
    assert float(cos.min()) > 0.98, float(cos.min())
