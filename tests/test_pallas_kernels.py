"""Pallas kernel correctness (interpret mode on CPU, compiled on TPU).

Layout is BSHD: [batch, seq, heads, head_dim]."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.ops.pallas_attention import _xla_ref, flash_attention


@pytest.mark.parametrize("shape", [(2, 257, 2, 64), (1, 100, 3, 88), (2, 128, 1, 128)])
def test_flash_attention_matches_xla(shape, rng):
    B, S, H, D = shape
    q = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    scale = D**-0.5
    want = _xla_ref(q, k, v, scale)
    got = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_attention_cross_lengths(rng):
    # q and kv lengths differ (cross-attention shape)
    q = jnp.asarray(rng.randn(2, 32, 2, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 257, 2, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 257, 2, 64).astype(np.float32))
    want = _xla_ref(q, k, v, 0.125)
    got = flash_attention(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_attention_grad_matches_xla(rng):
    q = jnp.asarray(rng.randn(1, 64, 2, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 64, 2, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 64, 2, 32).astype(np.float32))

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 0.2) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_ref(q, k, v, 0.2) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


@pytest.mark.parametrize("shape", [(4, 10, 3, 16), (130, 300, 32, 256), (1, 1, 2, 8)])
def test_token_max_sim_pallas_matches_xla(shape, rng):
    from sprc_tpu.ops.pallas_sim import token_max_sim_pallas
    from sprc_tpu.ops.sim_kernels import _xla_token_max_sim

    B, N, Q, E = shape
    feats = jnp.asarray(rng.randn(B, E).astype(np.float32))
    targets = jnp.asarray(rng.randn(N, Q, E).astype(np.float32))
    want = _xla_token_max_sim(feats, targets)
    got = token_max_sim_pallas(feats, targets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("quick", [True, False])
def test_fused_mlp_block_matches_xla(quick, rng):
    from sprc_tpu.ops.pallas_mlp import _xla_ref, fused_mlp_block

    B, S, D, C = 2, 9, 128, 256
    x = jnp.asarray(rng.randn(B, S, D).astype(np.float32) * 0.3)
    ln_s = jnp.asarray(1.0 + 0.1 * rng.randn(D).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(D).astype(np.float32))
    w1 = jnp.asarray(rng.randn(D, C).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(C, D).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(D).astype(np.float32) * 0.05)
    want = _xla_ref(x, ln_s, ln_b, w1, b1, w2, b2, eps=1e-6, quick=quick)
    got = fused_mlp_block(x, ln_s, ln_b, w1, b1, w2, b2, 1e-6, quick)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_mlp_grads_match_xla(rng):
    from sprc_tpu.ops.pallas_mlp import _xla_ref, fused_mlp_block

    B, S, D, C = 1, 4, 128, 256
    args = [
        jnp.asarray(rng.randn(B, S, D).astype(np.float32) * 0.3),
        jnp.asarray(1.0 + 0.1 * rng.randn(D).astype(np.float32)),
        jnp.asarray(0.1 * rng.randn(D).astype(np.float32)),
        jnp.asarray(rng.randn(D, C).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(C).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(C, D).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(D).astype(np.float32) * 0.05),
    ]
    g_p = jax.grad(lambda *a: jnp.sum(fused_mlp_block(*a, 1e-6, True) ** 2), argnums=tuple(range(7)))(*args)
    g_x = jax.grad(lambda *a: jnp.sum(_xla_ref(*a, eps=1e-6, quick=True) ** 2), argnums=tuple(range(7)))(*args)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_vit_block_fused_mlp_parity(rng, monkeypatch):
    """ViTBlock with the fused-MLP path (interpret mode) == unfused, and the
    param tree is identical."""
    from sprc_tpu.models.vit import ViTBlock, ViTConfig

    cfg = ViTConfig(image_size=28, patch_size=14, width=128, depth=1, num_heads=2,
                    mlp_hidden=256, qkv_fused_no_kbias=True, dtype=jnp.float32,
                    quick_gelu=True)
    block = ViTBlock(cfg)
    x = jnp.asarray(rng.randn(2, 9, 128).astype(np.float32) * 0.3)

    monkeypatch.setenv("SPRC_PALLAS_MLP", "0")
    params = block.init(jax.random.PRNGKey(0), x)["params"]
    want = block.apply({"params": params}, x)

    monkeypatch.setenv("SPRC_PALLAS_MLP", "force")
    params_fused = block.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(params_fused) == jax.tree.structure(params)
    got = block.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("B,S,W,H,G", [(8, 37, 64, 4, 4), (6, 16, 32, 2, 4), (3, 9, 48, 3, 4)])
def test_fused_attn_block_matches_xla(B, S, W, H, G, rng):
    from sprc_tpu.ops.pallas_block import _xla_ref as blk_ref
    from sprc_tpu.ops.pallas_block import fused_attn_block

    x = jnp.asarray(rng.randn(B, S, W).astype(np.float32))
    ln_s = jnp.asarray(1 + 0.1 * rng.randn(W).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(W).astype(np.float32))
    wqkv = jnp.asarray(0.05 * rng.randn(W, 3 * W).astype(np.float32))
    bqkv = jnp.asarray(0.05 * rng.randn(3 * W).astype(np.float32))
    wproj = jnp.asarray(0.05 * rng.randn(W, W).astype(np.float32))
    bproj = jnp.asarray(0.05 * rng.randn(W).astype(np.float32))
    scale = (W // H) ** -0.5
    got = fused_attn_block(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, H, 1e-5, scale, G)
    want = blk_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, heads=H, eps=1e-5, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_fused_attn_block_grad_matches_xla(rng):
    from sprc_tpu.ops.pallas_block import _xla_ref as blk_ref
    from sprc_tpu.ops.pallas_block import fused_attn_block

    B, S, W, H = 4, 12, 32, 2
    x = jnp.asarray(rng.randn(B, S, W).astype(np.float32))
    ln_s = jnp.ones((W,), jnp.float32)
    ln_b = jnp.zeros((W,), jnp.float32)
    wqkv = jnp.asarray(0.05 * rng.randn(W, 3 * W).astype(np.float32))
    bqkv = jnp.zeros((3 * W,), jnp.float32)
    wproj = jnp.asarray(0.05 * rng.randn(W, W).astype(np.float32))
    bproj = jnp.zeros((W,), jnp.float32)
    scale = (W // H) ** -0.5

    gp = jax.grad(lambda x_, w_: jnp.sum(
        fused_attn_block(x_, ln_s, ln_b, w_, bqkv, wproj, bproj, H, 1e-5, scale, 2) ** 2
    ), argnums=(0, 1))(x, wqkv)
    gx = jax.grad(lambda x_, w_: jnp.sum(
        blk_ref(x_, ln_s, ln_b, w_, bqkv, wproj, bproj, heads=H, eps=1e-5, scale=scale) ** 2
    ), argnums=(0, 1))(x, wqkv)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


@pytest.mark.parametrize("eva", [False, True])
def test_vit_block_fused_path_matches_unfused(eva, rng, monkeypatch):
    """ViTBlock with SPRC_PALLAS_BLOCK=force produces the same params tree
    and (tolerance) the same output as the unfused default path."""
    from sprc_tpu.models.vit import ViTBlock, ViTConfig

    cfg = ViTConfig(
        image_size=28, patch_size=14, width=32, depth=1, num_heads=2,
        mlp_hidden=64, qkv_fused_no_kbias=eva, dtype=jnp.float32,
    )
    x = jnp.asarray(rng.randn(4, 5, 32).astype(np.float32))
    blk = ViTBlock(cfg)

    monkeypatch.delenv("SPRC_PALLAS_BLOCK", raising=False)
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    want = blk.apply({"params": params}, x)

    monkeypatch.setenv("SPRC_PALLAS_BLOCK", "force")
    params_f = blk.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params_f) == jax.tree_util.tree_structure(params)
    got = blk.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_fused_vit_block_matches_xla(rng):
    from sprc_tpu.ops.pallas_block import _full_xla_ref, fused_vit_block

    B, S, W, H, M = 8, 13, 64, 4, 128
    shapes = [(B, S, W), (W,), (W,), (W, 3 * W), (3 * W,), (W, W), (W,),
              (W,), (W,), (W, M), (M,), (M, W), (W,)]
    args = [jnp.asarray((rng.randn(*sh) * 0.1).astype(np.float32)) for sh in shapes]
    args[1] = args[1] + 1
    args[7] = args[7] + 1
    scale = (W // H) ** -0.5
    for quick in (False, True):
        got = fused_vit_block(*args, H, 1e-5, scale, quick, 4)
        want = _full_xla_ref(*args, heads=H, eps=1e-5, scale=scale, quick=quick)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-6)
    # grad flows through the XLA-recompute VJP
    g = jax.grad(lambda x_: jnp.sum(
        fused_vit_block(x_, *args[1:], H, 1e-5, scale, False, 4) ** 2))(args[0])
    g2 = jax.grad(lambda x_: jnp.sum(
        _full_xla_ref(x_, *args[1:], heads=H, eps=1e-5, scale=scale,
                      quick=False) ** 2))(args[0])
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), atol=5e-4)


def test_fused_vit_block_i8_close_to_fp(rng):
    from sprc_tpu.ops.pallas_block import _full_xla_ref, fused_vit_block_i8
    from sprc_tpu.ops.quant import quantize_weight

    B, S, W, H, M = 4, 9, 32, 2, 64
    x = jnp.asarray((rng.randn(B, S, W) * 0.5).astype(np.float32))
    l1s = jnp.ones(W); l1b = jnp.zeros(W); l2s = jnp.ones(W); l2b = jnp.zeros(W)
    wqkv = jnp.asarray((rng.randn(W, 3 * W) * 0.05).astype(np.float32))
    wproj = jnp.asarray((rng.randn(W, W) * 0.05).astype(np.float32))
    w1 = jnp.asarray((rng.randn(W, M) * 0.05).astype(np.float32))
    w2 = jnp.asarray((rng.randn(M, W) * 0.05).astype(np.float32))
    zb3, zbW, zbM = jnp.zeros(3 * W), jnp.zeros(W), jnp.zeros(M)
    scale = (W // H) ** -0.5
    wq8, sq = quantize_weight(wqkv)
    wp8, sp = quantize_weight(wproj)
    w18, s1 = quantize_weight(w1)
    w28, s2 = quantize_weight(w2)
    acts = (4.0 / 127, 3.0 / 127, 4.0 / 127, 3.0 / 127)
    got = fused_vit_block_i8(x, l1s, l1b, wq8, sq, zb3, wp8, sp, zbW, l2s, l2b,
                             w18, s1, zbM, w28, s2, zbW, heads=H, eps=1e-5,
                             scale=scale, quick=True, acts=acts, G=4)
    ref = _full_xla_ref(x, l1s, l1b, wqkv, zb3, wproj, zbW, l2s, l2b, w1, zbM,
                        w2, zbW, heads=H, eps=1e-5, scale=scale, quick=True)
    rel = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel


def test_vit_block_int8_megakernel_param_tree(rng, monkeypatch):
    """int8_static + SPRC_PALLAS_BLOCK=force routes to the int8 megakernel
    with an UNCHANGED param tree and output close to the fp path."""
    from sprc_tpu.models.vit import ViTBlock, ViTConfig

    scales = (("mlp_fc1", 0.05), ("mlp_fc2", 0.05), ("proj", 0.05), ("qkv", 0.05))
    cfg = ViTConfig(image_size=28, patch_size=14, width=32, depth=1,
                    num_heads=2, mlp_hidden=64, dtype=jnp.float32)
    cfg_i8 = dataclasses_replace(cfg, quant="int8_static", act_scales=scales)
    x = jnp.asarray((rng.randn(4, 5, 32) * 0.3).astype(np.float32))

    monkeypatch.delenv("SPRC_PALLAS_BLOCK", raising=False)
    params = ViTBlock(cfg).init(jax.random.PRNGKey(0), x)["params"]
    want = ViTBlock(cfg).apply({"params": params}, x)

    monkeypatch.setenv("SPRC_PALLAS_BLOCK", "force")
    params_q = ViTBlock(cfg_i8).init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params_q) == jax.tree_util.tree_structure(params)
    got = ViTBlock(cfg_i8).apply({"params": params}, x)
    rel = float(jnp.max(jnp.abs(got - want))) / float(jnp.max(jnp.abs(want)))
    assert rel < 0.06, rel


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


@pytest.mark.parametrize("B", [3, 5, 6])
def test_vit_block_fused_odd_batches(B, rng, monkeypatch):
    """G halves down to divide any batch (odd batches -> G=1)."""
    from sprc_tpu.models.vit import ViTBlock, ViTConfig

    cfg = ViTConfig(image_size=28, patch_size=14, width=32, depth=1,
                    num_heads=2, mlp_hidden=64, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(B, 5, 32).astype(np.float32))
    monkeypatch.delenv("SPRC_PALLAS_BLOCK", raising=False)
    params = ViTBlock(cfg).init(jax.random.PRNGKey(0), x)["params"]
    want = ViTBlock(cfg).apply({"params": params}, x)
    monkeypatch.setenv("SPRC_PALLAS_BLOCK", "force")
    got = ViTBlock(cfg).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


@pytest.mark.parametrize("dense", ["", "batched"])
def test_fused_vit_block_dense_variants_match_xla(dense, rng, monkeypatch):
    """SPRC_FBLK_DENSE=batched (all G items' rows in one [G*S, W] dot per
    dense op — the round-3 megakernel A/B) must agree with the per-group
    default and the XLA reference; it differs in batching, not math."""
    from sprc_tpu.ops.pallas_block import _full_xla_ref, fused_vit_block

    monkeypatch.setenv("SPRC_FBLK_DENSE", dense)
    B, S, W, H, M = 8, 13, 64, 4, 128
    shapes = [(B, S, W), (W,), (W,), (W, 3 * W), (3 * W,), (W, W), (W,),
              (W,), (W,), (W, M), (M,), (M, W), (W,)]
    args = [jnp.asarray((rng.randn(*sh) * 0.1).astype(np.float32))
            for sh in shapes]
    args[1] = args[1] + 1
    args[7] = args[7] + 1
    scale = (W // H) ** -0.5
    got = fused_vit_block(*args, H, 1e-5, scale, False, 4)
    want = _full_xla_ref(*args, heads=H, eps=1e-5, scale=scale, quick=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-6)


@pytest.mark.parametrize("dense", ["", "batched"])
def test_fused_vit_block_i8_dense_variants_agree(dense, rng, monkeypatch):
    """int8 path: the batched-dense variant must be BIT-identical to the
    per-group default (same requant chain, different dot batching)."""
    from sprc_tpu.ops.pallas_block import fused_vit_block_i8
    from sprc_tpu.ops.quant import quantize_weight

    B, S, W, H, M = 4, 9, 32, 2, 64
    x = jnp.asarray((rng.randn(B, S, W) * 0.5).astype(np.float32))
    l1s = jnp.ones(W); l1b = jnp.zeros(W)
    l2s = jnp.ones(W); l2b = jnp.zeros(W)
    wqkv = jnp.asarray((rng.randn(W, 3 * W) * 0.05).astype(np.float32))
    wproj = jnp.asarray((rng.randn(W, W) * 0.05).astype(np.float32))
    w1 = jnp.asarray((rng.randn(W, M) * 0.05).astype(np.float32))
    w2 = jnp.asarray((rng.randn(M, W) * 0.05).astype(np.float32))
    zb3, zbW, zbM = jnp.zeros(3 * W), jnp.zeros(W), jnp.zeros(M)
    scale = (W // H) ** -0.5
    wq8, sq = quantize_weight(wqkv)
    wp8, sp = quantize_weight(wproj)
    w18, s1 = quantize_weight(w1)
    w28, s2 = quantize_weight(w2)
    acts = (4.0 / 127, 3.0 / 127, 4.0 / 127, 3.0 / 127)

    def run():
        return np.asarray(fused_vit_block_i8(
            x, l1s, l1b, wq8, sq, zb3, wp8, sp, zbW, l2s, l2b,
            w18, s1, zbM, w28, s2, zbW, heads=H, eps=1e-5,
            scale=scale, quick=True, acts=acts, G=4))

    monkeypatch.setenv("SPRC_FBLK_DENSE", dense)
    got = run()
    monkeypatch.setenv("SPRC_FBLK_DENSE", "")
    base = run()
    np.testing.assert_allclose(got, base, atol=2e-6)

    # SPRC_FBLK_I8_LNFOLD: quantize scales folded into the LN affines —
    # identical composition up to f32 rounding, which at int8 quantization
    # granularity means at most a +-1-step flip on values that land exactly
    # on a rounding boundary; outputs must stay within one dequant step
    monkeypatch.setenv("SPRC_FBLK_I8_LNFOLD", "1")
    folded = run()
    monkeypatch.delenv("SPRC_FBLK_I8_LNFOLD")
    step = max(float(np.max(np.asarray(s2))) * acts[3],
               float(np.max(np.asarray(sp))) * acts[1])
    np.testing.assert_allclose(folded, base, atol=step + 2e-6)
    assert np.mean(folded != base) < 0.05  # boundary flips are rare


@pytest.mark.parametrize(
    "attn", ["batched", "batched_nomax", "batched_sbf16",
             "batched_nomax_sbf16"])
def test_fused_vit_block_attn_variants_match_xla(attn, rng, monkeypatch):
    """SPRC_FBLK_ATTN softmax variants (round-4 VPU ablation): `nomax`
    elides the max-subtraction pass (clamped exp2 — identical softmax in
    exact arithmetic), `_sbf16` keeps the [H,S,S] scores in bf16 (8-bit
    score mantissas -> ~0.4% relative on probs). Both must track the XLA
    reference within their respective envelopes."""
    from sprc_tpu.ops.pallas_block import _full_xla_ref, fused_vit_block

    monkeypatch.setenv("SPRC_FBLK_ATTN", attn)
    B, S, W, H, M = 8, 13, 64, 4, 128
    shapes = [(B, S, W), (W,), (W,), (W, 3 * W), (3 * W,), (W, W), (W,),
              (W,), (W,), (W, M), (M,), (M, W), (W,)]
    args = [jnp.asarray((rng.randn(*sh) * 0.1).astype(np.float32))
            for sh in shapes]
    args[1] = args[1] + 1
    args[7] = args[7] + 1
    scale = (W // H) ** -0.5
    got = fused_vit_block(*args, H, 1e-5, scale, False, 4)
    want = _full_xla_ref(*args, heads=H, eps=1e-5, scale=scale, quick=False)
    atol = 5e-6 if attn in ("batched", "batched_nomax") else 2e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol)
