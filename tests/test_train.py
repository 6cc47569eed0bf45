"""Training stack tests: schedule parity vs torch, train-step behavior,
frozen-ViT invariants, data-parallel sharding, checkpoint resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.cir_base import CirConfig
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.vit import ViTConfig
from sprc_tpu.registry import registry
from sprc_tpu.loader import init_params
from sprc_tpu.train.loop import (
    TrainConfig,
    create_train_state,
    make_train_step,
)
from sprc_tpu.train.schedules import onecycle_schedule


def tiny_model(vocab=60, img=28):
    vcfg = ViTConfig(
        image_size=img, patch_size=14, width=32, depth=2, num_heads=2,
        mlp_hidden=64, qkv_fused_no_kbias=True, dtype=jnp.float32,
    )
    qcfg = QFormerConfig(
        vocab_size=vocab, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, encoder_width=32, query_length=4,
        dropout_rate=0.0, attention_dropout_rate=0.0,
    )
    cfg = CirConfig(
        vit_model="eva_clip_g", image_size=img, num_query_token=4,
        max_txt_len=8, vocab_size=vocab, vit_dtype=jnp.float32,
        vit_config_override=vcfg, qformer_config_override=qcfg,
    )
    return registry.get_model_class("blip2_cir_align_prompt")(cfg)


def make_batch(rng, b=8, img=28, vocab=60, txt=8):
    return {
        "reference": jnp.asarray(rng.rand(b, img, img, 3), jnp.float32),
        "target": jnp.asarray(rng.rand(b, img, img, 3), jnp.float32),
        "input_ids": jnp.asarray(rng.randint(0, vocab, size=(b, txt)), jnp.int32),
        "text_mask": jnp.asarray(np.ones((b, txt)), jnp.int32),
    }


def test_onecycle_matches_torch():
    torch = pytest.importorskip("torch")
    from torch.optim.lr_scheduler import OneCycleLR

    max_lr, total = 1e-4, 40
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=max_lr)
    sched = OneCycleLR(opt, max_lr=max_lr, total_steps=total, pct_start=0.3)
    ours = onecycle_schedule(max_lr, total, pct_start=0.3)
    for step in range(total):
        want = sched.get_last_lr()[0]
        got = float(ours(step))
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=f"step {step}")
        opt.step()
        sched.step()


def test_train_step_decreases_loss_and_freezes_vit(rng):
    model = tiny_model()
    params = init_params(model, image_size=28)
    cfg = TrainConfig(learning_rate=3e-3, total_steps=100)
    state, tx = create_train_state(params, cfg)
    step = make_train_step(model, tx, cfg, donate=False)

    batch = make_batch(rng)
    frozen_before = jax.tree.map(np.asarray, state.params["visual_encoder"])
    first = None
    for _ in range(8):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first, (first, last)
    assert int(state.step) == 8

    # frozen tower must be bit-identical
    frozen_after = jax.tree.map(np.asarray, state.params["visual_encoder"])
    for a, b in zip(jax.tree.leaves(frozen_before), jax.tree.leaves(frozen_after)):
        np.testing.assert_array_equal(a, b)
    # trainable parts must have moved
    assert not np.allclose(
        np.asarray(state.params["query_tokens"]), np.asarray(params["query_tokens"])
    )


def test_train_step_sharded_matches_single(rng):
    from sprc_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = tiny_model()
    params = init_params(model, image_size=28)
    cfg = TrainConfig(learning_rate=1e-3, total_steps=100)
    batch = make_batch(rng, b=8)

    state1, tx1 = create_train_state(params, cfg)
    step1 = make_train_step(model, tx1, cfg, donate=False)
    _, m1 = step1(state1, batch)

    mesh = make_mesh(8)
    state2, tx2 = create_train_state(params, cfg)
    state2 = replicate(mesh, state2)
    step8 = make_train_step(model, tx2, cfg, mesh=mesh, donate=False)
    _, m8 = step8(state2, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-5)
    for k in ("loss_itc", "loss_rtc", "loss_align"):
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=2e-5, err_msg=k)


def test_checkpoint_roundtrip(tmp_path, rng):
    from sprc_tpu.train.checkpoint import restore_state, save_state

    model = tiny_model()
    params = init_params(model, image_size=28)
    cfg = TrainConfig(learning_rate=1e-3, total_steps=100)
    state, tx = create_train_state(params, cfg)
    step = make_train_step(model, tx, cfg, donate=False)
    batch = make_batch(rng)
    state, _ = step(state, batch)

    path = str(tmp_path / "ckpt")
    save_state(path, state)
    template, _ = create_train_state(params, cfg)
    restored = restore_state(path, template)
    assert int(restored.step) == int(state.step)

    # resuming must produce identical next-step results
    s_a, m_a = step(state, batch)
    s_b, m_b = step(restored, batch)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_checkpoint_roundtrip_with_aux(tmp_path, rng):
    """TrainState.aux (momentum/queue families) persists through
    save_state/restore_state; states without aux restore aux=None."""
    from sprc_tpu.train.checkpoint import restore_state, save_state

    model = tiny_model()
    params = init_params(model, image_size=28)
    cfg = TrainConfig(learning_rate=1e-3, total_steps=100)
    state, tx = create_train_state(params, cfg)
    aux = {"queue": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
           "ptr": jnp.asarray(4, jnp.int32)}
    state = state.replace(aux=aux)
    path = str(tmp_path / "ckpt_aux")
    save_state(path, state)
    template, _ = create_train_state(params, cfg)
    restored = restore_state(path, template)
    assert restored.aux is not None
    np.testing.assert_array_equal(np.asarray(restored.aux["queue"]),
                                  np.asarray(aux["queue"]))
    assert int(restored.aux["ptr"]) == 4

    # aux-less states still roundtrip with aux=None
    path2 = str(tmp_path / "ckpt_noaux")
    save_state(path2, template)
    restored2 = restore_state(path2, template)
    assert restored2.aux is None


def test_layer_decay_scales(rng):
    from sprc_tpu.train.loop import layer_decay_scales

    model = tiny_model()
    params = init_params(model, image_size=28)
    scales = jax.tree.map(np.asarray, layer_decay_scales(params, 0.9))
    # non-ViT params get 1.0
    assert float(jax.tree.leaves(scales["query_tokens"])[0]) == 1.0
    trunk = scales["visual_encoder"]["trunk"]
    depth = 2
    # block i scale = 0.9 ** (depth + 1 - (i+1))
    assert np.isclose(float(jax.tree.leaves(trunk["block_0"])[0]), 0.9 ** 2)
    assert np.isclose(float(jax.tree.leaves(trunk["block_1"])[0]), 0.9 ** 1)
    # embeddings at layer 0
    assert np.isclose(float(jax.tree.leaves(trunk["patch_embed"])[0]), 0.9 ** 3)


def test_layer_decay_scales_scanned(rng):
    import jax.numpy as jnp

    from sprc_tpu.models.cir_base import CirConfig
    from sprc_tpu.models.vit import ViTConfig
    from sprc_tpu.models.qformer import QFormerConfig
    from sprc_tpu.registry import registry
    from sprc_tpu.train.loop import layer_decay_scales

    vcfg = ViTConfig(image_size=28, patch_size=14, width=32, depth=3, num_heads=2,
                     mlp_hidden=64, qkv_fused_no_kbias=True, dtype=jnp.float32,
                     scan_blocks=True)
    qcfg = QFormerConfig(vocab_size=60, hidden_size=32, num_layers=2, num_heads=2,
                         intermediate_size=64, encoder_width=32, query_length=4,
                         dropout_rate=0.0)
    cfg = CirConfig(vit_model="eva_clip_g", image_size=28, num_query_token=4,
                    max_txt_len=8, vocab_size=60, vit_dtype=jnp.float32,
                    vit_config_override=vcfg, qformer_config_override=qcfg)
    model = registry.get_model_class("blip2_cir_align_prompt")(cfg)
    params = init_params(model, image_size=28)
    scales = layer_decay_scales(params, 0.9)
    vec_leaf = jax.tree.leaves(scales["visual_encoder"]["trunk"]["blocks"])[0]
    assert vec_leaf.shape[0] == 3
    np.testing.assert_allclose(
        np.asarray(vec_leaf).reshape(3), [0.9 ** 3, 0.9 ** 2, 0.9 ** 1], rtol=1e-6
    )


def test_train_step_with_layer_decay_runs(rng):
    vcfg = ViTConfig(
        image_size=28, patch_size=14, width=32, depth=2, num_heads=2,
        mlp_hidden=64, qkv_fused_no_kbias=True, dtype=jnp.float32,
    )
    qcfg = QFormerConfig(
        vocab_size=60, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, encoder_width=32, query_length=4, dropout_rate=0.0,
    )
    cfg_m = CirConfig(
        vit_model="eva_clip_g", image_size=28, num_query_token=4,
        max_txt_len=8, vocab_size=60, vit_dtype=jnp.float32,
        freeze_vit=False,  # unfrozen so layer-decay scaling is exercised
        vit_config_override=vcfg, qformer_config_override=qcfg,
    )
    model = registry.get_model_class("blip2_cir_align_prompt")(cfg_m)
    params = init_params(model, image_size=28)
    cfg = TrainConfig(learning_rate=1e-3, total_steps=50, layer_decay=0.9,
                      frozen_prefixes=())
    state, tx = create_train_state(params, cfg)
    step = make_train_step(model, tx, cfg, donate=False)
    state, metrics = step(state, make_batch(rng, b=4))
    assert np.isfinite(float(metrics["loss"]))
    # ViT moved (not frozen here)
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(state.params["visual_encoder"]),
            jax.tree.leaves(params["visual_encoder"]),
        )
    )
    assert moved


def test_checkpoint_manager_keep_n(tmp_path, rng):
    from sprc_tpu.train.checkpoint import CheckpointManager

    model = tiny_model()
    params = init_params(model, image_size=28)
    cfg = TrainConfig(learning_rate=1e-3, total_steps=100)
    state, tx = create_train_state(params, cfg)
    step = make_train_step(model, tx, cfg, donate=False)
    batch = make_batch(rng, b=4)

    mgr = CheckpointManager(str(tmp_path / "ckpts"), keep=2, use_async=False)
    assert mgr.latest_step() is None
    assert mgr.restore(state) is None

    for i in range(3):
        state, _ = step(state, batch)
        mgr.save(i, state)
    mgr.wait()
    assert mgr.latest_step() == 2

    template, _ = create_train_state(params, cfg)
    restored = mgr.restore(template)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # retention: only the last 2 steps kept
    import os

    kept = sorted(d for d in os.listdir(tmp_path / "ckpts") if d.isdigit())
    assert kept == ["1", "2"]
    mgr.close()
