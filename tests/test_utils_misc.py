"""Utility module tests: cache, dist single-host behavior, Blip2ITM."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_cache_paths(tmp_path, monkeypatch):
    monkeypatch.setenv("SPRC_CACHE", str(tmp_path))
    from sprc_tpu.utils.cache import cache_root, cached_path, download_cached_file, is_url

    assert is_url("https://example.com/x.pth")
    assert not is_url("/local/file.pth")
    assert cache_root() == str(tmp_path)
    assert cached_path("/local/file.pth") == "/local/file.pth"
    p = cached_path("https://example.com/weights.pth")
    assert p.startswith(str(tmp_path)) and p.endswith("_weights.pth")

    # offline: missing artifact raises with the cache path in the message
    with pytest.raises(FileNotFoundError):
        download_cached_file("https://example.com/weights.pth")
    # pre-placed artifact resolves without network
    with open(p, "wb") as f:
        f.write(b"fake")
    assert download_cached_file("https://example.com/weights.pth") == p


def test_dist_single_host():
    from sprc_tpu.parallel.dist import (
        barrier,
        broadcast_from_main,
        get_rank,
        get_world_size,
        is_main_process,
        main_process,
        main_process_first,
    )

    assert get_rank() == 0 and get_world_size() == 1 and is_main_process()
    barrier()  # no-op on single host

    calls = []

    @main_process
    def only_main(x):
        calls.append(x)
        return x * 2

    assert only_main(3) == 6

    @main_process_first
    def ordered():
        calls.append("ran")
        return 1

    assert ordered() == 1
    tree = {"a": np.ones(2)}
    assert broadcast_from_main(tree) is tree


def test_blip2_itm_scoring(rng):
    from sprc_tpu.registry import registry
    from test_blip2_stage1 import IMG, VOCAB, TXT, Q, B

    from sprc_tpu.models.cir_base import CirConfig
    from sprc_tpu.models.qformer import QFormerConfig
    from sprc_tpu.models.vit import ViTConfig

    vcfg = ViTConfig(image_size=IMG, patch_size=14, width=32, depth=2, num_heads=2,
                     mlp_hidden=64, qkv_fused_no_kbias=True, dtype=jnp.float32)
    qcfg = QFormerConfig(vocab_size=VOCAB, hidden_size=32, num_layers=2, num_heads=2,
                         intermediate_size=64, encoder_width=32, query_length=Q,
                         dropout_rate=0.0)
    cfg = CirConfig(vit_model="eva_clip_g", image_size=IMG, num_query_token=Q,
                    max_txt_len=TXT, vocab_size=VOCAB, vit_dtype=jnp.float32,
                    embed_dim=16, vit_config_override=vcfg,
                    qformer_config_override=qcfg)
    model = registry.get_model_class("blip2_image_text_matching")(cfg)
    images = jnp.asarray(rng.rand(B, IMG, IMG, 3), jnp.float32)
    ids = jnp.asarray(rng.randint(0, VOCAB, (B, TXT)), jnp.int32)
    mask = jnp.asarray(np.ones((B, TXT)), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, ids, mask, bos_token_id=1, pad_token_id=0,
    )
    itm = model.apply(variables, images, ids, mask, method=model.itm)
    itc = model.apply(variables, images, ids, mask, method=model.itc)
    assert itm.shape == (B,) and itc.shape == (B,)
    assert np.isfinite(np.asarray(itm)).all() and np.isfinite(np.asarray(itc)).all()
