"""Golden parity: JAX vision towers vs the reference torch towers.

Tiny-config EVA ViT and CLIP ViT instantiated from the reference files
(loaded standalone with shimmed deps), weights ported through the interop
importers, logits compared on random inputs. Covers the EVA q/v-bias qkv
(eva_vit.py:118-126), pre-LN blocks, and CLIP's packed in_proj + QuickGELU
(clip_vit.py:109-139).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.vit import ClipViT, EvaViT, ViTConfig
from sprc_tpu.interop.torch_import import (
    clip_vit_params_from_torch,
    eva_vit_params_from_torch,
    torch_state_dict_to_numpy,
)

B = 2
IMG = 28
PATCH = 14
WIDTH = 32
DEPTH = 3
HEADS = 2

ATOL = 3e-5


def test_eva_vit_parity(ref_eva_vit_module, rng):
    import torch

    torch.manual_seed(0)
    tmodel = ref_eva_vit_module.VisionTransformer(
        img_size=IMG,
        patch_size=PATCH,
        embed_dim=WIDTH,
        depth=DEPTH,
        num_heads=HEADS,
        mlp_ratio=4.0,
        qkv_bias=True,
        use_mean_pooling=False,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
    ).eval()

    cfg = ViTConfig(
        image_size=IMG,
        patch_size=PATCH,
        width=WIDTH,
        depth=DEPTH,
        num_heads=HEADS,
        mlp_hidden=int(WIDTH * 4.0),
        layer_norm_eps=1e-6,
        qkv_fused_no_kbias=True,
        dtype=jnp.float32,
    )
    jmodel = EvaViT(cfg)
    params = eva_vit_params_from_torch(
        torch_state_dict_to_numpy(tmodel.state_dict()), prefix="", depth=DEPTH
    )

    x = rng.randn(B, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = jmodel.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert got.shape == want.shape  # [B, 5, WIDTH] = 4 patches + cls
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_clip_vit_parity(ref_clip_vit_module, rng):
    import torch

    torch.manual_seed(1)
    tmodel = ref_clip_vit_module.VisionTransformer(
        input_resolution=IMG,
        patch_size=PATCH,
        width=WIDTH,
        layers=DEPTH,
        heads=HEADS,
        use_grad_checkpointing=False,
    ).eval()

    cfg = ViTConfig(
        image_size=IMG,
        patch_size=PATCH,
        width=WIDTH,
        depth=DEPTH,
        num_heads=HEADS,
        mlp_hidden=WIDTH * 4,
        layer_norm_eps=1e-5,
        use_ln_pre=True,
        qkv_fused_no_kbias=False,
        quick_gelu=True,
        patch_bias=False,
        dtype=jnp.float32,
    )
    jmodel = ClipViT(cfg)
    params = clip_vit_params_from_torch(
        torch_state_dict_to_numpy(tmodel.state_dict()), prefix="", depth=DEPTH
    )

    x = rng.randn(B, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = jmodel.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_eva_vit_scan_blocks_parity(ref_eva_vit_module, rng):
    """Scanned-layer layout must be numerically identical to unrolled."""
    import torch

    torch.manual_seed(7)
    tmodel = ref_eva_vit_module.VisionTransformer(
        img_size=IMG, patch_size=PATCH, embed_dim=WIDTH, depth=DEPTH,
        num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True, use_mean_pooling=False,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
    ).eval()
    cfg = ViTConfig(
        image_size=IMG, patch_size=PATCH, width=WIDTH, depth=DEPTH,
        num_heads=HEADS, mlp_hidden=int(WIDTH * 4.0), layer_norm_eps=1e-6,
        qkv_fused_no_kbias=True, dtype=jnp.float32, scan_blocks=True,
    )
    jmodel = EvaViT(cfg)
    params = eva_vit_params_from_torch(
        torch_state_dict_to_numpy(tmodel.state_dict()), prefix="", depth=DEPTH,
        scan_blocks=True,
    )
    x = rng.randn(B, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = jmodel.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)
    # init structure matches the stacked importer layout
    init_p = jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))["params"]
    assert jax.tree.structure(init_p) == jax.tree.structure({"trunk": params["trunk"]} if "trunk" not in params else params)
