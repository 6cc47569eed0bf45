"""Weight round-trip: jax params -> torch state_dict -> jax params."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.interop.torch_export import params_to_torch_state_dict
from sprc_tpu.interop.torch_import import cir_align_prompt_params_from_torch
from sprc_tpu.loader import init_params

from test_variants import build


def test_roundtrip_align_prompt():
    model = build("blip2_cir_align_prompt")
    params = init_params(model, image_size=28)
    sd = params_to_torch_state_dict(params, model)
    # all reference key families present
    assert "Qformer.bert.encoder.layer.0.attention.self.query.weight" in sd
    assert "visual_encoder.blocks.0.attn.qkv.weight" in sd
    assert "query_tokens" in sd and "prompt_tokens" in sd and "temp" in sd

    back = cir_align_prompt_params_from_torch(sd, model)
    flat_a = dict(
        zip(
            [str(p) for p in jax.tree_util.tree_flatten_with_path(params)[0]],
            jax.tree.leaves(params),
        )
    )
    # compare leaf-by-leaf via tree structure equality
    leaves_a, tree_a = jax.tree.flatten(params)
    leaves_b, tree_b = jax.tree.flatten(back)
    assert tree_a == tree_b
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_torch_pt_file_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from sprc_tpu.train.checkpoint import export_torch_compatible
    from sprc_tpu.interop.torch_import import load_torch_file

    model = build("blip2_cir_align_prompt")
    params = init_params(model, image_size=28)
    path = str(tmp_path / "ckpt.pt")
    export_torch_compatible(path, params, model, epoch=3)

    ckpt = torch.load(path, weights_only=False)
    assert ckpt["epoch"] == 3
    assert "Blip2QformerCirAlignPrompt" in ckpt

    sd = load_torch_file(path)
    back = cir_align_prompt_params_from_torch(sd, model)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
