"""CLIP ModifiedResNet (RN50) golden parity vs the reference torch classes
(reference clip_models/model.py:50-244), extracted standalone via ast (the
full module needs torchvision, which is not in the image)."""

import ast
import os

import numpy as np
import pytest

REF = "/root/reference/src/lavis/models/clip_models/model.py"


@pytest.fixture(scope="module")
def ref_resnet_ns():
    if not os.path.exists(REF):
        pytest.skip("reference clip model.py not present")
    import torch
    import torch.nn.functional as F
    from collections import OrderedDict
    from torch import nn

    tree = ast.parse(open(REF).read())
    wanted = {"Bottleneck", "AttentionPool2d", "ModifiedResNet"}
    keep = [node for node in tree.body
            if isinstance(node, ast.ClassDef) and node.name in wanted]
    assert {c.name for c in keep} == wanted
    ns = {"torch": torch, "nn": nn, "F": F, "OrderedDict": OrderedDict,
          "freeze_batch_norm_2d": lambda m: m}
    exec(compile(ast.Module(body=keep, type_ignores=[]), REF, "exec"), ns)
    return ns


def _randomize_bn_stats(model, seed=0):
    """Give BatchNorms non-trivial running stats so the frozen-affine
    reformulation is actually exercised."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.copy_(torch.randn(
                mod.running_mean.shape, generator=gen) * 0.5)
            mod.running_var.copy_(torch.rand(
                mod.running_var.shape, generator=gen) + 0.5)
            mod.weight.data.copy_(torch.randn(
                mod.weight.shape, generator=gen) * 0.2 + 1.0)
            mod.bias.data.copy_(torch.randn(mod.bias.shape, generator=gen) * 0.1)


def test_modified_resnet_parity(ref_resnet_ns):
    import torch

    from sprc_tpu.models.resnet_clip import (
        ClipResNet,
        ResNetConfig,
        clip_resnet_params_from_torch,
    )

    cfg = ResNetConfig(layers=(1, 1, 1, 1), width=8, heads=4,
                       output_dim=16, image_size=64)
    torch.manual_seed(0)
    ref = ref_resnet_ns["ModifiedResNet"](
        layers=cfg.layers, output_dim=cfg.output_dim, heads=cfg.heads,
        image_size=cfg.image_size, width=cfg.width)
    _randomize_bn_stats(ref)
    ref.eval()

    rs = np.random.RandomState(1)
    img = rs.rand(2, 3, cfg.image_size, cfg.image_size).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(img)).numpy()

    import jax.numpy as jnp

    model = ClipResNet(cfg)
    params = clip_resnet_params_from_torch(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape == (2, cfg.output_dim)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_clip_rn50_yaml_and_forward():
    """configs/models/clip/resnet50.yaml builds; a tiny RN CLIP runs the
    full contrastive forward without a visual projection."""
    import jax
    import jax.numpy as jnp

    import sprc_tpu.models  # noqa: F401
    from sprc_tpu.loader import build_model
    from sprc_tpu.models.clip import Clip, ClipConfig, ClipTextConfig
    from sprc_tpu.models.resnet_clip import ResNetConfig

    m = build_model("clip", "resnet50")
    assert m.cfg.vision_resnet is not None
    assert m.cfg.vision_resnet.layers == (3, 4, 6, 3)
    assert m.cfg.embed_dim == 1024

    tiny = Clip(ClipConfig(
        embed_dim=16, image_size=64,
        vision_resnet=ResNetConfig(layers=(1, 1, 1, 1), width=8, heads=4,
                                   output_dim=16, image_size=64),
        text=ClipTextConfig(vocab_size=50, width=16, layers=1, heads=2,
                            context_length=8),
    ))
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)
    ids = jnp.asarray(rs.randint(0, 50, (2, 8)), jnp.int32)
    eot = jnp.asarray([7, 7], jnp.int32)
    variables = tiny.init(jax.random.PRNGKey(0), img, ids, eot)
    logits, img_f, txt_f = tiny.apply(variables, img, ids, eot)
    assert logits.shape == (2, 2)
    assert img_f.shape == (2, 16) and txt_f.shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(img_f), axis=-1), 1.0, atol=1e-5)
    # no visual_projection params on the resnet path
    assert "visual_projection" not in variables["params"]
