"""TimeSformer: golden parity vs the reference torch module (loaded
standalone with a fairscale shim) + structural self-tests."""

import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.models.timesformer import TimeSformer, TimeSformerConfig

REF = pathlib.Path("/root/reference/src/lavis/models/timesformer")

CFG = TimeSformerConfig(
    image_size=32, patch_size=16, width=24, depth=2, num_heads=2,
    mlp_hidden=48, num_frames=3, dtype=jnp.float32,
)


def _load_ref_vit():
    """Load reference timesformer/vit.py standalone; shim fairscale (not
    installed) and the relative helper imports."""
    try:
        import torch  # noqa: F401
    except Exception:
        return None
    if not (REF / "vit.py").exists():
        return None
    # fake package so the relative `.helpers` / `.vit_utils` imports resolve
    pkg = types.ModuleType("ref_tsf")
    pkg.__path__ = [str(REF)]
    sys.modules.setdefault("ref_tsf", pkg)
    # fairscale shim: checkpoint_wrapper is only used when grad ckpt is on
    fs = types.ModuleType("fairscale")
    fs_nn = types.ModuleType("fairscale.nn")
    fs_ck = types.ModuleType("fairscale.nn.checkpoint")
    fs_ca = types.ModuleType("fairscale.nn.checkpoint.checkpoint_activations")
    fs_ca.checkpoint_wrapper = lambda m, *a, **k: m
    for name, mod in [
        ("fairscale", fs), ("fairscale.nn", fs_nn),
        ("fairscale.nn.checkpoint", fs_ck),
        ("fairscale.nn.checkpoint.checkpoint_activations", fs_ca),
    ]:
        sys.modules.setdefault(name, mod)
    try:
        for sub in ("vit_utils", "helpers", "conv2d_same", "features", "linear"):
            spec = importlib.util.spec_from_file_location(
                f"ref_tsf.{sub}", str(REF / f"{sub}.py")
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"ref_tsf.{sub}"] = mod
            spec.loader.exec_module(mod)
        spec = importlib.util.spec_from_file_location(
            "ref_tsf.vit", str(REF / "vit.py"),
            submodule_search_locations=[str(REF)],
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_tsf.vit"] = mod
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


@pytest.fixture(scope="module")
def ref_pair():
    """(reference torch VisionTransformer, flax params ported from it)."""
    mod = _load_ref_vit()
    if mod is None:
        pytest.skip("reference timesformer not loadable")
    import torch

    torch.manual_seed(0)
    ref = mod.VisionTransformer(
        img_size=CFG.image_size, patch_size=CFG.patch_size, num_classes=0,
        embed_dim=CFG.width, depth=CFG.depth, num_heads=CFG.num_heads,
        mlp_ratio=CFG.mlp_hidden / CFG.width, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=CFG.layer_norm_eps),
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
        num_frames=CFG.num_frames, attention_type="divided_space_time",
    )
    ref.eval()
    # randomize params deterministically (zero-init embeds otherwise)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if p.ndim > 0:
                p.copy_(torch.randn_like(p) * 0.05)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params = {
        "patch_embed": {
            "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": sd["patch_embed.proj.bias"],
        },
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "time_embed": sd["time_embed"],
        "norm": ln("norm"),
    }
    for i in range(CFG.depth):
        b = f"blocks.{i}"
        params[f"block_{i}"] = {
            "temporal_norm1": ln(f"{b}.temporal_norm1"),
            "temporal_attn": {
                "qkv": dense(f"{b}.temporal_attn.qkv"),
                "proj": dense(f"{b}.temporal_attn.proj"),
            },
            "temporal_fc": dense(f"{b}.temporal_fc"),
            "norm1": ln(f"{b}.norm1"),
            "attn": {
                "qkv": dense(f"{b}.attn.qkv"),
                "proj": dense(f"{b}.attn.proj"),
            },
            "norm2": ln(f"{b}.norm2"),
            "mlp": {
                "fc1": dense(f"{b}.mlp.fc1"),
                "fc2": dense(f"{b}.mlp.fc2"),
            },
        }
    params = jax.tree.map(jnp.asarray, params)
    return ref, params


def test_forward_tokens_parity(ref_pair):
    import torch

    ref, params = ref_pair
    rs = np.random.RandomState(0)
    B, T, S = 2, CFG.num_frames, CFG.image_size
    video = rs.rand(B, T, S, S, 3).astype(np.float32)

    model = TimeSformer(CFG)
    got = model.apply(
        {"params": params}, jnp.asarray(video), method=model.forward_tokens
    )

    with torch.no_grad():
        # reference takes (b, c, t, h, w)
        tv = torch.from_numpy(video).permute(0, 4, 1, 2, 3).contiguous()
        want = ref.forward_features(tv).numpy()

    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-3)


def test_forward_features_pooled_shape():
    rs = np.random.RandomState(1)
    model = TimeSformer(CFG)
    video = jnp.asarray(rs.rand(2, CFG.num_frames, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video)["params"]
    out = model.apply({"params": params}, video)
    assert out.shape == (2, 1 + CFG.num_patches, CFG.width)
    assert np.isfinite(np.asarray(out)).all()


def test_temporal_fc_zero_init_after_block0():
    model = TimeSformer(CFG)
    rs = np.random.RandomState(2)
    video = jnp.asarray(rs.rand(1, CFG.num_frames, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video)["params"]
    assert float(np.abs(params["block_1"]["temporal_fc"]["kernel"]).max()) == 0.0
    assert float(np.abs(params["block_0"]["temporal_fc"]["kernel"]).max()) > 0.0
