"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Mirrors the multi-chip test strategy in SURVEY.md §4: sharding and collective
logic runs against ``--xla_force_host_platform_device_count=8`` CPU devices
so the multi-device paths are exercised without TPUs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import importlib.util
import pathlib
import sys

import numpy as np
import pytest

# The container's axon sitecustomize force-registers the TPU-tunnel backend
# and overrides JAX_PLATFORMS; pin the config back to CPU for tests.
import jax

jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = pathlib.Path("/root/reference/src")


def _load_reference_qformer():
    """Load the reference Qformer.py standalone (torch), shimming the old
    transformers API surface it expects. Returns the module or None."""
    try:
        import torch  # noqa: F401
        import transformers.modeling_utils as mu
        import transformers.pytorch_utils as pu

        for name in (
            "apply_chunking_to_forward",
            "find_pruneable_heads_and_indices",
            "prune_linear_layer",
        ):
            if not hasattr(mu, name):
                setattr(mu, name, getattr(pu, name))
        path = REFERENCE_ROOT / "lavis/models/blip2_models/Qformer.py"
        if not path.exists():
            return None
        spec = importlib.util.spec_from_file_location("ref_qformer", str(path))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


@pytest.fixture(scope="session")
def ref_qformer_module():
    mod = _load_reference_qformer()
    if mod is None:
        pytest.skip("reference Qformer not loadable in this environment")
    return mod


def _load_module_with_shims(path, name, shims):
    """Load a reference file standalone, injecting fake dep modules."""
    import types

    added = []
    try:
        for mod_name, attrs in shims.items():
            parts = mod_name.split(".")
            for i in range(1, len(parts) + 1):
                prefix = ".".join(parts[:i])
                if prefix not in sys.modules:
                    fake = types.ModuleType(prefix)
                    # a real ModuleSpec so importlib.util.find_spec (used by
                    # transformers' _is_package_available) doesn't raise on
                    # the shim and break later reference-module loads
                    fake.__spec__ = importlib.machinery.ModuleSpec(prefix, None)
                    sys.modules[prefix] = fake
                    added.append(prefix)
                if i > 1:
                    setattr(sys.modules[".".join(parts[: i - 1])], parts[i - 1], sys.modules[prefix])
            for k, v in attrs.items():
                setattr(sys.modules[mod_name], k, v)
        spec = importlib.util.spec_from_file_location(name, str(path))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        for m in added:
            sys.modules.pop(m, None)
        return None


def _timm_shims():
    import torch

    def drop_path(x, drop_prob=0.0, training=False):
        return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def register_model(fn):
        return fn

    return {
        "timm.models.layers": {
            "drop_path": drop_path,
            "to_2tuple": to_2tuple,
            "trunc_normal_": torch.nn.init.trunc_normal_,
        },
        "timm.models.registry": {"register_model": register_model},
        "lavis.common.dist_utils": {"download_cached_file": lambda *a, **k: None},
    }


@pytest.fixture(scope="session")
def ref_eva_vit_module():
    try:
        shims = _timm_shims()
    except Exception:
        pytest.skip("torch unavailable")
    path = REFERENCE_ROOT / "lavis/models/eva_vit.py"
    if not path.exists():
        pytest.skip("reference eva_vit.py not present")
    mod = _load_module_with_shims(path, "ref_eva_vit", shims)
    if mod is None:
        pytest.skip("reference eva_vit not loadable")
    return mod


@pytest.fixture(scope="session")
def ref_clip_vit_module(ref_eva_vit_module):
    shims = _timm_shims()
    shims["fairscale.nn.checkpoint.checkpoint_activations"] = {
        "checkpoint_wrapper": lambda m, *a, **k: m
    }
    shims["lavis.models.eva_vit"] = {
        "convert_weights_to_fp16": ref_eva_vit_module.convert_weights_to_fp16
    }
    path = REFERENCE_ROOT / "lavis/models/clip_vit.py"
    if not path.exists():
        pytest.skip("reference clip_vit.py not present")
    mod = _load_module_with_shims(path, "ref_clip_vit", shims)
    if mod is None:
        pytest.skip("reference clip_vit not loadable")
    return mod


@pytest.fixture(scope="session")
def ref_blip_vit_module(ref_qformer_module):
    """Reference BLIP-1 vit.py, standalone with timm/fairscale shims."""
    import torch
    import torch.nn as nn

    class PatchEmbedShim(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3, embed_dim=768):
            super().__init__()
            self.num_patches = (img_size // patch_size) ** 2
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size, stride=patch_size)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class DropPathShim(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    class BaseEncoderShim(nn.Module):
        pass

    shims = _timm_shims()
    shims["timm.models.vision_transformer"] = {
        "_cfg": lambda url="", **kw: {},
        "PatchEmbed": PatchEmbedShim,
    }
    shims["timm.models.helpers"] = {
        "named_apply": lambda *a, **k: None,
        "adapt_input_conv": lambda *a, **k: None,
    }
    shims["timm.models.layers"] = dict(shims["timm.models.layers"])
    shims["timm.models.layers"]["DropPath"] = DropPathShim
    shims["fairscale.nn.checkpoint.checkpoint_activations"] = {
        "checkpoint_wrapper": lambda m, *a, **k: m
    }
    shims["lavis.models.base_model"] = {"BaseEncoder": BaseEncoderShim}
    path = REFERENCE_ROOT / "lavis/models/vit.py"
    if not path.exists():
        pytest.skip("reference vit.py not present")
    mod = _load_module_with_shims(path, "ref_blip_vit", shims)
    if mod is None:
        pytest.skip("reference blip vit not loadable")
    return mod


@pytest.fixture(scope="session")
def ref_med_module(ref_qformer_module):
    """Reference med.py (BLIP-1 BERT fork), standalone."""
    path = REFERENCE_ROOT / "lavis/models/med.py"
    if not path.exists():
        pytest.skip("reference med.py not present")
    import torch.nn as nn

    mod = _load_module_with_shims(
        path,
        "ref_med",
        {
            "lavis.common.utils": {"get_abs_path": lambda p: p},
            "lavis.models.base_model": {"BaseEncoder": nn.Module},
        },
    )
    if mod is None:
        pytest.skip("reference med not loadable")
    return mod


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Loud slow-lane reminder (VERDICT r2 item 7): the default gate skips
    the full-dims numerics check; nothing else re-verifies it."""
    if os.environ.get("SPRC_FULLSCALE") != "1":
        terminalreporter.write_sep(
            "=",
            "REMINDER: full-scale parity NOT run - before shipping, run "
            "SPRC_FULLSCALE=1 python -m pytest tests/test_fullscale_parity.py "
            "(~4 min) and scripts/check_fused_tpu.py (see README slow lane)",
            yellow=True,
        )
