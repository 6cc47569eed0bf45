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


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
