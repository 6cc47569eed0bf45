"""Driver-interface tests: entry() compiles abstractly, dryrun_multichip
runs on the 8-device virtual mesh."""

import sys

import numpy as np
import pytest

import jax


sys.path.insert(0, "/root/repo")


def test_entry_builds_and_compiles_abstractly():
    import __graft_entry__ as g

    fn, args = g.entry()
    assert len(args) == 4
    out = jax.eval_shape(fn, *args)
    assert out.shape == () and out.dtype == np.float32


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any failure
