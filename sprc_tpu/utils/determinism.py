"""Determinism harness (SURVEY.md §5.2: the reference's only nod is a
commented-out seed helper, blip_fine_tune_2.py:357-366,415).

JAX programs are deterministic given fixed rng keys and inputs; this module
makes that checkable: run a function twice and assert bit-identical pytrees,
and fingerprint pytrees for cross-run/cross-host comparison.
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable, Tuple

import numpy as np


def tree_fingerprint(tree: Any) -> str:
    """Order-stable SHA-256 over all leaves of a pytree."""
    import jax

    h = hashlib.sha256()
    leaves, treedef = jax.tree.flatten(tree)
    h.update(str(treedef).encode())
    for leaf in leaves:
        arr = np.asarray(leaf)
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()


def assert_deterministic(
    fn: Callable, *args: Any, runs: int = 2, **kwargs: Any
) -> str:
    """Run ``fn`` ``runs`` times; raise if outputs differ bit-for-bit.

    Returns the common fingerprint. Use on a jitted train/eval step to catch
    nondeterminism (unseeded host rngs, unstable reductions, stale donated
    buffers) before it corrupts a long run.
    """
    fingerprints = []
    for _ in range(runs):
        out = fn(*args, **kwargs)
        fingerprints.append(tree_fingerprint(out))
    if len(set(fingerprints)) != 1:
        raise AssertionError(
            f"non-deterministic outputs: fingerprints {fingerprints}"
        )
    return fingerprints[0]


def seed_everything(seed: int) -> "np.random.RandomState":
    """Seed host-side rngs (numpy + python); JAX uses explicit keys.
    Returns a fresh RandomState for data-pipeline use."""
    import random

    random.seed(seed)
    np.random.seed(seed)
    return np.random.RandomState(seed)
