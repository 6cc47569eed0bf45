"""Pallas fused token-max similarity kernel.

``token_max_sim(feats [B,E], targets [N,Q,E]) -> [B,N]`` is the hot scoring
op: for every (query, gallery) pair take the max inner product over the Q
per-image query tokens (reference …cir_align_prompt.py:353-358). The XLA
path materializes the ``[B, N, Q]`` intermediate in HBM (Q=32x the output
traffic); here the max folds into the matmul epilogue in VMEM.

Kernel geometry: targets are viewed as ``[Q, N, E]`` (token-major); each
program computes one ``[TB, TN]`` output tile as an elementwise max over Q
small matmuls ``f[TB,E] @ t[q][E,TN]`` accumulated in registers. (A
``[TB, TN*Q] -> [TB, TN, Q]`` reshape would be the natural epilogue but
Mosaic cannot split the lane dimension — learned on hardware.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_TB = 128
_TN = 128


def _sim_kernel(f_ref, t_ref, o_ref, *, q: int):
    f = f_ref[...]  # [TB, E]
    acc = None
    for i in range(q):
        t = t_ref[i]  # [TN, E]
        scores = jax.lax.dot_general(
            f, t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [TB, TN]
        acc = scores if acc is None else jnp.maximum(acc, scores)
    o_ref[...] = acc


def token_max_sim_pallas(feats: jax.Array, targets: jax.Array) -> jax.Array:
    """feats [B, E], targets [N, Q, E] -> [B, N] float32."""
    B, E = feats.shape
    N, Q, _ = targets.shape

    pad_b = (-B) % _TB
    pad_n = (-N) % _TN
    if pad_b:
        feats = jnp.pad(feats, ((0, pad_b), (0, 0)))
    if pad_n:
        targets = jnp.pad(targets, ((0, pad_n), (0, 0), (0, 0)))
    Bp, Np = B + pad_b, N + pad_n
    targets_tok = targets.transpose(1, 0, 2)  # [Q, Np, E]

    out = pl.pallas_call(
        functools.partial(_sim_kernel, q=Q),
        grid=(Bp // _TB, Np // _TN),
        in_specs=[
            pl.BlockSpec((_TB, E), lambda i, j: (i, 0)),
            pl.BlockSpec((Q, _TN, E), lambda i, j: (0, j, 0)),
        ],
        out_specs=pl.BlockSpec((_TB, _TN), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(feats, targets_tok)
    return out[:B, :N]
