"""Pallas fused token-max similarity kernel.

``token_max_sim(feats [B,E], targets [N,Q,E]) -> [B,N]`` via one tiled
matmul whose epilogue folds the max over the Q query tokens in VMEM —
the XLA path materializes the ``[B, N, Q]`` intermediate in HBM
(Q=32x more write traffic than the output).

Grid: (B tiles, N tiles). Per program: feats tile [TB, E] x targets block
[TN*Q, E]^T -> scores [TB, TN*Q] fp32 in VMEM -> reshape [TB, TN, Q] ->
max -> out tile [TB, TN]. For E=256, TB=128, TN=128, Q=32: targets block
2 MB bf16, scores 2 MB fp32 — well inside VMEM.
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
    t = t_ref[0]  # [TN*Q, E]
    scores = jax.lax.dot_general(
        f, t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TB, TN*Q]
    tb, nq = scores.shape
    scores = scores.reshape(tb, nq // q, q)
    o_ref[...] = jnp.max(scores, axis=-1)


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
    targets_flat = targets.reshape(1, Np * Q, E)

    out = pl.pallas_call(
        functools.partial(_sim_kernel, q=Q),
        grid=(Bp // _TB, Np // _TN),
        in_specs=[
            pl.BlockSpec((_TB, E), lambda i, j: (i, 0)),
            pl.BlockSpec((1, _TN * Q, E), lambda i, j: (0, j, 0)),
        ],
        out_specs=pl.BlockSpec((_TB, _TN), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(feats, targets_flat)
    return out[:B, :N]
