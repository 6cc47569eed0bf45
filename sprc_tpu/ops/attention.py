"""Attention primitives.

``dot_product_attention`` is the single entry point all models use. It takes
pre-projected q/k/v in ``[B, H, S, D]`` layout plus an optional additive bias
(e.g. the BERT-style (1-mask) * -10000 padding bias of the reference,
Qformer.py:799-808) and returns ``[B, H, Sq, D]``.

On TPU, when shapes qualify, the call lowers to the Pallas flash-attention
kernel in :mod:`sprc_tpu.ops.pallas_attention` (memory-bound win for the
257-token ViT sequences). Elsewhere — CPU tests, odd shapes — it falls back
to a plain XLA softmax attention, which XLA fuses well on its own.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_PALLAS_MIN_SEQ = 128  # below this XLA's fused attention is already fine


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    scale: float,
) -> jnp.ndarray:
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention over ``[B, H, S, D]`` tensors.

    Args:
      q, k, v: ``[B, H, Sq|Sk, D]``.
      bias: optional additive bias broadcastable to ``[B, H, Sq, Sk]``
        (added AFTER the ``scale`` is applied, matching BERT semantics where
        the -10000 mask is added to already-scaled scores).
      scale: defaults to ``D ** -0.5``.
      use_pallas: force/forbid the Pallas kernel; default auto-selects.
    """
    head_dim = q.shape[-1]
    if scale is None:
        scale = head_dim**-0.5

    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and q.shape[-2] >= _PALLAS_MIN_SEQ
            and bias is None
        )
    if use_pallas:
        try:
            from sprc_tpu.ops.pallas_attention import flash_attention

            return flash_attention(q, k, v, scale=scale)
        except Exception:  # pragma: no cover - fall back if kernel unsupported
            pass
    return _xla_attention(q, k, v, bias, scale)
