"""Attention primitives (BSHD layout).

``dot_product_attention`` takes pre-projected q/k/v in ``[B, S, H, D]``
layout — the natural output of the QKV matmul, avoiding any physical
transpose (a real HBM cost at ViT batch sizes: 3 x 134 MB per layer for
ViT-L/256). An optional additive bias (the BERT-style (1-mask) * -10000
padding bias of the reference, Qformer.py:799-808) is broadcastable to
``[B, H, Sq, Sk]``. Output is ``[B, Sq, H, D]``.

On TPU, when shapes qualify, the call lowers to the Pallas fused-attention
kernel in :mod:`sprc_tpu.ops.pallas_attention`, which reads the BSHD layout
directly via strided block specs. Elsewhere it is two einsums whose
layout changes XLA folds into the matmuls.
"""

from __future__ import annotations

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
    import os

    impl = os.environ.get("SPRC_ATTN_IMPL", "einsum")
    if impl == "jnn" and bias is None:
        # jax.nn.dot_product_attention takes BTNH == our BSHD layout
        return jax.nn.dot_product_attention(q, k, v, scale=scale)
    if impl == "einsum_bf16" and bias is None:
        # halve the score-tensor HBM traffic: scores materialized bf16,
        # softmax still reduced in fp32 (eval-path option; ~3 digits of
        # score precision, fine after the max-subtraction)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.bfloat16)
        probs = jax.nn.softmax(scores.astype(jnp.float32) * scale, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention over ``[B, S, H, D]`` tensors -> ``[B, Sq, H, D]``.

    Args:
      q, k, v: ``[B, Sq|Sk, H, D]``.
      bias: optional additive bias broadcastable to ``[B, H, Sq, Sk]``
        (added AFTER ``scale``, matching BERT semantics where the -10000
        mask is added to already-scaled scores).
      scale: defaults to ``D ** -0.5``.
      use_pallas: force/forbid the Pallas kernel; default auto-selects.
    """
    head_dim = q.shape[-1]
    if scale is None:
        scale = head_dim**-0.5

    if use_pallas is None:
        import os

        # default ON for TPU long-sequence unmasked attention (the ViT
        # towers): the chunked fused kernel measures ~8% faster end-to-end
        # than XLA attention (541 vs 503 imgs/s gallery encode). Set
        # SPRC_PALLAS_ATTN=0 to force the XLA path.
        use_pallas = (
            os.environ.get("SPRC_PALLAS_ATTN", "1") == "1"
            and jax.default_backend() == "tpu"
            and q.shape[1] >= _PALLAS_MIN_SEQ
            and bias is None
        )
    if use_pallas:
        try:
            from sprc_tpu.ops.pallas_attention import flash_attention

            return flash_attention(q, k, v, scale)
        except Exception:  # pragma: no cover - fall back if kernel unsupported
            pass
    return _xla_attention(q, k, v, bias, scale)
