"""Int8 quantized matmul path for the frozen towers (PTQ, serving-oriented).

The v5e MXU runs s8 x s8 -> s32 at 2x the bf16 rate (394 vs 197 T/s
peak), and the towers SPRC evaluates with are FROZEN (reference trains
with ``freeze_vit=True``, blip2_qformer_cir_align_prompt.py config), so
post-training quantization of the ViT weights is low-risk: per-output-
channel symmetric scales for weights, dynamic per-token symmetric scales
for activations, fp32 rescale on the int32 accumulator.

This is a TPU-native serving optimization with no reference counterpart
(the reference evaluates in fp16); accuracy impact is measured by the
int8-vs-bf16 A/B in tests/test_quant.py and bench.py --mode encode_int8.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8: w [.., in, out] -> (int8, scale[out])."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return w8, scale


def quantize_act(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-token symmetric int8: x [.., d] -> (int8, scale[.., 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return x8, scale


def int8_matmul(
    x: jnp.ndarray,
    w8: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Quantize x per token, s8s8s32 MXU matmul, fp32 rescale.

    x: [.., in]; w8: [in, out] int8; w_scale: [out] fp32.
    """
    x8, x_scale = quantize_act(x)
    y32 = jax.lax.dot_general(
        x8, w8, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = y32.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def int8_dense_from_fp(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """int8 matmul quantizing the fp weight on the fly (weights are loop
    constants under jit/scan; XLA hoists the per-channel quantization out
    of the steady state for non-scanned layers, and for scanned stacks the
    per-block requantization is ~0.05 ms against an ~8 ms matmul)."""
    w8, w_scale = quantize_weight(w)
    return int8_matmul(x, w8, w_scale, bias, out_dtype)


def int8_dense_static(
    x: jnp.ndarray,
    w: jnp.ndarray,
    act_scale: float,
    bias: Optional[jnp.ndarray] = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """int8 matmul with a STATIC per-tensor activation scale.

    The dynamic path's per-token ``amax`` is a reduction, which forces XLA
    to materialize the bf16 activation before quantizing — a full extra HBM
    pass per matmul that erases the int8 compute win (measured: dynamic-int8
    block == bf16 block). With a calibrated compile-time constant scale the
    quantize is a pure elementwise op that fuses into the producer (LN/GELU
    epilogue), so the intermediate is written ONCE, as int8 — half the
    traffic of the bf16 path, and the matmul runs at the 2x int8 MXU rate.
    """
    x8 = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / act_scale)), -127, 127
    ).astype(jnp.int8)
    w8, w_scale = quantize_weight(w)
    y32 = jax.lax.dot_general(
        x8, w8, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = y32.astype(jnp.float32) * (act_scale * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
