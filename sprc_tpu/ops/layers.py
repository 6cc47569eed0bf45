"""Core NN building blocks with TPU-friendly dtype policies.

The reference keeps LayerNorm in float32 while running towers in fp16
(reference: src/lavis/models/blip2_models/blip2.py:193-199 and
src/lavis/models/clip_vit.py:100-106). On TPU we run compute in bfloat16 and
keep the same fp32-LayerNorm bridge: normalize in float32, cast the result
back to the compute dtype.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """QuickGELU x * sigmoid(1.702 x) used by CLIP ViT (clip_vit.py:109-111)."""
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormFP32(nn.Module):
    """LayerNorm computed in float32 regardless of input dtype.

    Output is cast back to the input dtype (the "fp16-safe LayerNorm" pattern
    of the reference, blip2.py:193-199).
    """

    epsilon: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (dim,), self.param_dtype)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(orig_dtype)


class DenseGeneral(nn.Module):
    """Linear layer with fp32 params and configurable compute dtype."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features), self.param_dtype
        )
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype), preferred_element_type=dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            y = y + bias.astype(dtype)
        return y


class MlpBlock(nn.Module):
    """Transformer FFN: dense -> activation -> dense."""

    hidden_features: int
    out_features: int
    activation: Callable = nn.gelu
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = DenseGeneral(
            self.hidden_features, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1"
        )(x)
        h = self.activation(h)
        return DenseGeneral(
            self.out_features, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2"
        )(h)


class LayerNormParams(nn.Module):
    """Materializes LayerNormFP32's (scale, bias) without applying the norm —
    for fused kernels that consume raw parameters. Param names, shapes and
    initializers match LayerNormFP32, so a module named identically yields
    an IDENTICAL param tree."""

    dim: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), self.param_dtype)
        return scale, bias


class DenseParams(nn.Module):
    """Materializes DenseGeneral's (kernel, bias) without applying the layer
    (fused-kernel counterpart; tree-compatible with DenseGeneral)."""

    in_features: int
    features: int
    use_bias: bool = True
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, (self.in_features, self.features), self.param_dtype
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        return kernel, bias


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Match torch.nn.functional.normalize: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)
