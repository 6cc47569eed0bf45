"""CLIP ModifiedResNet vision tower (RN50).

TPU-native re-implementation of the reference's ``ModifiedResNet``
(reference: src/lavis/models/clip_models/model.py:50-244, after
openai/CLIP): a 3-conv stem with avg-pool, bottleneck stages whose strided
convolutions are anti-aliased (avg-pool prepended, conv stride 1), and a
QKV attention pool instead of global average pooling — the attention
pool's ``c_proj`` IS the projection to the contrastive embedding space, so
a ResNet-backed CLIP uses no separate visual projection.

Layout is NHWC (TPU-preferred; XLA fuses BN affines into the convs).
BatchNorm is implemented as a frozen affine (running statistics stored as
parameters): the reference uses this tower for zero-shot/retrieval eval
(projects/clip/exp_*.yaml) and freezes it wholesale for fine-tuning
(``ModifiedResNet.lock``, model.py:219-227), so no batch-stat state is
threaded. Import released weights with
:func:`clip_resnet_params_from_torch`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)  # RN50
    width: int = 64
    heads: int = 32  # attn-pool heads (embed 2048 / 64)
    output_dim: int = 1024
    image_size: int = 224
    eps: float = 1e-5
    dtype: Any = jnp.float32

    def __post_init__(self):
        # YAML spells tuples as lists; flax module configs must stay hashable
        object.__setattr__(self, "layers", tuple(self.layers))

    @property
    def embed_dim(self) -> int:
        return self.width * 32


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm2d: running stats as params, fp32 affine."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (f,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (f,), jnp.float32)
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return (x.astype(jnp.float32) * inv + (bias - mean * inv)).astype(x.dtype)


def _conv(features: int, kernel: int, name: str, dtype) -> nn.Conv:
    return nn.Conv(
        features, (kernel, kernel), padding=[(kernel // 2,) * 2] * 2,
        use_bias=False, dtype=dtype, name=name,
    )


def _avg_pool(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    return nn.avg_pool(x, (stride, stride), strides=(stride, stride))


class Bottleneck(nn.Module):
    """conv1x1 -> conv3x3 -> (anti-aliased) avgpool -> conv1x1 x4
    (reference model.py:50-106)."""

    planes: int
    stride: int = 1
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        planes, out_ch = self.planes, self.planes * 4
        h = nn.relu(FrozenBatchNorm(planes, self.eps, name="bn1")(
            _conv(planes, 1, "conv1", self.dtype)(x)))
        h = nn.relu(FrozenBatchNorm(planes, self.eps, name="bn2")(
            _conv(planes, 3, "conv2", self.dtype)(h)))
        if self.stride > 1:
            h = _avg_pool(h, self.stride)
        h = FrozenBatchNorm(out_ch, self.eps, name="bn3")(
            _conv(out_ch, 1, "conv3", self.dtype)(h))
        identity = x
        if self.stride > 1 or x.shape[-1] != out_ch:
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = FrozenBatchNorm(out_ch, self.eps, name="down_bn")(
                _conv(out_ch, 1, "down_conv", self.dtype)(identity))
        return nn.relu(h + identity)


class AttentionPool2d(nn.Module):
    """Mean-token QKV attention pool (reference model.py:109-154). Only the
    prepended mean token's output is consumed, so the query is computed for
    that token alone — numerically identical, (HW+1)x cheaper."""

    heads: int
    output_dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C).astype(jnp.float32)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(C ** -0.5), (H * W + 1, C), jnp.float32)
        tokens = tokens + pos[None]
        q = nn.Dense(C, name="q_proj")(tokens[:, :1])
        k = nn.Dense(C, name="k_proj")(tokens)
        v = nn.Dense(C, name="v_proj")(tokens)
        nh, hd = self.heads, C // self.heads
        q = q.reshape(B, 1, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, nh, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) / np.sqrt(hd), -1)
        pooled = (attn @ v).transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
        return nn.Dense(self.output_dim, name="c_proj")(pooled)


class ClipResNet(nn.Module):
    """ModifiedResNet trunk + attention pool -> [B, output_dim]."""

    cfg: ResNetConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = images.astype(cfg.dtype)
        # 3-conv stem (stride-2 first conv) + avgpool (model.py:168-183)
        w2 = cfg.width // 2
        x = nn.Conv(w2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=cfg.dtype, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(w2, cfg.eps, name="bn1")(x))
        x = nn.relu(FrozenBatchNorm(w2, cfg.eps, name="bn2")(
            _conv(w2, 3, "conv2", cfg.dtype)(x)))
        x = nn.relu(FrozenBatchNorm(cfg.width, cfg.eps, name="bn3")(
            _conv(cfg.width, 3, "conv3", cfg.dtype)(x)))
        x = _avg_pool(x, 2)
        for stage, blocks in enumerate(cfg.layers):
            planes = cfg.width * (2 ** stage)
            for b in range(blocks):
                x = Bottleneck(
                    planes, stride=(2 if stage > 0 and b == 0 else 1),
                    eps=cfg.eps, dtype=cfg.dtype,
                    name=f"layer{stage + 1}_{b}")(x)
        return AttentionPool2d(
            cfg.heads, cfg.output_dim, cfg.eps, name="attnpool")(x)


# ------------------------------------------------------------------ interop


def clip_resnet_params_from_torch(
    sd: Mapping[str, Any], cfg: ResNetConfig,
) -> Dict[str, Any]:
    """torch ``ModifiedResNet.state_dict()`` (NCHW convs, BatchNorm running
    stats) -> :class:`ClipResNet` params."""

    def conv(name):
        return {"kernel": np.ascontiguousarray(
            np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}

    def bn(name):
        return {
            "scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"]),
            "mean": np.asarray(sd[f"{name}.running_mean"]),
            "var": np.asarray(sd[f"{name}.running_var"]),
        }

    def linear(name):
        return {"kernel": np.ascontiguousarray(np.asarray(sd[f"{name}.weight"]).T),
                "bias": np.asarray(sd[f"{name}.bias"])}

    params: Dict[str, Any] = {
        "conv1": conv("conv1"), "bn1": bn("bn1"),
        "conv2": conv("conv2"), "bn2": bn("bn2"),
        "conv3": conv("conv3"), "bn3": bn("bn3"),
    }
    for stage, blocks in enumerate(cfg.layers):
        for b in range(blocks):
            tp = f"layer{stage + 1}.{b}"
            block = {
                "conv1": conv(f"{tp}.conv1"), "bn1": bn(f"{tp}.bn1"),
                "conv2": conv(f"{tp}.conv2"), "bn2": bn(f"{tp}.bn2"),
                "conv3": conv(f"{tp}.conv3"), "bn3": bn(f"{tp}.bn3"),
            }
            if f"{tp}.downsample.0.weight" in sd:
                block["down_conv"] = conv(f"{tp}.downsample.0")
                block["down_bn"] = bn(f"{tp}.downsample.1")
            params[f"layer{stage + 1}_{b}"] = block
    params["attnpool"] = {
        "positional_embedding": np.asarray(sd["attnpool.positional_embedding"]),
        "q_proj": linear("attnpool.q_proj"),
        "k_proj": linear("attnpool.k_proj"),
        "v_proj": linear("attnpool.v_proj"),
        "c_proj": linear("attnpool.c_proj"),
    }
    return params
