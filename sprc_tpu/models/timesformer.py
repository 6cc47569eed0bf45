"""TimeSformer (divided space-time attention) — TPU-native Flax.

Re-implementation (not a port) of the reference video encoder
(reference: src/lavis/models/timesformer/vit.py:134-258 Block,
:300-460 VisionTransformer, :528-634 TimeSformer wrapper): ViT-B/16 trunk
where every block runs (1) temporal attention over frames per spatial
location, (2) spatial attention per frame with a replicated CLS whose
outputs are frame-averaged, (3) an MLP over [CLS; tokens].

TPU-first choices: video enters as ``[B, T, H, W, 3]`` NHWC frames (the
conv patchifier lowers to one MXU matmul over B*T frames); tokens are kept
in the factored ``[B, T, N, D]`` layout with the CLS carried separately —
the reference's flattened ``(h w t)`` token order forces gather/rearranges
every block, while the factored layout makes temporal/spatial attention a
pair of free transposes; attention itself is the shared BSHD
:func:`sprc_tpu.ops.attention.dot_product_attention`.

Parity notes: per-block ``temporal_fc`` is zero-init for blocks > 0 only
(reference vit.py:373-383 quirk). ``forward_features`` returns the ALPRO
pooled form ``[B, 1+N, D]`` (CLS + frame-averaged spatial tokens, reference
vit.py:595-609); ``forward_tokens`` returns the full ``[B, 1+N*T, D]``
sequence in the reference's (h w t) order for parity testing.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from sprc_tpu.ops.attention import dot_product_attention
from sprc_tpu.ops.layers import DenseGeneral, LayerNormFP32

Dtype = Any


@dataclasses.dataclass(frozen=True)
class TimeSformerConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_hidden: int = 3072
    num_frames: int = 8
    layer_norm_eps: float = 1e-6
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads


class _MHA(nn.Module):
    """timm-style MHA: packed qkv with bias + out proj (vit.py:86-131)."""

    config: TimeSformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        B, S, C = x.shape
        H, D = cfg.num_heads, cfg.head_dim
        qkv = DenseGeneral(3 * C, dtype=cfg.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ctx = dot_product_attention(
            q.reshape(B, S, H, D), k.reshape(B, S, H, D), v.reshape(B, S, H, D)
        ).reshape(B, S, C)
        out = DenseGeneral(C, dtype=cfg.dtype, name="proj")(ctx)
        return nn.Dropout(cfg.dropout_rate)(out, deterministic=deterministic)


class _Mlp(nn.Module):
    config: TimeSformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        h = DenseGeneral(cfg.mlp_hidden, dtype=cfg.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        h = DenseGeneral(cfg.width, dtype=cfg.dtype, name="fc2")(h)
        return nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)


class DividedBlock(nn.Module):
    """One divided space-time block over (tokens [B,T,N,C], cls [B,1,C])."""

    config: TimeSformerConfig
    zero_init_temporal_fc: bool = True  # blocks > 0 (reference vit.py:373-383)

    @nn.compact
    def __call__(self, x, cls, *, deterministic: bool = True):
        cfg = self.config
        B, T, N, C = x.shape

        # ---- temporal attention over frames, per spatial location (:210-224)
        h = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="temporal_norm1")(x)
        h = h.transpose(0, 2, 1, 3).reshape(B * N, T, C)
        h = _MHA(cfg, name="temporal_attn")(h, deterministic=deterministic)
        h = h.reshape(B, N, T, C).transpose(0, 2, 1, 3)
        fc_init = nn.initializers.zeros if self.zero_init_temporal_fc else (
            nn.initializers.normal(0.02)
        )
        res_t = DenseGeneral(C, dtype=cfg.dtype, kernel_init=fc_init,
                             name="temporal_fc")(h)
        xt = x + res_t

        # ---- spatial attention per frame with replicated CLS (:226-247)
        cls_rep = jnp.broadcast_to(
            cls[:, None].astype(x.dtype), (B, T, 1, C)
        ).reshape(B * T, 1, C)
        xs = jnp.concatenate([cls_rep, xt.reshape(B * T, N, C)], axis=1)
        so = _MHA(cfg, name="attn")(
            LayerNormFP32(epsilon=cfg.layer_norm_eps, name="norm1")(xs),
            deterministic=deterministic,
        )
        cls_out = so[:, 0].reshape(B, T, C).mean(axis=1, keepdims=True)  # [B,1,C]
        res_s = so[:, 1:].reshape(B, T, N, C)

        # ---- combine (:249-251): cat(init_cls, xt) + cat(cls_avg, res_spatial)
        x_new = xt + res_s
        cls_new = cls + cls_out

        # ---- MLP over [CLS; tokens] (:253-260); norm2/mlp are shared
        # between cls and tokens (the reference applies them to the
        # concatenated sequence — tokenwise ops, so applying per part is
        # identical)
        mlp = _Mlp(cfg, name="mlp")
        norm2 = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="norm2")
        cls_new = cls_new + mlp(norm2(cls_new), deterministic=deterministic)
        x_new = x_new + mlp(norm2(x_new), deterministic=deterministic)
        return x_new, cls_new


class TimeSformer(nn.Module):
    """Divided space-time ViT-B; see module docstring for layouts."""

    config: TimeSformerConfig

    @nn.compact
    def _trunk(self, video: jnp.ndarray, *, deterministic: bool = True):
        cfg = self.config
        B, T, H, W, _ = video.shape
        p = cfg.patch_size
        x = nn.Conv(
            features=cfg.width, kernel_size=(p, p), strides=(p, p),
            dtype=cfg.dtype, param_dtype=jnp.float32, name="patch_embed",
        )(video.reshape(B * T, H, W, 3).astype(cfg.dtype))
        N = (H // p) * (W // p)
        x = x.reshape(B, T, N, cfg.width)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, cfg.width), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.num_patches + 1, cfg.width), jnp.float32)
        time = self.param("time_embed", nn.initializers.normal(0.02),
                          (1, cfg.num_frames, cfg.width), jnp.float32)

        # spatial pos per frame (vit.py:415-432), temporal embed per frame
        # (:435-450); CLS gets pos_embed[0]
        x = x + pos[:, 1:, :][:, None].astype(x.dtype)
        x = x + time[:, :T, None, :].astype(x.dtype)
        cls_tok = jnp.broadcast_to(
            (cls + pos[:, :1, :]).astype(x.dtype), (B, 1, cfg.width)
        )

        for i in range(cfg.depth):
            x, cls_tok = DividedBlock(
                cfg, zero_init_temporal_fc=(i > 0), name=f"block_{i}"
            )(x, cls_tok, deterministic=deterministic)

        norm = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="norm")
        return norm(x), norm(cls_tok)

    def __call__(self, video: jnp.ndarray, *, deterministic: bool = True):
        return self.forward_features(video, deterministic=deterministic)

    def forward_features(self, video: jnp.ndarray, *, deterministic: bool = True):
        """ALPRO pooled features [B, 1+N, C]: CLS + frame-mean tokens
        (reference vit.py:595-609)."""
        x, cls_tok = self._trunk(video, deterministic=deterministic)
        pooled = x.mean(axis=1)  # mean over frames -> [B, N, C]
        return jnp.concatenate([cls_tok, pooled], axis=1).astype(jnp.float32)

    def forward_tokens(self, video: jnp.ndarray, *, deterministic: bool = True):
        """Full token sequence [B, 1+N*T, C] in the reference's (h w t)
        order (vit.py:412-460 token layout), for parity checks."""
        x, cls_tok = self._trunk(video, deterministic=deterministic)
        B, T, N, C = x.shape
        seq = x.transpose(0, 2, 1, 3).reshape(B, N * T, C)  # (n t), t fastest
        return jnp.concatenate([cls_tok, seq], axis=1).astype(jnp.float32)


def timesformer_params_from_torch(sd, prefix: str, depth: int) -> dict:
    """Reference TimeSformer ``VisionTransformer`` state dict -> param tree.

    ``prefix`` addresses the trunk inside a larger checkpoint — for the
    released ALPRO weights that is ``visual_encoder.model.`` (the reference
    ``TimeSformer`` wrapper, vit.py:528-588, owns the trunk as ``.model``).
    """
    import numpy as np

    from sprc_tpu.interop.torch_import import _layernorm, _linear

    p = prefix
    conv_w = np.asarray(sd[f"{p}patch_embed.proj.weight"])
    params = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{p}patch_embed.proj.bias"]),
        },
        "cls_token": np.asarray(sd[f"{p}cls_token"]),
        "pos_embed": np.asarray(sd[f"{p}pos_embed"]),
        "time_embed": np.asarray(sd[f"{p}time_embed"]),
        "norm": _layernorm(sd, f"{p}norm"),
    }
    for i in range(depth):
        b = f"{p}blocks.{i}"
        params[f"block_{i}"] = {
            "temporal_norm1": _layernorm(sd, f"{b}.temporal_norm1"),
            "temporal_attn": {
                "qkv": _linear(sd, f"{b}.temporal_attn.qkv"),
                "proj": _linear(sd, f"{b}.temporal_attn.proj"),
            },
            "temporal_fc": _linear(sd, f"{b}.temporal_fc"),
            "norm1": _layernorm(sd, f"{b}.norm1"),
            "attn": {
                "qkv": _linear(sd, f"{b}.attn.qkv"),
                "proj": _linear(sd, f"{b}.attn.proj"),
            },
            "norm2": _layernorm(sd, f"{b}.norm2"),
            "mlp": {
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            },
        }
    return params
