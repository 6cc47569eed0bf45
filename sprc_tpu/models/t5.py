"""Minimal JAX T5 encoder-decoder (for the blip2_t5 LLM head).

Implements the T5 surface blip2_t5 needs (reference blip2_t5.py loads
``T5ForConditionalGeneration``, typically flan-t5 = T5 v1.1): RMS layer
norm (no mean subtraction, no bias), bucketed relative position bias shared
from each stack's first layer, unscaled attention (the 1/sqrt(d) is folded
into T5's init), pre-LN blocks, gated-GELU (v1.1) or ReLU (v1.0) FF, and a
tied-or-untied LM head with the d_model**-0.5 output scale when tied.

Parity-tested against ``transformers.T5ForConditionalGeneration``
(tests/test_t5.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sprc_tpu.ops.layers import DenseGeneral


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 2048
    d_kv: int = 64
    d_ff: int = 5120
    num_heads: int = 32
    num_layers: int = 24
    num_decoder_layers: int = 24
    relative_buckets: int = 32
    relative_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    gated_act: bool = True  # v1.1 / flan: gelu-gated; False = v1.0 relu
    tie_word_embeddings: bool = False
    dtype: Any = jnp.float32


class T5LayerNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        return ((x32 * jax.lax.rsqrt(var + self.eps)) * scale).astype(x.dtype)


def _relative_bucket(rel_pos, *, bidirectional: bool, num_buckets: int, max_distance: int):
    """HF T5 _relative_position_bucket."""
    ret = jnp.zeros_like(rel_pos)
    n = -rel_pos
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5RelBias(nn.Module):
    config: T5Config
    bidirectional: bool

    @nn.compact
    def __call__(self, q_len: int, k_len: int) -> jnp.ndarray:
        cfg = self.config
        emb = self.param(
            "embedding",
            nn.initializers.normal(1.0),
            (cfg.relative_buckets, cfg.num_heads),
            jnp.float32,
        )
        ctx = jnp.arange(q_len)[:, None]
        mem = jnp.arange(k_len)[None, :]
        buckets = _relative_bucket(
            mem - ctx,
            bidirectional=self.bidirectional,
            num_buckets=cfg.relative_buckets,
            max_distance=cfg.relative_max_distance,
        )
        bias = emb[buckets]  # [q, k, H]
        return bias.transpose(2, 0, 1)[None]  # [1, H, q, k]


class T5Attention(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, x, kv, bias):
        cfg = self.config
        B, S, _ = x.shape
        Sk = kv.shape[1]
        H, D = cfg.num_heads, cfg.d_kv
        inner = H * D
        q = DenseGeneral(inner, use_bias=False, dtype=cfg.dtype, name="q")(x)
        k = DenseGeneral(inner, use_bias=False, dtype=cfg.dtype, name="k")(kv)
        v = DenseGeneral(inner, use_bias=False, dtype=cfg.dtype, name="v")(kv)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, Sk, H, D)
        v = v.reshape(B, Sk, H, D)
        # T5: NO 1/sqrt(d) scaling
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v).reshape(B, S, inner)
        return DenseGeneral(cfg.d_model, use_bias=False, dtype=cfg.dtype, name="o")(ctx)


class T5FF(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        if cfg.gated_act:
            g = DenseGeneral(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi_0")(x)
            u = DenseGeneral(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi_1")(x)
            h = nn.gelu(g, approximate=True) * u
        else:
            h = DenseGeneral(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi")(x)
            h = jax.nn.relu(h)
        return DenseGeneral(cfg.d_model, use_bias=False, dtype=cfg.dtype, name="wo")(h)


class T5Block(nn.Module):
    config: T5Config
    is_decoder: bool

    @nn.compact
    def __call__(self, x, self_bias, enc_out=None, cross_bias=None):
        cfg = self.config
        h = T5LayerNorm(cfg.layer_norm_eps, name="self_ln")(x)
        x = x + T5Attention(cfg, name="self_attn")(h, h, self_bias)
        if self.is_decoder:
            h = T5LayerNorm(cfg.layer_norm_eps, name="cross_ln")(x)
            x = x + T5Attention(cfg, name="cross_attn")(h, enc_out, cross_bias)
        h = T5LayerNorm(cfg.layer_norm_eps, name="ff_ln")(x)
        return x + T5FF(cfg, name="ff")(h)


class T5Stack(nn.Module):
    config: T5Config
    is_decoder: bool
    num_layers: int

    @nn.compact
    def __call__(self, inputs_embeds, attention_mask=None, enc_out=None, enc_mask=None):
        cfg = self.config
        B, S, _ = inputs_embeds.shape
        pad_bias = 0.0
        if attention_mask is not None:
            pad_bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9
        rel = T5RelBias(cfg, bidirectional=not self.is_decoder, name="rel_bias")(S, S)
        self_bias = rel + pad_bias
        if self.is_decoder:
            causal = jnp.tril(jnp.ones((S, S), jnp.float32))
            self_bias = self_bias + (1.0 - causal)[None, None] * -1e9
        cross_bias = None
        if enc_out is not None:
            cross_bias = 0.0
            if enc_mask is not None:
                cross_bias = (1.0 - enc_mask.astype(jnp.float32))[:, None, None, :] * -1e9
            else:
                cross_bias = jnp.zeros((1, 1, 1, enc_out.shape[1]), jnp.float32)

        x = inputs_embeds.astype(cfg.dtype)
        for i in range(self.num_layers):
            x = T5Block(cfg, self.is_decoder, name=f"block_{i}")(
                x, self_bias, enc_out, cross_bias
            )
        return T5LayerNorm(cfg.layer_norm_eps, name="final_ln")(x)


class T5ForConditionalGeneration(nn.Module):
    config: T5Config

    def setup(self) -> None:
        cfg = self.config
        self.shared = nn.Embed(
            cfg.vocab_size, cfg.d_model, param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(1.0),
        )
        self.encoder = T5Stack(cfg, is_decoder=False, num_layers=cfg.num_layers)
        self.decoder = T5Stack(cfg, is_decoder=True, num_layers=cfg.num_decoder_layers)
        if not cfg.tie_word_embeddings:
            self.lm_head = DenseGeneral(
                cfg.vocab_size, use_bias=False, dtype=cfg.dtype
            )

    def encode(self, inputs_embeds, attention_mask=None):
        return self.encoder(inputs_embeds, attention_mask)

    def encode_ids(self, input_ids, attention_mask=None):
        return self.encoder(self.shared(input_ids), attention_mask)

    def decode(self, decoder_input_ids, enc_out, enc_mask=None, decoder_mask=None):
        hidden = self.decoder(
            self.shared(decoder_input_ids), decoder_mask, enc_out, enc_mask
        )
        cfg = self.config
        if cfg.tie_word_embeddings:
            hidden = hidden * (cfg.d_model**-0.5)
            return jnp.einsum(
                "bsh,vh->bsv",
                hidden.astype(jnp.float32),
                self.shared.embedding.astype(jnp.float32),
            )
        return self.lm_head(hidden)

    def embed(self, input_ids):
        return self.shared(input_ids)

    def __call__(self, input_ids, decoder_input_ids, attention_mask=None,
                 decoder_mask=None):
        enc = self.encode_ids(input_ids, attention_mask)
        return self.decode(decoder_input_ids, enc, attention_mask, decoder_mask)


# ------------------------------------------------------------------ interop


def t5_params_from_hf(sd: Mapping[str, Any], *, num_layers: int,
                      num_decoder_layers: int, gated_act: bool = True,
                      tie_word_embeddings: bool = False,
                      prefix: str = "") -> Dict[str, Any]:
    def t(name):
        return np.ascontiguousarray(np.asarray(sd[f"{prefix}{name}"]).T)

    def ln(name):
        return {"scale": np.asarray(sd[f"{prefix}{name}.weight"])}

    def stack(side: str, n: int, is_decoder: bool) -> Dict[str, Any]:
        out: Dict[str, Any] = {
            "final_ln": ln(f"{side}.final_layer_norm"),
            "rel_bias": {
                "embedding": np.asarray(
                    sd[f"{prefix}{side}.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
                )
            },
        }
        for i in range(n):
            bp = f"{side}.block.{i}.layer."
            block: Dict[str, Any] = {
                "self_ln": ln(f"{bp}0.layer_norm"),
                "self_attn": {
                    "q": {"kernel": t(f"{bp}0.SelfAttention.q.weight")},
                    "k": {"kernel": t(f"{bp}0.SelfAttention.k.weight")},
                    "v": {"kernel": t(f"{bp}0.SelfAttention.v.weight")},
                    "o": {"kernel": t(f"{bp}0.SelfAttention.o.weight")},
                },
            }
            ff_idx = 1
            if is_decoder:
                block["cross_ln"] = ln(f"{bp}1.layer_norm")
                block["cross_attn"] = {
                    "q": {"kernel": t(f"{bp}1.EncDecAttention.q.weight")},
                    "k": {"kernel": t(f"{bp}1.EncDecAttention.k.weight")},
                    "v": {"kernel": t(f"{bp}1.EncDecAttention.v.weight")},
                    "o": {"kernel": t(f"{bp}1.EncDecAttention.o.weight")},
                }
                ff_idx = 2
            block["ff_ln"] = ln(f"{bp}{ff_idx}.layer_norm")
            if gated_act:
                block["ff"] = {
                    "wi_0": {"kernel": t(f"{bp}{ff_idx}.DenseReluDense.wi_0.weight")},
                    "wi_1": {"kernel": t(f"{bp}{ff_idx}.DenseReluDense.wi_1.weight")},
                    "wo": {"kernel": t(f"{bp}{ff_idx}.DenseReluDense.wo.weight")},
                }
            else:
                block["ff"] = {
                    "wi": {"kernel": t(f"{bp}{ff_idx}.DenseReluDense.wi.weight")},
                    "wo": {"kernel": t(f"{bp}{ff_idx}.DenseReluDense.wo.weight")},
                }
            out[f"block_{i}"] = block
        return out

    params: Dict[str, Any] = {
        "shared": {"embedding": np.asarray(sd[f"{prefix}shared.weight"])},
        "encoder": stack("encoder", num_layers, False),
        "decoder": stack("decoder", num_decoder_layers, True),
    }
    if not tie_word_embeddings:
        params["lm_head"] = {"kernel": t("lm_head.weight")}
    return params
