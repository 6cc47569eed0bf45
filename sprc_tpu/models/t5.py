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
    def __call__(self, q_len: int, k_len: int,
                 q_positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        emb = self.param(
            "embedding",
            nn.initializers.normal(1.0),
            (cfg.relative_buckets, cfg.num_heads),
            jnp.float32,
        )
        if q_positions is None:
            ctx = jnp.arange(q_len)[:, None]
        else:  # cached decode: bias rows for arbitrary (traced) positions
            ctx = q_positions.reshape(-1, 1)
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
    """T5 attention with optional functional caches: ``cache`` holds the
    growing self-attn K/V (scattered at ``positions``), ``static_kv`` a
    precomputed (k, v) pair ([B, Sk, H, D]) for cross-attention so the
    encoder memory is projected ONCE at prefill (the reference's
    past_key_values cross-attn reuse, HF modeling_t5.py)."""

    config: T5Config

    def setup(self) -> None:
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        self.q = DenseGeneral(inner, use_bias=False, dtype=cfg.dtype, name="q")
        self.k = DenseGeneral(inner, use_bias=False, dtype=cfg.dtype, name="k")
        self.v = DenseGeneral(inner, use_bias=False, dtype=cfg.dtype, name="v")
        self.o = DenseGeneral(cfg.d_model, use_bias=False, dtype=cfg.dtype, name="o")

    def __call__(self, x, kv, bias, *, positions=None, cache=None,
                 static_kv=None):
        cfg = self.config
        B, S, _ = x.shape
        H, D = cfg.num_heads, cfg.d_kv
        inner = H * D
        q = self.q(x).reshape(B, S, H, D)
        if static_kv is not None:
            k, v = static_kv
        else:
            Sk = kv.shape[1]
            k = self.k(kv).reshape(B, Sk, H, D)
            v = self.v(kv).reshape(B, Sk, H, D)
        new_cache = None
        if cache is not None:
            pos2d = positions[None, :] if positions.ndim == 1 else positions
            pos2d = jnp.broadcast_to(pos2d, (B, S))
            rows = jnp.arange(B)[:, None]
            new_cache = {
                "k": cache["k"].at[rows, pos2d].set(k.astype(cache["k"].dtype)),
                "v": cache["v"].at[rows, pos2d].set(v.astype(cache["v"].dtype)),
            }
            k, v = new_cache["k"], new_cache["v"]
        # T5: NO 1/sqrt(d) scaling
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v).reshape(B, S, inner)
        y = self.o(ctx)
        return y if cache is None else (y, new_cache)

    def project_kv(self, kv):
        """Cross-attn K/V of an encoder memory, computed once at prefill."""
        cfg = self.config
        B, Sk, _ = kv.shape
        H, D = cfg.num_heads, cfg.d_kv
        return (self.k(kv).reshape(B, Sk, H, D),
                self.v(kv).reshape(B, Sk, H, D))


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

    def setup(self) -> None:
        cfg = self.config
        self.self_ln = T5LayerNorm(cfg.layer_norm_eps, name="self_ln")
        self.self_attn = T5Attention(cfg, name="self_attn")
        if self.is_decoder:
            self.cross_ln = T5LayerNorm(cfg.layer_norm_eps, name="cross_ln")
            self.cross_attn = T5Attention(cfg, name="cross_attn")
        self.ff_ln = T5LayerNorm(cfg.layer_norm_eps, name="ff_ln")
        self.ff = T5FF(cfg, name="ff")

    def __call__(self, x, self_bias, enc_out=None, cross_bias=None, *,
                 positions=None, cache=None, cross_kv=None):
        h = self.self_ln(x)
        att = self.self_attn(h, h, self_bias, positions=positions, cache=cache)
        if cache is not None:
            att, new_cache = att
        x = x + att
        if self.is_decoder:
            h = self.cross_ln(x)
            x = x + self.cross_attn(h, enc_out, cross_bias, static_kv=cross_kv)
        h = self.ff_ln(x)
        y = x + self.ff(h)
        return y if cache is None else (y, new_cache)

    def cross_project(self, enc_out):
        return self.cross_attn.project_kv(enc_out)


class T5Stack(nn.Module):
    config: T5Config
    is_decoder: bool
    num_layers: int

    def setup(self) -> None:
        cfg = self.config
        self.blocks = [
            T5Block(cfg, self.is_decoder, name=f"block_{i}")
            for i in range(self.num_layers)
        ]
        self.rel_bias = T5RelBias(
            cfg, bidirectional=not self.is_decoder, name="rel_bias")
        self.final_ln = T5LayerNorm(cfg.layer_norm_eps, name="final_ln")

    @staticmethod
    def _cross_bias(enc_out, enc_mask):
        if enc_mask is not None:
            return (1.0 - enc_mask.astype(jnp.float32))[:, None, None, :] * -1e9
        return jnp.zeros((1, 1, 1, enc_out.shape[1]), jnp.float32)

    def __call__(self, inputs_embeds, attention_mask=None, enc_out=None, enc_mask=None):
        cfg = self.config
        B, S, _ = inputs_embeds.shape
        pad_bias = 0.0
        if attention_mask is not None:
            pad_bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9
        rel = self.rel_bias(S, S)
        self_bias = rel + pad_bias
        if self.is_decoder:
            causal = jnp.tril(jnp.ones((S, S), jnp.float32))
            self_bias = self_bias + (1.0 - causal)[None, None] * -1e9
        cross_bias = None
        if enc_out is not None:
            cross_bias = self._cross_bias(enc_out, enc_mask)

        x = inputs_embeds.astype(cfg.dtype)
        for block in self.blocks:
            x = block(x, self_bias, enc_out, cross_bias)
        return self.final_ln(x)

    # -- KV-cached decoder path (decoder stacks only) ---------------------
    def prefill(self, inputs_embeds, enc_out, enc_mask, s_max: int):
        """Decoder prefix pass filling self-attn K/V caches AND the
        once-per-sequence cross-attn K/V -> (hidden, cache). The T5 decode
        prefix is left-aligned (bos/forced tokens, no pads), so positions
        are uniform across rows."""
        assert self.is_decoder
        cfg = self.config
        B, P, _ = inputs_embeds.shape
        rel = self.rel_bias(P, s_max)  # [1, H, P, s_max]
        cols = jnp.arange(s_max)[None, :]
        causal = cols <= jnp.arange(P)[:, None]  # [P, s_max]
        self_bias = rel + jnp.where(causal, 0.0, -1e9)[None, None]
        cross_bias = self._cross_bias(enc_out, enc_mask)

        H, D = cfg.num_heads, cfg.d_kv
        positions = jnp.arange(P)
        x = inputs_embeds.astype(cfg.dtype)
        cache = {}
        for i, block in enumerate(self.blocks):
            ck, cv = block.cross_project(enc_out)
            empty = {"k": jnp.zeros((B, s_max, H, D), cfg.dtype),
                     "v": jnp.zeros((B, s_max, H, D), cfg.dtype)}
            x, new = block(
                x, self_bias, enc_out, cross_bias,
                positions=positions, cache=empty, cross_kv=(ck, cv))
            new["ck"], new["cv"] = ck, cv
            cache[f"block_{i}"] = new
        return self.final_ln(x), cache

    def decode_step(self, embed_t, t, cache, enc_mask):
        """One cached decoder position t (scalar; uniform across rows):
        embed_t [B, 1, d] -> (hidden [B, 1, d], cache)."""
        assert self.is_decoder
        cfg = self.config
        s_max = cache["block_0"]["k"].shape[1]
        t_arr = jnp.asarray(t).reshape(1)
        rel = self.rel_bias(1, s_max, q_positions=t_arr)  # [1, H, 1, s_max]
        valid = jnp.arange(s_max)[None, None, None, :] <= t
        self_bias = rel + jnp.where(valid, 0.0, -1e9)
        if enc_mask is not None:
            cross_bias = self._cross_bias(None, enc_mask)
        else:
            senc = cache["block_0"]["ck"].shape[1]
            cross_bias = jnp.zeros((1, 1, 1, senc), jnp.float32)

        x = embed_t.astype(cfg.dtype)
        new_cache = {}
        for i, block in enumerate(self.blocks):
            entry = cache[f"block_{i}"]
            x, new = block(
                x, self_bias, None, cross_bias,
                positions=t_arr, cache={"k": entry["k"], "v": entry["v"]},
                cross_kv=(entry["ck"], entry["cv"]))
            new["ck"], new["cv"] = entry["ck"], entry["cv"]
            new_cache[f"block_{i}"] = new
        return self.final_ln(x), new_cache


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
        return self._lm_logits(hidden)

    def _lm_logits(self, hidden):
        cfg = self.config
        if cfg.tie_word_embeddings:
            hidden = hidden * (cfg.d_model**-0.5)
            return jnp.einsum(
                "bsh,vh->bsv",
                hidden.astype(jnp.float32),
                self.shared.embedding.astype(jnp.float32),
            )
        return self.lm_head(hidden)

    # -- KV-cached decode (reference past_key_values, HF modeling_t5.py) --
    def decode_prefill(self, decoder_input_ids, enc_out, enc_mask, s_max: int):
        """-> (logits at the last prefix position [B, V], cache)."""
        hidden, cache = self.decoder.prefill(
            self.shared(decoder_input_ids), enc_out, enc_mask, s_max)
        return self._lm_logits(hidden[:, -1:, :])[:, 0, :], cache

    def decode_step_logits(self, tok, t, cache, enc_mask=None):
        """tok [B], scalar position t -> (next-token logits [B, V], cache)."""
        hidden, cache = self.decoder.decode_step(
            self.shared(tok)[:, None, :], t, cache, enc_mask)
        return self._lm_logits(hidden)[:, 0, :], cache

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
