"""Minimal JAX OPT decoder (for the blip2_opt LLM head).

Implements the OPT architecture surface blip2_opt needs (reference
blip2_opt.py loads ``OPTForCausalLM``): learned position embeddings with
OPT's +2 offset, pre-LN decoder blocks (ReLU MLP), final LN, LM head tied
to the token embeddings. Weights import from a HF ``OPTForCausalLM``
state_dict; parity-tested vs transformers (tests/test_opt.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sprc_tpu.ops.layers import DenseGeneral, LayerNormFP32


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 2560
    ffn_dim: int = 10240
    num_layers: int = 32
    num_heads: int = 32
    max_positions: int = 2048
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


class OPTAttention(nn.Module):
    """Causal attention with an optional functional K/V cache (the
    reference's ``past_key_values`` path, HF modeling_opt.py, done as
    explicit data — see LlamaAttention for the pattern)."""

    config: OPTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray, *,
                 positions=None, cache=None):
        cfg = self.config
        B, S, _ = x.shape
        H, D = cfg.num_heads, cfg.head_dim
        q = DenseGeneral(H * D, dtype=cfg.dtype, name="q_proj")(x)
        k = DenseGeneral(H * D, dtype=cfg.dtype, name="k_proj")(x)
        v = DenseGeneral(H * D, dtype=cfg.dtype, name="v_proj")(x)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, H, D)
        v = v.reshape(B, S, H, D)
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
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (D**-0.5) + bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v).reshape(B, S, H * D)
        y = DenseGeneral(cfg.hidden_size, dtype=cfg.dtype, name="out_proj")(ctx)
        return y if cache is None else (y, new_cache)


class OPTLayer(nn.Module):
    """Pre-LN decoder layer with ReLU MLP (do_layer_norm_before=True)."""

    config: OPTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray, *,
                 positions=None, cache=None):
        cfg = self.config
        h = LayerNormFP32(epsilon=1e-5, name="self_attn_ln")(x)
        att = OPTAttention(cfg, name="attn")(
            h, bias, positions=positions, cache=cache)
        if cache is not None:
            att, new_cache = att
        x = x + att
        h = LayerNormFP32(epsilon=1e-5, name="final_ln")(x)
        h = DenseGeneral(cfg.ffn_dim, dtype=cfg.dtype, name="fc1")(h)
        h = jax.nn.relu(h)
        h = DenseGeneral(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(h)
        y = x + h
        return y if cache is None else (y, new_cache)


class OPTForCausalLM(nn.Module):
    config: OPTConfig

    def setup(self) -> None:
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(0.02),
        )
        # OPT's learned positions are offset by 2 (padding_idx legacy)
        self.embed_positions = nn.Embed(
            cfg.max_positions + 2, cfg.hidden_size, param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(0.02),
        )
        self.layers = [OPTLayer(cfg, name=f"layer_{i}") for i in range(cfg.num_layers)]
        self.final_ln = LayerNormFP32(epsilon=1e-5)

    def _decode(self, inputs_embeds, attention_mask):
        cfg = self.config
        B, S, _ = inputs_embeds.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, S), jnp.int32)
        # OPT computes positions as cumulative attention-mask counts - 1 + 2
        positions = jnp.cumsum(attention_mask, axis=1) * attention_mask - 1 + 2
        pos_emb = self.embed_positions(jnp.maximum(positions, 0))
        x = inputs_embeds.astype(cfg.dtype) + pos_emb.astype(cfg.dtype)

        causal = jnp.tril(jnp.ones((S, S), bool))
        allowed = causal[None] & attention_mask.astype(bool)[:, None, :]
        bias = jnp.where(allowed[:, None, :, :], 0.0, -1e9).astype(jnp.float32)
        for layer in self.layers:
            x = layer(x, bias)
        return self.final_ln(x)

    def hidden_states(self, inputs_embeds, attention_mask=None):
        return self._decode(inputs_embeds, attention_mask)

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    # -- KV-cached decode (HF past_key_values done functionally) ----------
    def prefill(self, inputs_embeds, attention_mask, s_max: int):
        """Full-prefix pass filling per-layer K/V caches -> (hidden, cache).

        Right-padded prompts: generated tokens later decode INTO the pad
        slots (per-row positions), so valid columns stay contiguous."""
        cfg = self.config
        B, P, _ = inputs_embeds.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, P), jnp.int32)
        positions = jnp.cumsum(attention_mask, axis=1) * attention_mask - 1 + 2
        pos_emb = self.embed_positions(jnp.maximum(positions, 0))
        x = inputs_embeds.astype(cfg.dtype) + pos_emb.astype(cfg.dtype)

        causal = jnp.tril(jnp.ones((P, P), bool))
        allowed = causal[None] & attention_mask.astype(bool)[:, None, :]
        bias = jnp.full((B, 1, P, s_max), -1e9, jnp.float32)
        bias = bias.at[:, :, :, :P].set(jnp.where(allowed[:, None], 0.0, -1e9))

        H, D = cfg.num_heads, cfg.head_dim
        cache = {}
        kv_pos = jnp.arange(P)
        for i, layer in enumerate(self.layers):
            empty = {"k": jnp.zeros((B, s_max, H, D), cfg.dtype),
                     "v": jnp.zeros((B, s_max, H, D), cfg.dtype)}
            x, cache[f"layer_{i}"] = layer(
                x, bias, positions=kv_pos, cache=empty)
        return self.final_ln(x), cache

    def decode_step(self, tok, pos, cache):
        """One cached position: tok [B], per-row buffer position ``pos``
        [B] -> (hidden [B, 1, h], cache). The learned position embedding
        index is pos + 2 (OPT's legacy offset; contiguous per row)."""
        cfg = self.config
        B = tok.shape[0]
        s_max = cache["layer_0"]["k"].shape[1]
        x = (self.embed_tokens(tok)[:, None, :].astype(cfg.dtype)
             + self.embed_positions(pos + 2)[:, None, :].astype(cfg.dtype))
        valid = jnp.arange(s_max)[None, :] <= pos[:, None]
        bias = jnp.where(valid[:, None, None, :], 0.0, -1e9).astype(jnp.float32)
        new_cache = {}
        for i, layer in enumerate(self.layers):
            x, new_cache[f"layer_{i}"] = layer(
                x, bias, positions=pos[:, None], cache=cache[f"layer_{i}"])
        return self.final_ln(x), new_cache

    def decode_step_logits(self, tok, pos, cache):
        hidden, cache = self.decode_step(tok, pos, cache)
        return self.logits(hidden)[:, 0, :], cache

    def logits(self, hidden):
        # LM head tied to token embeddings (OPT default)
        emb = self.embed_tokens.embedding
        return jnp.einsum(
            "bsh,vh->bsv", hidden.astype(jnp.float32), emb.astype(jnp.float32)
        )

    def __call__(self, input_ids, attention_mask=None):
        hidden = self._decode(self.embed_tokens(input_ids), attention_mask)
        return self.logits(hidden)


def opt_params_from_hf(sd: Mapping[str, Any], *, num_layers: int,
                       prefix: str = "") -> Dict[str, Any]:
    """HF OPTForCausalLM state_dict -> params."""

    def t(name):
        return np.ascontiguousarray(np.asarray(sd[f"{prefix}{name}"]).T)

    def lin(name):
        return {
            "kernel": t(f"{name}.weight"),
            "bias": np.asarray(sd[f"{prefix}{name}.bias"]),
        }

    def ln(name):
        return {
            "scale": np.asarray(sd[f"{prefix}{name}.weight"]),
            "bias": np.asarray(sd[f"{prefix}{name}.bias"]),
        }

    dp = "model.decoder."
    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": np.asarray(sd[f"{prefix}{dp}embed_tokens.weight"])},
        "embed_positions": {"embedding": np.asarray(sd[f"{prefix}{dp}embed_positions.weight"])},
        "final_ln": ln(f"{dp}final_layer_norm"),
    }
    for i in range(num_layers):
        lp = f"{dp}layers.{i}."
        params[f"layer_{i}"] = {
            "self_attn_ln": ln(f"{lp}self_attn_layer_norm"),
            "final_ln": ln(f"{lp}final_layer_norm"),
            "attn": {
                "q_proj": lin(f"{lp}self_attn.q_proj"),
                "k_proj": lin(f"{lp}self_attn.k_proj"),
                "v_proj": lin(f"{lp}self_attn.v_proj"),
                "out_proj": lin(f"{lp}self_attn.out_proj"),
            },
            "fc1": lin(f"{lp}fc1"),
            "fc2": lin(f"{lp}fc2"),
        }
    return params
