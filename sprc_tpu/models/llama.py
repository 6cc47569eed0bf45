"""Minimal JAX LLaMA decoder (for the InstructBLIP-style CIR variants).

Implements the LLaMA architecture surface the instruct models need
(reference blip2_vicuna_instruct.py:84-86 loads ``LlamaForCausalLM``):
RMSNorm, rotary position embeddings, (grouped-query-capable) causal
attention with padding masks, SwiGLU MLP, and a tied/untied LM head.
Weights import from a HF ``LlamaForCausalLM`` state_dict.

Runs in bf16 on TPU with fp32 RMSNorm statistics; parity-tested against
``transformers.LlamaForCausalLM`` instantiated from a tiny config
(tests/test_llama.py).
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
class LlamaConfig:
    vocab_size: int = 32001
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: Optional[int] = None  # None = MHA
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        normed = x32 * jax.lax.rsqrt(var + self.eps)
        return (normed * scale).astype(x.dtype)


def rotary_embed(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Apply RoPE to [B, S, H, D] given integer positions [S] or per-row
    [B, S] (HF layout: rotate_half over the split halves)."""
    D = x.shape[-1]
    if positions.ndim == 1:
        positions = positions[None, :]  # [1, S] broadcast over batch
    inv_freq = 1.0 / (theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [B?, S, D/2]
    cos = jnp.cos(angles)[:, :, None, :]  # [B?, S, 1, D/2]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., : D // 2], x[..., D // 2 :]
    cos = jnp.concatenate([cos, cos], axis=-1).astype(jnp.float32)
    sin = jnp.concatenate([sin, sin], axis=-1).astype(jnp.float32)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    out = x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin
    return out.astype(x.dtype)


class LlamaAttention(nn.Module):
    """Causal attention with an optional functional K/V cache.

    With ``cache`` (dict ``{"k": [B, S_max, KV, D], "v": ...}``) the new
    positions' K/V are scattered into the cache at ``positions`` and the
    query attends over the FULL cache; returns ``(y, new_cache)``. Without
    it, plain full-sequence attention returns ``y`` (unchanged math). This
    is the reference's ``past_key_values`` path (HF modeling_llama.py) done
    functionally — cache as explicit data, one jitted step per shape."""

    config: LlamaConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray, *,
                 positions: Optional[jnp.ndarray] = None, cache=None):
        cfg = self.config
        B, S, _ = x.shape
        H, KV, D = cfg.num_heads, cfg.kv_heads, cfg.head_dim

        q = DenseGeneral(H * D, use_bias=False, dtype=cfg.dtype, name="q_proj")(x)
        k = DenseGeneral(KV * D, use_bias=False, dtype=cfg.dtype, name="k_proj")(x)
        v = DenseGeneral(KV * D, use_bias=False, dtype=cfg.dtype, name="v_proj")(x)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, KV, D)
        v = v.reshape(B, S, KV, D)

        if positions is None:
            positions = jnp.arange(S)
        q = rotary_embed(q, positions, cfg.rope_theta)
        k = rotary_embed(k, positions, cfg.rope_theta)

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

        if KV != H:  # GQA: repeat kv heads
            rep = H // KV
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (D**-0.5) + bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        ctx = ctx.reshape(B, S, H * D)
        y = DenseGeneral(cfg.hidden_size, use_bias=False, dtype=cfg.dtype, name="o_proj")(ctx)
        return y if cache is None else (y, new_cache)


class LlamaMLP(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        gate = DenseGeneral(cfg.intermediate_size, use_bias=False, dtype=cfg.dtype, name="gate_proj")(x)
        up = DenseGeneral(cfg.intermediate_size, use_bias=False, dtype=cfg.dtype, name="up_proj")(x)
        h = jax.nn.silu(gate) * up
        return DenseGeneral(cfg.hidden_size, use_bias=False, dtype=cfg.dtype, name="down_proj")(h)


class LlamaLayer(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray, *,
                 positions: Optional[jnp.ndarray] = None, cache=None):
        cfg = self.config
        h = RMSNorm(cfg.rms_eps, name="input_ln")(x)
        att = LlamaAttention(cfg, name="attn")(
            h, bias, positions=positions, cache=cache)
        if cache is not None:
            att, new_cache = att
        x = x + att
        h = RMSNorm(cfg.rms_eps, name="post_ln")(x)
        y = x + LlamaMLP(cfg, name="mlp")(h)
        return y if cache is None else (y, new_cache)


class LlamaModel(nn.Module):
    """Decoder trunk over input embeddings -> last hidden states.

    Takes ``inputs_embeds`` (the instruct models prepend projected query
    outputs to token embeddings, blip2_vicuna_instruct.py:199-202) and an
    optional padding mask; causal masking is built in.

    ``prefill``/``decode_step`` implement KV-cached decoding functionally
    (reference past_key_values plumbing, HF modeling_llama.py): the prefix
    runs ONCE filling per-layer K/V buffers padded to ``s_max``; each
    subsequent token is a single-position step against the cache at its
    row's own position (right-padded prompts decode into their pad slots,
    so valid columns stay contiguous per row).
    """

    config: LlamaConfig

    def setup(self) -> None:
        cfg = self.config
        self.layers = [
            LlamaLayer(cfg, name=f"layer_{i}") for i in range(cfg.num_layers)
        ]
        self.norm = RMSNorm(cfg.rms_eps, name="norm")

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        B, S, _ = inputs_embeds.shape
        causal = jnp.tril(jnp.ones((S, S), bool))
        if attention_mask is None:
            allowed = causal[None]
        else:
            allowed = causal[None] & attention_mask.astype(bool)[:, None, :]
        bias = jnp.where(allowed[:, None, :, :], 0.0, -1e9).astype(jnp.float32)

        x = inputs_embeds.astype(cfg.dtype)
        for layer in self.layers:
            x = layer(x, bias)
        return self.norm(x)

    def prefill(self, inputs_embeds: jnp.ndarray,
                attention_mask: Optional[jnp.ndarray], s_max: int):
        """Full-prefix pass that also fills the K/V caches -> (hidden, cache)."""
        cfg = self.config
        B, P, _ = inputs_embeds.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, P), jnp.int32)
        causal = jnp.tril(jnp.ones((P, P), bool))
        allowed = causal[None] & attention_mask.astype(bool)[:, None, :]
        bias = jnp.full((B, 1, P, s_max), -1e9, jnp.float32)
        bias = bias.at[:, :, :, :P].set(
            jnp.where(allowed[:, None], 0.0, -1e9))
        positions = jnp.arange(P)

        KV, D = cfg.kv_heads, cfg.head_dim
        empty = lambda: {  # noqa: E731
            "k": jnp.zeros((B, s_max, KV, D), cfg.dtype),
            "v": jnp.zeros((B, s_max, KV, D), cfg.dtype),
        }
        x = inputs_embeds.astype(cfg.dtype)
        cache = {}
        for i, layer in enumerate(self.layers):
            x, cache[f"layer_{i}"] = layer(
                x, bias, positions=positions, cache=empty())
        return self.norm(x), cache

    def decode_step(self, embed_t: jnp.ndarray, pos: jnp.ndarray, cache):
        """One cached position: embed_t [B, 1, h], per-row position ``pos``
        [B] (its K/V goes to cache slot pos; attends cols <= pos)."""
        cfg = self.config
        B = embed_t.shape[0]
        s_max = cache["layer_0"]["k"].shape[1]
        valid = jnp.arange(s_max)[None, :] <= pos[:, None]  # [B, s_max]
        bias = jnp.where(valid[:, None, None, :], 0.0, -1e9).astype(jnp.float32)
        positions = pos[:, None]  # [B, 1]

        x = embed_t.astype(cfg.dtype)
        new_cache = {}
        for i, layer in enumerate(self.layers):
            x, new_cache[f"layer_{i}"] = layer(
                x, bias, positions=positions, cache=cache[f"layer_{i}"])
        return self.norm(x), new_cache


class LlamaForCausalLM(nn.Module):
    config: LlamaConfig

    def setup(self) -> None:
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(0.02),
        )
        self.model = LlamaModel(cfg)
        self.lm_head = DenseGeneral(cfg.vocab_size, use_bias=False, dtype=cfg.dtype)

    def __call__(self, input_ids, attention_mask=None):
        hidden = self.model(self.embed_tokens(input_ids), attention_mask)
        return self.lm_head(hidden)

    def hidden_states(self, inputs_embeds, attention_mask=None):
        return self.model(inputs_embeds, attention_mask)

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def logits(self, hidden):
        return self.lm_head(hidden)

    # KV-cached decode surface (see LlamaModel.prefill/decode_step)
    def prefill(self, inputs_embeds, attention_mask, s_max: int):
        return self.model.prefill(inputs_embeds, attention_mask, s_max)

    def decode_step_logits(self, tok, pos, cache):
        """tok [B] -> (next-token logits [B, V], cache)."""
        hidden, cache = self.model.decode_step(
            self.embed_tokens(tok)[:, None, :], pos, cache)
        return self.lm_head(hidden)[:, 0, :], cache


# ------------------------------------------------------------------ interop


def llama_params_from_hf(sd: Mapping[str, Any], *, num_layers: int,
                         prefix: str = "") -> Dict[str, Any]:
    """HF LlamaForCausalLM state_dict -> LlamaForCausalLM params."""

    def t(name):
        return np.ascontiguousarray(np.asarray(sd[f"{prefix}{name}"]).T)

    model: Dict[str, Any] = {
        "norm": {"scale": np.asarray(sd[f"{prefix}model.norm.weight"])},
    }
    for i in range(num_layers):
        lp = f"model.layers.{i}."
        model[f"layer_{i}"] = {
            "input_ln": {"scale": np.asarray(sd[f"{prefix}{lp}input_layernorm.weight"])},
            "post_ln": {"scale": np.asarray(sd[f"{prefix}{lp}post_attention_layernorm.weight"])},
            "attn": {
                "q_proj": {"kernel": t(f"{lp}self_attn.q_proj.weight")},
                "k_proj": {"kernel": t(f"{lp}self_attn.k_proj.weight")},
                "v_proj": {"kernel": t(f"{lp}self_attn.v_proj.weight")},
                "o_proj": {"kernel": t(f"{lp}self_attn.o_proj.weight")},
            },
            "mlp": {
                "gate_proj": {"kernel": t(f"{lp}mlp.gate_proj.weight")},
                "up_proj": {"kernel": t(f"{lp}mlp.up_proj.weight")},
                "down_proj": {"kernel": t(f"{lp}mlp.down_proj.weight")},
            },
        }
    return {
        "embed_tokens": {"embedding": np.asarray(sd[f"{prefix}model.embed_tokens.weight"])},
        "model": model,
        "lm_head": {"kernel": t("lm_head.weight")},
    }
