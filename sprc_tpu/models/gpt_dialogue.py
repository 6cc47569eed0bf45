"""GPT-2 video-dialogue model (registry: ``gpt_dialogue``).

TPU-native equivalent of the reference ``GPTDialogue``
(reference: src/lavis/models/gpt_models/gpt_dialogue.py:18-110): a GPT-2 LM
whose input sequence is [projected video features | token embeddings] with
token-type embeddings, trained with shifted CE over text (ignore -1) plus a
shifted MSE video-feature reconstruction head.

The GPT-2 trunk (pre-LN blocks, packed c_attn Conv1D weights — stored [in,
out], unlike nn.Linear — gelu_new MLP, tied LM head) is parity-tested vs
``transformers.GPT2LMHeadModel`` (tests/test_gpt_dialogue.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sprc_tpu.ops.layers import DenseGeneral, LayerNormFP32
from sprc_tpu.registry import registry


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_positions: int = 1024
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32


class GPT2Block(nn.Module):
    config: GPT2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        B, S, C = x.shape
        H, D = cfg.n_head, cfg.n_embd // cfg.n_head
        h = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="ln_1")(x)
        qkv = DenseGeneral(3 * C, dtype=cfg.dtype, name="c_attn")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q.reshape(B, S, H, D), k.reshape(B, S, H, D),
            preferred_element_type=jnp.float32,
        ) * (D**-0.5) + bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(v.dtype), v.reshape(B, S, H, D)
        ).reshape(B, S, C)
        x = x + DenseGeneral(C, dtype=cfg.dtype, name="c_proj")(ctx)
        h = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="ln_2")(x)
        h = DenseGeneral(4 * C, dtype=cfg.dtype, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=True)  # gelu_new
        h = DenseGeneral(C, dtype=cfg.dtype, name="mlp_proj")(h)
        return x + h


class GPT2Model(nn.Module):
    """GPT-2 trunk over inputs_embeds (+ optional token-type ids)."""

    config: GPT2Config

    def setup(self) -> None:
        cfg = self.config
        self.wte = nn.Embed(
            cfg.vocab_size, cfg.n_embd, param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(0.02),
        )
        self.wpe = nn.Embed(
            cfg.n_positions, cfg.n_embd, param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(0.01),
        )
        self.blocks = [GPT2Block(cfg, name=f"h_{i}") for i in range(cfg.n_layer)]
        self.ln_f = LayerNormFP32(epsilon=cfg.layer_norm_eps)

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        B, S, _ = inputs_embeds.shape
        x = inputs_embeds + self.wpe(jnp.arange(S))[None]
        if token_type_ids is not None:
            # HF GPT-2 embeds token types through wte
            x = x + self.wte(token_type_ids)
        causal = jnp.tril(jnp.ones((S, S), bool))
        allowed = causal[None]
        if attention_mask is not None:
            allowed = allowed & attention_mask.astype(bool)[:, None, :]
        bias = jnp.where(allowed[:, None, :, :], 0.0, -1e9).astype(jnp.float32)
        x = x.astype(cfg.dtype)
        for block in self.blocks:
            x = block(x, bias)
        return self.ln_f(x)

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.wte(input_ids)

    def logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        # LM head tied to wte
        return jnp.einsum(
            "bsh,vh->bsv",
            hidden.astype(jnp.float32),
            self.wte.embedding.astype(jnp.float32),
        )


@dataclasses.dataclass(frozen=True)
class GPTDialogueConfig:
    gpt: GPT2Config = GPT2Config()
    len_video_ft: int = 4224


@registry.register_model("gpt_dialogue", override=True)
class GPTDialogue(nn.Module):
    """GPT-2 over [video prefix | dialogue tokens] (reference :36-103)."""

    cfg: GPTDialogueConfig

    def setup(self) -> None:
        self.transformer = GPT2Model(self.cfg.gpt)
        self.video_ff = DenseGeneral(self.cfg.gpt.n_embd)
        self.video_ff_out = DenseGeneral(self.cfg.len_video_ft)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        video_fts: jnp.ndarray,  # [B, T, len_video_ft]
        attn_mask: jnp.ndarray,  # [B, T + L]
        token_type_ids: jnp.ndarray,  # [B, T + L]
        labels: Optional[jnp.ndarray] = None,  # [B, T + L], -1 = ignore
    ) -> Dict[str, jnp.ndarray]:
        embs = jnp.concatenate(
            [
                self.video_ff(video_fts).astype(jnp.float32),
                self.transformer.embed(input_ids),
            ],
            axis=1,
        )
        hidden = self.transformer(embs, attn_mask, token_type_ids)
        lm_logits = self.transformer.logits(hidden)

        out: Dict[str, jnp.ndarray] = {"logits": lm_logits}
        loss = jnp.asarray(0.0, jnp.float32)
        if labels is not None:
            shift_logits = lm_logits[:, :-1, :]
            shift_labels = labels[:, 1:]
            valid = shift_labels != -1
            logp = jax.nn.log_softmax(shift_logits, axis=-1)
            safe = jnp.where(valid, shift_labels, 0)
            nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
            loss = loss + (nll * valid).sum() / jnp.maximum(valid.sum(), 1)
        # video reconstruction (:82-95): shifted MSE over the video prefix
        T = video_fts.shape[1]
        video_logits = self.video_ff_out(hidden[:, :T, :])
        video_loss = jnp.mean(
            jnp.square(
                video_logits[:, :-1, :].astype(jnp.float32)
                - video_fts[:, 1:, :].astype(jnp.float32)
            )
        )
        out["loss"] = loss + video_loss
        return out


def gpt2_params_from_hf(sd: Mapping[str, Any], *, n_layer: int,
                        prefix: str = "transformer.") -> Dict[str, Any]:
    """HF GPT2 state_dict -> GPT2Model params. NOTE: HF Conv1D weights are
    already [in, out] — no transpose."""

    def conv1d(name):
        return {
            "kernel": np.asarray(sd[f"{prefix}{name}.weight"]),
            "bias": np.asarray(sd[f"{prefix}{name}.bias"]),
        }

    def ln(name):
        return {
            "scale": np.asarray(sd[f"{prefix}{name}.weight"]),
            "bias": np.asarray(sd[f"{prefix}{name}.bias"]),
        }

    params: Dict[str, Any] = {
        "wte": {"embedding": np.asarray(sd[f"{prefix}wte.weight"])},
        "wpe": {"embedding": np.asarray(sd[f"{prefix}wpe.weight"])},
        "ln_f": ln("ln_f"),
    }
    for i in range(n_layer):
        hp = f"h.{i}."
        params[f"h_{i}"] = {
            "ln_1": ln(f"{hp}ln_1"),
            "c_attn": conv1d(f"{hp}attn.c_attn"),
            "c_proj": conv1d(f"{hp}attn.c_proj"),
            "ln_2": ln(f"{hp}ln_2"),
            "mlp_fc": conv1d(f"{hp}mlp.c_fc"),
            "mlp_proj": conv1d(f"{hp}mlp.c_proj"),
        }
    return params
