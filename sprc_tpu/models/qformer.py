"""TPU-native Q-Former.

A from-scratch JAX implementation of the querying transformer used by the
BLIP-2 family: a BERT-base encoder whose first ``query_length`` positions are
learned query embeddings, with cross-attention into frozen image embeddings
on every ``cross_attention_freq``-th layer and a *separate* FFN for query
positions.

Behavioral contract (matched bit-for-intent against the reference fork,
reference: src/lavis/models/blip2_models/Qformer.py):

1. Embedding layouts (Qformer.py:78-114):
   - queries + text (image pass): text tokens get word+position embeddings for
     positions ``0..L-1``; query embeds are *prepended without* position
     embeddings; LayerNorm is applied to the concatenated sequence.
   - ``no_img`` text-only pass (SPRC addition, Qformer.py:102-104): the query
     embeds are spliced in *after the CLS token*, and position embeddings for
     positions ``0..L+Q-1`` are added across the whole spliced sequence.
   - queries only: just LayerNorm(query_embeds).
   - text only: standard BERT embeddings.
2. Per-layer routing (Qformer.py:434-468, including the fork's
   "baiyang change"): when image embeddings are present, query positions get
   cross-attention (on cross layers) and the query FFN while text positions
   get the text FFN; when image embeddings are ABSENT, *all* positions
   (including prepended fused queries) run through the text FFN and no
   cross-attention happens.
3. Padding masks are additive ``(1 - m) * -10000`` applied to already-scaled
   scores (Qformer.py:799-808, :250-253).

All sequence lengths are static under ``jax.jit`` (queries=32, text<=32,
image tokens 257), so every mode compiles to a fixed XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sprc_tpu.ops.attention import dot_product_attention
from sprc_tpu.ops.layers import DenseGeneral, LayerNormFP32

NEG_INF = -10000.0  # matches the reference's additive mask constant


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    vocab_size: int = 30523  # bert-base-uncased + [DEC]
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    encoder_width: int = 1408  # frozen ViT feature dim (EVA ViT-g)
    cross_attention_freq: int = 2
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    query_length: int = 32
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.1
    initializer_range: float = 0.02
    dtype: jnp.dtype = jnp.float32
    # activation-checkpoint each layer (reference Qformer gradient
    # checkpointing, Qformer.py:531-554): the big train-memory item at
    # ViT-L b128 is the Q-Former's saved cross-attn K/V + prob residuals
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def make_additive_mask(attention_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, S] {0,1} -> additive [B, 1, 1, S] bias with -10000 at masked slots."""
    return ((1.0 - attention_mask.astype(jnp.float32)) * NEG_INF)[:, None, None, :].astype(dtype)


def make_unilm_mask(
    attention_mask: jnp.ndarray, query_length: int, dtype=jnp.float32
) -> jnp.ndarray:
    """UniLM-style decoder mask (Qformer.py:749-789, has_query path).

    Layout: ``[queries (Q) | text (L)]``. Query rows attend only to queries;
    text row i attends to all queries plus text positions <= i; everything is
    multiplied by the padding mask. Returns additive [B, 1, S, S].
    """
    B, S = attention_mask.shape
    L = S - query_length
    rows = jnp.arange(S)[:, None]
    cols = jnp.arange(S)[None, :]
    is_query_col = cols < query_length
    # query rows: ones on query cols, zeros on text cols
    query_rows = is_query_col & (rows < query_length)
    # text rows: ones on query cols + causal over text cols
    text_causal = (cols - query_length) <= (rows - query_length)
    text_rows = (rows >= query_length) & (is_query_col | ((cols >= query_length) & text_causal))
    structural = (query_rows | text_rows).astype(jnp.float32)  # [S, S]
    combined = structural[None] * attention_mask.astype(jnp.float32)[:, None, :]
    return ((1.0 - combined) * NEG_INF)[:, None, :, :].astype(dtype)


class QFormerEmbeddings(nn.Module):
    config: QFormerConfig

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray],
        query_embeds: Optional[jnp.ndarray],
        *,
        no_img: bool = False,
        past_length: int = 0,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        word = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            param_dtype=jnp.float32,
            name="word_embeddings",
        )
        position = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            param_dtype=jnp.float32,
            name="position_embeddings",
        )

        if input_ids is not None:
            text = word(input_ids)
            length = input_ids.shape[1]
            if no_img and query_embeds is not None:
                # splice queries after CLS, then add positions across the
                # whole spliced sequence (Qformer.py:102-104)
                length = length + query_embeds.shape[1]
                spliced = jnp.concatenate(
                    [text[:, :1, :], query_embeds.astype(text.dtype), text[:, 1:, :]], axis=1
                )
                pos_ids = jnp.arange(past_length, past_length + length)
                embeddings = spliced + position(pos_ids)[None]
            else:
                pos_ids = jnp.arange(past_length, past_length + length)
                embeddings = text + position(pos_ids)[None]
                if query_embeds is not None:
                    embeddings = jnp.concatenate(
                        [query_embeds.astype(text.dtype), embeddings], axis=1
                    )
        else:
            embeddings = query_embeds

        embeddings = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="ln")(embeddings)
        embeddings = nn.Dropout(cfg.dropout_rate)(embeddings, deterministic=deterministic)
        return embeddings.astype(cfg.dtype)


class QFormerAttention(nn.Module):
    """Self- or cross-attention block with post-LN residual (BERT style)."""

    config: QFormerConfig
    is_cross: bool = False

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,
        kv_source: jnp.ndarray,
        bias: Optional[jnp.ndarray],
        *,
        deterministic: bool = True,
        return_probs: bool = False,
        probs_offset=None,
    ):
        cfg = self.config
        B, S, _ = hidden.shape
        Sk = kv_source.shape[1]
        H, D = cfg.num_heads, cfg.head_dim

        q = DenseGeneral(cfg.hidden_size, dtype=cfg.dtype, name="query")(hidden)
        k = DenseGeneral(cfg.hidden_size, dtype=cfg.dtype, name="key")(kv_source)
        v = DenseGeneral(cfg.hidden_size, dtype=cfg.dtype, name="value")(kv_source)

        q = q.reshape(B, S, H, D)
        k = k.reshape(B, Sk, H, D)
        v = v.reshape(B, Sk, H, D)

        probs = None
        if return_probs:
            # explicit path exposing the softmax weights (needed by the
            # slt variant's token selection, blip2_qformer_cir_slt.py:118-121)
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * (D**-0.5)
            if bias is not None:
                scores = scores + bias.astype(scores.dtype)
            probs = jax.nn.softmax(scores, axis=-1)
            if probs_offset is not None:
                # zero-valued probe: grads w.r.t. it equal grads w.r.t. the
                # attention probs (GradCAM, utils/gradcam.py)
                probs = probs + probs_offset
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        else:
            ctx = dot_product_attention(q, k, v, bias=bias)
        ctx = ctx.reshape(B, S, cfg.hidden_size)

        out = DenseGeneral(cfg.hidden_size, dtype=cfg.dtype, name="out")(ctx)
        out = nn.Dropout(cfg.dropout_rate)(out, deterministic=deterministic)
        normed = LayerNormFP32(epsilon=cfg.layer_norm_eps, name="ln")(out + hidden)
        if return_probs:
            return normed, probs
        return normed


class QFormerFFN(nn.Module):
    """BERT FFN with post-LN residual: dense->gelu->dense->LN(x + input)."""

    config: QFormerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        h = DenseGeneral(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = DenseGeneral(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(h)
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        return LayerNormFP32(epsilon=cfg.layer_norm_eps, name="ln")(h + x)


class _QFAttnParams(nn.Module):
    """Param tree of QFormerAttention without applying it (fused-kernel
    route; name-compatible with the unfused module)."""

    config: QFormerConfig
    kv_width: int

    @nn.compact
    def __call__(self):
        from sprc_tpu.ops.layers import DenseParams, LayerNormParams

        H = self.config.hidden_size

        def d(name, inf):
            k, b = DenseParams(inf, H, name=name)()
            return {"kernel": k, "bias": b}

        s, b = LayerNormParams(H, name="ln")()
        return {
            "query": d("query", H),
            "key": d("key", self.kv_width),
            "value": d("value", self.kv_width),
            "out": d("out", H),
            "ln": {"scale": s, "bias": b},
        }


class _QFFFNParams(nn.Module):
    """Param tree of QFormerFFN without applying it."""

    config: QFormerConfig

    @nn.compact
    def __call__(self):
        from sprc_tpu.ops.layers import DenseParams, LayerNormParams

        H, M = self.config.hidden_size, self.config.intermediate_size
        k1, b1 = DenseParams(H, M, name="fc1")()
        k2, b2 = DenseParams(M, H, name="fc2")()
        s, b = LayerNormParams(H, name="ln")()
        return {
            "fc1": {"kernel": k1, "bias": b1},
            "fc2": {"kernel": k2, "bias": b2},
            "ln": {"scale": s, "bias": b},
        }


class QFormerLayer(nn.Module):
    config: QFormerConfig
    has_cross_attention: bool

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,
        self_bias: Optional[jnp.ndarray],
        image_embeds: Optional[jnp.ndarray],
        image_bias: Optional[jnp.ndarray],
        query_length: int,
        *,
        deterministic: bool = True,
        return_self_probs: bool = False,
    ):
        import os

        cfg = self.config

        # fused whole-layer kernel (ops/pallas_qformer.py) for the
        # inference hot paths: column-bias masks only (the non-decoder
        # mask shape), no dropout, no attention-prob outputs. Default ON
        # for TPU (measured on chip: query 2008->3693 q/s, rerank
        # 2782->4642 cand/s, encode int8 1023->1116 imgs/s); training and
        # decoder passes fall through the gates below to the unfused
        # composition. SPRC_PALLAS_QF=0 opts out; "force" = interpret
        # mode for CPU tests.
        qf_flag = os.environ.get("SPRC_PALLAS_QF", "1")
        col_bias_ok = self_bias is None or (
            self_bias.ndim == 4 and self_bias.shape[1] == 1
            and self_bias.shape[2] == 1
        )
        fused_ok = (
            qf_flag in ("1", "force")
            and (qf_flag == "force" or jax.default_backend() == "tpu")
            and deterministic
            and not return_self_probs
            and col_bias_ok
            and image_bias is None
            and cfg.hidden_size % 128 == 0
            and cfg.intermediate_size % 128 == 0
        )
        if fused_ok:
            from sprc_tpu.ops.pallas_qformer import fused_qformer_layer

            B, S, _ = hidden.shape
            self_p = _QFAttnParams(cfg, cfg.hidden_size, name="self_attn")()
            cross_p = None
            # cross params only when the unfused path would create them
            # (image present on a cross layer) — keeps param trees identical
            if self.has_cross_attention and image_embeds is not None:
                cross_p = _QFAttnParams(
                    cfg, cfg.encoder_width, name="cross_attn")()
            text_ffn_all = image_embeds is None
            ffn_q_p = None
            if not text_ffn_all:
                ffn_q_p = _QFFFNParams(cfg, name="ffn_query")()
            ffn_t_p = None
            if text_ffn_all or S > query_length:
                ffn_t_p = _QFFFNParams(cfg, name="ffn_text")()
            if ffn_t_p is None:  # query-only pass: no text FFN params used
                ffn_t_p = ffn_q_p
            col_bias = (
                jnp.zeros((B, S), jnp.float32) if self_bias is None
                else self_bias[:, 0, 0, :].astype(jnp.float32)
            )
            img = None
            if image_embeds is not None and self.has_cross_attention:
                img = image_embeds.astype(cfg.dtype)
            return fused_qformer_layer(
                hidden.astype(cfg.dtype), col_bias, self_p, img, cross_p,
                ffn_q_p, ffn_t_p, heads=cfg.num_heads,
                eps=cfg.layer_norm_eps, Q=query_length,
                text_ffn_all=text_ffn_all,
                # SPRC_QF_INT8=1: the ten dense projections run on the int8
                # MXU path (per-out-channel weight scales, per-row dynamic
                # activation scales in-VMEM). Serving-numerics opt-in like
                # the towers' quant="int8_static"; bf16 stays the parity
                # default. Drift quantified in tests/test_pallas_qformer.py
                # and the bench A/B (MEASUREMENTS.md round 3).
                int8=os.environ.get("SPRC_QF_INT8", "0") == "1",
            )

        attn_result = QFormerAttention(cfg, name="self_attn")(
            hidden, hidden, self_bias,
            deterministic=deterministic, return_probs=return_self_probs,
        )
        if return_self_probs:
            attn_out, self_probs = attn_result
        else:
            attn_out, self_probs = attn_result, None

        if image_embeds is not None:
            # query positions: (cross-attn on cross layers) + query FFN;
            # text positions: text FFN (Qformer.py:434-468)
            q_part = attn_out[:, :query_length, :]
            if self.has_cross_attention:
                q_part = QFormerAttention(cfg, is_cross=True, name="cross_attn")(
                    q_part, image_embeds.astype(cfg.dtype), image_bias,
                    deterministic=deterministic,
                )
            q_out = QFormerFFN(cfg, name="ffn_query")(q_part, deterministic=deterministic)
            if attn_out.shape[1] > query_length:
                t_out = QFormerFFN(cfg, name="ffn_text")(
                    attn_out[:, query_length:, :], deterministic=deterministic
                )
                out = jnp.concatenate([q_out, t_out], axis=1)
            else:
                out = q_out
        else:
            # no image: everything (fused queries included) through the text
            # FFN — the fork's "baiyang change" (Qformer.py:434-435)
            out = QFormerFFN(cfg, name="ffn_text")(attn_out, deterministic=deterministic)
        if return_self_probs:
            return out, self_probs
        return out


class QFormer(nn.Module):
    """The Q-Former trunk (BertModel analogue; no LM head)."""

    config: QFormerConfig

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        query_embeds: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        image_embeds: Optional[jnp.ndarray] = None,
        image_mask: Optional[jnp.ndarray] = None,
        *,
        no_img: bool = False,
        is_decoder: bool = False,
        deterministic: bool = True,
        output_attentions: bool = False,
        sow_hidden: bool = False,  # sow per-layer inputs (KV-cache prefill)
    ):
        cfg = self.config
        if input_ids is None and query_embeds is None:
            raise ValueError("need input_ids and/or query_embeds")

        query_length = query_embeds.shape[1] if query_embeds is not None else 0

        hidden = QFormerEmbeddings(cfg, name="embeddings")(
            input_ids, query_embeds, no_img=no_img, deterministic=deterministic
        )
        B, S, _ = hidden.shape

        if attention_mask is None:
            attention_mask = jnp.ones((B, S), jnp.int32) if is_decoder else None
        if attention_mask is None:
            self_bias = None
        else:
            if attention_mask.shape[1] != S:
                raise ValueError(
                    f"attention_mask length {attention_mask.shape[1]} != sequence {S}"
                )
            if is_decoder:
                self_bias = make_unilm_mask(attention_mask, query_length)
            else:
                self_bias = make_additive_mask(attention_mask)

        if image_embeds is not None and image_mask is not None:
            image_bias = make_additive_mask(image_mask)
        else:
            image_bias = None

        # in no_img mode the layers must not see the image at all
        layer_image = None if no_img else image_embeds

        last_probs = None
        for i in range(cfg.num_layers):
            if sow_hidden:
                # per-layer inputs: enough to rebuild every layer's K/V
                # cache outside (models/lm.py cached_greedy_generate)
                self.sow("intermediates", f"hidden_{i}", hidden)
            want_probs = output_attentions and i == cfg.num_layers - 1
            layer = QFormerLayer(
                cfg,
                has_cross_attention=(i % cfg.cross_attention_freq == 0),
                name=f"layer_{i}",
            )
            if cfg.remat and not want_probs:
                # statics (query_length / deterministic) ride the closure;
                # tensors and Nones are the checkpointed pytree args
                def _call(mdl, h, sb, li, ib, _q=query_length,
                          _d=deterministic):
                    return mdl(h, sb, li, ib, _q, deterministic=_d,
                               return_self_probs=False)

                result = nn.remat(_call, prevent_cse=False)(
                    layer, hidden, self_bias, layer_image, image_bias
                )
            else:
                result = layer(
                    hidden,
                    self_bias,
                    layer_image,
                    image_bias,
                    query_length,
                    deterministic=deterministic,
                    return_self_probs=want_probs,
                )
            if want_probs:
                hidden, last_probs = result
            else:
                hidden = result
        if output_attentions:
            return hidden, last_probs
        return hidden
