"""BLIP-2 T5 head (registry: ``blip2_t5``).

TPU-native re-implementation of ``Blip2T5``
(reference: src/lavis/models/blip2_models/blip2_t5.py:108-156): frozen ViT
-> Q-Former queries -> ``t5_proj`` -> prepended to the frozen T5 ENCODER's
token embeddings; seq2seq LM loss over the output text (decoder teacher
forcing with T5's shift-right; pads masked -100). Greedy generation decodes
from the frozen encoder state.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from sprc_tpu.models.cir_base import Blip2CirBase
from sprc_tpu.models.t5 import T5Config, T5ForConditionalGeneration
from sprc_tpu.ops.layers import DenseGeneral
from sprc_tpu.registry import registry

# long-lived jitted decode programs per model id (strong model ref pins it)
# keyed by the module itself (value-hashable); see blip2_opt.py note
_T5_GEN_CACHE: Dict[object, Dict] = {}


@registry.register_model("blip2_t5", override=True)
@registry.register_model("blip2_t5_instruct", override=True)
class Blip2T5(Blip2CirBase):
    """Seq2seq (instruction) captioning through a frozen T5."""

    t5_config: T5Config = T5Config()

    FROZEN_PREFIXES = ("visual_encoder", "t5")

    def setup(self) -> None:
        super().setup()
        self.t5 = T5ForConditionalGeneration(self.t5_config)
        self.t5_proj = DenseGeneral(
            self.t5_config.d_model, dtype=self.cfg.qformer_config().dtype
        )

    def _encode(self, images, input_ids, input_mask, deterministic):
        image_embeds = self.encode_image(images)
        query_hidden = self.embed_image_queries(image_embeds, deterministic=deterministic)
        inputs_t5 = self.t5_proj(query_hidden)  # [B, Q, d_model]
        tok_embeds = self.t5.embed(input_ids)
        enc_embeds = jnp.concatenate(
            [inputs_t5.astype(tok_embeds.dtype), tok_embeds], axis=1
        )
        B, Q = inputs_t5.shape[:2]
        enc_mask = jnp.concatenate(
            [jnp.ones((B, Q), dtype=input_mask.dtype), input_mask], axis=1
        )
        return self.t5.encode(enc_embeds, enc_mask), enc_mask

    def __call__(
        self,
        images: jnp.ndarray,
        input_ids: jnp.ndarray,
        input_mask: jnp.ndarray,
        output_ids: jnp.ndarray,
        output_mask: jnp.ndarray,
        *,
        pad_token_id: int = 0,
        decoder_start_token_id: int = 0,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        enc_out, enc_mask = self._encode(images, input_ids, input_mask, deterministic)

        # T5 shift-right teacher forcing
        dec_in = jnp.concatenate(
            [
                jnp.full((output_ids.shape[0], 1), decoder_start_token_id, output_ids.dtype),
                output_ids[:, :-1],
            ],
            axis=1,
        )
        logits = self.t5.decode(dec_in, enc_out, enc_mask, output_mask)

        labels = jnp.where(output_ids == pad_token_id, -100, output_ids)
        valid = labels != -100
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        safe = jnp.where(valid, labels, 0)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        loss = (nll * valid).sum() / jnp.maximum(valid.sum(), 1)
        return {"loss": loss}

    def generate_ids(
        self,
        params,
        images: jnp.ndarray,
        input_ids: jnp.ndarray,
        input_mask: jnp.ndarray,
        *,
        eos_token_id: int = 1,
        pad_token_id: int = 0,
        decoder_start_token_id: int = 0,
        max_new_tokens: int = 30,
        use_cache: bool = True,
    ) -> jnp.ndarray:
        """Greedy seq2seq decode -> [B, max_new_tokens].

        ``use_cache=True`` (default) prefills the decoder start token once
        (also projecting the cross-attn K/V of the encoder memory exactly
        once) then runs single-position cached steps (reference
        past_key_values, HF modeling_t5.py) — stepwise-equal to the
        recompute path (tests/test_llm_cache.py)."""
        import numpy as np

        B = input_ids.shape[0]

        def _enc(mdl, images, ids, mask):
            return mdl._encode(images, ids, mask, True)

        enc_out, enc_mask = self.apply(
            {"params": params}, images, input_ids, input_mask, method=_enc
        )

        if use_cache:
            from sprc_tpu.models.generation import cached_greedy_loop

            s_max = 1 + max_new_tokens
            entry = _T5_GEN_CACHE.setdefault(self, {})
            if ("prefill", s_max) not in entry:
                entry[("prefill", s_max)] = jax.jit(
                    lambda p, d, e, m: self.apply(
                        {"params": p}, d, e, m,
                        method=lambda mdl, d_, e_, m_: mdl.t5.decode_prefill(
                            d_, e_, m_, s_max)))
            if "step" not in entry:
                entry["step"] = jax.jit(
                    lambda p, tok, t, cache, em: self.apply(
                        {"params": p}, tok, t, cache, em,
                        method=lambda mdl, *a: mdl.t5.decode_step_logits(*a)))
            prefill, step = entry[("prefill", s_max)], entry["step"]

            bos = jnp.full((B, 1), decoder_start_token_id, jnp.int32)
            logits0, cache = prefill(params, bos, enc_out, enc_mask)

            def step_fn(tok, pos, state):
                cache, p, em = state
                logits, cache = step(p, tok, pos[0], cache, em)
                return logits, (cache, p, em)
            step_fn.__sprc_step_cache__ = entry.setdefault("fused", {})

            return cached_greedy_loop(
                logits0, (cache, params, enc_mask), jnp.ones((B,), jnp.int32),
                step_fn, eos_token_id=eos_token_id, pad_token_id=pad_token_id,
                max_new_tokens=max_new_tokens)

        def _dec(mdl, dec_ids, enc_out, enc_mask, dec_mask):
            return mdl.t5.decode(dec_ids, enc_out, enc_mask, dec_mask)

        decode = jax.jit(
            lambda dec_ids, dec_mask: self.apply(
                {"params": params}, dec_ids, enc_out, enc_mask, dec_mask, method=_dec
            )
        )
        total = max_new_tokens + 1
        dec = np.full((B, total), pad_token_id, np.int32)
        dec[:, 0] = decoder_start_token_id
        dmask = np.zeros((B, total), np.int32)
        dmask[:, 0] = 1
        finished = np.zeros((B,), bool)
        for step in range(1, total):
            logits = np.asarray(decode(jnp.asarray(dec), jnp.asarray(dmask)))
            nxt = logits[:, step - 1].argmax(-1).astype(np.int32)
            nxt = np.where(finished, pad_token_id, nxt)
            dec[:, step] = nxt
            dmask[:, step] = (~finished).astype(np.int32)
            finished |= nxt == eos_token_id
            if finished.all():
                break
        return jnp.asarray(dec[:, 1:])
