"""InstructBLIP-style CIR models backed by a JAX LLaMA decoder.

Real implementations of the two LLM-backed variants (replacing the stubs):

- ``blip2_vicuna_instruct`` (reference blip2_vicuna_instruct.py): the
  CIR-modified InstructBLIP. Q-Former fuses (image queries + instruction
  text); the 32 query outputs project into the LLM space (``llm_proj``) and
  are prepended to the instruction's token embeddings; the frozen LLaMA's
  last hidden states mean-pool through ``l2q_proj`` into a 768-d retrieval
  feature (:210-242). Target features are the mean Q-Former query output
  (:224-233, NO vision_proj). ITC over feature cosines / 0.07 (:236-242).
- ``blip2_instruct_cir`` (reference blip2_instruct_cir.py:139-240):
  instruction-tuned captioning — LM cross-entropy over the output segment
  only (instruction, padding and query positions masked to -100).

The LLaMA trunk is :mod:`sprc_tpu.models.llama` (parity-tested vs HF);
weights load from a local HF checkpoint via ``llama_params_from_hf``.
Text enters pre-tokenized: ``llm_input_ids``/``llm_mask`` from the LLaMA
tokenizer and ``input_ids``/``text_mask`` from the BERT tokenizer.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sprc_tpu.models.cir_base import Blip2CirBase, CirConfig, cross_entropy_diagonal
from sprc_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from sprc_tpu.ops.layers import DenseGeneral, l2_normalize
from sprc_tpu.registry import registry


class _InstructBase(Blip2CirBase):
    """Shared: Q-Former fusion -> llm_proj -> frozen LLaMA hidden states."""

    llama_config: LlamaConfig = LlamaConfig()

    def setup(self) -> None:
        super().setup()
        qcfg = self.cfg.qformer_config()
        self.llm = LlamaForCausalLM(self.llama_config)
        self.llm_proj = DenseGeneral(self.llama_config.hidden_size, dtype=qcfg.dtype)
        self.l2q_proj = DenseGeneral(qcfg.hidden_size, dtype=qcfg.dtype)

    def _query_fusion(self, image_embeds, input_ids, text_mask, deterministic):
        """Queries + instruction text cross-attending the image -> query outs."""
        B = image_embeds.shape[0]
        Q = self.cfg.num_query_token
        queries = self._queries(B)
        attn = jnp.concatenate(
            [jnp.ones((B, Q), dtype=text_mask.dtype), text_mask], axis=1
        )
        hidden = self.qformer(
            input_ids=input_ids,
            query_embeds=queries,
            attention_mask=attn,
            image_embeds=image_embeds,
            deterministic=deterministic,
        )
        return hidden[:, :Q, :]

    def _llm_hidden(self, query_outputs, llm_input_ids, llm_mask):
        """Prepend projected queries to token embeds; frozen LLaMA forward."""
        B = query_outputs.shape[0]
        Q = query_outputs.shape[1]
        inputs_llm = self.llm_proj(query_outputs)
        tok_embeds = self.llm.embed(llm_input_ids)
        inputs_embeds = jnp.concatenate(
            [inputs_llm.astype(tok_embeds.dtype), tok_embeds], axis=1
        )
        mask = jnp.concatenate(
            [jnp.ones((B, Q), dtype=llm_mask.dtype), llm_mask], axis=1
        )
        # the LLM is FROZEN via the optimizer partition (FROZEN_PREFIXES),
        # not stop_gradient: gradients must flow THROUGH it into llm_proj
        # (reference freezes llm_model params, :100-101, but backprops
        # through the LLM to train the projections/Q-Former)
        hidden = self.llm.hidden_states(inputs_embeds, mask)
        return hidden, mask

    def _ref_feature(self, query_outputs, llm_input_ids, llm_mask):
        hidden, _ = self._llm_hidden(query_outputs, llm_input_ids, llm_mask)
        return l2_normalize(self.l2q_proj(hidden).mean(axis=1))


@registry.register_model("blip2_vicuna_instruct", override=True)
class VicunaInstructCir(_InstructBase):
    """CIR retrieval through the LLM (blip2_vicuna_instruct.py)."""

    FROZEN_PREFIXES = ("visual_encoder", "llm")

    def __call__(
        self,
        reference_images: jnp.ndarray,
        target_images: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        llm_input_ids: jnp.ndarray,
        llm_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        ref_embeds = self.encode_image(reference_images)
        query_outputs = self._query_fusion(
            ref_embeds, input_ids, text_mask, deterministic
        )
        ref_feats = self._ref_feature(query_outputs, llm_input_ids, llm_mask)

        tgt_embeds = self.encode_image(target_images)
        tgt_hidden = self.embed_image_queries(tgt_embeds, deterministic=deterministic)
        target_feats = l2_normalize(tgt_hidden.mean(axis=1))  # no vision_proj (:230-233)

        sim = (ref_feats.astype(jnp.float32) @ target_feats.astype(jnp.float32).T) / 0.07
        return {"loss_itc": cross_entropy_diagonal(sim)}

    # eval contract (:246-333): target feats are mean query outputs
    def extract_target_features(self, images: jnp.ndarray):
        frozen = self.encode_image(images)
        hidden = self.embed_image_queries(frozen)
        return l2_normalize(hidden.mean(axis=1)), frozen

    def inference(
        self,
        reference_embeds: jnp.ndarray,
        target_feats: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        llm_input_ids: jnp.ndarray,
        llm_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        query_outputs = self._query_fusion(reference_embeds, input_ids, text_mask, True)
        ref_feats = self._ref_feature(query_outputs, llm_input_ids, llm_mask)
        return ref_feats.astype(jnp.float32) @ target_feats.astype(jnp.float32).T


# long-lived jitted prefill/step programs per (model id): a fresh jit per
# generate call would recompile the whole decode program each call
# keyed by the module itself (value-hashable); see blip2_opt.py note
_GEN_CACHE: Dict[object, Dict] = {}


def instruct_generate(
    model,
    params,
    images: jnp.ndarray,
    input_ids: jnp.ndarray,
    text_mask: jnp.ndarray,
    llm_input_ids: jnp.ndarray,
    llm_mask: jnp.ndarray,
    *,
    eos_token_id: int,
    pad_token_id: int,
    max_new_tokens: int = 30,
    use_cache: bool = True,
):
    """Greedy LLM generation conditioned on [query prefix | prompt tokens]
    (the reference's instruct ``generate``; greedy path of num_beams=1).

    ``use_cache=True`` (default) runs the KV-cached path: ONE prefill over
    [queries | prompt] then single-position steps against per-layer K/V
    caches (reference past_key_values, HF modeling_llama.py), O(T) instead
    of O(T*P) prefix recompute — stepwise-equal to the uncached path
    (tests/test_llm_cache.py). Returns generated token ids
    [B, max_new_tokens].
    """
    import numpy as np

    if use_cache:
        B, L = llm_input_ids.shape
        Q = model.cfg.num_query_token
        s_max = Q + L + max_new_tokens

        entry = _GEN_CACHE.setdefault(model, {})
        key = ("prefill", s_max)
        if key not in entry:
            def _prefill_method(mdl, images, bert_ids, bert_mask, ids, mask,
                                lengths):
                image_embeds = mdl.encode_image(images)
                query_outputs = mdl._query_fusion(
                    image_embeds, bert_ids, bert_mask, True)
                Bq = query_outputs.shape[0]
                inputs_llm = mdl.llm_proj(query_outputs)
                tok_embeds = mdl.llm.embed(ids)
                inputs_embeds = jnp.concatenate(
                    [inputs_llm.astype(tok_embeds.dtype), tok_embeds], axis=1)
                mask_full = jnp.concatenate(
                    [jnp.ones((Bq, Q), dtype=mask.dtype), mask], axis=1)
                hidden, cache = mdl.llm.prefill(inputs_embeds, mask_full, s_max)
                # per-row logits at the last real prefix position
                rows = jnp.arange(Bq)
                last = hidden[rows, Q + lengths - 1][:, None, :]
                return mdl.llm.logits(last)[:, 0, :], cache

            entry[key] = jax.jit(
                lambda p, *a: model.apply({"params": p}, *a,
                                          method=_prefill_method))
        if "step" not in entry:
            def _step_method(mdl, tok, pos, cache):
                return mdl.llm.decode_step_logits(tok, pos, cache)

            step_jit = jax.jit(
                lambda p, tok, pos, cache: model.apply(
                    {"params": p}, tok, pos, cache, method=_step_method))
            entry["step"] = step_jit
        step_jit = entry["step"]

        lengths = jnp.asarray(llm_mask).sum(axis=1).astype(jnp.int32)
        logits0, cache = entry[key](
            params, images, input_ids, text_mask, llm_input_ids, llm_mask,
            lengths)

        # params ride the loop state (traced args, NOT baked into the
        # cached fused program as constants)
        def step_fn(tok, pos, state):
            cache, p = state
            logits, cache = step_jit(p, tok, pos, cache)
            return logits, (cache, p)
        # reuse one compiled fused select+step across calls
        step_fn.__sprc_step_cache__ = entry.setdefault("fused", {})

        from sprc_tpu.models.generation import cached_greedy_loop

        return cached_greedy_loop(
            logits0, (cache, params), Q + lengths, step_fn,
            eos_token_id=eos_token_id, pad_token_id=pad_token_id,
            max_new_tokens=max_new_tokens,
        )

    B, L = llm_input_ids.shape
    Q = model.cfg.num_query_token

    def _logits_method(mdl, images, bert_ids, bert_mask, ids, mask):
        image_embeds = mdl.encode_image(images)
        query_outputs = mdl._query_fusion(image_embeds, bert_ids, bert_mask, True)
        hidden, _ = mdl._llm_hidden(query_outputs, ids, mask)
        return mdl.llm.lm_head(hidden)

    def hidden_logits(ids, mask):
        return model.apply(
            {"params": params}, images, input_ids, text_mask, ids, mask,
            method=_logits_method,
        )

    total = L + max_new_tokens
    ids = np.full((B, total), pad_token_id, np.int32)
    ids[:, :L] = np.asarray(llm_input_ids)
    mask = np.zeros((B, total), np.int32)
    mask[:, :L] = np.asarray(llm_mask)
    lengths = np.asarray(llm_mask).sum(axis=1)
    finished = np.zeros((B,), bool)

    logits_fn = jax.jit(hidden_logits)
    for step in range(max_new_tokens):
        logits = np.asarray(logits_fn(jnp.asarray(ids), jnp.asarray(mask)))
        # next-token logits at each row's current end (query prefix offset Q)
        rows = np.arange(B)
        next_logits = logits[rows, Q + lengths - 1]
        next_tok = next_logits.argmax(-1).astype(np.int32)
        next_tok = np.where(finished, pad_token_id, next_tok)
        ids[rows, lengths] = next_tok
        mask[rows, lengths] = (~finished).astype(np.int32)
        lengths = lengths + (~finished).astype(np.int64)
        finished |= next_tok == eos_token_id
        if finished.all():
            break
    # return only the generated tail per row, left-aligned
    out = np.full((B, max_new_tokens), pad_token_id, np.int32)
    base = np.asarray(llm_mask).sum(axis=1)
    for b in range(B):
        gen = ids[b, base[b] : lengths[b]]
        out[b, : len(gen)] = gen
    return jnp.asarray(out)


@registry.register_model("blip2_instruct_cir", override=True)
class InstructCir(_InstructBase):
    """Instruction-tuned LM loss (blip2_instruct_cir.py:139-240).

    ``llm_input_ids`` here is the concatenated [instruction | output] token
    sequence (the reference's concat_text_input_output); ``target_mask``
    marks positions that receive LM loss (output tokens only).
    """

    FROZEN_PREFIXES = ("visual_encoder", "llm")

    def setup(self) -> None:
        super().setup()
        # lm head shares the llm's head; nothing extra

    def __call__(
        self,
        images: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        llm_input_ids: jnp.ndarray,
        llm_mask: jnp.ndarray,
        target_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        image_embeds = self.encode_image(images)
        query_outputs = self._query_fusion(
            image_embeds, input_ids, text_mask, deterministic
        )
        hidden, full_mask = self._llm_hidden(query_outputs, llm_input_ids, llm_mask)
        logits = self.llm.lm_head(hidden)

        B = llm_input_ids.shape[0]
        Q = query_outputs.shape[1]
        # labels: [-100 over queries | llm ids masked outside target span]
        labels = jnp.where(target_mask.astype(bool), llm_input_ids, -100)
        labels = jnp.concatenate(
            [jnp.full((B, Q), -100, labels.dtype), labels], axis=1
        )
        shifted_logits = logits[:, :-1, :]
        shifted_labels = labels[:, 1:]
        valid = shifted_labels != -100
        logp = jax.nn.log_softmax(shifted_logits.astype(jnp.float32), axis=-1)
        safe = jnp.where(valid, shifted_labels, 0)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        loss = (nll * valid).sum() / jnp.maximum(valid.sum(), 1)
        return {"loss": loss}
