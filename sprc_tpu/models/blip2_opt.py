"""BLIP-2 OPT captioning head (registry: ``blip2_opt``).

TPU-native re-implementation of ``Blip2OPT``
(reference: src/lavis/models/blip2_models/blip2_opt.py:107-163): frozen ViT
-> Q-Former queries -> ``opt_proj`` -> prepended to the frozen OPT decoder's
token embeddings; next-token LM loss over the caption (query positions,
prompt prefix and pads masked out). Greedy generation mirrors the
query-prefix decode of :func:`sprc_tpu.models.instruct_cir.instruct_generate`.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from sprc_tpu.models.cir_base import Blip2CirBase
from sprc_tpu.models.opt import OPTConfig, OPTForCausalLM
from sprc_tpu.ops.layers import DenseGeneral
from sprc_tpu.registry import registry

# long-lived jitted decode programs keyed by the module itself (linen
# modules hash by VALUE: config-equal instances share one entry, so memory
# scales with distinct architectures, not with instances — an id()-keyed
# table with a strong '_model' ref would immortalize every instance ever
# used for generation)
_OPT_GEN_CACHE: Dict[object, Dict] = {}


@registry.register_model("blip2_opt", override=True)
class Blip2OPT(Blip2CirBase):
    """LM captioning through a frozen OPT decoder."""

    opt_config: OPTConfig = OPTConfig()

    FROZEN_PREFIXES = ("visual_encoder", "opt")

    def setup(self) -> None:
        super().setup()
        self.opt = OPTForCausalLM(self.opt_config)
        self.opt_proj = DenseGeneral(
            self.opt_config.hidden_size, dtype=self.cfg.qformer_config().dtype
        )

    def _inputs_opt(self, images, deterministic):
        image_embeds = self.encode_image(images)
        query_hidden = self.embed_image_queries(image_embeds, deterministic=deterministic)
        return self.opt_proj(query_hidden)  # [B, Q, H_opt]

    def __call__(
        self,
        images: jnp.ndarray,
        opt_input_ids: jnp.ndarray,
        opt_mask: jnp.ndarray,
        *,
        pad_token_id: int = 1,
        prompt_length: int = 0,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        B, L = opt_input_ids.shape
        inputs_opt = self._inputs_opt(images, deterministic)
        Q = inputs_opt.shape[1]
        tok_embeds = self.opt.embed(opt_input_ids)
        inputs_embeds = jnp.concatenate(
            [inputs_opt.astype(tok_embeds.dtype), tok_embeds], axis=1
        )
        mask = jnp.concatenate(
            [jnp.ones((B, Q), dtype=opt_mask.dtype), opt_mask], axis=1
        )
        hidden = self.opt.hidden_states(inputs_embeds, mask)
        logits = self.opt.logits(hidden)

        # targets: -100 over query positions + prompt prefix + pads (:138-147)
        labels = jnp.where(opt_input_ids == pad_token_id, -100, opt_input_ids)
        if prompt_length:
            pos = jnp.arange(L)[None, :]
            labels = jnp.where(pos < prompt_length, -100, labels)
        labels = jnp.concatenate([jnp.full((B, Q), -100, labels.dtype), labels], axis=1)

        shifted_logits = logits[:, :-1, :]
        shifted_labels = labels[:, 1:]
        valid = shifted_labels != -100
        logp = jax.nn.log_softmax(shifted_logits.astype(jnp.float32), axis=-1)
        safe = jnp.where(valid, shifted_labels, 0)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        loss = (nll * valid).sum() / jnp.maximum(valid.sum(), 1)
        return {"loss": loss}

    def generate_ids(
        self,
        params,
        images: jnp.ndarray,
        prompt_ids: jnp.ndarray,
        prompt_mask: jnp.ndarray,
        *,
        eos_token_id: int = 2,
        pad_token_id: int = 1,
        max_new_tokens: int = 30,
        use_cache: bool = True,
    ) -> jnp.ndarray:
        """Greedy caption decode (reference generate, num_beams=1 path).

        ``use_cache=True`` (default) prefills [query prefix | prompt] once
        and runs single-position steps against per-layer K/V caches
        (reference past_key_values, HF modeling_opt.py) — stepwise-equal to
        the recompute path (tests/test_llm_cache.py)."""
        import numpy as np

        B, L = prompt_ids.shape

        if use_cache:
            from sprc_tpu.models.generation import cached_greedy_loop

            Q = self.cfg.num_query_token
            s_max = Q + L + max_new_tokens

            def _prefill(mdl, images, ids, mask, lengths):
                inputs_opt = mdl._inputs_opt(images, True)
                tok = mdl.opt.embed(ids)
                embeds = jnp.concatenate(
                    [inputs_opt.astype(tok.dtype), tok], axis=1)
                full_mask = jnp.concatenate(
                    [jnp.ones((ids.shape[0], Q), dtype=mask.dtype), mask],
                    axis=1)
                hidden, cache = mdl.opt.prefill(embeds, full_mask, s_max)
                rows = jnp.arange(ids.shape[0])
                last = hidden[rows, Q + lengths - 1][:, None, :]
                return mdl.opt.logits(last)[:, 0, :], cache

            # long-lived jitted programs per model instance (fresh jits per
            # call would recompile the decode program every call)
            entry = _OPT_GEN_CACHE.setdefault(self, {})
            if ("prefill", s_max) not in entry:
                entry[("prefill", s_max)] = jax.jit(
                    lambda p, *a: self.apply(
                        {"params": p}, *a, method=_prefill))
            if "step" not in entry:
                entry["step"] = jax.jit(
                    lambda p, tok, pos, cache: self.apply(
                        {"params": p}, tok, pos, cache,
                        method=lambda mdl, *a: mdl.opt.decode_step_logits(*a)))
            prefill = entry[("prefill", s_max)]
            step = entry["step"]

            lengths = jnp.asarray(prompt_mask).sum(axis=1).astype(jnp.int32)
            logits0, cache = prefill(
                params, images, prompt_ids, prompt_mask, lengths)

            def step_fn(tok, pos, state):
                cache, p = state
                logits, cache = step(p, tok, pos, cache)
                return logits, (cache, p)
            step_fn.__sprc_step_cache__ = entry.setdefault("fused", {})

            return cached_greedy_loop(
                logits0, (cache, params), Q + lengths, step_fn,
                eos_token_id=eos_token_id, pad_token_id=pad_token_id,
                max_new_tokens=max_new_tokens)

        def _logits(mdl, images, ids, mask):
            inputs_opt = mdl._inputs_opt(images, True)
            tok = mdl.opt.embed(ids)
            embeds = jnp.concatenate([inputs_opt.astype(tok.dtype), tok], axis=1)
            Q = inputs_opt.shape[1]
            full_mask = jnp.concatenate(
                [jnp.ones((ids.shape[0], Q), dtype=mask.dtype), mask], axis=1
            )
            hidden = mdl.opt.hidden_states(embeds, full_mask)
            return mdl.opt.logits(hidden)

        logits_fn = jax.jit(
            lambda ids, mask: self.apply(
                {"params": params}, images, ids, mask, method=_logits
            )
        )
        Q = self.cfg.num_query_token
        total = L + max_new_tokens
        ids = np.full((B, total), pad_token_id, np.int32)
        ids[:, :L] = np.asarray(prompt_ids)
        mask = np.zeros((B, total), np.int32)
        mask[:, :L] = np.asarray(prompt_mask)
        lengths = np.asarray(prompt_mask).sum(axis=1)
        finished = np.zeros((B,), bool)
        for _ in range(max_new_tokens):
            logits = np.asarray(logits_fn(jnp.asarray(ids), jnp.asarray(mask)))
            rows = np.arange(B)
            nxt = logits[rows, Q + lengths - 1].argmax(-1).astype(np.int32)
            nxt = np.where(finished, pad_token_id, nxt)
            ids[rows, lengths] = nxt
            mask[rows, lengths] = (~finished).astype(np.int32)
            lengths = lengths + (~finished).astype(np.int64)
            finished |= nxt == eos_token_id
            if finished.all():
                break
        out = np.full((B, max_new_tokens), pad_token_id, np.int32)
        base = np.asarray(prompt_mask).sum(axis=1)
        for b in range(B):
            gen = ids[b, base[b] : lengths[b]]
            out[b, : len(gen)] = gen
        return jnp.asarray(out)
