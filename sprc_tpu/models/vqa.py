"""VQA models (registry: ``blip_vqa``, ``albef_vqa``).

TPU-native re-implementation of the reference VQA models
(reference: src/lavis/models/blip_models/blip_vqa.py:33-340 and
src/lavis/models/albef_models/albef_vqa.py:28-440): a multimodal question
encoder (ViT image embeds cross-attended by a med-BERT over the question)
feeding an answer DECODER (causal med-BERT cross-attending the question
states) trained with weighted per-answer LM loss, plus the two inference
modes — ``generate`` (greedy decode) and ``rank`` (first-token top-k
filtering of an answer list, then full-LM-loss re-ranking, :277-340).

TPU-first twists: the reference's ragged answer replication
(``question_states += [s]*n``, :138-143) becomes a static gather by a
host-built ``ans_to_question`` index vector; answer ranking runs as two
fixed-shape jitted passes (first-token probe, then [B*k] re-score) instead
of Python-side index_select loops.

BLIP flavor cross-attends on every layer; ALBEF stages fusion at
``fusion_layer`` (med_config_albef.json: 12 layers, fusion at 6). ALBEF's
momentum answer-distillation (albef_vqa.py:47-70,153-226 + the soft-label
LM loss of med.py:1254-1259) is the functional-state variant here:
``use_distill=True`` threads momentum copies of the towers through the
train step's aux state (``init_vqa_state``/``vqa_train_step``, same
pattern as models/albef.py), mixing (1-alpha)*CE + alpha*distill per
answer with the reference's one-epoch alpha ramp (albef_vqa.py:80-81).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sprc_tpu.models.albef import MedEncoder
from sprc_tpu.models.lm import QFormerLMHead
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.vit import ClipViT, ViTConfig, blip_vit_b_config
from sprc_tpu.registry import registry


@dataclasses.dataclass(frozen=True)
class VQAConfig:
    flavor: str = "blip"  # 'blip' | 'albef'
    image_size: int = 480
    max_txt_len: int = 35
    vocab_size: int = 30524
    fusion_layer: int = 6  # albef flavor only
    # momentum answer distillation (albef flavor; reference
    # albef_vqa.py:47-70 defaults use_distill=True, momentum .995, alpha .4)
    use_distill: bool = False
    momentum: float = 0.995
    alpha: float = 0.4
    vit_dtype: Any = jnp.bfloat16
    text_dtype: Any = jnp.float32
    vit_config_override: Optional[ViTConfig] = None
    text_config_override: Optional[QFormerConfig] = None
    decoder_config_override: Optional[QFormerConfig] = None

    def vit_config(self) -> ViTConfig:
        return self.vit_config_override or blip_vit_b_config(
            self.image_size, dtype=self.vit_dtype
        )

    def text_config(self) -> QFormerConfig:
        return self.text_config_override or QFormerConfig(
            vocab_size=self.vocab_size,
            encoder_width=self.vit_config().width,
            dtype=self.text_dtype,
        )

    def decoder_config(self) -> QFormerConfig:
        return self.decoder_config_override or self.text_config()


@registry.register_model("blip_vqa", override=True)
@registry.register_model("albef_vqa", override=True)
class VQAModel(nn.Module):
    """Question encoder + answer decoder (reference :94-160)."""

    cfg: VQAConfig

    def setup(self) -> None:
        cfg = self.cfg
        tcfg = cfg.text_config()
        dcfg = cfg.decoder_config()
        self.visual_encoder = ClipViT(cfg.vit_config())
        if cfg.flavor == "albef":
            self.text_encoder = MedEncoder(tcfg, cfg.fusion_layer)
        else:
            # BLIP med: cross-attention on every layer
            self.text_encoder = MedEncoder(tcfg, tcfg.num_layers, cross_from=0)
        self.text_decoder = MedEncoder(dcfg, fusion_layer=dcfg.num_layers, cross_from=0)
        self.lm_head = QFormerLMHead(dcfg)

    # ------------------------------------------------------------- encoder

    def encode_question(
        self,
        images: jnp.ndarray,
        question_ids: jnp.ndarray,
        question_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """-> [B, L, H] multimodal question states (reference :105-124)."""
        image_embeds = self.visual_encoder(images).astype(jnp.float32)
        return self.text_encoder(
            input_ids=question_ids, attention_mask=question_mask,
            image_embeds=image_embeds, mode="multimodal",
            deterministic=deterministic,
        )

    # ------------------------------------------------------------- decoder

    def decode_logits(
        self,
        answer_ids: jnp.ndarray,
        answer_mask: jnp.ndarray,
        question_states: jnp.ndarray,
        question_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        hidden = self.text_decoder(
            input_ids=answer_ids, attention_mask=answer_mask,
            image_embeds=question_states, image_mask=question_mask,
            mode="multimodal", is_decoder=True, deterministic=deterministic,
        )
        return self.lm_head(hidden)

    def _per_answer_nll(
        self, logits: jnp.ndarray, answer_ids: jnp.ndarray, pad_token_id: int
    ) -> jnp.ndarray:
        """Per-sequence SUM of smoothed next-token CE (med reduction='none';
        label smoothing 0.1 as in med.py's LM loss)."""
        labels = jnp.where(answer_ids == pad_token_id, -100, answer_ids)
        shifted_logits = logits[:, :-1, :].astype(jnp.float32)
        shifted_labels = labels[:, 1:]
        valid = shifted_labels != -100
        logp = jax.nn.log_softmax(shifted_logits, axis=-1)
        safe = jnp.where(valid, shifted_labels, 0)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        smooth = -logp.mean(axis=-1)
        per_tok = 0.9 * nll + 0.1 * smooth
        return (per_tok * valid).sum(axis=-1)

    def _per_answer_distill(
        self,
        logits: jnp.ndarray,
        soft_logits: jnp.ndarray,
        answer_ids: jnp.ndarray,
        pad_token_id: int,
    ) -> jnp.ndarray:
        """Per-sequence SUM of -sum(softmax(soft) * log_softmax(logits))
        over valid (non-pad, shifted) positions — the soft-label branch of
        the med LM loss (reference med.py:1254-1259)."""
        labels = jnp.where(answer_ids == pad_token_id, -100, answer_ids)
        valid = labels[:, 1:] != -100
        logp = jax.nn.log_softmax(logits[:, :-1, :].astype(jnp.float32), -1)
        soft = jax.nn.softmax(soft_logits[:, :-1, :].astype(jnp.float32), -1)
        per_tok = -(soft * logp).sum(axis=-1)
        return (per_tok * valid).sum(axis=-1)

    def __call__(
        self,
        images: jnp.ndarray,
        question_ids: jnp.ndarray,  # [B, Lq]
        question_mask: jnp.ndarray,
        answer_ids: jnp.ndarray,  # [N, La] bos-prefixed, N = total answers
        answer_mask: jnp.ndarray,
        ans_to_question: jnp.ndarray,  # [N] question index per answer
        weights: jnp.ndarray,  # [N] per-answer weight
        *,
        pad_token_id: int = 0,
        deterministic: bool = True,
        soft_logits: Optional[jnp.ndarray] = None,  # [N, La, V] momentum
        alpha: jnp.ndarray | float = 0.0,
    ) -> Dict[str, jnp.ndarray]:
        """Weighted answer LM loss: sum(w_i * nll_i) / B (reference :155-160).
        With ``soft_logits`` (the momentum decoder's logits) each answer's
        loss mixes (1-alpha)*CE + alpha*distill (albef_vqa.py:203-216)."""
        question_states = self.encode_question(
            images, question_ids, question_mask, deterministic=deterministic
        )
        qs = question_states[ans_to_question]
        qmask = question_mask[ans_to_question]
        logits = self.decode_logits(
            answer_ids, answer_mask, qs, qmask, deterministic=deterministic
        )
        nll = self._per_answer_nll(logits, answer_ids, pad_token_id)
        if soft_logits is not None:
            distill = self._per_answer_distill(
                logits, soft_logits, answer_ids, pad_token_id
            )
            nll = (1.0 - alpha) * nll + alpha * distill
        loss = (weights * nll).sum() / images.shape[0]
        return {"loss": loss, "logits": logits}

    # ----------------------------------------------------------- inference

    def rank_answers(
        self,
        params,
        images: jnp.ndarray,
        question_ids: jnp.ndarray,
        question_mask: jnp.ndarray,
        answer_ids: jnp.ndarray,  # [A, La] the candidate list, bos-prefixed
        answer_mask: jnp.ndarray,
        *,
        num_ans_candidates: int = 128,
        pad_token_id: int = 0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> ([B] best answer index into the list, [B, k] top-k candidates).

        Two-stage ranking (reference :277-340): a bos-only decode scores each
        answer's FIRST token; the top-k candidates are then re-scored with the
        full per-answer LM loss and the minimum wins.
        """
        A = answer_ids.shape[0]
        k = min(num_ans_candidates, A)
        B = images.shape[0]

        @jax.jit
        def _stage(images, question_ids, question_mask):
            question_states = self.apply(
                {"params": params}, images, question_ids, question_mask,
                method=self.encode_question,
            )
            bos = jnp.full((B, 1), answer_ids[0, 0], jnp.int32)
            first_logits = self.apply(
                {"params": params}, bos, jnp.ones((B, 1), jnp.int32),
                question_states, question_mask, method=self.decode_logits,
            )[:, 0, :]
            probs = jax.nn.softmax(first_logits.astype(jnp.float32), axis=-1)
            first_token_prob = probs[:, answer_ids[:, 1]]  # [B, A]
            _, topk_ids = jax.lax.top_k(first_token_prob, k)
            return question_states, topk_ids

        question_states, topk_ids = _stage(images, question_ids, question_mask)

        @jax.jit
        def _rescore(question_states, question_mask, topk_ids):
            cand_ids = answer_ids[topk_ids].reshape(B * k, -1)
            cand_mask = answer_mask[topk_ids].reshape(B * k, -1)
            qs = jnp.repeat(question_states, k, axis=0)
            qm = jnp.repeat(question_mask, k, axis=0)
            logits = self.apply(
                {"params": params}, cand_ids, cand_mask, qs, qm,
                method=self.decode_logits,
            )
            nll = self._per_answer_nll(logits, cand_ids, pad_token_id)
            best = jnp.argmin(nll.reshape(B, k), axis=-1)
            return jnp.take_along_axis(topk_ids, best[:, None], axis=-1)[:, 0]

        best_idx = _rescore(question_states, question_mask, topk_ids)
        return best_idx, topk_ids

    def generate_answers(
        self,
        params,
        images: jnp.ndarray,
        question_ids: jnp.ndarray,
        question_mask: jnp.ndarray,
        *,
        bos_token_id: int,
        eos_token_id: int,
        pad_token_id: int = 0,
        max_new_tokens: int = 10,
    ) -> jnp.ndarray:
        """Greedy answer decode (reference _generate_answers :238-275)."""
        B = images.shape[0]
        question_states = self.apply(
            {"params": params}, images, question_ids, question_mask,
            method=self.encode_question,
        )
        total = 1 + max_new_tokens
        ids = np.full((B, total), pad_token_id, np.int32)
        ids[:, 0] = bos_token_id
        mask = np.zeros((B, total), np.int32)
        mask[:, 0] = 1
        logits_fn = jax.jit(
            lambda ids, mask: self.apply(
                {"params": params}, ids, mask, question_states, question_mask,
                method=self.decode_logits,
            )
        )
        lengths = np.ones((B,), np.int64)
        finished = np.zeros((B,), bool)
        for _ in range(max_new_tokens):
            logits = np.asarray(logits_fn(jnp.asarray(ids), jnp.asarray(mask)))
            rows = np.arange(B)
            nxt = logits[rows, lengths - 1].argmax(-1).astype(np.int32)
            nxt = np.where(finished, pad_token_id, nxt)
            ids[rows, lengths] = nxt
            mask[rows, lengths] = (~finished).astype(np.int32)
            lengths += (~finished).astype(np.int64)
            finished |= nxt == eos_token_id
            if finished.all():
                break
        return jnp.asarray(ids[:, 1:])


# --------------------------------------- functional momentum distillation

# subtrees mirrored into the momentum copy (reference model_pairs,
# albef_vqa.py:64-69: visual encoder, text encoder, text decoder — the
# decoder's LM head is a separate module here, so it is mirrored too)
VQA_MOMENTUM_KEYS = ("visual_encoder", "text_encoder", "text_decoder",
                     "lm_head")


def init_vqa_state(params) -> Dict[str, Any]:
    """Momentum tower copies for ``use_distill`` training (fresh buffers —
    aliasing the live params breaks train-state donation)."""
    return {
        "params_m": {
            k: jax.tree.map(lambda x: jnp.array(x, copy=True), params[k])
            for k in VQA_MOMENTUM_KEYS
            if k in params
        }
    }


def vqa_train_step(model: VQAModel, params, state, batch, alpha, rng=None):
    """One pure distilled VQA forward (reference albef_vqa.py:153-226):
    EMA momentum update -> momentum towers' answer logits (no grad,
    eval-mode as under the reference's torch.no_grad momentum forward) ->
    weighted (1-alpha)*CE + alpha*distill loss. Returns (losses, new_state)
    for the generic train step's aux threading."""
    from sprc_tpu.models.albef import momentum_update

    state = momentum_update(params, state, model.cfg.momentum)
    params_m = {**params, **state["params_m"]}
    q_m = model.apply(
        {"params": params_m}, batch["images"], batch["question_ids"],
        batch["question_mask"], method=model.encode_question,
    )
    logits_m = model.apply(
        {"params": params_m}, batch["answer_ids"], batch["answer_mask"],
        q_m[batch["ans_to_question"]],
        batch["question_mask"][batch["ans_to_question"]],
        method=model.decode_logits,
    )
    logits_m = jax.lax.stop_gradient(logits_m)
    out = model.apply(
        {"params": params}, batch["images"], batch["question_ids"],
        batch["question_mask"], batch["answer_ids"], batch["answer_mask"],
        batch["ans_to_question"], batch["weights"],
        soft_logits=logits_m, alpha=alpha,
        deterministic=rng is None,
        rngs=None if rng is None else {"dropout": rng},
    )
    return {"loss": out["loss"]}, state
