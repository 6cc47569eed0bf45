"""The SPRC flagship model: sentence-level prompts for composed retrieval.

TPU-native re-design of ``Blip2QformerCirAlignPrompt``
(reference: src/lavis/models/blip2_models/blip2_qformer_cir_align_prompt.py).

Losses (reference :95-200):
- ``loss_itc``  — fusion feature vs target token-max similarity, in-batch CE.
- ``loss_rtc``  — learned ``prompt_tokens`` + text-only (``no_img``) pass,
  CLS feature vs targets, in-batch CE (:171-191).
- ``loss_align`` — MSE between the mean fused query and the mean (detached)
  prompt token (:193-194).

Eval contract (:312-386):
- ``extract_target_features(images)`` -> ``(target_feats [B,Q,256],
  frozen_embeds [B,S,D])``
- ``inference(reference_embeds, target_feats, tokens)`` -> ``[B, N]`` raw
  max-sim scores (no temperature).

Under ``pjit`` with the batch sharded over the ``data`` mesh axis, the
in-batch contrastive matrix is computed over the *global* batch by XLA's
SPMD partitioner — no explicit all-gather layer is needed (the reference's
``GatherLayer`` hack, base_model.py:199-217, dissolves into the compiler).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from sprc_tpu.models.cir_base import Blip2CirBase, cross_entropy_diagonal
from sprc_tpu.ops.layers import l2_normalize
from sprc_tpu.registry import registry


@registry.register_model("blip2_cir_align_prompt")
class CirAlignPrompt(Blip2CirBase):
    """SPRC: two-pass query/text fusion + sentence-prompt alignment."""

    DEFAULT_LOSS_WEIGHTS = {"loss_itc": 1.0, "loss_rtc": 0.4, "loss_align": 0.4}

    def setup(self) -> None:
        super().setup()
        qcfg = self.cfg.qformer_config()
        self.prompt_tokens = self.param(
            "prompt_tokens",
            nn.initializers.normal(qcfg.initializer_range),
            (1, self.cfg.num_query_token, qcfg.hidden_size),
            jnp.float32,
        )

    # ------------------------------------------------------------------ train

    def __call__(
        self,
        reference_images: jnp.ndarray,
        target_images: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Full training forward -> {'loss_itc','loss_rtc','loss_align'}."""
        ref_embeds, tgt_embeds = self.encode_image_pair(
            reference_images, target_images)
        return self.losses_from_embeds(
            ref_embeds,
            tgt_embeds,
            input_ids,
            text_mask,
            deterministic=deterministic,
        )

    def losses_from_embeds(
        self,
        ref_embeds: jnp.ndarray,
        tgt_embeds: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """The three SPRC losses from post-ln_vision image embeddings."""
        B = ref_embeds.shape[0]
        Q = self.cfg.num_query_token

        fused_queries, fusion_feats = self.fuse_reference(
            ref_embeds, input_ids, text_mask, deterministic=deterministic
        )

        target_feats = self.target_features(tgt_embeds, deterministic=deterministic)

        sim_i2t = self.token_max_sim(fusion_feats, target_feats) / self.temp
        loss_itc = cross_entropy_diagonal(sim_i2t)

        text_only_feat = self._prompt_text_feature(
            input_ids, text_mask, deterministic=deterministic
        )
        sim_r2t = self.token_max_sim(text_only_feat, target_feats) / self.temp
        loss_rtc = cross_entropy_diagonal(sim_r2t)

        prompt = jnp.broadcast_to(self.prompt_tokens, (B, Q, self.prompt_tokens.shape[2]))
        loss_align = jnp.mean(
            jnp.square(
                fused_queries.astype(jnp.float32).mean(axis=1)
                - jax.lax.stop_gradient(prompt.astype(jnp.float32).mean(axis=1))
            )
        )

        return {"loss_itc": loss_itc, "loss_rtc": loss_rtc, "loss_align": loss_align}

    def _prompt_text_feature(
        self, input_ids: jnp.ndarray, text_mask: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        """Relative-text feature: prompt_tokens + text, no_img pass (:171-182)."""
        B = input_ids.shape[0]
        Q = self.cfg.num_query_token
        prompt = jnp.broadcast_to(self.prompt_tokens, (B, Q, self.prompt_tokens.shape[2]))
        attn_mask = jnp.concatenate(
            [jnp.ones((B, Q), dtype=text_mask.dtype), text_mask], axis=1
        )
        hidden = self.qformer(
            input_ids=input_ids,
            query_embeds=prompt,
            attention_mask=attn_mask,
            no_img=True,
            deterministic=deterministic,
        )
        return l2_normalize(self.text_proj(hidden[:, 0, :]))

    # eval contract (extract_target_features / inference / fusion_feature)
    # is inherited from Blip2CirBase
