"""ALPRO video-text models — TPU-native Flax.

Re-implementations (not ports) of the reference ALPRO family:

- ``alpro_retrieval`` (reference src/lavis/models/alpro_models/
  alpro_retrieval.py:29-241): TimeSformer video tower + med-BERT text
  tower (12 layers, fusion_layer 6, NO cross-attention — fusion is
  self-attention over the concatenated [text; video] sequence,
  bert_config_alpro.json), in-batch VTC loss + hard-negative VTM.
- ``alpro_qa`` (alpro_qa.py:25-141): same towers; classifier MLP
  (hidden -> 2*hidden -> ReLU -> num_classes) over the fusion CLS.

TPU-first: the reference's ``all_gather_with_grad`` + rank-local eye
targets dissolve into a global-batch loss under pjit (the ``data``-sharded
batch makes XLA insert the gather); hard negatives use
``jax.random.categorical`` instead of host-side ``torch.multinomial``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sprc_tpu.models.albef import MedEncoder
from sprc_tpu.models.qformer import QFormerConfig
from sprc_tpu.models.timesformer import TimeSformer, TimeSformerConfig
from sprc_tpu.ops.layers import DenseGeneral, l2_normalize
from sprc_tpu.registry import registry


@dataclasses.dataclass(frozen=True)
class AlproConfig:
    image_size: int = 224
    num_frames: int = 8
    embed_dim: int = 256
    max_txt_len: int = 35
    temp_init: float = 0.07
    vocab_size: int = 30522
    fusion_layer: int = 6  # bert_config_alpro.json
    num_classes: int = 0  # QA answer vocabulary (msrvtt: 1500, msvd: 2423)
    vit_dtype: Any = jnp.float32
    text_dtype: Any = jnp.float32
    video_config_override: Optional[TimeSformerConfig] = None
    text_config_override: Optional[QFormerConfig] = None

    def video_config(self) -> TimeSformerConfig:
        return self.video_config_override or TimeSformerConfig(
            image_size=self.image_size, num_frames=self.num_frames,
            dtype=self.vit_dtype,
        )

    def text_config(self) -> QFormerConfig:
        return self.text_config_override or QFormerConfig(
            vocab_size=self.vocab_size,
            encoder_width=self.video_config().width,
            dtype=self.text_dtype,
        )


class _AlproBase(nn.Module):
    cfg: AlproConfig

    def _towers(self):
        cfg = self.cfg
        visual_encoder = TimeSformer(cfg.video_config(), name="visual_encoder")
        # add_cross_attention=false: fusion layers self-attend over the
        # concatenated sequence; MedEncoder does exactly that when no
        # image_embeds are passed
        text_encoder = MedEncoder(
            cfg.text_config(), cfg.fusion_layer, name="text_encoder"
        )
        return visual_encoder, text_encoder

    def encode_video(self, video: jnp.ndarray, *, deterministic: bool = True):
        """[B, T, H, W, 3] -> pooled video embeds [B, 1+N, C] (fp32)."""
        return self.visual_encoder(video, deterministic=deterministic)

    def encode_text(self, input_ids, text_mask, *, deterministic: bool = True):
        """Text-only layers [0, fusion_layer) (reference forward_text)."""
        return self.text_encoder(
            input_ids=input_ids, attention_mask=text_mask, mode="text",
            deterministic=deterministic,
        )

    def fuse(self, text_embeds, text_mask, video_embeds, *, deterministic=True):
        """Fusion layers over concat([text; video]) -> hidden [B, St+Sv, C]
        (reference alpro_retrieval.py:155-168 mode='fusion')."""
        emb = jnp.concatenate(
            [text_embeds, video_embeds.astype(text_embeds.dtype)], axis=1
        )
        mask = jnp.concatenate(
            [text_mask, jnp.ones(video_embeds.shape[:2], text_mask.dtype)], axis=1
        )
        return self.text_encoder(
            inputs_embeds=emb, attention_mask=mask, mode="fusion",
            deterministic=deterministic,
        )


@registry.register_model("alpro_retrieval", override=True)
class AlproRetrieval(_AlproBase):
    cfg: AlproConfig

    def setup(self) -> None:
        cfg = self.cfg
        self.visual_encoder, self.text_encoder = self._towers()
        self.vision_proj = DenseGeneral(cfg.embed_dim, dtype=cfg.text_dtype)
        self.text_proj = DenseGeneral(cfg.embed_dim, dtype=cfg.text_dtype)
        self.itm_head = DenseGeneral(2, dtype=cfg.text_dtype)
        self.temp = self.param(
            "temp", nn.initializers.constant(cfg.temp_init), (), jnp.float32
        )

    def unimodal(self, video, input_ids, text_mask, *, deterministic=True):
        """-> (video_embeds, video_feat, text_embeds, text_feat)."""
        video_embeds = self.encode_video(video, deterministic=deterministic)
        video_feat = l2_normalize(self.vision_proj(video_embeds[:, 0, :]))
        text_embeds = self.encode_text(
            input_ids, text_mask, deterministic=deterministic
        )
        text_feat = l2_normalize(self.text_proj(text_embeds[:, 0, :]))
        return video_embeds, video_feat, text_embeds, text_feat

    def __call__(
        self,
        video: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """VTC + VTM losses (reference alpro_retrieval.py:66-240)."""
        bs = video.shape[0]
        temp = jnp.clip(self.temp, 0.001, 0.5)

        video_embeds, video_feat, text_embeds, text_feat = self.unimodal(
            video, input_ids, text_mask, deterministic=deterministic
        )

        # ---- in-batch VTC; under pjit the batch is global, so the
        # reference's all_gather + rank-local eye is just the identity
        sim_v2t = video_feat @ text_feat.T / temp
        sim_t2v = text_feat @ video_feat.T / temp
        targets = jnp.eye(bs, dtype=jnp.float32)
        loss_v2t = -jnp.mean(jnp.sum(jax.nn.log_softmax(sim_v2t, -1) * targets, 1))
        loss_t2v = -jnp.mean(jnp.sum(jax.nn.log_softmax(sim_t2v, -1) * targets, 1))
        loss_vtc = (loss_v2t + loss_t2v) / 2

        # ---- hard-negative VTM (:152-240)
        neg_inf = jnp.full((bs, bs), -1e9, jnp.float32)
        w_v2t = jax.nn.softmax(
            jnp.where(jnp.eye(bs, dtype=bool), neg_inf, jax.lax.stop_gradient(sim_v2t)),
            axis=1,
        )
        w_t2v = jax.nn.softmax(
            jnp.where(jnp.eye(bs, dtype=bool), neg_inf, jax.lax.stop_gradient(sim_t2v)),
            axis=1,
        )
        if self.has_rng("sample"):
            r1, r2 = jax.random.split(self.make_rng("sample"))
            neg_vid = jax.random.categorical(r1, jnp.log(w_t2v + 1e-9), axis=1)
            neg_txt = jax.random.categorical(r2, jnp.log(w_v2t + 1e-9), axis=1)
        else:
            neg_vid = jnp.argmax(w_t2v, axis=1)
            neg_txt = jnp.argmax(w_v2t, axis=1)

        pos = self.fuse(
            text_embeds, text_mask, video_embeds, deterministic=deterministic
        )[:, 0, :]
        # negatives: [texts; neg texts] x [neg videos; videos] (:200-218)
        text_all = jnp.concatenate([text_embeds, text_embeds[neg_txt]], axis=0)
        mask_all = jnp.concatenate([text_mask, text_mask[neg_txt]], axis=0)
        vid_all = jnp.concatenate([video_embeds[neg_vid], video_embeds], axis=0)
        neg = self.fuse(text_all, mask_all, vid_all, deterministic=deterministic)[:, 0, :]

        logits = self.itm_head(jnp.concatenate([pos, neg], axis=0))
        labels = jnp.concatenate(
            [jnp.ones(bs, jnp.int32), jnp.zeros(2 * bs, jnp.int32)]
        )
        loss_vtm = jnp.mean(
            -jax.nn.log_softmax(logits, -1)[jnp.arange(3 * bs), labels]
        )

        return {
            "loss": loss_vtc + loss_vtm,
            "loss_vtc": loss_vtc,
            "loss_vtm": loss_vtm,
        }

    # ------------------------------------------------------- eval helpers

    def video_feats(self, video, *, deterministic=True):
        """-> (video_embeds, normalized video_feat) for sim-matrix eval."""
        emb = self.encode_video(video, deterministic=deterministic)
        return emb, l2_normalize(self.vision_proj(emb[:, 0, :]))

    def text_feats(self, input_ids, text_mask, *, deterministic=True):
        emb = self.encode_text(input_ids, text_mask, deterministic=deterministic)
        return emb, l2_normalize(self.text_proj(emb[:, 0, :]))

    def vtm_score(self, text_embeds, text_mask, video_embeds, *, deterministic=True):
        """ITM logit of the 'match' class for rescoring top-k candidates
        (reference compute_sim_matrix rescoring loop :290-340)."""
        cls = self.fuse(
            text_embeds, text_mask, video_embeds, deterministic=deterministic
        )[:, 0, :]
        return self.itm_head(cls)[:, 1]


@registry.register_model("alpro_qa", override=True)
class AlproQA(_AlproBase):
    cfg: AlproConfig

    def setup(self) -> None:
        cfg = self.cfg
        assert cfg.num_classes > 0, "AlproQA needs num_classes > 0"
        self.visual_encoder, self.text_encoder = self._towers()
        self.classifier_fc1 = DenseGeneral(
            cfg.text_config().hidden_size * 2, dtype=cfg.text_dtype
        )
        self.classifier_fc2 = DenseGeneral(cfg.num_classes, dtype=cfg.text_dtype)

    def predict(self, video, input_ids, text_mask, *, deterministic=True):
        """-> answer logits [B, num_classes] (reference alpro_qa.py:54-105)."""
        text_embeds = self.encode_text(
            input_ids, text_mask, deterministic=deterministic
        )
        video_embeds = self.encode_video(video, deterministic=deterministic)
        cls = self.fuse(
            text_embeds, text_mask, video_embeds, deterministic=deterministic
        )[:, 0, :]
        return self.classifier_fc2(nn.relu(self.classifier_fc1(cls)))

    def __call__(
        self, video, input_ids, text_mask, targets, *, deterministic=True
    ) -> Dict[str, jnp.ndarray]:
        """targets < 0 mark answers outside the vocabulary and are excluded
        from the loss (the reference drops such items at dataset build;
        here the batch shape stays static)."""
        logits = self.predict(
            video, input_ids, text_mask, deterministic=deterministic
        )
        valid = targets >= 0
        safe = jnp.where(valid, targets, 0)
        nll = -jax.nn.log_softmax(logits, -1)[jnp.arange(logits.shape[0]), safe]
        loss = (nll * valid).sum() / jnp.maximum(valid.sum(), 1)
        return {"loss": loss, "logits": logits}


@registry.register_model("timesformer", override=True)
class TimeSformerModel(nn.Module):
    """Standalone TimeSformer registry entry (feature extractor)."""

    cfg: AlproConfig

    @nn.compact
    def __call__(self, video: jnp.ndarray, *, deterministic: bool = True):
        return TimeSformer(self.cfg.video_config(), name="model")(
            video, deterministic=deterministic
        )


def alpro_params_from_torch(sd, model) -> dict:
    """Reference ALPRO checkpoint state dict -> param tree for
    ``AlproRetrieval`` / ``AlproQA`` (the released msrvtt/didemo/msvd
    weights; reference alpro_retrieval.py:36-64, alpro_qa.py:31-51).

    The visual trunk lives under ``visual_encoder.model.`` (the reference
    TimeSformer wrapper) and the text tower under ``text_encoder.``; ALPRO's
    token-type row 0 is folded into the position embeddings (see
    ``med_params_from_torch``).
    """
    import jax.numpy as jnp
    import numpy as np

    from sprc_tpu.interop.torch_import import _linear
    from sprc_tpu.models.albef import med_params_from_torch
    from sprc_tpu.models.timesformer import timesformer_params_from_torch

    cfg = model.cfg
    vp = (
        "visual_encoder.model."
        if any(k.startswith("visual_encoder.model.") for k in sd)
        else "visual_encoder."
    )
    params = {
        "visual_encoder": timesformer_params_from_torch(
            sd, vp, cfg.video_config().depth
        ),
        "text_encoder": med_params_from_torch(
            sd,
            "text_encoder.",
            cfg.text_config().num_layers,
            fold_type_token0=(
                "text_encoder.embeddings.token_type_embeddings.weight" in sd
            ),
        ),
    }
    if "itm_head.weight" in sd:  # retrieval head set
        params["vision_proj"] = _linear(sd, "vision_proj")
        params["text_proj"] = _linear(sd, "text_proj")
        params["itm_head"] = _linear(sd, "itm_head")
        params["temp"] = np.asarray(sd["temp"]).reshape(())
    if "classifier.0.weight" in sd:  # QA classifier (nn.Sequential 0/2)
        params["classifier_fc1"] = _linear(sd, "classifier.0")
        params["classifier_fc2"] = _linear(sd, "classifier.2")
    return jax.tree.map(jnp.asarray, params)
