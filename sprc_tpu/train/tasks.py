"""Concrete tasks for the runners.

- :class:`CirTask` — CIRR / FashionIQ composed-retrieval fine-tuning with
  per-epoch retrieval evaluation (the SPRC workload, reference
  blip_fine_tune_2.py wired through the generic runner instead of an ad-hoc
  script).
- :class:`ImageTextRetrievalTask` — generic i2t/t2i retrieval eval task
  (reference tasks/retrieval.py) over paired image/text data.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Sequence

import numpy as np

from sprc_tpu.registry import registry
from sprc_tpu.train.runner import BaseTask


@registry.register("task", "composed_retrieval")
class CirTask(BaseTask):
    def __init__(
        self,
        model,
        tokenizer,
        train_dataset,
        *,
        batch_size: int = 128,
        workers: int = 4,
        seed: int = 42,
        caption_key: str = "caption",
        eval_fn=None,
        # NOTE: harmonic_mean/geometric_mean report 0.0 (with a warning)
        # when any recall is 0 early in training — see retrieval/metrics.py;
        # arithmetic_mean is robust to that
        selection_key: str = "arithmetic_mean",
    ):
        from sprc_tpu.data.loader import DataLoader
        from sprc_tpu.text.processors import CaptionProcessor

        self.model = model
        self.tokenizer = tokenizer
        self.processor = CaptionProcessor()
        self.caption_key = caption_key
        self.eval_fn = eval_fn
        self.selection_key = selection_key
        self._fiq_rng = np.random.RandomState(seed)
        self.loader = DataLoader(
            train_dataset,
            batch_size=batch_size,
            shuffle=True,
            drop_last=True,
            num_workers=workers,
            seed=seed,
        )

    def train_loader(self, epoch: int) -> Iterable[dict]:
        self.loader.set_epoch(epoch)
        return self.loader

    def prepare_batch(self, batch: dict) -> Dict[str, Any]:
        from sprc_tpu.text.processors import randomize_fiq_captions

        if self.caption_key == "caption":
            captions = [self.processor(c) for c in batch["caption"]]
        else:
            flat = [c for pair in batch["captions"] for c in pair]
            captions = [
                self.processor(c) for c in randomize_fiq_captions(flat, self._fiq_rng)
            ]
        tok = self.tokenizer(captions, max_length=self.model.cfg.max_txt_len)
        return {
            "reference": batch["reference_image"].astype(np.float32),
            "target": batch["target_image"].astype(np.float32),
            "input_ids": tok["input_ids"],
            "text_mask": tok["attention_mask"],
        }

    def evaluation(self, model, params) -> Dict[str, float]:
        if self.eval_fn is None:
            return {}
        return self.eval_fn(model, params)

    def selection_metric(self, results: Dict[str, float]) -> Optional[float]:
        return results.get(self.selection_key)


def _image_batches(images, batch: int):
    """Yield [b, ...] chunks from an array OR a pre-batched iterable —
    eval callers stream gallery pixels instead of materializing the whole
    split in host RAM (reference evaluation dataloaders)."""
    if hasattr(images, "shape"):
        for s in range(0, images.shape[0], batch):
            yield images[s: s + batch]
    else:
        yield from images


@registry.register("task", "retrieval")
class ImageTextRetrievalTask(BaseTask):
    """Eval-only i2t/t2i retrieval (reference tasks/retrieval.py:19-120)."""

    def __init__(self, tokenizer, *, k_test: int = 128, max_txt_len: int = 35):
        self.tokenizer = tokenizer
        self.k_test = k_test
        self.max_txt_len = max_txt_len

    def evaluate_pairs(
        self,
        model,
        params,
        images: np.ndarray,
        texts: Sequence[str],
        img2txt: Dict[int, Sequence[int]],
        txt2img: Dict[int, int],
    ) -> Dict[str, float]:
        import jax
        import jax.numpy as jnp

        from sprc_tpu.retrieval.sim_matrix import compute_sim_matrix, retrieval_recalls

        img_fn = jax.jit(lambda p, im: model.apply(
            {"params": p}, im, method=model.extract_target_features))
        txt_fn = jax.jit(lambda p, ids, mask: model.apply(
            {"params": p}, ids, mask, method=model.encode_text_cls))
        feats_l, frozen_l = [], []
        for chunk in _image_batches(images, 64):
            f, fr = img_fn(params, jnp.asarray(chunk))
            feats_l.append(np.asarray(f))
            frozen_l.append(np.asarray(fr))
        feats, frozen = np.concatenate(feats_l), np.concatenate(frozen_l)
        tok = self.tokenizer(list(texts), max_length=self.max_txt_len)
        text_feats = np.concatenate([
            np.asarray(txt_fn(
                params, jnp.asarray(tok["input_ids"][s: s + 256]),
                jnp.asarray(tok["attention_mask"][s: s + 256])))
            for s in range(0, len(texts), 256)
        ])
        s_i2t, s_t2i = compute_sim_matrix(
            model, params, np.asarray(frozen), np.asarray(feats),
            tok["input_ids"], tok["attention_mask"], text_feats,
            k_test=min(self.k_test, len(texts)),
        )
        return retrieval_recalls(s_i2t, s_t2i, img2txt, txt2img)

    def evaluate_pairs_itc(
        self,
        model,
        params,
        images: np.ndarray,
        texts: Sequence[str],
        img2txt: Dict[int, Sequence[int]],
        txt2img: Dict[int, int],
        *,
        batch: int = 16,
    ) -> Dict[str, float]:
        """ITC sims + top-k ITM rescoring for the BLIP-1/ALBEF retrieval
        families (reference {blip,albef}_retrieval compute_sim_matrix,
        blip_retrieval.py:290-360): CLS-projection cosine sims rank all
        pairs, then the fusion encoder's ITM logit[:, 1] rescores the top-k
        in both directions."""
        import jax
        import jax.numpy as jnp

        from sprc_tpu.retrieval.sim_matrix import retrieval_recalls

        tok = self.tokenizer(list(texts), max_length=self.max_txt_len)
        enc_tok = self.tokenizer(
            list(texts), max_length=self.max_txt_len, enc_token=True)

        img_fn = jax.jit(lambda p, im: model.apply(
            {"params": p}, im,
            method=lambda m, im_: (
                lambda ie: (ie, m.vision_proj(ie[:, 0, :]))
            )(m.visual_encoder(im_).astype(jnp.float32))))
        txt_fn = jax.jit(lambda p, ids, mask: model.apply(
            {"params": p}, ids, mask,
            method=lambda m, i_, m_: (
                lambda te: (te, m.text_proj(te[:, 0, :]))
            )(m.text_encoder(input_ids=i_, attention_mask=m_, mode="text"))))

        def _norm(x):
            x = np.asarray(x, np.float32)
            return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True),
                                  1e-12)

        embeds, feats = [], []
        for chunk in _image_batches(images, batch):
            ie, if_ = img_fn(params, jnp.asarray(chunk))
            embeds.append(np.asarray(ie))
            feats.append(np.asarray(if_))
        image_embeds, image_feat = np.concatenate(embeds), _norm(
            np.concatenate(feats))
        te_l, tf_l = [], []
        for s in range(0, len(texts), 256):
            te, tf = txt_fn(
                params, jnp.asarray(tok["input_ids"][s: s + 256]),
                jnp.asarray(tok["attention_mask"][s: s + 256]))
            te_l.append(np.asarray(te))
            tf_l.append(np.asarray(tf))
        text_embeds, text_feat = np.concatenate(te_l), _norm(
            np.concatenate(tf_l))
        k_test = min(self.k_test, len(texts), image_embeds.shape[0])
        sims = image_feat @ text_feat.T

        if hasattr(model, "itm_logits"):  # BLIP-1: multimodal over [ENC] ids
            itm = jax.jit(lambda p, ids, mask, ie: model.apply(
                {"params": p}, ids, mask, ie,
                method=model.itm_logits)[:, 1])

            def _score(rows_img, rows_ids, rows_mask, _te):
                return np.asarray(itm(params, rows_ids, rows_mask, rows_img))
        else:  # ALBEF: fusion over text embeds + itm head
            itm = jax.jit(lambda p, te_, mask, ie: model.apply(
                {"params": p}, te_, mask, ie,
                method=lambda m, a, b, c: m.itm_head(
                    m.fusion_cls(a, b, c)))[:, 1])

            def _score(rows_img, rows_ids, rows_mask, rows_te):
                return np.asarray(itm(params, rows_te, rows_mask, rows_img))

        return self._rescore_topk(
            sims, k_test, image_embeds, text_embeds,
            np.asarray(enc_tok["input_ids"]),
            np.asarray(enc_tok["attention_mask"]),
            _score, img2txt, txt2img)

    def evaluate_pairs_clip(
        self,
        model,
        params,
        images: np.ndarray,
        texts: Sequence[str],
        img2txt: Dict[int, Sequence[int]],
        txt2img: Dict[int, int],
        *,
        tokenize=None,
        batch: int = 64,
    ) -> Dict[str, float]:
        """CLIP retrieval eval: pure cosine ranking of normalized tower
        features, no cross-encoder rescore (reference
        projects/clip/exp_{coco,flickr}_ret_eval.yaml over CLIP.forward).

        ``tokenize(texts) -> (ids, eot_positions)``; defaults to the
        wordpiece tokenizer with eot = last non-pad position."""
        import jax
        import jax.numpy as jnp

        from sprc_tpu.retrieval.sim_matrix import retrieval_recalls

        if tokenize is None:
            from sprc_tpu.text.llm_tokenizers import clip_tokenize

            ctx = int(getattr(model.cfg.text, "context_length", 77))
            tokenize = lambda t: clip_tokenize(  # noqa: E731
                self.tokenizer, t, min(ctx, self.max_txt_len))
        img_fn = jax.jit(lambda p, im: model.apply(
            {"params": p}, im, method=model.encode_image))
        txt_fn = jax.jit(lambda p, ids, eot: model.apply(
            {"params": p}, ids, eot, method=model.encode_text))

        def _norm(x):
            x = np.asarray(x, np.float32)
            return x / np.maximum(
                np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        feats = [np.asarray(img_fn(params, jnp.asarray(chunk)))
                 for chunk in _image_batches(images, batch)]
        image_feat = _norm(np.concatenate(feats))
        ids, eot = tokenize(list(texts))
        ids, eot = np.asarray(ids), np.asarray(eot)
        text_feat = _norm(np.concatenate([
            np.asarray(txt_fn(
                params, jnp.asarray(ids[s: s + 256], jnp.int32),
                jnp.asarray(eot[s: s + 256], jnp.int32)))
            for s in range(0, ids.shape[0], 256)
        ]))
        sims = image_feat @ text_feat.T
        return retrieval_recalls(sims, sims.T, img2txt, txt2img)

    def evaluate_pairs_video(
        self,
        model,
        params,
        videos: np.ndarray,
        texts: Sequence[str],
        img2txt: Dict[int, Sequence[int]],
        txt2img: Dict[int, int],
        *,
        batch: int = 4,
    ) -> Dict[str, float]:
        """ALPRO video-text retrieval eval: VTC sims + top-k VTM rescore
        (reference alpro_retrieval.py compute_sim_matrix:250-340)."""
        import jax
        import jax.numpy as jnp

        from sprc_tpu.retrieval.sim_matrix import retrieval_recalls

        tok = self.tokenizer(list(texts), max_length=self.max_txt_len)
        ids = np.asarray(tok["input_ids"])
        mask = np.asarray(tok["attention_mask"])

        vfn = jax.jit(lambda p, v: model.apply(
            {"params": p}, v, method=model.video_feats))
        tfn = jax.jit(lambda p, i, m: model.apply(
            {"params": p}, i, m, method=model.text_feats))
        vtm = jax.jit(lambda p, te, tm, ve: model.apply(
            {"params": p}, te, tm, ve, method=model.vtm_score))

        embeds, feats = [], []
        for chunk in _image_batches(videos, batch):
            ve, vf = vfn(params, jnp.asarray(chunk))
            embeds.append(np.asarray(ve))
            feats.append(np.asarray(vf))
        video_embeds, video_feat = np.concatenate(embeds), np.concatenate(feats)
        te_l, tf_l = [], []
        for s in range(0, ids.shape[0], 256):
            te, tf = tfn(params, jnp.asarray(ids[s: s + 256]),
                         jnp.asarray(mask[s: s + 256]))
            te_l.append(np.asarray(te))
            tf_l.append(np.asarray(tf))
        text_embeds, text_feat = np.concatenate(te_l), np.concatenate(tf_l)
        k_test = min(self.k_test, len(texts), video_embeds.shape[0])
        sims = video_feat @ text_feat.T

        def _score(rows_vid, rows_ids, rows_mask, rows_te):
            return np.asarray(vtm(params, rows_te, rows_mask, rows_vid))

        return self._rescore_topk(
            sims, k_test, video_embeds, text_embeds, ids, mask, _score,
            img2txt, txt2img)

    def _rescore_topk(self, sims, k_test, image_embeds, text_embeds,
                      enc_ids, enc_mask, _score, img2txt, txt2img):
        import jax.numpy as jnp

        from sprc_tpu.retrieval.sim_matrix import retrieval_recalls

        s_i2t = np.full_like(sims, -100.0)
        for i in range(sims.shape[0]):
            topk = np.argsort(-sims[i], kind="stable")[:k_test]
            score = _score(
                jnp.asarray(np.repeat(image_embeds[i: i + 1], len(topk), 0)),
                jnp.asarray(enc_ids[topk]), jnp.asarray(enc_mask[topk]),
                jnp.asarray(text_embeds[topk]))
            s_i2t[i, topk] = score + sims[i, topk]
        s_t2i = np.full_like(sims.T, -100.0)
        for t in range(sims.shape[1]):
            topk = np.argsort(-sims[:, t], kind="stable")[:k_test]
            score = _score(
                jnp.asarray(image_embeds[topk]),
                jnp.asarray(np.repeat(enc_ids[t: t + 1], len(topk), 0)),
                jnp.asarray(np.repeat(enc_mask[t: t + 1], len(topk), 0)),
                jnp.asarray(np.repeat(text_embeds[t: t + 1], len(topk), 0)))
            s_t2i[t, topk] = score + sims[topk, t]
        return retrieval_recalls(s_i2t, s_t2i, img2txt, txt2img)


# the generic LAVIS eval-task family registers on import
from sprc_tpu.train import eval_tasks as _eval_tasks  # noqa: E402,F401
