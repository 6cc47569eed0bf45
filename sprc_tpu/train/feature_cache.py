"""Frozen-tower feature cache for exact cached-feature training.

TPU-first redesign with no reference counterpart: the reference re-runs the
frozen ViT over both triplet images every step of every epoch
(blip_fine_tune_2.py:292 -> …cir_align_prompt.py:102,143), even though

- the fine-tune transform is DETERMINISTIC (targetpad + bicubic resize +
  center crop, no random augmentation — blip_fine_tune_2.py:251,
  data_utils.py:91-105), and
- the tower is frozen and kept in eval mode (LAVIS ``disabled_train``),

so ``visual_encoder(image)`` is the same array every epoch.  Precomputing it
once per unique image and feeding ``model.forward_cached`` turns the train
step into a Q-Former-only fwd+bwd — numerically identical losses/grads
(tests/test_train_cached.py) at a fraction of the step time.

The cache stores PRE-``ln_vision`` tower outputs (``encode_tower``) because
``ln_vision`` is trainable — only ``visual_encoder`` is frozen in the
reference (…align_prompt.py:64-69).

Size: one image is ``[S, D]`` in bf16 — 514 KB at ViT-L (257x1024), 723 KB
at EVA ViT-g (257x1408).  CIRR train (~17k unique images) is ~9/12 GB —
host-RAM resident, gathered per batch and shipped with the batch (the same
host->device edge the raw pixels used, at ~2x pixel bytes for ViT-L).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class FeatureCache:
    """name -> frozen tower-feature row ([S, D]) store, host-resident."""

    def __init__(self, names: Sequence[str], rows: np.ndarray):
        if len(names) != rows.shape[0]:
            raise ValueError(f"{len(names)} names vs {rows.shape[0]} rows")
        self.names: List[str] = list(names)
        self.rows = rows  # [N, S, D], ml_dtypes.bfloat16 or float32
        self._index: Dict[str, int] = {n: i for i, n in enumerate(self.names)}

    def __len__(self) -> int:
        return len(self.names)

    def __contains__(self, name: str) -> bool:
        return name in self._index

    def gather(self, names: Sequence[str]) -> np.ndarray:
        """Batch lookup -> [B, S, D] (raises KeyError on a missing name)."""
        idx = np.asarray([self._index[n] for n in names], np.int64)
        return self.rows[idx]

    # ------------------------------------------------------------- persistence

    def save(self, path: str) -> None:
        """Write <path>.npz (+ sidecar name list) — bf16 stored as uint16."""
        raw = self.rows
        if raw.dtype == jnp.bfloat16:  # ml_dtypes bfloat16
            payload, stored = raw.view(np.uint16), "bfloat16"
        else:
            payload, stored = raw, str(raw.dtype)
        np.savez(path, rows=payload)
        with open(path + ".names.json", "w") as f:
            json.dump({"names": self.names, "dtype": stored}, f)

    @classmethod
    def load(cls, path: str) -> "FeatureCache":
        with open(path + ".names.json") as f:
            meta = json.load(f)
        npz = path if path.endswith(".npz") else path + ".npz"
        rows = np.load(npz)["rows"]
        if meta["dtype"] == "bfloat16":
            rows = rows.view(jnp.bfloat16)
        return cls(meta["names"], rows)


def build_feature_cache(
    model,
    params,
    batches: Iterable[Tuple[Sequence[str], np.ndarray]],
    host_dtype=jnp.bfloat16,
) -> FeatureCache:
    """One deterministic ``encode_tower`` pass over unique gallery images.

    ``batches`` yields ``(names, images [B,H,W,3] float32)`` (the classic-mode
    dataset stream, same shape the index builder consumes).  Returns the
    host-resident cache; duplicate names keep their first row.
    """
    encode = jax.jit(
        lambda p, imgs: model.apply(
            {"params": p}, imgs, method=model.encode_tower
        ).astype(host_dtype)
    )
    names: List[str] = []
    seen: set = set()
    chunks: List[np.ndarray] = []
    pending: Optional[Tuple[List[str], jax.Array]] = None

    def drain(item):
        batch_names, feats = item
        arr = np.asarray(feats)
        keep = [i for i, n in enumerate(batch_names) if n not in seen]
        if keep:
            chunks.append(arr[np.asarray(keep)])
            for i in keep:
                seen.add(batch_names[i])
                names.append(batch_names[i])

    for batch_names, images in batches:
        feats = encode(params, jnp.asarray(images))
        # one-deep pipeline: convert the previous batch while this one runs
        if pending is not None:
            drain(pending)
        pending = (list(batch_names), feats)
    if pending is not None:
        drain(pending)
    if not chunks:
        raise ValueError("empty feature-cache build stream")
    return FeatureCache(names, np.concatenate(chunks, axis=0))


def cached_batches(
    cache: FeatureCache,
    triplets: Iterable[Dict],
    tokenizer,
    processor,
    max_txt_len: int,
    batch_size: int,
    *,
    caption_key: str = "caption",
    fiq_rng=None,
    drop_last: bool = True,
    shuffle_rng: Optional[np.random.RandomState] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Triplet dicts (name-mode relative items) -> cached train batches.

    Yields ``{'reference_embeds','target_embeds','input_ids','text_mask'}``
    ready for the ``from_embeds=True`` train step.
    """
    from sprc_tpu.text.processors import randomize_fiq_captions

    items = [t for t in triplets if t is not None]
    order = np.arange(len(items))
    if shuffle_rng is not None:
        shuffle_rng.shuffle(order)
    for start in range(0, len(items), batch_size):
        sel = order[start : start + batch_size]
        if drop_last and len(sel) < batch_size:
            break
        batch = [items[i] for i in sel]
        refs = [b["reference_name"] for b in batch]
        tgts = [b["target_name"] for b in batch]
        if caption_key == "caption":
            captions = [processor(b["caption"]) for b in batch]
        else:
            flat = [c for b in batch for c in b["captions"]]
            captions = [processor(c) for c in randomize_fiq_captions(flat, fiq_rng)]
        tok = tokenizer(captions, max_length=max_txt_len)
        yield {
            "reference_embeds": cache.gather(refs),
            "target_embeds": cache.gather(tgts),
            "input_ids": tok["input_ids"],
            "text_mask": tok["attention_mask"],
        }
