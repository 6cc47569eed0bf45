"""Flat (single-vector) CLIP gallery helpers.

TPU-native equivalents of the reference's CLIP-index utilities
(`/root/reference/src/utils.py:20-43` extract_index_features and
`:107-114` element_wise_sum). The reference uses these for the CLIP4Cir
combiner baseline; its `validate_blip_rerank.main()` consumer is dead code
(broken imports — SURVEY §7.3), but the helpers themselves are the generic
"flat gallery" path every CLIP-style retrieval run needs, so they live here
against the jitted/pipelined engine conventions rather than a torch
DataLoader loop.

Unlike the BLIP index (per-image [32, 256] token features + frozen ViT
rows), a CLIP index is one embedding per image; scoring is a plain
features @ query.T matmul after `element_wise_sum` query fusion.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def element_wise_sum(
    image_features: jnp.ndarray, text_features: jnp.ndarray
) -> jnp.ndarray:
    """L2-normalized element-wise sum of (non-normalized) features.

    Reference: `src/utils.py:107-114` (F.normalize(image + text, dim=-1)).
    """
    s = image_features + text_features
    norm = jnp.linalg.norm(s, axis=-1, keepdims=True)
    return s / jnp.maximum(norm, 1e-12)


def extract_clip_index_features(
    batches: Iterable[Tuple[Sequence[str], np.ndarray]],
    model,
    params,
    *,
    encode_batch: int = 32,
    normalize: bool = False,
) -> Tuple[np.ndarray, List[str]]:
    """Encode a classic-mode gallery stream into flat CLIP features.

    ``batches`` yield ``(names, images [b, H, W, 3] float32)`` — the same
    stream contract as ``RetrievalEngine.build_index``. Trailing partial
    batches are padded so one compiled program serves the whole gallery.
    Returns ``(features [N, D] float32, names)``; features are raw
    projections (reference keeps them non-normalized so element_wise_sum
    normalizes once, `src/utils.py:31,113`), pass ``normalize=True`` for
    pre-normalized galleries.

    Reference: `src/utils.py:20-43` extract_index_features.
    """
    encode = jax.jit(
        lambda p, imgs: model.apply({"params": p}, imgs, method=model.encode_image)
    )

    names: List[str] = []
    parts: List[np.ndarray] = []
    for batch_names, images in batches:
        # re-chunk to exactly encode_batch rows per call: oversize batches
        # are split and undersize ones zero-padded, so ONE compiled shape
        # serves the whole gallery regardless of the stream's batching
        for s in range(0, images.shape[0], encode_batch):
            chunk = images[s:s + encode_batch]
            b = chunk.shape[0]
            if b < encode_batch:
                pad = encode_batch - b
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)],
                    axis=0,
                )
            feats = np.asarray(encode(params, jnp.asarray(chunk))[:b], np.float32)
            if normalize:
                feats = feats / np.maximum(
                    np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
                )
            parts.append(feats)
        names.extend(batch_names)
    if not parts:
        dim = getattr(getattr(model, "cfg", None), "embed_dim", 0)
        return np.zeros((0, dim), np.float32), names
    return np.concatenate(parts, axis=0), names
