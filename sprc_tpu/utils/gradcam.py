"""GradCAM over BLIP-ITM cross-attention (TPU-native, functional).

The reference computes GradCAM with stateful backward hooks on the torch
attention module (blip_image_text_matching.py:151-199, common/gradcam.py).
Functionally: gradcam = attn_probs * relu(d itm_match_logit / d attn_probs),
text-masked, head-averaged. Here the gradient is taken w.r.t. a zero-valued
additive probe on the probs (a pure-JAX equivalent of the hook).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def compute_gradcam(
    model,
    params,
    images: jnp.ndarray,
    enc_input_ids: jnp.ndarray,
    text_mask: jnp.ndarray,
    *,
    block_num: int = 7,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (gradcam rows, full per-token gradcam).

    Returns
      avg:  [B, num_patches] — the token-averaged map (the row PNP-VQA
            samples patches from, pnp_vqa.py:80-84)
      full: [B, 2+L, num_patches] — [CLS map, token-average, per-token maps]
            matching the reference's concatenated layout (:185-197).
    """
    B, L = enc_input_ids.shape

    # probe shape = cross-attn probs at block_num: [B, H, L, S_img]
    num_heads = model.cfg.text_config().num_heads
    img_tokens = model.cfg.vit_config().num_patches + 1
    probe0 = jnp.zeros((B, num_heads, L, img_tokens), jnp.float32)

    def f(probe):
        return model.apply(
            {"params": params}, images, enc_input_ids, text_mask, probe,
            block_num, method=model.itm_gradcam,
        )

    (_, probs), grads = jax.value_and_grad(f, has_aux=True)(probe0)
    if probs is None:
        raise ValueError(
            f"block_num={block_num} has no cross-attention in this encoder "
            "(fewer layers, or cross-attention starts later)"
        )

    mask = text_mask.astype(jnp.float32)[:, None, :, None]  # [B,1,L,1]
    cams = probs[:, :, :, 1:] * mask  # drop the image CLS column
    grd = jnp.clip(grads[:, :, :, 1:], 0.0) * mask
    gradcam = (cams * grd).mean(axis=1)  # head average -> [B, L, P]

    gradcam = np.asarray(gradcam, np.float32)
    toks = text_mask.sum(axis=-1) - 2  # drop [CLS]/[SEP] (reference :165)
    full = []
    for b in range(B):
        n = int(toks[b])
        avg_row = gradcam[b, 1 : n + 1].sum(axis=0, keepdims=True) / max(n, 1)
        full.append(
            np.concatenate([gradcam[b, :1], avg_row, gradcam[b, 1:]], axis=0)
        )
    full = np.stack(full)
    return full[:, 1], full


def get_att_map(
    img: np.ndarray, att_map: np.ndarray, *, blur: bool = True,
    overlap: bool = True,
) -> np.ndarray:
    """Overlay a patch-level attention map on an image (reference
    common/gradcam.py getAttMap), using PIL resampling instead of
    scipy/skimage (not in this image)."""
    from PIL import Image

    att_map = att_map - att_map.min()
    if att_map.max() > 0:
        att_map = att_map / att_map.max()
    h, w = img.shape[:2]
    pil = Image.fromarray((att_map * 255).astype(np.uint8))
    att_map = np.asarray(
        pil.resize((w, h), Image.BICUBIC), np.float32
    ) / 255.0
    if blur:
        # approximate the gaussian blur with a box-filtered downsample cycle
        small = pil.resize((max(w // 8, 1), max(h // 8, 1)), Image.BILINEAR)
        att_map = np.asarray(
            small.resize((w, h), Image.BILINEAR), np.float32
        ) / 255.0
        att_map = att_map - att_map.min()
        if att_map.max() > 0:
            att_map = att_map / att_map.max()
    # jet-like colormap without matplotlib
    def _jet(x):
        r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
        g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
        b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
        return np.stack([r, g, b], axis=-1)

    att_v = _jet(att_map)
    if overlap:
        w_ = (att_map**0.7)[..., None]
        return (1 - w_) * img + w_ * att_v
    return att_v
