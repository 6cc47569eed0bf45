"""Image preprocessing: TargetPad / SquarePad -> bicubic resize -> center crop
-> normalize (CLIP statistics).

Two implementations of the same pipeline (reference: src/data_utils.py:49-105):

1. **Host path** (`targetpad_transform`, `squarepad_transform`): PIL-exact.
   Used for eval parity — PIL's bicubic differs slightly from XLA's and
   Recall@1 is sensitive at the 0.1 level (SURVEY.md §7.2).
2. **Device path** (`device_preprocess`): a jittable jax function over raw
   uint8 RGB batches — pad, `jax.image.resize` bicubic, crop, normalize —
   fused by XLA into the encode step for the high-throughput gallery path.

Output layout is NHWC float32 (TPU-native), not the reference's NCHW.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


# ------------------------------------------------------------------ host path


def _pil():
    import PIL.Image

    return PIL.Image


def _target_pad(image, target_ratio: float):
    """Pad to the target aspect ratio if the image is too elongated
    (reference data_utils.py:49-72)."""
    w, h = image.size
    actual_ratio = max(w, h) / min(w, h)
    if actual_ratio < target_ratio:
        return image
    scaled_max_wh = max(w, h) / target_ratio
    hp = max(int((scaled_max_wh - w) / 2), 0)
    vp = max(int((scaled_max_wh - h) / 2), 0)
    return _pad_pil(image, hp, vp)


def _square_pad(image):
    w, h = image.size
    max_wh = max(w, h)
    hp = int((max_wh - w) / 2)
    vp = int((max_wh - h) / 2)
    return _pad_pil(image, hp, vp)


def _pad_pil(image, hp: int, vp: int):
    """Zero-pad left/right by hp and top/bottom by vp (F.pad semantics)."""
    PIL = _pil()
    if hp == 0 and vp == 0:
        return image
    mode = image.mode
    new = PIL.new(mode, (image.size[0] + 2 * hp, image.size[1] + 2 * vp), 0)
    new.paste(image, (hp, vp))
    return new


def _resize_shorter(image, dim: int):
    """torchvision Resize(dim) semantics: shorter side -> dim, keep aspect."""
    PIL = _pil()
    w, h = image.size
    if w <= h:
        nw, nh = dim, max(1, round(h * dim / w))
    else:
        nw, nh = max(1, round(w * dim / h)), dim
    return image.resize((nw, nh), PIL.BICUBIC)


def _center_crop(image, dim: int):
    w, h = image.size
    left = int(round((w - dim) / 2.0))
    top = int(round((h - dim) / 2.0))
    return image.crop((left, top, left + dim, top + dim))


def _finalize(image, dim: int) -> np.ndarray:
    image = image.convert("RGB")
    arr = np.asarray(image, dtype=np.float32) / 255.0  # HWC
    arr = (arr - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)
    return arr


@dataclasses.dataclass
class HostTransform:
    """Picklable host-side preprocess: PIL image -> float32 [H, W, 3]."""

    dim: int
    pad: str  # "target" | "square" | "none"
    target_ratio: float = 1.25

    def __call__(self, image) -> np.ndarray:
        if self.pad == "target":
            image = _target_pad(image, self.target_ratio)
        elif self.pad == "square":
            image = _square_pad(image)
        image = _resize_shorter(image, self.dim)
        image = _center_crop(image, self.dim)
        return _finalize(image, self.dim)


def targetpad_transform(target_ratio: float, dim: int) -> HostTransform:
    return HostTransform(dim=dim, pad="target", target_ratio=target_ratio)


def squarepad_transform(dim: int) -> HostTransform:
    return HostTransform(dim=dim, pad="square")


# ---------------------------------------------------------------- device path


def device_preprocess(dim: int = 224, target_ratio: float = 1.25) -> Callable:
    """Jittable device preprocess over fixed-size uint8 batches.

    Takes ``images [B, H, W, 3] uint8`` (already decoded, arbitrary but
    uniform H/W) plus their true ``sizes [B, 2]`` (h, w) and produces the
    normalized [B, dim, dim, 3] float32 batch. Padding/resize math follows
    the host path; interpolation is XLA bicubic, so use this for training
    and throughput paths, and the host path when bit-level PIL parity
    matters.
    """
    import jax
    import jax.numpy as jnp

    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)

    def _one(img: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
        H, W = img.shape[0], img.shape[1]
        h = size[0].astype(jnp.float32)
        w = size[1].astype(jnp.float32)
        long_side = jnp.maximum(w, h)
        short_side = jnp.minimum(w, h)
        ratio = long_side / short_side
        scaled = long_side / target_ratio
        do_pad = ratio >= target_ratio
        hp = jnp.where(do_pad, jnp.maximum((scaled - w) / 2.0, 0.0), 0.0)
        vp = jnp.where(do_pad, jnp.maximum((scaled - h) / 2.0, 0.0), 0.0)
        hp = jnp.floor(hp)
        vp = jnp.floor(vp)
        padded_h = h + 2.0 * vp
        padded_w = w + 2.0 * hp
        # resize shorter side to dim
        scale = dim / jnp.minimum(padded_h, padded_w)
        out_h = jnp.round(padded_h * scale)
        out_w = jnp.round(padded_w * scale)

        # implement pad+resize+crop as one gather-free resize with a source
        # window: compute, in padded coordinates, the crop box that maps to
        # the output dim x dim, then sample the original image (zeros outside)
        left = jnp.round((out_w - dim) / 2.0)
        top = jnp.round((out_h - dim) / 2.0)
        # source box in padded coords
        src_x0 = left / scale - hp
        src_y0 = top / scale - vp
        src_w = dim / scale
        src_h = dim / scale

        # scale_and_translate: out = resize(img, scale, translation)
        img_f = img.astype(jnp.float32)
        translation = (-src_y0 * scale, -src_x0 * scale, 0.0)
        out = jax.image.scale_and_translate(
            img_f,
            shape=(dim, dim, 3),
            spatial_dims=(0, 1, 2),
            scale=jnp.array([scale, scale, 1.0]),
            translation=jnp.asarray(translation),
            method="cubic",
        )
        out = out / 255.0
        return (out - mean) / std

    return jax.vmap(_one)
