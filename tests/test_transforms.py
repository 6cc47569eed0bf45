"""Image pipeline parity: host path vs the reference torchvision pipeline,
plus device-path sanity."""

import numpy as np
import pytest

from sprc_tpu.data.transforms import (
    CLIP_MEAN,
    CLIP_STD,
    squarepad_transform,
    targetpad_transform,
)


def _reference_pipeline(pil_img, dim=224, target_ratio=1.25, pad="target"):
    """The reference preprocess (reference src/data_utils.py:91-105) built
    independently from PIL primitives (torchvision is absent in this image):
    F.pad == ImageOps.expand, Resize(int) == shorter-side bicubic resize,
    CenterCrop uses round() offsets, ToTensor == /255."""
    import PIL.Image
    import PIL.ImageOps

    image = pil_img
    w, h = image.size
    if pad == "target":
        actual = max(w, h) / min(w, h)
        if actual >= target_ratio:
            scaled = max(w, h) / target_ratio
            hp = max(int((scaled - w) / 2), 0)
            vp = max(int((scaled - h) / 2), 0)
            image = PIL.ImageOps.expand(image, border=(hp, vp, hp, vp), fill=0)
    else:
        m = max(w, h)
        hp = int((m - w) / 2)
        vp = int((m - h) / 2)
        image = PIL.ImageOps.expand(image, border=(hp, vp, hp, vp), fill=0)

    # torchvision Resize(dim): resize shorter side to dim keeping aspect
    w, h = image.size
    if w <= h:
        nw, nh = dim, int(round(h * dim / w))
    else:
        nw, nh = int(round(w * dim / h)), dim
    image = image.resize((nw, nh), PIL.Image.BICUBIC)

    # torchvision CenterCrop(dim)
    w, h = image.size
    left = int(round((w - dim) / 2.0))
    top = int(round((h - dim) / 2.0))
    image = image.crop((left, top, left + dim, top + dim)).convert("RGB")

    arr = np.asarray(image, np.float32) / 255.0
    return (arr - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)


@pytest.mark.parametrize("shape", [(224, 224), (640, 480), (100, 300), (320, 240)])
@pytest.mark.parametrize("pad", ["target", "square"])
def test_host_transform_matches_reference(shape, pad, rng):
    import PIL.Image

    arr = (rng.rand(*shape, 3) * 255).astype(np.uint8)
    img = PIL.Image.fromarray(arr)

    if pad == "target":
        ours = targetpad_transform(1.25, 224)(img)
    else:
        ours = squarepad_transform(224)(img)
    want = _reference_pipeline(img, pad=pad)
    assert ours.shape == want.shape == (224, 224, 3)
    np.testing.assert_allclose(ours, want, atol=1e-5)


def test_device_preprocess_close_to_host(rng):
    import PIL.Image
    import jax.numpy as jnp

    from sprc_tpu.data.transforms import device_preprocess

    h, w = 180, 260
    arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    img = PIL.Image.fromarray(arr)
    host = targetpad_transform(1.25, 112)(img)

    fn = device_preprocess(dim=112, target_ratio=1.25)
    dev = np.asarray(
        fn(jnp.asarray(arr)[None], jnp.asarray([[h, w]], jnp.int32))
    )[0]
    assert dev.shape == host.shape
    # XLA bicubic vs PIL bicubic: small interpolation differences allowed,
    # but the images must agree closely in the interior
    diff = np.abs(dev - host)
    assert float(np.median(diff)) < 0.05, float(np.median(diff))
    assert float(diff.mean()) < 0.12, float(diff.mean())
