"""Processor family tests."""

import numpy as np
import pytest

from sprc_tpu.data.processors import (
    BLIP_AUGS,
    BlipImageEvalProcessor,
    BlipImageTrainProcessor,
    ClipImageProcessor,
    rand_augment,
    random_resized_crop,
)
from sprc_tpu.registry import registry


@pytest.fixture()
def image(rng):
    import PIL.Image

    return PIL.Image.fromarray((rng.rand(80, 120, 3) * 255).astype(np.uint8))


def test_train_processor_shapes_and_determinism(image):
    p1 = BlipImageTrainProcessor(image_size=64, seed=7)
    p2 = BlipImageTrainProcessor(image_size=64, seed=7)
    a = p1(image)
    b = p2(image)
    assert a.shape == (64, 64, 3) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)  # same seed, same augmentation
    c = p1(image)  # advances rng -> different crop
    assert not np.array_equal(a, c)


def test_eval_processor(image):
    out = BlipImageEvalProcessor(image_size=48)(image)
    assert out.shape == (48, 48, 3)
    # normalization: a mid-gray pixel maps near zero
    import PIL.Image

    gray = PIL.Image.new("RGB", (48, 48), (117, 117, 117))
    out_gray = BlipImageEvalProcessor(image_size=48)(gray)
    assert abs(out_gray.mean()) < 0.25


def test_clip_processor_aspect(image):
    out = ClipImageProcessor(image_size=32)(image)
    assert out.shape == (32, 32, 3)


def test_all_augs_run(image, rng):
    for op in BLIP_AUGS:
        from sprc_tpu.data.processors import _apply_aug

        out = _apply_aug(image, op, 5.0, rng)
        assert out.size == image.size


def test_random_resized_crop_bounds(image, rng):
    out = random_resized_crop(image, 32, rng)
    assert out.size == (32, 32)


def test_registry_names():
    for name in ("blip_image_train", "blip_image_eval", "blip2_image_train",
                 "clip_image_train", "blip_caption"):
        registry.get_processor_class(name)
