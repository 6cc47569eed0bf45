"""Native data-plane tests: decode + preprocess parity vs the PIL host path."""

import io

import numpy as np
import pytest

pytest.importorskip("ctypes")


@pytest.fixture(scope="module")
def native():
    from sprc_tpu.data import native as n

    try:
        n.load_library()
    except Exception as e:
        pytest.skip(f"native library unavailable: {e}")
    return n


def _png_bytes(arr):
    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _jpeg_bytes(arr, quality=95):
    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_decode_png_exact(native, rng):
    arr = (rng.rand(37, 53, 3) * 255).astype(np.uint8)
    out = native.decode(_png_bytes(arr))
    np.testing.assert_array_equal(out, arr)


def test_decode_jpeg_close(native, rng):
    import PIL.Image

    arr = (rng.rand(64, 48, 3) * 255).astype(np.uint8)
    data = _jpeg_bytes(arr)
    ours = native.decode(data)
    theirs = np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))
    assert ours.shape == theirs.shape
    # libjpeg decode should match PIL's libjpeg decode bit-for-bit
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("shape", [(224, 224), (640, 480), (100, 300)])
def test_preprocess_matches_pil_path(native, shape, rng):
    import PIL.Image

    from sprc_tpu.data.transforms import targetpad_transform

    arr = (rng.rand(*shape, 3) * 255).astype(np.uint8)
    data = _png_bytes(arr)

    tfm = native.NativeTransform(dim=224, pad="target", target_ratio=1.25)
    ours = tfm(data)

    want = targetpad_transform(1.25, 224)(PIL.Image.fromarray(arr))
    assert ours.shape == want.shape
    # uint8 resample rounding differs by at most 1 step / 0.26 std
    diff = np.abs(ours - want)
    assert float(diff.max()) <= (2.0 / 255.0) / 0.26 + 1e-5, float(diff.max())
    assert float(diff.mean()) < 0.01


def test_batch_and_error_flags(native, rng):
    arrs = [(rng.rand(50, 40, 3) * 255).astype(np.uint8) for _ in range(3)]
    sources = [_png_bytes(a) for a in arrs] + [b"not an image"]
    tfm = native.NativeTransform(dim=32)
    out, ok = tfm.batch(sources)
    assert out.shape == (4, 32, 32, 3)
    assert ok.tolist() == [True, True, True, False]
    assert np.all(out[3] == 0)
    # single-path equivalence
    np.testing.assert_allclose(out[0], tfm(sources[0]), atol=0)
