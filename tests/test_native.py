"""Native JPEG decoder tests: accuracy vs the PIL parity path, fallbacks."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from uml_tpu import native
from uml_tpu.data.transforms import load_uint8


def _photo_jpeg(h=375, w=500, quality=85):
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack([
        128 + 100 * np.sin(xx / 40) * np.cos(yy / 60),
        128 + 80 * np.cos(xx / 25),
        128 + 90 * np.sin(yy / 35),
    ], -1).clip(0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


needs_native = pytest.mark.skipif(not native.native_available(),
                                  reason="no g++/libjpeg")


@needs_native
def test_native_close_to_pil():
    jpeg = _photo_jpeg()
    out = native.fast_decode_jpeg(jpeg)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8
    ref = load_uint8(Image.open(io.BytesIO(jpeg)))
    diff = np.abs(out.astype(int) - ref.astype(int))
    # IDCT-scaled decode differs slightly from full-decode+bicubic
    assert diff.mean() < 3.0
    assert np.percentile(diff, 99) < 16


@needs_native
@pytest.mark.parametrize("hw", [(224, 224), (224, 500), (500, 224), (64, 64)])
def test_native_shapes(hw):
    jpeg = _photo_jpeg(*hw)
    out = native.fast_decode_jpeg(jpeg, 224)
    assert out.shape == (224, 224, 3)


@needs_native
def test_native_rejects_garbage():
    with pytest.raises(RuntimeError):
        native.fast_decode_jpeg(b"not a jpeg at all")


@needs_native
def test_loader_uses_native_and_falls_back(tmp_path):
    from uml_tpu.data.loader import ImageBatchLoader

    jpeg_path = tmp_path / "a.jpg"
    jpeg_path.write_bytes(_photo_jpeg())
    png_path = tmp_path / "b.png"  # native can't decode -> PIL fallback
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(png_path)

    items = [{"impath": str(jpeg_path), "label": 0},
             {"impath": str(png_path), "label": 1}]
    loader = ImageBatchLoader(items, "crop", batch_size=2, num_workers=1)
    assert loader._native is not None
    imgs, labels, paths = next(iter(loader))
    assert imgs.shape == (2, 224, 224, 3)
    assert labels.tolist() == [0, 1]
    # augmented loaders must NOT use the native center-crop path
    aug = ImageBatchLoader(items, "randomcrop", batch_size=2)
    assert aug._native is None
