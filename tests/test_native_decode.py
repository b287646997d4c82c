"""Native C++ batch decoder (fer_vit_tpu/native_src/decode.cpp) parity vs PIL."""

import os

import numpy as np
import pytest

from fer_vit_tpu.data import native_decode as nd

pytestmark = pytest.mark.skipif(
    not nd.available(), reason="native decoder toolchain unavailable")


def _write_images(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i, (size, fmt) in enumerate(
            [(48, "PNG"), (48, "JPEG"), (100, "PNG"), (300, "JPEG"),
             (256, "PNG"), (64, "PNG")]):
        base = rng.integers(0, 255, size=(8, 8, 3), dtype=np.uint8)
        img = Image.fromarray(base).resize((size, size), Image.BILINEAR)
        p = str(tmp_path / f"im{i}.{fmt.lower()}")
        img.save(p, fmt)
        paths.append(p)
    # grayscale input (the reference's grayscale→RGB case)
    g = Image.fromarray(rng.integers(0, 255, size=(48, 48), dtype=np.uint8),
                        mode="L")
    p = str(tmp_path / "gray.png")
    g.save(p)
    paths.append(p)
    return paths


def test_matches_pil_within_one_level(tmp_path):
    from PIL import Image

    paths = _write_images(tmp_path)
    out = nd.decode_batch(paths, 256)
    assert out.shape == (len(paths), 256, 256, 3)
    for i, p in enumerate(paths):
        with Image.open(p) as im:
            ref = np.asarray(im.convert("RGB").resize((256, 256),
                                                      Image.BILINEAR),
                             np.uint8)
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert diff.max() <= 2, (p, diff.max())


def test_no_resize_is_exact(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    p = str(tmp_path / "exact.png")
    Image.fromarray(arr).save(p)
    out = nd.decode_batch([p], 64)
    np.testing.assert_array_equal(out[0], arr)


def test_corrupt_file_black_fallback(tmp_path):
    p = str(tmp_path / "corrupt.jpg")
    with open(p, "wb") as f:
        f.write(b"\xff\xd8not really a jpeg")
    out = nd.decode_batch([p], 32)
    assert out.sum() == 0


def test_mixed_formats_route_unsupported_to_pil(tmp_path):
    """IMAGE_EXTS admits .bmp/.webp, which the C++ decoder does not
    recognize — decode_batch must route them to PIL inside the same
    call, never black-fill them (regression: early version returned
    all-black for every non-JPEG/PNG file)."""
    from PIL import Image

    rng = np.random.default_rng(2)
    paths = []
    for ext, fmt in [("png", "PNG"), ("bmp", "BMP"), ("webp", "WEBP"),
                     ("jpg", "JPEG")]:
        arr = rng.integers(30, 225, size=(40, 40, 3), dtype=np.uint8)
        p = str(tmp_path / f"mixed.{ext}")
        Image.fromarray(arr).save(p, fmt)
        paths.append(p)
    out = nd.decode_batch(paths, 32)
    for i, p in enumerate(paths):
        assert out[i].sum() > 0, f"{p} decoded black"
        with Image.open(p) as im:
            ref = np.asarray(im.convert("RGB").resize((32, 32),
                                                      Image.BILINEAR),
                             np.uint8)
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        # PIL-routed rows are exact; native rows within the usual ±2
        assert diff.max() <= 2, (p, diff.max())


def test_image_store_native_matches_pil(tmp_path):
    from fer_vit_tpu.data.image_pipeline import ImageStore
    from tests.test_image_pipeline import _make_image_tree

    _make_image_tree(tmp_path)
    s_native = ImageStore.load(str(tmp_path), img_size=32, use_native=True)
    s_pil = ImageStore.load(str(tmp_path), img_size=32, use_native=False)
    np.testing.assert_array_equal(s_native.labels, s_pil.labels)
    diff = np.abs(s_native.images.astype(int) - s_pil.images.astype(int))
    assert diff.max() <= 2


def test_misextensioned_content_retries_with_pil(tmp_path):
    """A .jpg whose BYTES are WebP (mislabeled download) fails the native
    magic check — the batch must PIL-retry such files, not black-fill
    them (the failure count alone doesn't say which file failed, so the
    native subset is re-decoded with PIL on any failure)."""
    from PIL import Image

    rng = np.random.default_rng(5)
    good = rng.integers(30, 225, size=(40, 40, 3), dtype=np.uint8)
    p_good = str(tmp_path / "good.jpg")
    Image.fromarray(good).save(p_good, "JPEG")
    sneaky = rng.integers(30, 225, size=(40, 40, 3), dtype=np.uint8)
    p_webp = str(tmp_path / "really_webp.jpg")
    Image.fromarray(sneaky).save(p_webp, "WEBP")  # webp bytes, .jpg name

    out = nd.decode_batch([p_good, p_webp], 32)
    assert out[0].sum() > 0
    assert out[1].sum() > 0, "mislabeled webp black-filled instead of PIL retry"
    with Image.open(p_webp) as im:
        ref = np.asarray(im.convert("RGB").resize((32, 32), Image.BILINEAR),
                         np.uint8)
    assert np.array_equal(out[1], ref)  # PIL-retried rows are exact
