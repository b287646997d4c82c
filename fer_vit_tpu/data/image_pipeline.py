"""Image data pipeline: HBM-resident uint8 store + on-device augmentation.

Capability parity with the reference image path (reference:
data/image_dataset.py — class-dir FER2013 images, ImageNet normalization;
train augs at :139-161: horizontal flip, ±15° rotation, color jitter
(0.2/0.2/0.2/0.1), affine translate ±0.1 / scale 0.9–1.1; corrupt-file →
black-image fallback at :125-130), rebuilt TPU-first:

* the whole dataset is decoded ONCE on the host into a uint8 array and kept
  device-resident; epochs never touch host I/O (torchvision CPU-worker
  transforms become one fused jitted function on device);
* rotation + translate + scale compose into a single affine warp (one
  bilinear gather instead of two sequential interpolations);
* color jitter runs in RGB with the standard grayscale/YIQ identities
  (fixed order brightness→contrast→saturation→hue; the reference's
  torchvision version randomizes the order — a statistical, not semantic,
  difference);
* normalization = ImageNet mean/std, f32 (or bf16) output NHWC.
"""

from __future__ import annotations

import dataclasses
import os
from collections import Counter
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fer_vit_tpu import EMOTION_TO_INDEX

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)
IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


@dataclasses.dataclass
class ImageStore:
    """uint8 (N, H, W, 3) images + int32 labels, ready for device residence."""

    images: np.ndarray
    labels: np.ndarray

    def __len__(self) -> int:
        return self.images.shape[0]

    def get_class_counts(self) -> Dict[int, int]:
        return dict(sorted(Counter(self.labels.tolist()).items()))

    def class_weights(self, num_classes: int = 7) -> np.ndarray:
        counts = Counter(self.labels.tolist())
        total = len(self)
        return np.asarray(
            [total / (num_classes * counts[i]) if counts.get(i) else 1.0
             for i in range(num_classes)], np.float32)

    def balanced_subset_indices(self, fraction: float, seed: int = 42) -> np.ndarray:
        if fraction >= 1.0:
            return np.arange(len(self))
        selected: List[int] = []
        for class_id in sorted(set(self.labels.tolist())):
            indices = np.nonzero(self.labels == class_id)[0]
            n_select = max(1, int(len(indices) * fraction))
            rng = np.random.RandomState(seed)
            selected.extend(rng.choice(indices, n_select, replace=False))
        return np.asarray(sorted(selected), dtype=np.int64)

    def subset(self, indices: np.ndarray) -> "ImageStore":
        return ImageStore(self.images[indices], self.labels[indices])

    @classmethod
    def load(cls, data_root: str, img_size: int = 224,
             use_native: Optional[bool] = None) -> "ImageStore":
        """Decode a class-dir image tree once into a uint8 array.

        Decodes with the native C++ thread-pool decoder
        (:mod:`fer_vit_tpu.data.native_decode`) when it is available
        (±1 gray level vs PIL, parity-tested), else per-file PIL."""
        paths: List[Tuple[str, int]] = []
        for cls_name, label in sorted(EMOTION_TO_INDEX.items(),
                                      key=lambda kv: kv[1]):
            cls_dir = os.path.join(data_root, cls_name)
            if not os.path.isdir(cls_dir):
                continue
            for fname in sorted(os.listdir(cls_dir)):
                if fname.lower().endswith(IMAGE_EXTS):
                    paths.append((os.path.join(cls_dir, fname), label))
        if not paths:
            raise ValueError(f"No images found in {data_root}")

        labels = np.asarray([label for _, label in paths], np.int32)

        from fer_vit_tpu.data import native_decode

        if use_native is None:
            use_native = native_decode.available()
        if use_native:
            images = native_decode.decode_batch(
                [p for p, _ in paths], img_size)
        else:
            from PIL import Image

            images = np.zeros((len(paths), img_size, img_size, 3), np.uint8)
            for i, (p, _) in enumerate(paths):
                try:
                    with Image.open(p) as im:
                        im = im.convert("RGB").resize(
                            (img_size, img_size), Image.BILINEAR)
                        images[i] = np.asarray(im, np.uint8)
                except Exception:
                    pass  # black-image fallback (reference :125-130)
        print(f"Loaded {len(paths)} images from {data_root}"
              f" ({'native' if use_native else 'PIL'} decode)")
        return cls(images, labels)


@dataclasses.dataclass(frozen=True)
class ImageAugmentConfig:
    """Reference train transforms (data/image_dataset.py:139-161)."""

    horizontal_flip: float = 0.5
    rotation_degrees: float = 15.0
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2
    hue: float = 0.1
    translate: float = 0.1
    scale_min: float = 0.9
    scale_max: float = 1.1


def _affine_warp(images: jax.Array, angle: jax.Array, tx: jax.Array,
                 ty: jax.Array, scale: jax.Array) -> jax.Array:
    """Per-sample inverse-mapped affine warp with bilinear sampling, zero
    fill. images (B, H, W, C) f32; angle radians; tx/ty in pixels; scale
    scalar per sample."""
    b, h, w, c = images.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None] - cy  # (1,H,1)
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :] - cx  # (1,1,W)

    cos = jnp.cos(angle)[:, None, None]
    sin = jnp.sin(angle)[:, None, None]
    inv_s = 1.0 / scale[:, None, None]
    # inverse transform: rotate by −angle, scale by 1/s, shift by −t
    src_x = (cos * (xx - tx[:, None, None]) + sin * (yy - ty[:, None, None])) * inv_s + cx
    src_y = (-sin * (xx - tx[:, None, None]) + cos * (yy - ty[:, None, None])) * inv_s + cy

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = (src_x - x0)[..., None]
    wy = (src_y - y0)[..., None]

    def gather(yi, xi):
        yi_c = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        xi_c = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        batch_idx = jnp.arange(b)[:, None, None]
        vals = images[batch_idx, yi_c, xi_c]  # (B,H,W,C)
        valid = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
        return vals * valid[..., None].astype(images.dtype)

    out = (
        gather(y0, x0) * (1 - wy) * (1 - wx)
        + gather(y0, x0 + 1) * (1 - wy) * wx
        + gather(y0 + 1, x0) * wy * (1 - wx)
        + gather(y0 + 1, x0 + 1) * wy * wx
    )
    return out


def _rgb_to_gray(x: jax.Array) -> jax.Array:
    coef = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.sum(x * coef, axis=-1, keepdims=True)


def _adjust_hue(x: jax.Array, factor: jax.Array) -> jax.Array:
    """Hue rotation via the YIQ identity (factor in turns, ±0.5 max)."""
    theta = (factor * 2.0 * jnp.pi)[:, None, None, None]
    # RGB → YIQ
    y = _rgb_to_gray(x)
    i = (0.596 * x[..., 0:1] - 0.274 * x[..., 1:2] - 0.322 * x[..., 2:3])
    q = (0.211 * x[..., 0:1] - 0.523 * x[..., 1:2] + 0.312 * x[..., 2:3])
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    i2 = i * cos - q * sin
    q2 = i * sin + q * cos
    r = y + 0.956 * i2 + 0.621 * q2
    g = y - 0.272 * i2 - 0.647 * q2
    b = y - 1.106 * i2 + 1.703 * q2
    return jnp.clip(jnp.concatenate([r, g, b], axis=-1), 0.0, 1.0)


def image_augment(
    key: jax.Array,
    images: jax.Array,  # uint8 or f32 (B, H, W, 3)
    config: ImageAugmentConfig,
    out_size: Optional[int] = None,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Full train-time augmentation + ImageNet normalization, jitted."""
    b = images.shape[0]
    x = images.astype(jnp.float32) / (255.0 if images.dtype == jnp.uint8 else 1.0)
    keys = jax.random.split(key, 8)

    # horizontal flip
    flip = jax.random.bernoulli(keys[0], config.horizontal_flip, (b,))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)

    # rotation + translate + scale as one warp
    h, w = x.shape[1], x.shape[2]
    deg = config.rotation_degrees
    angle = jax.random.uniform(keys[1], (b,), minval=-deg, maxval=deg) * (
        jnp.pi / 180.0)
    tx = jax.random.uniform(keys[2], (b,), minval=-config.translate,
                            maxval=config.translate) * w
    ty = jax.random.uniform(keys[3], (b,), minval=-config.translate,
                            maxval=config.translate) * h
    scale = jax.random.uniform(keys[4], (b,), minval=config.scale_min,
                               maxval=config.scale_max)
    x = _affine_warp(x, angle, tx, ty, scale)

    # color jitter
    if config.brightness > 0:
        f = jax.random.uniform(keys[5], (b, 1, 1, 1),
                               minval=1 - config.brightness,
                               maxval=1 + config.brightness)
        x = jnp.clip(x * f, 0.0, 1.0)
    if config.contrast > 0:
        f = jax.random.uniform(keys[6], (b, 1, 1, 1),
                               minval=1 - config.contrast,
                               maxval=1 + config.contrast)
        mean_gray = jnp.mean(_rgb_to_gray(x), axis=(1, 2, 3),
                             keepdims=True)
        x = jnp.clip((x - mean_gray) * f + mean_gray, 0.0, 1.0)
    if config.saturation > 0:
        f = jax.random.uniform(keys[7], (b, 1, 1, 1),
                               minval=1 - config.saturation,
                               maxval=1 + config.saturation)
        gray = _rgb_to_gray(x)
        x = jnp.clip((x - gray) * f + gray, 0.0, 1.0)
    if config.hue > 0:
        k_hue = jax.random.fold_in(key, 99)
        f = jax.random.uniform(k_hue, (b,), minval=-config.hue,
                               maxval=config.hue)
        x = _adjust_hue(x, f)

    return normalize_images(x, out_size=out_size, dtype=dtype,
                            already_01=True)


def normalize_images(
    images: jax.Array,
    out_size: Optional[int] = None,
    dtype: jnp.dtype = jnp.float32,
    already_01: bool = False,
) -> jax.Array:
    """Eval-time transform: resize + ImageNet normalize (reference
    get_val_transforms, data/image_dataset.py:164-172)."""
    x = images.astype(jnp.float32)
    if not already_01:
        x = x / (255.0 if images.dtype == jnp.uint8 else 1.0)
    if out_size is not None and (x.shape[1] != out_size or x.shape[2] != out_size):
        x = jax.image.resize(x, (x.shape[0], out_size, out_size, x.shape[3]),
                             method=jax.image.ResizeMethod.LINEAR)
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.astype(dtype)


def get_train_transforms(img_size: int = 224) -> ImageAugmentConfig:
    """Mirror of reference get_train_transforms (image_dataset.py:139-161)."""
    del img_size  # size is applied at store/normalize time
    return ImageAugmentConfig()


def get_val_transforms(img_size: int = 224) -> None:
    del img_size
    return None
