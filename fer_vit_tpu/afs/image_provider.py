"""Reference-image providers for AFS training.

Capability parity with the reference (reference: afs/image_provider.py):

* :class:`GeneratedImageProvider` (strategy A) — decode the W+ latents with
  the frozen StyleGAN2 generator (domain-consistent; two extra G passes,
  reference :57-89); jitted on device.
* :class:`DiskImageProvider` (strategy B) — load the original images from
  the paths stored with each latent, with optional root remapping
  (reference :92-125); host-side decode, device normalize.

Both return (B, 256, 256, 3) NHWC tensors in [−1, 1].
"""

from __future__ import annotations

import abc
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fer_vit_tpu.encoders.stylegan2 import Generator, face_pool
from fer_vit_tpu.utils.compile_opts import tuned_jit


class ImageProvider(abc.ABC):
    @abc.abstractmethod
    def get_images(self, w_batch: jax.Array,
                   img_paths: Optional[List[str]]) -> jax.Array:
        ...


class GeneratedImageProvider(ImageProvider):
    def __init__(self, generator: Generator, variables: dict,
                 out_size: int = 256):
        self.generator = generator
        self.variables = variables

        @tuned_jit
        def _decode(variables, w):
            img, _ = generator.apply(variables, [w], input_is_latent=True,
                                     randomize_noise=False)
            return face_pool(img, out_size)

        self._decode = _decode

    def get_images(self, w_batch, img_paths=None):
        return self._decode(self.variables, w_batch)


class DiskImageProvider(ImageProvider):
    def __init__(self, img_root: Optional[str] = None, size: int = 256):
        self.img_root = img_root
        self.size = size

    def _remap(self, path: str) -> str:
        if self.img_root is None:
            return os.path.abspath(path)
        # reference semantics (afs/image_provider.py:108-113): rebuild
        # from the last TWO components — img_root/class_dir/filename —
        # so class-directory datasets resolve (and same-named files in
        # different classes cannot collide)
        parts = os.path.normpath(path).split(os.sep)
        return os.path.join(self.img_root, *parts[-2:])

    def get_images(self, w_batch, img_paths):
        from PIL import Image

        if img_paths is None:
            raise ValueError("DiskImageProvider needs img_paths "
                             "(latents must carry 'img_path')")
        imgs = np.zeros((len(img_paths), self.size, self.size, 3), np.float32)
        for i, p in enumerate(img_paths):
            # the reference raises on an unreadable path (Image.open,
            # :115-125) — a silent black frame would train L_id/L_lpips
            # against garbage with no signal
            with Image.open(self._remap(p)) as im:
                im = im.convert("RGB").resize((self.size, self.size),
                                              Image.BILINEAR)
                imgs[i] = np.asarray(im, np.float32)
        return jnp.asarray((imgs / 255.0 - 0.5) / 0.5)
