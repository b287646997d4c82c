"""Random (src, tgt) latent pairing for AFS training.

Capability parity with the reference ``PairLatentDataset`` (reference:
afs/pair_dataset.py:60-86 — per-item uniform target resampled until
tgt ≠ src), built TPU-side: the latent set is HBM-resident
(:class:`fer_vit_tpu.data.latent_store.LatentStore`, which also preserves
``img_path`` when packs carry them) and each step draws a batch of (src,
tgt) index pairs on device.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fer_vit_tpu.data.latent_store import LatentStore


def sample_pair_indices(key: jax.Array, n: int, batch: int
                        ) -> Tuple[jax.Array, jax.Array]:
    """(src_idx, tgt_idx) with tgt ≠ src, uniform over the other n−1 items
    (shift-by-offset trick: tgt = (src + U[1, n−1]) mod n — exactly uniform
    over non-self indices, no rejection loop)."""
    k1, k2 = jax.random.split(key)
    src = jax.random.randint(k1, (batch,), 0, n)
    offset = jax.random.randint(k2, (batch,), 1, n)
    tgt = (src + offset) % n
    return src, tgt


@dataclasses.dataclass
class PairLatentStore:
    """Latent store + optional original image paths (for DiskImageProvider)."""

    store: LatentStore
    img_paths: Optional[List[str]] = None

    def __len__(self) -> int:
        return len(self.store)

    _device_latents: Optional[jax.Array] = None

    @classmethod
    def load(cls, latent_dir: str) -> "PairLatentStore":
        store = LatentStore.load(latent_dir)
        if len(store) < 2:
            raise ValueError(
                f"Need at least 2 latents for pairing, found {len(store)}"
            )
        # LatentStore preserves source paths from BOTH formats (reference
        # per-image .pt 'img_path' and generate_latents packs' 'paths')
        paths = (list(store.img_paths)
                 if store.img_paths is not None else None)
        return cls(store, paths)

    @property
    def device_latents(self) -> jax.Array:
        """The latent matrix, uploaded to device ONCE (a per-step
        jnp.asarray would re-transfer the whole ~GB-scale set every
        step)."""
        if self._device_latents is None:
            self._device_latents = jnp.asarray(self.store.latents)
        return self._device_latents

    def sample_batch(self, key: jax.Array, batch: int):
        """→ (w_src, w_tgt, src_idx, tgt_idx) device arrays."""
        src, tgt = sample_pair_indices(key, len(self), batch)
        latents = self.device_latents
        return latents[src], latents[tgt], src, tgt
