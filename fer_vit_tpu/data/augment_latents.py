"""Offline semantic latent augmentation along SeFa directions.

Capability parity with the reference ``augment_latents_with_directions``
(reference: data/augment_latents.py:8-77): for each latent emit
``w + step·direction`` for every selected direction × step size, preserving
the label, keeping the originals, idempotently.

TPU-native: the reference loops file-by-file in Python; here the whole
augmentation is ONE broadcast add on device —

    aug[n,k,s] = w[n] + steps[s] · dirs[k]     (N·K·S new samples)

— and the result is written as a sharded .npz pack. An online variant
(:func:`online_direction_augment`) applies the same perturbation inside the
training step instead of materializing files.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fer_vit_tpu.data.latent_store import LatentStore

DEFAULT_STEPS = (-2.0, -1.0, 1.0, 2.0)


def augment_latents_array(
    latents: np.ndarray,  # (N, L, D)
    directions: np.ndarray,  # (K, D) — per-layer-broadcast, as the reference
    step_sizes: Sequence[float] = DEFAULT_STEPS,
) -> np.ndarray:
    """(N, L, D) → (N, K, S, L, D) augmented latents, one fused XLA op."""
    w = jnp.asarray(latents)  # (N, L, D)
    d = jnp.asarray(np.asarray(directions, np.float32))  # (K, D)
    s = jnp.asarray(np.asarray(step_sizes, np.float32))  # (S,)
    # broadcast: (N,1,1,L,D) + (1,K,S,1,D)
    aug = w[:, None, None] + (s[None, :, None] * d[:, None, :])[None, :, :, None, :]
    return np.asarray(aug)


def online_direction_augment(
    key: jax.Array,
    latents: jax.Array,  # (B, L, D)
    directions: jax.Array,  # (K, D)
    step_sizes: Sequence[float] = DEFAULT_STEPS,
    prob: float = 0.5,
) -> jax.Array:
    """In-step variant: each sample gets, with probability ``prob``, one
    random (direction, step) perturbation — no offline files at all."""
    b = latents.shape[0]
    k_dir, k_step, k_apply = jax.random.split(key, 3)
    steps = jnp.asarray(np.asarray(step_sizes, np.float32))
    dir_idx = jax.random.randint(k_dir, (b,), 0, directions.shape[0])
    step_idx = jax.random.randint(k_step, (b,), 0, steps.shape[0])
    apply = jax.random.bernoulli(k_apply, prob, (b,))
    delta = steps[step_idx][:, None] * directions[dir_idx]  # (B, D)
    delta = jnp.where(apply[:, None], delta, 0.0)
    return latents + delta[:, None, :].astype(latents.dtype)


def augment_latents_with_directions(
    latent_dir: str,
    output_dir: str,
    directions: np.ndarray,  # (K_total, D)
    direction_indices: List[int],
    step_sizes: Sequence[float] = DEFAULT_STEPS,
) -> int:
    """File-level API matching the reference's signature: read latents from
    ``latent_dir`` (any LatentStore-supported format), write originals +
    augmented samples to ``output_dir`` as packs. Idempotent: skips if the
    output pack already exists. Returns total sample count."""
    os.makedirs(output_dir, exist_ok=True)
    out_pack = os.path.join(output_dir, "latents_pack_augmented.npz")
    if os.path.exists(out_pack):
        with np.load(out_pack) as data:
            n = data["labels"].shape[0]
        print(f"augmented pack already exists ({n} samples); skipping")
        return n

    store = LatentStore.load(latent_dir)
    selected = np.asarray(directions, np.float32)[list(direction_indices)]
    aug = augment_latents_array(store.latents, selected, step_sizes)
    n, k, s = aug.shape[:3]
    aug_flat = aug.reshape(n * k * s, *aug.shape[3:])
    aug_labels = np.repeat(store.labels, k * s)

    all_latents = np.concatenate([store.latents, aug_flat])
    all_labels = np.concatenate([store.labels, aug_labels])
    np.savez(out_pack, latents=all_latents.astype(np.float32),
             labels=all_labels.astype(np.int32))
    total = all_labels.shape[0]
    print(f"original {len(store)} + augmented {n * k * s} = {total} samples")
    print(f"output: {out_pack}")
    return total
