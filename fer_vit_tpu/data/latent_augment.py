"""On-device latent-space augmentation.

Same three transforms as the reference ``LatentAugment`` (reference:
data/latent_dataset.py:6-49) — additive Gaussian noise, global scale jitter
U(min,max) per sample, per-element Bernoulli masking — but jitted and run
*inside* the training step on device (the reference runs them in CPU
DataLoader workers). One fused VPU kernel per batch, zero host work.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp  # noqa: F401  (kept: public aug API surface)


@dataclasses.dataclass(frozen=True)
class LatentAugmentConfig:
    noise_std: float = 0.0
    scale_min: float = 1.0
    scale_max: float = 1.0
    mask_prob: float = 0.0

    @property
    def enabled(self) -> bool:
        return (
            self.noise_std > 0
            or self.mask_prob > 0
            or (self.scale_min, self.scale_max) != (1.0, 1.0)
        )


def get_latent_train_transforms(
    noise_std: float = 0.1,
    scale_range=(0.9, 1.1),
    mask_prob: float = 0.1,
) -> LatentAugmentConfig:
    """Mirror of the reference factory (data/latent_dataset.py:139-152)."""
    return LatentAugmentConfig(
        noise_std=noise_std,
        scale_min=scale_range[0],
        scale_max=scale_range[1],
        mask_prob=mask_prob,
    )


def latent_augment(
    key: jax.Array, latents: jax.Array, config: LatentAugmentConfig
) -> jax.Array:
    """Augment a (B, L, D) batch. Each sample gets independent noise, its own
    global scale (the reference draws one scalar per __call__, i.e. per
    sample), and an element-wise keep mask with keep prob 1−mask_prob
    (no rescaling — matching the reference: data/latent_dataset.py:44-47)."""
    if not config.enabled:
        return latents
    b = latents.shape[0]
    k_noise, k_scale, k_mask = jax.random.split(key, 3)
    out = latents
    if config.noise_std > 0:
        out = out + config.noise_std * jax.random.normal(
            k_noise, out.shape, out.dtype
        )
    if (config.scale_min, config.scale_max) != (1.0, 1.0):
        scale = jax.random.uniform(
            k_scale, (b, 1, 1), out.dtype, config.scale_min, config.scale_max
        )
        out = out * scale
    if config.mask_prob > 0:
        keep = jax.random.uniform(k_mask, out.shape) > config.mask_prob
        out = out * keep.astype(out.dtype)
    return out
