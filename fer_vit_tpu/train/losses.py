"""Cross-entropy with torch's exact class-weight + label-smoothing semantics.

The reference trains with ``nn.CrossEntropyLoss(weight=class_weights,
label_smoothing=s)`` (reference: train/train_latent_vit.py:248-253). Torch's
mean reduction with class weights normalizes by Σᵢ w_{yᵢ} (not batch size),
and with smoothing the per-sample loss is

    (1−s)·w_{yᵢ}·(−log p_{yᵢ})  +  s·(−Σ_c w_c·log p_c)/C

with the same Σ w_{yᵢ} normalizer for both terms. These functions return the
(numerator, denominator) pair so callers can combine mixup terms and padding
masks before dividing — exactly reproducing the reference's loss values.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cross_entropy_parts(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
    label_smoothing: float = 0.0,
    sample_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (weighted loss sum, weight sum) over the batch.

    ``sample_mask`` zeroes padded samples (the epoch scan pads the last
    batch to a static shape).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]  # (B,)

    if class_weights is None:
        w = jnp.ones_like(nll)
    else:
        w = class_weights[labels].astype(jnp.float32)

    if label_smoothing > 0.0:
        c = logits.shape[-1]
        if class_weights is None:
            smooth = -jnp.sum(logp, axis=-1) / c
        else:
            smooth = -jnp.sum(logp * class_weights[None, :], axis=-1) / c
        per_sample = (1.0 - label_smoothing) * w * nll + label_smoothing * smooth
    else:
        per_sample = w * nll

    if sample_mask is not None:
        m = sample_mask.astype(jnp.float32)
        per_sample = per_sample * m
        w = w * m
    return jnp.sum(per_sample), jnp.sum(w)


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
    label_smoothing: float = 0.0,
    sample_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Torch-equivalent mean-reduced cross entropy."""
    num, den = cross_entropy_parts(
        logits, labels, class_weights, label_smoothing, sample_mask
    )
    return num / jnp.maximum(den, 1e-12)


def mixup_cross_entropy(
    logits: jax.Array,
    labels_a: jax.Array,
    labels_b: jax.Array,
    lam: jax.Array,
    class_weights: Optional[jax.Array] = None,
    label_smoothing: float = 0.0,
    sample_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """lam·CE(y_a) + (1−lam)·CE(y_b) (reference: train_latent_vit.py:131)."""
    la = cross_entropy(logits, labels_a, class_weights, label_smoothing, sample_mask)
    lb = cross_entropy(logits, labels_b, class_weights, label_smoothing, sample_mask)
    return lam * la + (1.0 - lam) * lb
