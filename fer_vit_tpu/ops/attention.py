"""Scaled dot-product attention.

Behavioral contract mirrors ``torch.nn.MultiheadAttention`` as used by the
reference transformer stacks (reference: models_fer_vit/latent_vit.py:24-31,
models_fer_vit/image_vit.py:101-113): softmax(QKᵀ/√d)V with dropout applied
to the attention *weights*.

Sequence lengths in this workload are tiny (19–197 tokens), so the whole
score matrix fits VMEM trivially; the XLA path below compiles to fused
MXU matmuls + VPU softmax and is already near roofline at these shapes.
A Pallas flash-attention kernel (:mod:`fer_vit_tpu.ops.flash_attention`)
exists for the ImageViT 197-token path and anything longer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """Attention over (B, H, L, Dh) tensors.

    Scores and softmax are computed in f32 regardless of input dtype (bf16
    inputs hit the MXU; the softmax accumulates in f32 for stability), and
    the result is cast back to the input dtype.
    """
    dtype = q.dtype
    depth = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, jnp.float32))
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    weights = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when dropout is active")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        weights.astype(dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)

