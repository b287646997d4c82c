"""w+ preprocessing modules: LEAM, SemanticPE, LayerWiseNorm.

Capability parity with the reference ``modules/`` package (reference:
modules/leam.py, modules/semantic_pe.py, modules/layer_wise_norm.py), built
the TPU way: LayerWiseNorm is a *single* vectorized LayerNorm with per-layer
(L, D) scale/bias instead of 18 separate module calls (reference loops over
18 ``nn.LayerNorm`` instances, modules/layer_wise_norm.py:42-45) — one fused
VPU kernel instead of 18 dispatches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# Which StyleGAN w+ layer belongs to which semantic group:
# Coarse=0 (layers 1-4, face structure), Medium=1 (5-12, expression),
# Fine=2 (13-18, texture/color). Reference: modules/semantic_pe.py:6-8.
LAYER_GROUPS = (0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2)


class LEAM(nn.Module):
    """Layer-wise Expression Attention Mask.

    A learnable scalar per w+ layer, squashed by sigmoid and multiplied in.
    Init: 1.0 for the middle (expression-bearing) layers, ``init_coarse`` /
    ``init_fine`` for layers 1-4 / 13-18 (reference: modules/leam.py:26-29).
    """

    num_layers: int = 18
    init_coarse: float = 0.5
    init_fine: float = 0.5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _init_weights(self, key, shape, dtype):
        del key
        w = jnp.ones(shape, dtype)
        w = w.at[:4].set(self.init_coarse)
        w = w.at[12:].set(self.init_fine)
        return w

    @nn.compact
    def __call__(self, w_plus: jax.Array) -> jax.Array:
        weights = self.param(
            "layer_weights", self._init_weights, (self.num_layers,), self.param_dtype
        )
        gate = jax.nn.sigmoid(weights.astype(self.dtype))
        return w_plus * gate[None, :, None]

    @staticmethod
    def get_weights(params) -> jax.Array:
        """Post-sigmoid weights for visualization (reference: modules/leam.py:42-44)."""
        return jax.nn.sigmoid(params["layer_weights"])


class SemanticPE(nn.Module):
    """Semantic positional encoding for the Coarse/Medium/Fine hierarchy.

    Adds group embedding (3×D table indexed by LAYER_GROUPS) + per-layer
    embedding (L×D) to each token (reference: modules/semantic_pe.py:36-48).
    Both tables are gathered once per forward — a constant (L, D) add.
    """

    d_model: int = 512
    num_layers: int = 18
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, w_plus: jax.Array) -> jax.Array:
        group_embed = self.param(
            "group_embed",
            nn.initializers.normal(1.0),  # torch nn.Embedding default: N(0,1)
            (3, self.d_model),
            self.param_dtype,
        )
        layer_embed = self.param(
            "layer_embed",
            nn.initializers.normal(1.0),
            (self.num_layers, self.d_model),
            self.param_dtype,
        )
        num_layers = w_plus.shape[1]
        groups = jnp.asarray(LAYER_GROUPS[:num_layers])
        pe = group_embed[groups] + layer_embed[:num_layers]
        return w_plus + pe[None].astype(self.dtype)


class LayerWiseNorm(nn.Module):
    """Independent LayerNorm per w+ layer, vectorized.

    Optional residual gate ``w + sigmoid(gate)·(norm(w) − w)`` with gate init
    −5.0 ≈ identity at start (reference: modules/layer_wise_norm.py:25-50).
    Implemented as one normalization over the last axis with per-layer
    (L, D) scale/bias — mathematically identical to the reference's 18
    separate LayerNorms, but a single fused kernel.
    """

    num_layers: int = 18
    d_model: int = 512
    use_residual: bool = False
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, w_plus: jax.Array) -> jax.Array:
        scale = self.param(
            "scale",
            nn.initializers.ones_init(),
            (self.num_layers, self.d_model),
            self.param_dtype,
        )
        bias = self.param(
            "bias",
            nn.initializers.zeros_init(),
            (self.num_layers, self.d_model),
            self.param_dtype,
        )
        x32 = w_plus.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        normed = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        normed = normed.astype(self.dtype) * scale[None].astype(self.dtype)
        normed = normed + bias[None].astype(self.dtype)

        if self.use_residual:
            gate = self.param(
                "gate",
                lambda key, shape, dtype: jnp.full(shape, -5.0, dtype),
                (self.num_layers,),
                self.param_dtype,
            )
            g = jax.nn.sigmoid(gate.astype(self.dtype))[None, :, None]
            return w_plus + g * (normed - w_plus)
        return normed
