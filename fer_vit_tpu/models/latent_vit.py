"""LatentViT — the core classifier over StyleGAN w+ codes.

Capability parity with the reference ``LatentViT`` (reference:
models_fer_vit/latent_vit.py:5-48): (B, L, 512) → Linear proj → prepend CLS
→ add learned pos-emb → depth×post-norm transformer (ReLU FFN, torch
TransformerEncoderLayer defaults) → LayerNorm + Linear head on the CLS token.

At 19 tokens the whole forward is a few MXU matmuls; under jit the entire
model fuses into one small XLA program, so per-step host overhead — not
FLOPs — is the thing to kill (the epoch-level ``lax.scan`` in
:mod:`fer_vit_tpu.train` does that).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fer_vit_tpu.nn.initializers import torch_linear_bias_init, torch_linear_kernel_init
from fer_vit_tpu.nn.transformer import TransformerEncoder


class LatentViT(nn.Module):
    # torch nn.TransformerEncoder deep-copies one layer: all layers start
    # IDENTICAL (reference latent_vit.py:24-37) — harness init reproduces
    # this via nn.transformer.clone_torch_encoder_init
    torch_clone_init = "full"
    latent_dim: int = 512
    seq_len: int = 18
    embed_dim: int = 512
    depth: int = 6
    heads: int = 8
    mlp_dim: int = 2048
    num_classes: int = 7
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        """x: (B, seq_len, latent_dim) → logits (B, num_classes)."""
        x = x.astype(self.dtype)
        x = nn.Dense(
            self.embed_dim,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(self.latent_dim),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="input_proj",
        )(x)

        b = x.shape[0]
        # torch.randn init (std=1), reference models_fer_vit/latent_vit.py:21-22.
        cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.embed_dim),
            self.param_dtype,
        )
        pos_emb = self.param(
            "pos_emb",
            nn.initializers.normal(1.0),
            (1, self.seq_len + 1, self.embed_dim),
            self.param_dtype,
        )
        cls = jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_emb.astype(self.dtype)

        x = TransformerEncoder(
            depth=self.depth,
            embed_dim=self.embed_dim,
            num_heads=self.heads,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            activation="relu",
            norm_first=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="transformer",
        )(x, deterministic=deterministic)

        cls_out = x[:, 0]
        cls_out = nn.LayerNorm(  # torch nn.LayerNorm default eps
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
            name="head_norm",
        )(cls_out)
        logits = nn.Dense(
            self.num_classes,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(self.embed_dim),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="head",
        )(cls_out)
        return logits.astype(jnp.float32)
