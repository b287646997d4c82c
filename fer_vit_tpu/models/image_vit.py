"""ImageViT — standard ViT trained from scratch on face images.

Capability parity with the reference ``ImageViT`` (reference:
models_fer_vit/image_vit.py:47-166): conv patch-embed, CLS token, learned
pos-emb, dropout after pos-add, post-norm GELU transformer, LN+Linear head;
trunc-normal(0.02) init on linear kernels / pos-emb / CLS
(reference :122-136). Factories mirror create_vit_tiny/small/base
(reference :169-205).

TPU-native differences: images are **NHWC** (channels-last is the TPU conv
layout — the torch reference uses NCHW); the patch embed is a
``lax.conv_general_dilated`` with stride=kernel=patch, which XLA lowers to a
single MXU matmul over im2col'd patches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fer_vit_tpu.nn.initializers import (
    torch_conv_kernel_init,
    torch_linear_bias_init,
    trunc_normal_init,
)
from fer_vit_tpu.nn.transformer import TransformerEncoder


class PatchEmbedding(nn.Module):
    """(B, H, W, C) → (B, N, embed_dim) patch tokens."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.patch_size
        # the reference's _init_weights only re-draws nn.Linear modules —
        # the patch Conv2d keeps torch conv defaults (kaiming-uniform
        # kernel, uniform bias), image_vit.py:122-136
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_linear_bias_init(3 * p * p),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)


class ImageViT(nn.Module):
    # torch deep-copies the encoder layer, then _init_weights re-draws every
    # nn.Linear independently — only the MHA in_proj (a bare Parameter)
    # stays identical across layers at init
    torch_clone_init = "in_proj"
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    num_classes: int = 7
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def n_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        """x: (B, H, W, C) image tensor (NHWC) → (B, num_classes) logits."""
        x = x.astype(self.dtype)
        x = PatchEmbedding(
            img_size=self.img_size,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embed",
        )(x)

        b = x.shape[0]
        cls_token = self.param(
            "cls_token", trunc_normal_init(0.02), (1, 1, self.embed_dim),
            self.param_dtype,
        )
        pos_embed = self.param(
            "pos_embed",
            trunc_normal_init(0.02),
            (1, self.n_patches + 1, self.embed_dim),
            self.param_dtype,
        )
        cls = jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_embed.astype(self.dtype)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)

        x = TransformerEncoder(
            depth=self.depth,
            embed_dim=self.embed_dim,
            num_heads=self.heads,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            activation="gelu",
            norm_first=False,
            # reference _init_weights: every nn.Linear (incl. the MHA
            # out_proj) trunc_normal(0.02) + zero bias
            vit_linear_init=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="transformer",
        )(x, deterministic=deterministic)

        cls_out = x[:, 0]
        cls_out = nn.LayerNorm(  # torch nn.LayerNorm default eps
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
            name="norm",
        )(cls_out)
        logits = nn.Dense(
            self.num_classes,
            kernel_init=trunc_normal_init(0.02),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="head",
        )(cls_out)
        return logits.astype(jnp.float32)


def create_vit_tiny(num_classes: int = 7, img_size: int = 224, **kw) -> ImageViT:
    """ViT-Tiny/16 (~5M params), reference models_fer_vit/image_vit.py:195-205."""
    return ImageViT(img_size=img_size, patch_size=16, embed_dim=192, depth=12,
                    heads=3, mlp_dim=768, num_classes=num_classes, **kw)


def create_vit_small(num_classes: int = 7, img_size: int = 224, **kw) -> ImageViT:
    """ViT-Small/16 (~22M params), reference models_fer_vit/image_vit.py:169-179."""
    return ImageViT(img_size=img_size, patch_size=16, embed_dim=384, depth=12,
                    heads=6, mlp_dim=1536, num_classes=num_classes, **kw)


def create_vit_base(num_classes: int = 7, img_size: int = 224, **kw) -> ImageViT:
    """ViT-Base/16 (~86M params), reference models_fer_vit/image_vit.py:182-192."""
    return ImageViT(img_size=img_size, patch_size=16, embed_dim=768, depth=12,
                    heads=12, mlp_dim=3072, num_classes=num_classes, **kw)
