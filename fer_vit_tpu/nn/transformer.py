"""Transformer encoder stack with the reference's exact semantics.

The reference uses ``torch.nn.TransformerEncoderLayer`` (reference:
models_fer_vit/latent_vit.py:24-31 — post-norm, ReLU FFN by default;
models_fer_vit/image_vit.py:101-113 — post-norm, GELU). This module
reproduces those semantics as a Flax layer:

    post-norm:  x = LN1(x + Drop(SelfAttn(x)))
                x = LN2(x + Drop(FFN(x)))
    pre-norm:   x = x + Drop(SelfAttn(LN1(x)))
                x = x + Drop(FFN(LN2(x)))

with dropout also applied to the attention weights and inside the FFN,
exactly as torch does.

TPU notes: qkv is one packed (D,3D) matmul; all matmuls run in the policy
compute dtype (bf16 on TPU) with f32 softmax/LN statistics. At 19–197
tokens the whole layer fuses into a handful of MXU ops under XLA.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from fer_vit_tpu.nn.initializers import torch_linear_bias_init, torch_linear_kernel_init
from fer_vit_tpu.ops.attention import dot_product_attention


def _activation(name: str) -> Callable[[jax.Array], jax.Array]:
    if name == "relu":
        return nn.relu
    if name == "gelu":
        # exact (erf) GELU — torch's TransformerEncoderLayer 'gelu' is exact;
        # flax's default tanh approximation differs by ~1e-4.
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"unknown activation: {name!r}")


class MultiHeadSelfAttention(nn.Module):
    """Packed-qkv self-attention matching ``torch.nn.MultiheadAttention``.

    Param layout: ``in_proj`` kernel (D, 3D) / bias (3D,), ``out_proj``
    kernel (D, D) / bias (D,). torch init: xavier-uniform in_proj, zeros
    in_proj bias, torch-Linear-default out_proj kernel, zeros out_proj bias.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        d = self.embed_dim
        in_kernel = self.param(
            "in_proj_kernel",
            nn.initializers.xavier_uniform(),
            (d, 3 * d),
            self.param_dtype,
        )
        in_bias = self.param(
            "in_proj_bias", nn.initializers.zeros_init(), (3 * d,), self.param_dtype
        )
        out_kernel = self.param(
            "out_proj_kernel", torch_linear_kernel_init, (d, d), self.param_dtype
        )
        out_bias = self.param(
            "out_proj_bias", nn.initializers.zeros_init(), (d,), self.param_dtype
        )

        b, l, _ = x.shape
        head_dim = d // self.num_heads
        qkv = x @ in_kernel.astype(self.dtype) + in_bias.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, l, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        rng = None
        dropout_active = self.dropout > 0.0 and not deterministic
        if dropout_active:
            rng = self.make_rng("dropout")
        if not dropout_active and l >= 128 and jax.default_backend() == "tpu":
            # Pallas fused kernel: keeps the (L, L) scores in VMEM
            # (fer_vit_tpu.ops.flash_attention; parity-tested vs this path).
            from fer_vit_tpu.ops.flash_attention import fused_attention

            out = fused_attention(split_heads(q), split_heads(k),
                                  split_heads(v))
        else:
            out = dot_product_attention(
                split_heads(q),
                split_heads(k),
                split_heads(v),
                dropout_rate=self.dropout,
                dropout_rng=rng,
                deterministic=deterministic,
            )
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return out @ out_kernel.astype(self.dtype) + out_bias.astype(self.dtype)


class TransformerEncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_dim: int
    dropout: float = 0.1
    activation: str = "relu"
    norm_first: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        act = _activation(self.activation)
        attn = MultiHeadSelfAttention(
            self.embed_dim,
            self.num_heads,
            dropout=self.dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="self_attn",
        )
        # torch TransformerEncoderLayer layer_norm_eps default is 1e-5
        # (flax defaults to 1e-6 — a real, if tiny, parity gap)
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm2")
        linear1 = nn.Dense(
            self.mlp_dim,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(self.embed_dim),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear1",
        )
        linear2 = nn.Dense(
            self.embed_dim,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(self.mlp_dim),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear2",
        )
        drop = nn.Dropout(self.dropout, deterministic=deterministic)

        def ffn(h):
            return linear2(drop(act(linear1(h))))

        if self.norm_first:
            x = x + drop(attn(norm1(x), deterministic=deterministic))
            x = x + drop(ffn(norm2(x)))
        else:
            x = norm1(x + drop(attn(x, deterministic=deterministic)))
            x = norm2(x + drop(ffn(x)))
        return x


class TransformerEncoder(nn.Module):
    """Stack of identical encoder layers (reference: nn.TransformerEncoder)."""

    depth: int
    embed_dim: int
    num_heads: int
    mlp_dim: int
    dropout: float = 0.1
    activation: str = "relu"
    norm_first: bool = False
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        layer_cls = TransformerEncoderLayer
        if self.remat:
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=())
        for i in range(self.depth):
            x = layer_cls(
                self.embed_dim,
                self.num_heads,
                self.mlp_dim,
                dropout=self.dropout,
                activation=self.activation,
                norm_first=self.norm_first,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )(x, deterministic=deterministic)
        return x
