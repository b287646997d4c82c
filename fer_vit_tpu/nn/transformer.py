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
    # the reference ImageViT's _init_weights re-draws the MHA out_proj (an
    # nn.Linear) trunc_normal(0.02); in_proj_weight is a bare Parameter and
    # keeps torch MHA's xavier init either way
    vit_linear_init: bool = False
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
        if self.vit_linear_init:
            from fer_vit_tpu.nn.initializers import trunc_normal_init

            out_kernel_init = trunc_normal_init(0.02)
        else:
            out_kernel_init = torch_linear_kernel_init
        out_kernel = self.param(
            "out_proj_kernel", out_kernel_init, (d, d), self.param_dtype
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
    # True → the reference ImageViT's _init_weights pass (image_vit.py:
    # 122-136): every nn.Linear (linear1/2 AND the MHA out_proj) re-drawn
    # trunc_normal(0.02) with zero bias. False → torch
    # TransformerEncoderLayer defaults (LatentViT never re-inits).
    vit_linear_init: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # NOTE: deterministic is deliberately positional-capable — the
        # remat path marks it static (static_argnums), which jax cannot
        # do for keyword arguments.
        act = _activation(self.activation)
        attn = MultiHeadSelfAttention(
            self.embed_dim,
            self.num_heads,
            dropout=self.dropout,
            vit_linear_init=self.vit_linear_init,
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
        if self.vit_linear_init:
            from fer_vit_tpu.nn.initializers import trunc_normal_init

            k1 = k2 = trunc_normal_init(0.02)
            b1 = b2 = nn.initializers.zeros_init()
        else:
            k1 = k2 = torch_linear_kernel_init
            b1 = torch_linear_bias_init(self.embed_dim)
            b2 = torch_linear_bias_init(self.mlp_dim)
        linear1 = nn.Dense(
            self.mlp_dim,
            kernel_init=k1,
            bias_init=b1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear1",
        )
        linear2 = nn.Dense(
            self.embed_dim,
            kernel_init=k2,
            bias_init=b2,
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
    vit_linear_init: bool = False
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        layer_cls = TransformerEncoderLayer
        if self.remat:
            # deterministic reaches the layer positionally: it drives
            # Python control flow (dropout branches), so jax.checkpoint
            # must treat it as static — (self, x, deterministic) → 2
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(2,))
        for i in range(self.depth):
            x = layer_cls(
                self.embed_dim,
                self.num_heads,
                self.mlp_dim,
                dropout=self.dropout,
                activation=self.activation,
                norm_first=self.norm_first,
                vit_linear_init=self.vit_linear_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )(x, deterministic)
        return x


def clone_torch_encoder_init(params, mode: str = "full"):
    """Reproduce torch ``nn.TransformerEncoder``'s deep-copy init quirk on
    a freshly-initialized params tree: torch clones ONE encoder layer, so
    all layers start IDENTICAL (reference latent_vit.py:24-37). The
    reference ImageViT then re-draws every nn.Linear independently
    (_init_weights), leaving only the MHA in_proj — a bare Parameter —
    identical across layers (mode="in_proj").

    Walks the tree, finds any node holding ``layers_{i}`` siblings, and
    copies the relevant leaves of ``layers_0`` into the others. Forward /
    converted-weight parity is unaffected; this matches the NATIVE-init
    joint distribution the ±0.5% val-acc target is raced on.
    """
    import re

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {k: walk(v) for k, v in node.items()}
        names = sorted(k for k in out if re.fullmatch(r"layers_\d+", k))
        if "layers_0" in out and len(names) > 1:
            src = out["layers_0"]
            for k in names:
                if k == "layers_0":
                    continue
                # REAL copies, not aliases: the train step donates param
                # buffers, and two leaves sharing one buffer trip XLA's
                # "donate the same buffer twice" check
                if mode == "full":
                    out[k] = jax.tree_util.tree_map(
                        lambda v: jnp.array(v, copy=True), src)
                else:  # "in_proj"
                    layer = dict(out[k])
                    sa = dict(layer["self_attn"])
                    sa["in_proj_kernel"] = jnp.array(
                        src["self_attn"]["in_proj_kernel"], copy=True)
                    layer["self_attn"] = sa
                    out[k] = layer
        return out

    return walk(params)
