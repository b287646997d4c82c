"""HybridLatentViT — a pretrained (timm-style) ViT trunk over latent tokens.

Capability parity with the reference ``HybridLatentViT`` (reference:
models_fer_vit/hybrid_latent_vit.py:18-246): project the (B, 18, 512)
latent to the trunk's embed dim, prepend the pretrained CLS token, add a
pos-emb linearly interpolated from the pretrained 196-token table to 18
tokens (reference :118-156), run the 12 pre-norm ViT blocks (timm ``Block``
semantics), optionally insert per-block adapters x + α·MLP(x) with α
init 0.1 (reference :249-265), and classify with LN+Dropout+Linear.

TPU-native design decisions:

* Freezing is **not** mutation of requires_grad — it is an optax
  ``multi_transform`` mask produced by :func:`trainable_mask`; the forward
  is identical, only the update rule differs (and XLA DCEs the frozen
  branches of the backward pass).
* Pretrained timm weights arrive as a converted ``.npz`` pytree (the image
  has no timm and no network; :mod:`fer_vit_tpu.encoders.convert_timm`
  writes the file on a machine that has them). Without a weights file the
  trunk initializes randomly with the timm init scheme — same architecture,
  ``use_pretrained=False`` semantics.
* Pos-emb interpolation is ``jax.image.resize(method='linear')``
  (half-pixel centers == torch ``align_corners=False``).
"""

from __future__ import annotations

from typing import Any, Dict, Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fer_vit_tpu.nn.initializers import (
    torch_linear_bias_init,
    torch_linear_kernel_init,
    trunc_normal_init,
)
from fer_vit_tpu.ops.attention import dot_product_attention

ModelSize = Literal["tiny", "small", "base"]

# timm vit_{tiny,small,base}_patch16_224 trunk dims.
TIMM_VIT_CONFIGS: Dict[str, Dict[str, int]] = {
    "tiny": dict(embed_dim=192, depth=12, num_heads=3, mlp_dim=768),
    "small": dict(embed_dim=384, depth=12, num_heads=6, mlp_dim=1536),
    "base": dict(embed_dim=768, depth=12, num_heads=12, mlp_dim=3072),
}


class TimmAttention(nn.Module):
    """timm ViT attention: packed qkv Dense + output proj, pre-norm caller."""

    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, l, d = x.shape
        head_dim = d // self.num_heads
        qkv = nn.Dense(
            3 * d, kernel_init=trunc_normal_init(0.02),
            dtype=self.dtype, param_dtype=self.param_dtype, name="qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, l, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        out = dot_product_attention(split_heads(q), split_heads(k), split_heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(
            d, kernel_init=trunc_normal_init(0.02),
            dtype=self.dtype, param_dtype=self.param_dtype, name="proj",
        )(out)


class TimmBlock(nn.Module):
    """Pre-norm transformer block matching timm ``Block``:
    x = x + attn(norm1(x)); x = x + mlp(norm2(x)) with GELU MLP."""

    embed_dim: int
    num_heads: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        x = x + TimmAttention(
            self.embed_dim, self.num_heads,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
        )(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(x)
        h = nn.Dense(self.mlp_dim, kernel_init=trunc_normal_init(0.02),
                     dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)  # timm uses exact GELU
        h = nn.Dense(self.embed_dim, kernel_init=trunc_normal_init(0.02),
                     dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(h)
        return x + h


class AdapterModule(nn.Module):
    """x + α·MLP(x), α init 0.1 (reference: hybrid_latent_vit.py:249-265)."""

    embed_dim: int
    adapter_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # reference adapters are bare nn.Linear modules — torch defaults
        # (kaiming-uniform kernel, uniform bias), NOT flax/timm init; they
        # are the only trained params in the 'adapter' strategy
        h = nn.Dense(self.adapter_dim,
                     kernel_init=torch_linear_kernel_init,
                     bias_init=torch_linear_bias_init(self.embed_dim),
                     dtype=self.dtype,
                     param_dtype=self.param_dtype, name="down")(x)
        h = nn.gelu(h, approximate=False)  # timm uses exact GELU
        h = nn.Dense(self.embed_dim,
                     kernel_init=torch_linear_kernel_init,
                     bias_init=torch_linear_bias_init(self.adapter_dim),
                     dtype=self.dtype,
                     param_dtype=self.param_dtype, name="up")(h)
        alpha = self.param(
            "alpha", lambda k, s, d: jnp.full(s, 0.1, d), (1,), self.param_dtype
        )
        return x + alpha.astype(self.dtype) * h


class HybridLatentViT(nn.Module):
    latent_dim: int = 512
    seq_len: int = 18
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_dim: int = 1536
    num_classes: int = 7
    adapter_dim: Optional[int] = None
    head_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def use_adapter(self) -> bool:
        return self.adapter_dim is not None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = x.astype(self.dtype)
        # reference input_proj / head are bare nn.Linear (torch defaults),
        # hybrid_latent_vit.py:82,110-114 — only the timm trunk uses
        # trunc-normal init
        x = nn.Dense(
            self.embed_dim, kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(self.latent_dim),
            dtype=self.dtype, param_dtype=self.param_dtype, name="input_proj",
        )(x)
        b = x.shape[0]
        cls_token = self.param(
            "cls_token", trunc_normal_init(0.02), (1, 1, self.embed_dim),
            self.param_dtype,
        )
        pos_embed = self.param(
            "pos_embed", trunc_normal_init(0.02),
            (1, self.seq_len + 1, self.embed_dim), self.param_dtype,
        )
        cls = jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1) + pos_embed.astype(self.dtype)

        for i in range(self.depth):
            x = TimmBlock(
                self.embed_dim, self.num_heads, self.mlp_dim,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"blocks_{i}",
            )(x)
            if self.use_adapter:
                x = AdapterModule(
                    self.embed_dim, self.adapter_dim,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"adapters_{i}",
                )(x)

        cls_out = x[:, 0]
        cls_out = nn.LayerNorm(  # reference head.0 = torch default eps 1e-5
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
            name="head_norm",
        )(cls_out)
        cls_out = nn.Dropout(self.head_dropout, deterministic=deterministic)(cls_out)
        logits = nn.Dense(
            self.num_classes, kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(self.embed_dim),
            dtype=self.dtype, param_dtype=self.param_dtype, name="head",
        )(cls_out)
        return logits.astype(jnp.float32)


def create_hybrid_latent_vit(
    latent_dim: int = 512,
    seq_len: int = 18,
    model_size: ModelSize = "small",
    num_classes: int = 7,
    use_adapter: bool = False,
    adapter_dim: int = 64,
    **kw,
) -> HybridLatentViT:
    """Factory matching the reference (hybrid_latent_vit.py:268-310)."""
    cfg = dict(TIMM_VIT_CONFIGS.get(model_size, TIMM_VIT_CONFIGS["small"]))
    cfg.update(kw)  # explicit kwargs (e.g. tiny test dims) win over the preset
    return HybridLatentViT(
        latent_dim=latent_dim,
        seq_len=seq_len,
        num_classes=num_classes,
        adapter_dim=adapter_dim if use_adapter else None,
        **cfg,
    )


def interpolate_pos_embed(pretrained_pos: np.ndarray, seq_len: int) -> np.ndarray:
    """1-D linear interpolation of the patch pos-emb from N→seq_len tokens,
    CLS slot passed through (reference: hybrid_latent_vit.py:118-156)."""
    pretrained_pos = np.asarray(pretrained_pos)
    cls_pos = pretrained_pos[:, :1]
    patch_pos = pretrained_pos[:, 1:]  # (1, N, D)
    if patch_pos.shape[1] != seq_len:
        patch_pos = np.asarray(
            jax.image.resize(
                jnp.asarray(patch_pos),
                (1, seq_len, patch_pos.shape[2]),
                method="linear",
            )
        )
    return np.concatenate([cls_pos, patch_pos], axis=1)


def graft_pretrained(params: Dict[str, Any], pretrained: Dict[str, Any],
                     seq_len: int) -> Dict[str, Any]:
    """Graft a converted timm trunk (.npz pytree from
    :mod:`fer_vit_tpu.encoders.convert_timm`) into freshly-initialized
    HybridLatentViT params: blocks_*, cls_token, pos_embed (interpolated).
    input_proj / head / adapters stay freshly initialized, as the reference
    trains them from scratch."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for name, val in pretrained.items():
        if name == "cls_token":
            params["cls_token"] = jnp.asarray(val)
        elif name == "pos_embed":
            params["pos_embed"] = jnp.asarray(interpolate_pos_embed(val, seq_len))
        elif name.startswith("blocks_"):
            top, rest = name.split("/", 1)
            node = params[top]
            *path, leaf = rest.split("/")
            for p in path:
                node = node[p]
            if leaf not in node:
                raise KeyError(f"pretrained param {name} not found in model")
            node[leaf] = jnp.asarray(val)
    return params


def trainable_mask(
    params: Dict[str, Any],
    freeze_transformer: bool = False,
    freeze_stages: Optional[int] = None,
) -> Dict[str, Any]:
    """Boolean pytree: True = trainable. Replaces requires_grad-mutation
    (reference: hybrid_latent_vit.py:171-183) with an optax mask.

    ``freeze_transformer`` freezes every ``blocks_*`` subtree (adapters and
    everything else stay trainable); ``freeze_stages=N`` freezes blocks 0..N-1.
    """

    def block_index(name: str) -> Optional[int]:
        if name.startswith("blocks_"):
            return int(name.split("_")[1])
        return None

    def mask_subtree(tree, flag):
        return jax.tree_util.tree_map(lambda _: flag, tree)

    out = {}
    for name, sub in params.items():
        idx = block_index(name)
        if idx is None:
            out[name] = mask_subtree(sub, True)
        elif freeze_transformer:
            out[name] = mask_subtree(sub, False)
        elif freeze_stages is not None and idx < freeze_stages:
            out[name] = mask_subtree(sub, False)
        else:
            out[name] = mask_subtree(sub, True)
    return out


def layerwise_lr_mult(
    params: Dict[str, Any],
    freeze_transformer: bool = False,
    freeze_stages: Optional[int] = None,
) -> tuple:
    """(lr_mult pytree, wd_mask pytree) for the reference's layer-wise LR
    groups (reference: train/train_hybrid_latent_vit.py:63-117):
    input_proj ×10, transformer blocks ×1, adapters ×10, head ×10,
    pos_embed/CLS ×5 with weight decay 0. Frozen subtrees get mult 0."""
    frozen = trainable_mask(params, freeze_transformer, freeze_stages)

    def group_mult(name: str) -> float:
        if name == "input_proj" or name.startswith("adapters_") or \
                name in ("head", "head_norm"):
            return 10.0
        if name in ("pos_embed", "cls_token"):
            return 5.0
        return 1.0

    mult = {}
    wd = {}
    for name, sub in params.items():
        m = group_mult(name)
        mult[name] = jax.tree_util.tree_map(lambda _: m, sub)
        wd[name] = jax.tree_util.tree_map(
            lambda _: name not in ("pos_embed", "cls_token"), sub
        )
    # apply freezing on top
    mult = jax.tree_util.tree_map(
        lambda m, t: m if t else 0.0, mult, frozen
    )
    return mult, wd


# Recommended fine-tuning strategies (reference: hybrid_latent_vit.py:314-343).
RECOMMENDED_STRATEGIES = {
    "full_finetune": {
        "freeze_transformer": False, "freeze_stages": None,
        "use_adapter": False, "lr": 1e-4,
        "description": "train everything (best accuracy, slowest)",
    },
    "partial_freeze": {
        "freeze_transformer": False, "freeze_stages": 6,
        "use_adapter": False, "lr": 3e-4,
        "description": "freeze lower blocks (balanced)",
    },
    "adapter": {
        "freeze_transformer": True, "freeze_stages": None,
        "use_adapter": True, "lr": 1e-3,
        "description": "train adapters only (fastest, memory-efficient)",
    },
    "linear_probe": {
        "freeze_transformer": True, "freeze_stages": None,
        "use_adapter": False, "lr": 1e-3,
        "description": "train the head only (baseline)",
    },
}
