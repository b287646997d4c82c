"""timm-architecture ViT for images (vit_{tiny,small,base}_patch16_224).

The reference's ``--use_pretrained`` path swaps in
``timm.create_model('vit_small_patch16_224', pretrained=True)`` (reference:
train/train_image_vit.py:233-236). This is that architecture in Flax —
pre-norm blocks identical to :class:`fer_vit_tpu.models.hybrid_latent_vit
.TimmBlock` — with ImageNet weights loadable from a converted ``.npz``
(:mod:`fer_vit_tpu.encoders.convert_timm`; this image has no timm and no
network, so conversion happens wherever timm/torch weights exist).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fer_vit_tpu.models.hybrid_latent_vit import TIMM_VIT_CONFIGS, TimmBlock
from fer_vit_tpu.nn.initializers import trunc_normal_init


class TimmViT(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_dim: int = 1536
    num_classes: int = 7
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def n_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        del deterministic  # timm eval path; dropout-free fine-tune trunk
        x = x.astype(self.dtype)
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    kernel_init=trunc_normal_init(0.02), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="patch_embed")(x)
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)

        cls_token = self.param("cls_token", trunc_normal_init(0.02),
                               (1, 1, self.embed_dim), self.param_dtype)
        pos_embed = self.param("pos_embed", trunc_normal_init(0.02),
                               (1, self.n_patches + 1, self.embed_dim),
                               self.param_dtype)
        cls = jnp.broadcast_to(cls_token.astype(self.dtype),
                               (b, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1) + pos_embed.astype(self.dtype)

        for i in range(self.depth):
            x = TimmBlock(self.embed_dim, self.num_heads, self.mlp_dim,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name=f"blocks_{i}")(x)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        logits = nn.Dense(self.num_classes, kernel_init=trunc_normal_init(0.02),
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="head")(x[:, 0])
        return logits.astype(jnp.float32)


def create_timm_vit(model_size: str = "small", num_classes: int = 7,
                    img_size: int = 224,
                    pretrained_npz: Optional[str] = None, **kw):
    """Build TimmViT; optionally return (model, params_patch_fn) that grafts
    converted ImageNet weights into freshly-initialized params."""
    cfg = TIMM_VIT_CONFIGS[model_size]
    model = TimmViT(img_size=img_size, num_classes=num_classes,
                    embed_dim=cfg["embed_dim"], depth=cfg["depth"],
                    num_heads=cfg["num_heads"], mlp_dim=cfg["mlp_dim"], **kw)
    if pretrained_npz is None:
        return model, None

    from fer_vit_tpu.encoders.convert_psp import load_npz_variables

    pretrained = load_npz_variables(pretrained_npz)["params"]

    def patch(params):
        for name, sub in pretrained.items():
            if name == "head":  # classifier head stays fresh (7 classes)
                continue
            if name in params:
                params[name] = jax.tree_util.tree_map(
                    lambda _, v: jnp.asarray(v), params[name], sub
                )
        return params

    return model, patch
