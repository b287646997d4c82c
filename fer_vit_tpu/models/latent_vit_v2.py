"""LatentViTv2 — LatentViT with optional w+ preprocessing modules.

Capability parity with the reference ``LatentViTv2`` (reference:
models_fer_vit/latent_vit_v2.py:7-101). Application order is
**SPE → LWN → LEAM → backbone**, matching the reference *code*
(models_fer_vit/latent_vit_v2.py:82-85 — the code order is authoritative;
its docstring disagrees with itself).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fer_vit_tpu.models.latent_vit import LatentViT
from fer_vit_tpu.nn.preprocessing import LEAM, LayerWiseNorm, SemanticPE


class LatentViTv2(nn.Module):
    # the LatentViT backbone inherits torch's deep-copied-layers init quirk
    torch_clone_init = "full"
    latent_dim: int = 512
    seq_len: int = 18
    embed_dim: int = 512
    depth: int = 6
    heads: int = 8
    mlp_dim: int = 2048
    num_classes: int = 7
    dropout: float = 0.1
    use_lwn: bool = False
    use_lwn_residual: bool = False
    use_spe: bool = False
    use_leam: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, w_plus: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = w_plus.astype(self.dtype)
        if self.use_spe:
            x = SemanticPE(
                d_model=self.latent_dim, num_layers=self.seq_len,
                dtype=self.dtype, param_dtype=self.param_dtype, name="spe",
            )(x)
        if self.use_lwn:
            x = LayerWiseNorm(
                num_layers=self.seq_len, d_model=self.latent_dim,
                use_residual=self.use_lwn_residual,
                dtype=self.dtype, param_dtype=self.param_dtype, name="lwn",
            )(x)
        if self.use_leam:
            x = LEAM(
                num_layers=self.seq_len,
                dtype=self.dtype, param_dtype=self.param_dtype, name="leam",
            )(x)
        return LatentViT(
            latent_dim=self.latent_dim,
            seq_len=self.seq_len,
            embed_dim=self.embed_dim,
            depth=self.depth,
            heads=self.heads,
            mlp_dim=self.mlp_dim,
            num_classes=self.num_classes,
            dropout=self.dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="backbone",
        )(x, deterministic=deterministic)

    def get_config(self) -> dict:
        """Model config for experiment logs (reference: latent_vit_v2.py:93-101)."""
        return {
            "model": "LatentViTv2",
            "use_lwn": self.use_lwn,
            "use_lwn_residual": self.use_lwn_residual,
            "use_spe": self.use_spe,
            "use_leam": self.use_leam,
        }

    @staticmethod
    def get_leam_weights(params) -> jax.Array | None:
        """Post-sigmoid LEAM weights from a params pytree, or None if absent
        (reference: latent_vit_v2.py:87-91)."""
        if "leam" in params:
            return LEAM.get_weights(params["leam"])
        return None
