"""CNN baselines over w+ latent codes.

Capability parity with the reference latent CNN zoo (reference:
models_fer_vit/latent_cnn.py): four variants over (B, 18, 512) —

* ``LatentCNN``       — 4×Conv1D(k3) + 2 residual blocks + global avg-pool
                        (max-pool deliberately disabled for determinism,
                        reference :109-111) + MLP head.
* ``LatentCNNDeep``   — Linear 512→256 projection, hierarchical conv blocks
                        256→384→512 with residuals, attention pooling.
* ``LatentCNNLight``  — 3 conv layers, avg-pool, small head.
* ``LatentCNN2D``     — treats the latent as a 1-channel 18×512 image.

TPU-native layout: convs run channels-last ((B, L, C) for 1-D,
(B, H, W, C) for 2-D) — the reference transposes to torch's channels-first
(latent_cnn.py:146); here the data stays in the layout XLA's TPU conv
emitter wants. BatchNorm batch statistics live in the ``batch_stats``
collection and are threaded explicitly through the train step. Under DP the
batch-axis reductions inside BN become cross-shard collectives under GSPMD,
so the statistics are *globally* batched — proven (loss, params, and final
batch_stats all equal single-device execution) by
tests/test_multichip.py::test_dp_bn_batch_stats_match_single_device and
exercised every round by ``__graft_entry__._dryrun_bn_model``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fer_vit_tpu.nn.initializers import kaiming_normal_fan_out_init, normal_init
from fer_vit_tpu.nn.masked_batchnorm import MaskedBatchNorm

# torch BatchNorm1d defaults: momentum 0.1 (== 0.9 decay here), eps 1e-5,
# unbiased running-var update (reference models_fer_vit/latent_cnn.py).
_BN_KW = dict(momentum=0.9, epsilon=1e-5)


class LatentConv1D(nn.Module):
    """Conv1D(k) → BN → ReLU → Dropout (reference: latent_cnn.py:14-38)."""

    features: int
    kernel_size: int = 3
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 mask: jax.Array | None = None) -> jax.Array:
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            use_bias=False,
            kernel_init=kaiming_normal_fan_out_init(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        x = MaskedBatchNorm(
            use_running_average=deterministic,
            dtype=self.dtype, param_dtype=self.param_dtype, name="bn", **_BN_KW,
        )(x, mask=mask)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class LatentResBlock1D(nn.Module):
    """Residual 1-D conv block (reference: latent_cnn.py:41-63)."""

    features: int
    kernel_size: int = 3
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 mask: jax.Array | None = None) -> jax.Array:
        conv_kw = dict(
            kernel_size=(self.kernel_size,),
            padding="SAME",
            use_bias=False,
            kernel_init=kaiming_normal_fan_out_init(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        bn_kw = dict(
            use_running_average=deterministic,
            dtype=self.dtype, param_dtype=self.param_dtype, **_BN_KW,
        )
        residual = x
        out = nn.Conv(self.features, name="conv1", **conv_kw)(x)
        out = MaskedBatchNorm(name="bn1", **bn_kw)(out, mask=mask)
        out = nn.relu(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        out = nn.Conv(self.features, name="conv2", **conv_kw)(out)
        out = MaskedBatchNorm(name="bn2", **bn_kw)(out, mask=mask)
        return nn.relu(out + residual)


class _MLPHead(nn.Module):
    """Linear → BN → ReLU → Dropout → Linear classifier head."""

    hidden: int
    num_classes: int
    dropout: float
    in_features: int
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 mask: jax.Array | None = None) -> jax.Array:
        x = nn.Dense(
            self.hidden,
            kernel_init=normal_init(0.01),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="fc1",
        )(x)
        if self.use_bn:
            x = MaskedBatchNorm(
                use_running_average=deterministic,
                dtype=self.dtype, param_dtype=self.param_dtype, name="bn", **_BN_KW,
            )(x, mask=mask)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(
            self.num_classes,
            kernel_init=normal_init(0.01),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="fc2",
        )(x)
        return x.astype(jnp.float32)


class LatentCNN(nn.Module):
    """Standard 1-D latent CNN (reference: latent_cnn.py:66-161)."""

    latent_dim: int = 512
    seq_len: int = 18
    num_classes: int = 7
    hidden_dims: Sequence[int] = (512, 512, 512, 512)
    dropout: float = 0.3
    use_residual: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 mask: jax.Array | None = None) -> jax.Array:
        x = x.astype(self.dtype)  # (B, L, D): L spatial, D channels
        for i, h in enumerate(self.hidden_dims):
            x = LatentConv1D(
                h, dropout=self.dropout, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"conv_{i}",
            )(x, deterministic=deterministic, mask=mask)
        if self.use_residual:
            for i in range(2):
                x = LatentResBlock1D(
                    self.hidden_dims[-1], dropout=self.dropout, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"res_{i}",
                )(x, deterministic=deterministic, mask=mask)
        # Global average pool over the sequence axis (deterministic — the
        # reference disables max-pool on purpose, latent_cnn.py:109-111).
        x = jnp.mean(x, axis=1)
        return _MLPHead(
            hidden=512, num_classes=self.num_classes, dropout=self.dropout,
            in_features=self.hidden_dims[-1], dtype=self.dtype,
            param_dtype=self.param_dtype, name="classifier",
        )(x, deterministic=deterministic, mask=mask)


class LatentCNNDeep(nn.Module):
    """Deep hierarchical latent CNN with attention pooling
    (reference: latent_cnn.py:164-261)."""

    latent_dim: int = 512
    seq_len: int = 18
    num_classes: int = 7
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 mask: jax.Array | None = None) -> jax.Array:
        x = x.astype(self.dtype)
        # Input projection 512→256 with LayerNorm.
        x = nn.Dense(
            256, kernel_init=normal_init(0.01), bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="input_proj",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5,  # torch nn.LayerNorm default eps
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="input_norm")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout * 0.5, deterministic=deterministic)(x)

        stage_channels = [(256, 1), (384, 1), (512, 2)]
        for s, (ch, n_res) in enumerate(stage_channels):
            x = LatentConv1D(
                ch, dropout=self.dropout, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"stage{s}_conv",
            )(x, deterministic=deterministic, mask=mask)
            for r in range(n_res):
                x = LatentResBlock1D(
                    ch, dropout=self.dropout, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"stage{s}_res{r}",
                )(x, deterministic=deterministic, mask=mask)

        # Attention pooling: conv1x1 → softmax over positions → weighted sum.
        attn = nn.Conv(
            1, kernel_size=(1,), kernel_init=kaiming_normal_fan_out_init(),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
        )(x)  # (B, L, 1)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=1).astype(self.dtype)
        x = jnp.sum(x * attn, axis=1)  # (B, 512)

        return _MLPHead(
            hidden=512, num_classes=self.num_classes, dropout=self.dropout,
            in_features=512, dtype=self.dtype, param_dtype=self.param_dtype,
            name="classifier",
        )(x, deterministic=deterministic, mask=mask)


class LatentCNNLight(nn.Module):
    """Lightweight latent CNN (reference: latent_cnn.py:264-330)."""

    latent_dim: int = 512
    seq_len: int = 18
    num_classes: int = 7
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 mask: jax.Array | None = None) -> jax.Array:
        x = x.astype(self.dtype)
        plan = [(256, True), (256, True), (384, False)]  # (features, dropout?)
        for i, (ch, use_drop) in enumerate(plan):
            x = nn.Conv(
                ch, kernel_size=(3,), padding="SAME",
                kernel_init=kaiming_normal_fan_out_init(),
                bias_init=nn.initializers.zeros_init(),
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"conv_{i}",
            )(x)
            x = MaskedBatchNorm(
                use_running_average=deterministic, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"bn_{i}", **_BN_KW,
            )(x, mask=mask)
            x = nn.relu(x)
            if use_drop:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = jnp.mean(x, axis=1)  # (B, 384)
        x = nn.Dense(
            256, kernel_init=normal_init(0.01), bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="fc1",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(
            self.num_classes, kernel_init=normal_init(0.01),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="fc2",
        )(x)
        return x.astype(jnp.float32)


class LatentCNN2D(nn.Module):
    """2-D conv over the latent treated as a 1×18×512 image
    (reference: latent_cnn.py:333-409)."""

    latent_dim: int = 512
    seq_len: int = 18
    num_classes: int = 7
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 mask: jax.Array | None = None) -> jax.Array:
        x = x.astype(self.dtype)[..., None]  # (B, 18, 512, 1) NHWC
        plan = [(64, False, self.dropout * 0.5),
                (128, True, self.dropout * 0.5),
                (256, True, self.dropout)]
        for i, (ch, pool, drop) in enumerate(plan):
            x = nn.Conv(
                ch, kernel_size=(3, 3), padding="SAME",
                kernel_init=kaiming_normal_fan_out_init(),
                bias_init=nn.initializers.zeros_init(),
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"conv_{i}",
            )(x)
            x = MaskedBatchNorm(
                use_running_average=deterministic, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"bn_{i}", **_BN_KW,
            )(x, mask=mask)
            x = nn.relu(x)
            if pool:
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
            # Spatial (channel-wise) dropout, as torch Dropout2d zeroes whole
            # channels: broadcast the mask over H, W.
            x = nn.Dropout(
                drop, broadcast_dims=(1, 2), deterministic=deterministic
            )(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool → (B, 256)
        return _MLPHead(
            hidden=256, num_classes=self.num_classes, dropout=self.dropout,
            in_features=256, dtype=self.dtype, param_dtype=self.param_dtype,
            name="classifier",
        )(x, deterministic=deterministic, mask=mask)


def create_latent_cnn(
    model_type: str = "standard",
    latent_dim: int = 512,
    seq_len: int = 18,
    num_classes: int = 7,
    dropout: float = 0.3,
    **kw,
):
    """Factory matching the reference (latent_cnn.py:412-438)."""
    common = dict(latent_dim=latent_dim, seq_len=seq_len,
                  num_classes=num_classes, dropout=dropout, **kw)
    if model_type == "light":
        return LatentCNNLight(**common)
    if model_type == "standard":
        return LatentCNN(use_residual=True, **common)
    if model_type == "deep":
        return LatentCNNDeep(**common)
    if model_type == "2d":
        return LatentCNN2D(**common)
    raise ValueError(f"Unknown model type: {model_type}")
