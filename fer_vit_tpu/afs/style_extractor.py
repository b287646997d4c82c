"""AFS style extractor h : W+ → w_sty.

Capability parity with the reference (reference: afs/style_extractor.py):
18 independent per-layer ``StyleBlock``s — Linear 512→256, 2 Highway layers
(learned carry + BatchNorm1d before the activation), Linear 256→512.

TPU-native: the 18 blocks are **vmapped over the layer axis** (one batched
matmul per sub-layer instead of 18 small sequential ones — reference loops
them, style_extractor.py:108-115). BatchNorm statistics are per-block
(leading axis of the batch_stats leaves), exactly like 18 separate
``BatchNorm1d`` modules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fer_vit_tpu.nn.initializers import torch_linear_bias_init, torch_linear_kernel_init
from fer_vit_tpu.nn.masked_batchnorm import MaskedBatchNorm


def _dense(features: int, in_dim: int, dtype, param_dtype, name: str):
    return nn.Dense(
        features,
        kernel_init=torch_linear_kernel_init,
        bias_init=torch_linear_bias_init(in_dim),
        dtype=dtype, param_dtype=param_dtype, name=name,
    )


class HighwayLayer(nn.Module):
    """y = g ⊙ act(BN(W_n x)) + (1−g) ⊙ W_l x, g = σ(W_g x).

    Carry is a learned Linear (NOT identity) — the AFS paper's variant
    (reference: afs/style_extractor.py:6-40).
    """

    dim: int
    act: str = "lrelu"
    momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        nonlin = _dense(self.dim, self.dim, self.dtype, self.param_dtype,
                        "nonlinear")(x)
        # MaskedBatchNorm for torch BatchNorm1d fidelity: running_var is
        # updated with the UNBIASED (n/(n-1)) estimate like the reference's
        # nn.BatchNorm1d (afs/style_extractor.py:22-25); plain flax
        # BatchNorm uses the biased one, which skews every eval forward.
        nonlin = MaskedBatchNorm(
            use_running_average=deterministic,
            momentum=1.0 - self.momentum,  # torch momentum 0.1 == flax 0.9
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
            name="bn",
        )(nonlin)
        if self.act == "relu":
            nonlin = nn.relu(nonlin)
        elif self.act == "lrelu":
            nonlin = nn.leaky_relu(nonlin, negative_slope=0.2)
        else:
            raise ValueError(f"Unknown activation {self.act!r}")
        linear = _dense(self.dim, self.dim, self.dtype, self.param_dtype,
                        "linear")(x)
        gate = jax.nn.sigmoid(
            _dense(self.dim, self.dim, self.dtype, self.param_dtype,
                   "gate")(x)
        )
        return gate * nonlin + (1.0 - gate) * linear


class StyleBlock(nn.Module):
    """Linear(512→256) → Highway × num_highway → Linear(256→512)."""

    in_dim: int = 512
    mid_dim: int = 256
    num_highway: int = 2
    act: str = "lrelu"
    momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = _dense(self.mid_dim, self.in_dim, self.dtype, self.param_dtype,
                   "down")(x)
        for i in range(self.num_highway):
            x = HighwayLayer(
                self.mid_dim, act=self.act, momentum=self.momentum,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"highway_{i}",
            )(x, deterministic)
        return _dense(self.in_dim, self.mid_dim, self.dtype, self.param_dtype,
                      "up")(x)


class StyleExtractor(nn.Module):
    """h : (B, n_layers, latent_dim) → (B, n_layers, latent_dim).

    Identity component: w_id = w − h(w).
    """

    n_layers: int = 18
    latent_dim: int = 512
    mid_dim: int = 256
    num_highway: int = 2
    act: str = "lrelu"
    momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, w: jax.Array, deterministic: bool = True) -> jax.Array:
        block = nn.vmap(
            StyleBlock,
            in_axes=(1, None), out_axes=1,  # map over the W+ layer axis
            axis_size=self.n_layers,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
        )
        return block(
            in_dim=self.latent_dim, mid_dim=self.mid_dim,
            num_highway=self.num_highway, act=self.act,
            momentum=self.momentum, dtype=self.dtype,
            param_dtype=self.param_dtype, name="blocks",
        )(w.astype(self.dtype), deterministic)
