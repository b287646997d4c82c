"""Initializers matching the reference's PyTorch init distributions.

Training-dynamics parity (±0.5% val-acc vs the reference, BASELINE.md) wants
the same init *distributions*, not the same bits:

* ``torch.nn.Linear`` default: kaiming-uniform(a=√5) on the kernel, i.e.
  U(−1/√fan_in, 1/√fan_in); bias U(−1/√fan_in, 1/√fan_in).
* ``torch.nn.Conv{1,2}d`` default: same with fan_in = in_ch · prod(kernel).
* ViT-style init used by the reference ImageViT (reference:
  models_fer_vit/image_vit.py:122-136): trunc-normal(std=0.02) on linear
  kernels / pos-emb / cls, zeros bias, LN ones/zeros.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == variance_scaling(1/3, fan_in, uniform)
torch_linear_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_linear_bias_init(fan_in: int):
    """Bias U(−1/√fan_in, 1/√fan_in), as torch Linear/Conv defaults do."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# For convs flax computes fan_in from the kernel shape (prod(kernel)·in_ch),
# matching torch's fan_in, so the same variance_scaling works.
torch_conv_kernel_init = torch_linear_kernel_init


def trunc_normal_init(std: float = 0.02):
    """torch/timm ``trunc_normal_(std=std, a=-2.0, b=2.0)``: the bounds are
    ABSOLUTE values (±2), i.e. ±100σ at std=0.02 — effectively untruncated,
    std == ``std`` exactly. (flax's lower/upper are in σ units: passing ±2
    there truncates at ±2σ and shrinks the realized std by ~12%.)"""
    return nn.initializers.truncated_normal(
        stddev=std, lower=-2.0 / std, upper=2.0 / std)


def kaiming_normal_fan_out_init(nonlinearity: str = "relu"):
    """torch ``kaiming_normal_(mode='fan_out', nonlinearity='relu')``
    (reference: models_fer_vit/latent_cnn.py:129): N(0, 2/fan_out)."""
    del nonlinearity  # relu gain (√2) is the only one used by the zoo
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def normal_init(std: float):
    return nn.initializers.normal(stddev=std)
