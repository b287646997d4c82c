"""LPIPS perceptual distance (AlexNet backbone), as used by the reference's
AFS loss (reference: afs/losses.py:98-103, LPIPS(net_type='alex') frozen).

Structure (standard lpips-alex):
    scaling layer (fixed shift/scale per RGB channel, inputs in [−1, 1])
    AlexNet conv features, slices after each of the 5 ReLUs
    per-slice channel-unit-normalization
    squared difference → 1×1 "lin" conv (C→1, no bias) → spatial mean → sum

Weights convert from a torch LPIPS state_dict (the lpips package's
``alex.pth`` + torchvision alexnet features — neither is downloadable in
this image, so conversion runs wherever they exist; random init otherwise,
which keeps the loss runnable for smoke tests).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

# AlexNet feature config: (out_ch, kernel, stride, pad, maxpool_after)
_ALEX_CFG = [
    (64, 11, 4, 2, True),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, False),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]
_LIN_CHANNELS = [64, 192, 384, 256, 256]


class AlexFeatures(nn.Module):
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        feats = []
        for i, (ch, k, s, p, pool) in enumerate(_ALEX_CFG):
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=p,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"conv_{i}")(x)
            x = nn.relu(x)
            feats.append(x)
            if pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """lpips(x, y) for NHWC images in [−1, 1] → (,) scalar mean distance."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)

        def norm_input(t):
            return (t.astype(self.dtype) - shift) / scale

        net = AlexFeatures(dtype=self.dtype, param_dtype=self.param_dtype,
                           name="net")
        fx = net(norm_input(x))
        fy = net(norm_input(y))

        def unit_normalize(t):
            n = jnp.sqrt(jnp.sum(t.astype(jnp.float32) ** 2, axis=-1,
                                 keepdims=True))
            return (t / jnp.maximum(n, 1e-10).astype(t.dtype))

        total = jnp.zeros((), jnp.float32)
        for i, (ax, ay) in enumerate(zip(fx, fy)):
            diff = (unit_normalize(ax) - unit_normalize(ay)) ** 2
            lin = self.param(
                f"lin_{i}",
                nn.initializers.normal(0.02),
                (1, 1, _LIN_CHANNELS[i], 1),
                self.param_dtype,
            )
            w = jax.nn.relu(lin.astype(diff.dtype))  # lpips keeps lins ≥ 0
            val = jax.lax.conv_general_dilated(
                diff, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            total = total + jnp.mean(val.astype(jnp.float32), axis=(1, 2, 3)).mean()
        return total


def convert_lpips_state_dict(alex_sd: Dict[str, np.ndarray],
                             lin_sd: Dict[str, np.ndarray]) -> dict:
    """torchvision alexnet.features + lpips lin weights → LPIPS params.

    alex_sd keys: features.{0,3,6,8,10}.{weight,bias}
    lin_sd keys:  lin{i}.model.1.weight (1,C,1,1)  (lpips package format)
    """
    conv_idx = [0, 3, 6, 8, 10]
    net = {}
    for i, ci in enumerate(conv_idx):
        net[f"conv_{i}"] = {
            "kernel": np.transpose(alex_sd[f"features.{ci}.weight"],
                                   (2, 3, 1, 0)),
            "bias": alex_sd[f"features.{ci}.bias"],
        }
    params = {"net": net}
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lin_sd:
                w = lin_sd[key]  # (1, C, 1, 1)
                params[f"lin_{i}"] = np.transpose(w, (2, 3, 1, 0))
                break
    return {"params": params}


def convert_lpips_checkpoint(alex_path: str, lin_path: str) -> dict:
    import torch

    alex_sd = {k: np.asarray(v, np.float32) for k, v in
               torch.load(alex_path, map_location="cpu",
                          weights_only=False).items()}
    lin_sd = {k: np.asarray(v, np.float32) for k, v in
              torch.load(lin_path, map_location="cpu",
                         weights_only=False).items()}
    return convert_lpips_state_dict(alex_sd, lin_sd)
