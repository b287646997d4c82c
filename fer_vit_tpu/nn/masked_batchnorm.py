"""Mask-aware BatchNorm for statically-padded batches.

The train harness pads the final partial batch of every epoch to a static
shape (fer_vit_tpu/train/harness.py) so the whole epoch runs inside one
jitted ``lax.scan``. The reference instead shrinks the final torch batch
(e.g. /root/reference/train/train_latent_cnn.py:110-137 iterates whatever
the DataLoader yields), so its BatchNorm statistics are computed over real
rows only. With plain ``flax.linen.BatchNorm`` the zero pad rows enter the
batch moments — and because validation runs right after the epoch's final
(padded) batch, the corrupted running-stat update lands immediately before
every eval. Measured on the reference-equivalence harness this cost the
latent CNN ~0.1 val-accuracy / ~0.3 val-loss versus the torch reference; a
3-seed spread of the reference itself was ~5× tighter than that gap.

``MaskedBatchNorm`` keeps the static-shape design and instead computes
mask-weighted batch moments: a row mask (B,) of {0,1} excludes pad rows
from mean/var while every row still flows through the (per-example) affine
transform. Under jit+GSPMD data parallelism the mask-weighted sums reduce
over the *global* batch exactly like ``jnp.mean`` would, so DP semantics
are unchanged.

Variable layout is identical to ``flax.linen.BatchNorm`` (params
``scale``/``bias``, batch_stats ``mean``/``var``) so checkpoints and the
torch state_dict converters are unaffected.

Torch-fidelity detail: torch's ``BatchNorm1d`` normalizes with the biased
variance but updates ``running_var`` with the *unbiased* (n/(n-1))
variance (torch docs; reference models train with default momentum 0.1 ==
our ``momentum=0.9`` decay). ``unbiased_running_var=True`` replicates
that; ``flax.linen.BatchNorm`` uses the biased estimate for both.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """Drop-in BatchNorm accepting an optional per-row validity mask.

    Args (call):
        x: ``(B, ..., C)`` activations; features on the last axis.
        mask: optional ``(B,)`` array, 1 for real rows, 0 for pad rows.
            ``None`` reduces over every row (plain BatchNorm).
    """

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    unbiased_running_var: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None
                 ) -> jax.Array:
        feat = (x.shape[-1],)
        scale = self.param("scale", nn.initializers.ones_init(), feat,
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), feat,
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), feat)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), feat)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            if mask is None:
                n = 1.0
                for d in red:
                    n *= x.shape[d]
                n = jnp.asarray(n, jnp.float32)
                mean = jnp.mean(xf, axis=red)
                mean2 = jnp.mean(xf * xf, axis=red)
            else:
                w = mask.astype(jnp.float32).reshape(
                    (x.shape[0],) + (1,) * (x.ndim - 1))
                spatial = 1.0
                for d in red[1:]:
                    spatial *= x.shape[d]
                # max(n, 1): an all-pad mask would otherwise produce 0/0
                # NaN moments that permanently poison the running stats;
                # with the guard the moments stay finite (zero) instead.
                n = jnp.maximum(jnp.sum(w) * spatial, 1.0)
                mean = jnp.sum(xf * w, axis=red) / n
                mean2 = jnp.sum(xf * xf * w, axis=red) / n
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                run_var = var * (n / jnp.maximum(n - 1.0, 1.0)) \
                    if self.unbiased_running_var else var
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * run_var

        dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (x.astype(jnp.float32) - mean) * inv
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(dtype)
