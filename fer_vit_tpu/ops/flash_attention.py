"""Pallas TPU fused attention kernel.

For this workload's sequence lengths (19–197 tokens, SURVEY.md §2.7) the
whole score matrix fits comfortably in VMEM, so the right kernel is a
*single-block* fused attention: one kernel instance per (batch, head)
computes scores → softmax → value-weighted sum entirely on-chip — no HBM
round-trip for the (L, L) score matrix, f32 softmax statistics, bf16 MXU
matmuls. (A tiled flash-attention with running softmax is unnecessary until
L² stops fitting VMEM — at L=197 the scores are 0.15 MB.)

The XLA reference path (:mod:`fer_vit_tpu.ops.attention`) remains the
default; ``fused_attention`` is selected by
:class:`fer_vit_tpu.nn.transformer.MultiHeadSelfAttention` on TPU backends
for L ≥ 128 where it saves the materialized scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (L, Dh)
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (L, L) f32
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(w.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """softmax(QKᵀ/√d)V over (B, H, L, Dh) tensors — Pallas fused kernel.

    No dropout (inference / deterministic path); the transformer layer falls
    back to the XLA implementation when attention dropout is active.
    """
    b, h, l, dh = q.shape
    scale = 1.0 / (dh ** 0.5)
    grid = (b * h,)

    def reshape(t):
        return t.reshape(b * h, l, dh)

    spec = pl.BlockSpec((1, l, dh), lambda i: (i, 0, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, l, dh), q.dtype),
        interpret=interpret,
    )(reshape(q), reshape(k), reshape(v))
    return out.reshape(b, h, l, dh)
