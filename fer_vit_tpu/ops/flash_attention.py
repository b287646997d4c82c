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

Differentiability: ``pl.pallas_call`` has no reverse-mode rule, so
``fused_attention`` carries a ``jax.custom_vjp`` whose backward recomputes
the attention with the XLA implementation and differentiates that — the
standard recompute-in-backward scheme of flash attention. This makes the
fused path safe under ``jax.grad`` (training steps, grad histograms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fer_vit_tpu.ops.attention import dot_product_attention


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


def _fused_attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                            interpret: bool) -> jax.Array:
    b, h, l, dh = q.shape
    scale = 1.0 / (dh ** 0.5)
    grid = (b * h,)

    def reshape(t):
        return t.reshape(b * h, l, dh)

    spec = pl.BlockSpec(
        (1, l, dh), lambda i: (i, 0, 0),
        memory_space=pltpu.MemorySpace.ANY if interpret
        else pltpu.MemorySpace.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, l, dh), q.dtype),
        interpret=interpret,
    )(reshape(q), reshape(k), reshape(v))
    return out.reshape(b, h, l, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     interpret: bool) -> jax.Array:
    return _fused_attention_pallas(q, k, v, interpret)


def _fused_attention_fwd(q, k, v, interpret):
    # Residuals are just the inputs; the backward recomputes attention via
    # the XLA path and differentiates that (flash-attention-style remat —
    # cheaper than saving the (L, L) weights, and exact: both paths compute
    # softmax(QKᵀ/√d)V with f32 statistics).
    return _fused_attention_pallas(q, k, v, interpret), (q, k, v)


def _fused_attention_bwd(interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(dot_product_attention, q, k, v)
    return vjp(g)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """softmax(QKᵀ/√d)V over (B, H, L, Dh) tensors — Pallas fused kernel.

    No dropout (inference / deterministic path); the transformer layer falls
    back to the XLA implementation when attention dropout is active.
    Reverse-mode differentiable via a custom VJP (XLA recompute backward).
    """
    return _fused_attention(q, k, v, interpret)
