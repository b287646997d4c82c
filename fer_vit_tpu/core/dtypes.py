"""Mixed-precision dtype policy.

TPU MXU wants bf16 operands; optimizer state and accumulations stay f32.
Models take a ``DTypePolicy`` and cast activations at entry; Flax modules use
``param_dtype=policy.param_dtype`` and ``dtype=policy.compute_dtype``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """What dtype each tensor class lives in.

    Attributes:
      param_dtype:   dtype parameters are stored in (f32 keeps optimizer quality).
      compute_dtype: dtype matmuls/convs run in (bf16 hits the MXU fast path).
      output_dtype:  dtype of model outputs (logits) — f32 for stable softmax/CE.
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    output_dtype: jnp.dtype = jnp.float32

    def cast_input(self, x: jax.Array) -> jax.Array:
        return x.astype(self.compute_dtype)

    def cast_output(self, x: jax.Array) -> jax.Array:
        return x.astype(self.output_dtype)


def default_policy(bf16: bool | None = None) -> DTypePolicy:
    """Default policy: bf16 compute on TPU, f32 elsewhere (tests on CPU)."""
    if bf16 is None:
        bf16 = jax.default_backend() not in ("cpu",)
    if bf16:
        return DTypePolicy(compute_dtype=jnp.bfloat16)
    return DTypePolicy()
