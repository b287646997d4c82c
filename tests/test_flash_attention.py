"""Pallas fused-attention parity vs the XLA reference implementation
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fer_vit_tpu.ops.attention import dot_product_attention
from fer_vit_tpu.ops.flash_attention import fused_attention


@pytest.mark.parametrize("b,h,l,dh", [(2, 4, 19, 64), (1, 2, 197, 64),
                                      (2, 2, 37, 32)])
def test_matches_reference(b, h, l, dh):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, l, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, dh)), jnp.float32)
    ref = dot_product_attention(q, k, v)
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_bf16_path():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 64, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 2, 64, 32)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 2, 64, 32)), jnp.bfloat16)
    ref = dot_product_attention(q, k, v)
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )
