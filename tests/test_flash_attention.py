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


def test_grad_matches_reference():
    """jax.grad through the fused kernel (custom VJP: XLA recompute
    backward) must match grads of the XLA implementation — the training
    step and grad-histogram snapshots differentiate through attention."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(2, 2, 130, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, 130, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 2, 130, 32)), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3)


def test_grad_through_transformer_layer_on_fused_path(monkeypatch):
    """Regression for the round-1 crash: a TransformerEncoderLayer with
    deterministic=True at L>=128 selects the fused kernel on TPU; value_and_grad
    through it must work (fer_vit_tpu/train/loop.py grad snapshots)."""
    import fer_vit_tpu.nn.transformer as tr

    # Force the fused branch on CPU by faking the backend check and using
    # interpret mode inside the kernel call.
    monkeypatch.setattr(tr.jax, "default_backend", lambda: "tpu")
    import fer_vit_tpu.ops.flash_attention as fa
    orig = fa.fused_attention
    monkeypatch.setattr(
        fa, "fused_attention",
        lambda q, k, v, interpret=True: orig(q, k, v, interpret=True),
    )

    layer = tr.TransformerEncoderLayer(embed_dim=64, num_heads=2,
                                       mlp_dim=128, dropout=0.1)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 197, 64)),
                    jnp.float32)
    variables = layer.init(jax.random.key(0), x)

    def loss(params):
        out = layer.apply({"params": params}, x, deterministic=True)
        return jnp.sum(out ** 2)

    val, grads = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)


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
