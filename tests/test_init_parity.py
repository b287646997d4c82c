"""Native-init distribution parity with the reference's torch models —
the blind spot of converted-weight equivalence (EQUIVALENCE Part A starts
both sides from identical weights; these tests pin the distributions a
NATIVE init draws from), plus the remat path."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fer_vit_tpu.nn.initializers import trunc_normal_init
from fer_vit_tpu.nn.transformer import (
    TransformerEncoder,
    clone_torch_encoder_init,
)


def test_remat_encoder_matches_plain():
    """TransformerEncoder(remat=True) must produce identical params and
    outputs to the plain stack, and be differentiable in train mode (the
    deterministic flag drives Python control flow → must be static)."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 19, 32)),
                    jnp.float32)
    enc = TransformerEncoder(depth=2, embed_dim=32, num_heads=2, mlp_dim=64)
    enc_r = TransformerEncoder(depth=2, embed_dim=32, num_heads=2,
                               mlp_dim=64, remat=True)
    v = enc.init(jax.random.key(0), x)
    vr = enc_r.init(jax.random.key(0), x)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(a, b)), v, vr))
    np.testing.assert_array_equal(np.asarray(enc.apply(v, x)),
                                  np.asarray(enc_r.apply(v, x)))

    def loss(p):
        out = enc_r.apply({"params": p}, x, deterministic=False,
                          rngs={"dropout": jax.random.key(1)})
        return out.sum()

    g = jax.jit(jax.grad(loss))(v["params"])
    total = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), g, 0.0)
    assert np.isfinite(total) and total > 0


def test_trunc_normal_matches_torch_semantics():
    """torch trunc_normal_(std=0.02, a=-2, b=2) bounds are ABSOLUTE (±100σ
    — effectively untruncated): realized std must be ≈ 0.02, not the ~12%
    smaller value a ±2σ truncation produces."""
    s = np.asarray(trunc_normal_init(0.02)(jax.random.key(0), (200000,),
                                           jnp.float32))
    assert abs(float(s.std()) - 0.02) < 0.0005
    torch = pytest.importorskip("torch")
    t = torch.empty(200000)
    torch.nn.init.trunc_normal_(t, std=0.02)
    assert abs(float(s.std()) - float(t.std())) < 0.0005


def _init_via_harness(model, sample):
    from fer_vit_tpu.train.harness import Harness, TrainConfig

    h = Harness(model=model, cfg=TrainConfig(epochs=1, batch_size=4))
    return h.init_state(jax.random.key(0), sample).params


def test_latent_vit_layers_identical_at_init():
    """torch nn.TransformerEncoder deep-copies one layer — the reference
    LatentViT's layers are bit-identical at init (latent_vit.py:24-37);
    the harness init must reproduce that joint distribution."""
    from fer_vit_tpu.models.latent_vit import LatentViT

    params = _init_via_harness(LatentViT(depth=3, embed_dim=64, heads=4,
                                         mlp_dim=128),
                               jnp.zeros((1, 18, 512)))
    layers = params["transformer"]
    flat0 = jax.tree_util.tree_leaves(layers["layers_0"])
    for i in (1, 2):
        flat_i = jax.tree_util.tree_leaves(layers[f"layers_{i}"])
        for a, b in zip(flat0, flat_i):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_image_vit_init_matches_reference_scheme():
    """Reference ImageViT (_init_weights, image_vit.py:122-136): every
    nn.Linear trunc_normal(0.02) + zero bias, Linears independent across
    the deep-copied layers, but the MHA in_proj (a bare Parameter) stays
    identical; the patch conv keeps torch conv defaults."""
    from fer_vit_tpu.models.image_vit import ImageViT

    model = ImageViT(img_size=32, patch_size=16, embed_dim=64, depth=2,
                     heads=2, mlp_dim=128)
    params = _init_via_harness(model, jnp.zeros((1, 32, 32, 3)))
    layers = params["transformer"]
    l0, l1 = layers["layers_0"], layers["layers_1"]
    # in_proj cloned; Linears re-drawn independently
    np.testing.assert_array_equal(
        np.asarray(l0["self_attn"]["in_proj_kernel"]),
        np.asarray(l1["self_attn"]["in_proj_kernel"]))
    assert not np.array_equal(np.asarray(l0["linear1"]["kernel"]),
                              np.asarray(l1["linear1"]["kernel"]))
    # FFN linears + out_proj: trunc_normal(0.02), zero bias
    for leaf, arr in ((l0["linear1"], None), (l0["linear2"], None)):
        k = np.asarray(leaf["kernel"])
        assert abs(k.std() - 0.02) < 0.004, k.std()
        assert np.all(np.asarray(leaf["bias"]) == 0)
    op = np.asarray(l0["self_attn"]["out_proj_kernel"])
    assert abs(op.std() - 0.02) < 0.006
    # patch conv: torch Conv2d default — uniform bound 1/sqrt(3*16*16)
    pk = np.asarray(params["patch_embed"]["proj"]["kernel"])
    bound = 1.0 / math.sqrt(3 * 16 * 16)
    assert np.max(np.abs(pk)) <= bound * 1.0001
    assert abs(pk.std() - bound / math.sqrt(3)) < 0.2 * bound


def test_hybrid_adapter_and_proj_use_torch_linear_defaults():
    """Reference adapters / input_proj / head are bare nn.Linear modules
    (hybrid_latent_vit.py:82,110-114,249-265): uniform ±1/√fan_in kernels
    and biases — NOT trunc-normal, NOT zero-bias. Adapters are the only
    trained params in the 'adapter' strategy, so this is load-bearing."""
    from fer_vit_tpu.models.hybrid_latent_vit import create_hybrid_latent_vit

    m = create_hybrid_latent_vit(model_size="tiny", seq_len=18,
                                 use_adapter=True, adapter_dim=8)
    params = m.init(jax.random.key(0), jnp.zeros((1, 18, 512)))["params"]
    down = np.asarray(params["adapters_0"]["down"]["kernel"])
    bound = 1.0 / math.sqrt(192)
    assert np.max(np.abs(down)) <= bound * 1.0001
    assert np.max(np.abs(down)) > bound * 0.9  # uniform, not gaussian tail
    proj = np.asarray(params["input_proj"]["kernel"])
    bound_p = 1.0 / math.sqrt(512)
    assert np.max(np.abs(proj)) <= bound_p * 1.0001
    assert np.any(np.asarray(params["input_proj"]["bias"]) != 0)


def test_clone_util_walks_nested_trees():
    enc = TransformerEncoder(depth=2, embed_dim=16, num_heads=2, mlp_dim=32)
    v = enc.init(jax.random.key(0), jnp.zeros((1, 5, 16)))
    nested = {"backbone": {"transformer": v["params"]}}
    out = clone_torch_encoder_init(nested, "full")
    t = out["backbone"]["transformer"]
    np.testing.assert_array_equal(
        np.asarray(t["layers_0"]["linear1"]["kernel"]),
        np.asarray(t["layers_1"]["linear1"]["kernel"]))
