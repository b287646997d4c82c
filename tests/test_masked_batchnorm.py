"""MaskedBatchNorm correctness vs torch BatchNorm1d.

The train harness pads the final partial batch to a static shape; the
reference shrinks it (reference train/train_latent_cnn.py:110-137 just
iterates the DataLoader). These tests pin the fix: masked batch moments
over a padded batch must equal torch's moments over the unpadded batch —
normalization output, running-mean AND (unbiased) running-var update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fer_vit_tpu.nn.masked_batchnorm import MaskedBatchNorm

torch.manual_seed(0)


def _torch_bn_step(x_real_blc: np.ndarray) -> dict:
    """One train-mode BatchNorm1d step on (B, C, L) torch layout."""
    c = x_real_blc.shape[-1]
    bn = torch.nn.BatchNorm1d(c)  # momentum 0.1, eps 1e-5
    with torch.no_grad():
        bn.weight.copy_(torch.linspace(0.5, 1.5, c))
        bn.bias.copy_(torch.linspace(-0.2, 0.2, c))
    bn.train()
    xt = torch.from_numpy(x_real_blc).permute(0, 2, 1)  # (B, C, L)
    with torch.no_grad():
        out = bn(xt)
    return {
        "out": out.permute(0, 2, 1).numpy(),
        "running_mean": bn.running_mean.numpy(),
        "running_var": bn.running_var.numpy(),
        "weight": bn.weight.detach().numpy(),
        "bias": bn.bias.detach().numpy(),
    }


def _our_bn_step(x_blc: np.ndarray, mask, weight, bias) -> dict:
    bn = MaskedBatchNorm(use_running_average=False)
    variables = bn.init(jax.random.PRNGKey(0), jnp.zeros_like(jnp.asarray(x_blc)))
    variables = {
        "params": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)},
        "batch_stats": variables["batch_stats"],
    }
    m = None if mask is None else jnp.asarray(mask, jnp.float32)
    out, upd = bn.apply(variables, jnp.asarray(x_blc), mask=m,
                        mutable=["batch_stats"])
    return {
        "out": np.asarray(out),
        "running_mean": np.asarray(upd["batch_stats"]["mean"]),
        "running_var": np.asarray(upd["batch_stats"]["var"]),
    }


@pytest.mark.parametrize("n_real,n_pad", [(6, 2), (36, 28), (5, 0)])
def test_masked_padded_batch_matches_torch_unpadded(n_real, n_pad):
    rng = np.random.default_rng(42)
    c, seq = 16, 18
    x_real = rng.normal(size=(n_real, seq, c)).astype(np.float32) * 2.0 + 0.5
    ref = _torch_bn_step(x_real)

    x_pad = np.concatenate(
        [x_real, np.zeros((n_pad, seq, c), np.float32)], axis=0)
    mask = np.concatenate([np.ones(n_real), np.zeros(n_pad)])
    ours = _our_bn_step(x_pad, mask, ref["weight"], ref["bias"])

    np.testing.assert_allclose(ours["out"][:n_real], ref["out"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours["running_mean"], ref["running_mean"],
                               rtol=1e-5, atol=1e-6)
    # torch updates running_var with the UNBIASED (n/(n-1)) estimate.
    np.testing.assert_allclose(ours["running_var"], ref["running_var"],
                               rtol=1e-5, atol=1e-6)


def test_no_mask_matches_torch_full_batch():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(9, 18, 16)).astype(np.float32)
    ref = _torch_bn_step(x)
    ours = _our_bn_step(x, None, ref["weight"], ref["bias"])
    np.testing.assert_allclose(ours["out"], ref["out"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours["running_var"], ref["running_var"],
                               rtol=1e-5, atol=1e-6)


def test_pad_row_content_is_irrelevant():
    """Garbage in the pad slots must not change real-row outputs or the
    running-stat update (the harness zeroes pads, but the mask alone must
    be sufficient)."""
    rng = np.random.default_rng(3)
    x_real = rng.normal(size=(6, 18, 16)).astype(np.float32)
    weight = np.ones(16, np.float32)
    bias = np.zeros(16, np.float32)
    mask = np.array([1] * 6 + [0] * 3, np.float32)

    zeros = np.concatenate([x_real, np.zeros((3, 18, 16), np.float32)])
    junk = np.concatenate(
        [x_real, 1e3 * rng.normal(size=(3, 18, 16)).astype(np.float32)])
    a = _our_bn_step(zeros, mask, weight, bias)
    b = _our_bn_step(junk, mask, weight, bias)
    np.testing.assert_allclose(a["out"][:6], b["out"][:6], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(a["running_mean"], b["running_mean"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(a["running_var"], b["running_var"],
                               rtol=1e-5, atol=1e-6)


def test_latent_cnn_models_thread_mask():
    """End-to-end through the zoo: padded-batch batch_stats with mask ==
    unpadded-batch batch_stats (light variant; dropout off for determinism)."""
    from fer_vit_tpu.models import create_latent_cnn

    rng = np.random.default_rng(0)
    x_real = jnp.asarray(rng.normal(size=(6, 18, 512)), jnp.float32)
    x_pad = jnp.concatenate([x_real, jnp.zeros((2, 18, 512))], axis=0)
    mask = jnp.array([1.0] * 6 + [0.0] * 2)

    m = create_latent_cnn("light", dropout=0.0)
    v = m.init(jax.random.PRNGKey(1), x_real)
    kw = dict(deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)},
              mutable=["batch_stats"])
    out_u, upd_u = m.apply(v, x_real, **kw)
    out_p, upd_p = m.apply(v, x_pad, mask=mask, **kw)
    np.testing.assert_allclose(np.asarray(out_p)[:6], np.asarray(out_u),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(upd_u["batch_stats"]),
                    jax.tree_util.tree_leaves(upd_p["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_all_pad_mask_stays_finite():
    """An all-pad mask must not 0/0-NaN the batch moments (which would
    permanently poison the running stats); moments clamp to finite."""
    from fer_vit_tpu.nn.masked_batchnorm import MaskedBatchNorm

    bn = MaskedBatchNorm(use_running_average=False)
    v = bn.init(jax.random.PRNGKey(0), jnp.zeros((4, 8)))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)),
                    jnp.float32)
    out, upd = bn.apply(v, x, mask=jnp.zeros(4), mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out)).all()
    for leaf in jax.tree_util.tree_leaves(upd["batch_stats"]):
        assert np.isfinite(np.asarray(leaf)).all()
