"""Transformer-stack numerical parity vs torch.

The reference models are built on ``torch.nn.TransformerEncoderLayer``
(post-norm; ReLU for LatentViT, GELU for ImageViT). Same weights → same
logits is the foundation of the ±0.5% val-acc parity target (BASELINE.md):
this converts a torch encoder layer's state_dict into our params and checks
the full forward, plus a complete LatentViT against a torch replica.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fer_vit_tpu.models import LatentViT  # noqa: E402
from fer_vit_tpu.nn.transformer import TransformerEncoderLayer  # noqa: E402


def _convert_torch_layer(sd, prefix=""):
    """torch TransformerEncoderLayer state_dict → our layer params."""
    def g(k):
        return sd[f"{prefix}{k}"].detach().numpy().astype(np.float32)

    return {
        "self_attn": {
            "in_proj_kernel": g("self_attn.in_proj_weight").T,
            "in_proj_bias": g("self_attn.in_proj_bias"),
            "out_proj_kernel": g("self_attn.out_proj.weight").T,
            "out_proj_bias": g("self_attn.out_proj.bias"),
        },
        "linear1": {"kernel": g("linear1.weight").T, "bias": g("linear1.bias")},
        "linear2": {"kernel": g("linear2.weight").T, "bias": g("linear2.bias")},
        "norm1": {"scale": g("norm1.weight"), "bias": g("norm1.bias")},
        "norm2": {"scale": g("norm2.weight"), "bias": g("norm2.bias")},
    }


@pytest.mark.parametrize("activation", ["relu", "gelu"])
def test_encoder_layer_matches_torch(activation):
    d, h, mlp, L, B = 64, 4, 128, 19, 3
    torch.manual_seed(0)
    t_layer = torch.nn.TransformerEncoderLayer(
        d_model=d, nhead=h, dim_feedforward=mlp, dropout=0.0,
        activation=activation, batch_first=True,
    ).eval()
    params = _convert_torch_layer(t_layer.state_dict())

    x = np.random.default_rng(0).normal(size=(B, L, d)).astype(np.float32)
    with torch.no_grad():
        expected = t_layer(torch.tensor(x)).numpy()

    layer = TransformerEncoderLayer(embed_dim=d, num_heads=h, mlp_dim=mlp,
                                    dropout=0.0, activation=activation)
    # highest precision: this env's default f32 matmuls run in bf16
    # (oneDNN/AMX), which would mask semantic bugs behind ~3e-3 noise.
    with jax.default_matmul_precision("highest"):
        got = np.asarray(layer.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=5e-5)


class TorchLatentViTReplica(torch.nn.Module):
    """Independent torch replica of the reference LatentViT architecture
    (models_fer_vit/latent_vit.py:5-48) as a parity oracle."""

    def __init__(self, latent_dim=64, seq_len=18, embed_dim=64, depth=2,
                 heads=4, mlp_dim=128, num_classes=7):
        super().__init__()
        self.input_proj = torch.nn.Linear(latent_dim, embed_dim)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, embed_dim))
        self.pos_emb = torch.nn.Parameter(torch.randn(1, seq_len + 1, embed_dim))
        layer = torch.nn.TransformerEncoderLayer(
            d_model=embed_dim, nhead=heads, dim_feedforward=mlp_dim,
            dropout=0.0, batch_first=True,
        )
        self.transformer = torch.nn.TransformerEncoder(layer, num_layers=depth)
        self.mlp_head = torch.nn.Sequential(
            torch.nn.LayerNorm(embed_dim),
            torch.nn.Linear(embed_dim, num_classes),
        )

    def forward(self, x):
        x = self.input_proj(x)
        cls = self.cls_token.expand(x.size(0), -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_emb
        x = self.transformer(x)
        return self.mlp_head(x[:, 0])


def test_latent_vit_matches_torch_replica():
    torch.manual_seed(1)
    depth = 2
    ref = TorchLatentViTReplica(depth=depth).eval()
    sd = ref.state_dict()

    params = {
        "input_proj": {
            "kernel": sd["input_proj.weight"].numpy().T.astype(np.float32),
            "bias": sd["input_proj.bias"].numpy().astype(np.float32),
        },
        "cls_token": sd["cls_token"].numpy().astype(np.float32),
        "pos_emb": sd["pos_emb"].numpy().astype(np.float32),
        "transformer": {
            f"layers_{i}": _convert_torch_layer(
                sd, prefix=f"transformer.layers.{i}.")
            for i in range(depth)
        },
        "head_norm": {
            "scale": sd["mlp_head.0.weight"].numpy().astype(np.float32),
            "bias": sd["mlp_head.0.bias"].numpy().astype(np.float32),
        },
        "head": {
            "kernel": sd["mlp_head.1.weight"].numpy().T.astype(np.float32),
            "bias": sd["mlp_head.1.bias"].numpy().astype(np.float32),
        },
    }

    model = LatentViT(latent_dim=64, seq_len=18, embed_dim=64, depth=depth,
                      heads=4, mlp_dim=128, dropout=0.0)
    x = np.random.default_rng(2).normal(size=(4, 18, 64)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.tensor(x)).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=5e-5)
    # same prediction for every sample
    np.testing.assert_array_equal(got.argmax(1), expected.argmax(1))
