"""Tutorial: a Vision Transformer from scratch in pure JAX.

JAX counterpart of the reference tutorial (reference:
sample_code/vit-sample.py — patch-embed, manual multi-head self-attention,
pre-norm encoder blocks, MLP head — educational, not product surface).
Everything here is explicit functions + parameter pytrees; no Flax, no
framework magic, to show what the real models in ``fer_vit_tpu`` compile
down to.

Run:  python examples/vit_from_scratch.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_vit(key, img_size=28, patch=7, dim=64, depth=2, heads=4,
             mlp_dim=128, channels=1, num_classes=10):
    n_patches = (img_size // patch) ** 2
    keys = iter(jax.random.split(key, 4 + depth * 4))  # 4 linears per block

    def dense(k, din, dout):
        return {"w": jax.random.normal(k, (din, dout)) * (din ** -0.5),
                "b": jnp.zeros(dout)}

    params = {
        "patch": dense(next(keys), patch * patch * channels, dim),
        "cls": jax.random.normal(next(keys), (1, 1, dim)) * 0.02,
        "pos": jax.random.normal(next(keys), (1, n_patches + 1, dim)) * 0.02,
        "head": dense(next(keys), dim, num_classes),
        "blocks": [],
    }
    for _ in range(depth):
        params["blocks"].append({
            "ln1": {"g": jnp.ones(dim), "b": jnp.zeros(dim)},
            "qkv": dense(next(keys), dim, 3 * dim),
            "proj": dense(next(keys), dim, dim),
            "ln2": {"g": jnp.ones(dim), "b": jnp.zeros(dim)},
            "fc1": dense(next(keys), dim, mlp_dim),
            "fc2": dense(next(keys), mlp_dim, dim),
        })
    return params, dict(patch=patch, heads=heads)


def layer_norm(x, p):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * p["g"] + p["b"]


def attention(x, p, heads):
    b, l, d = x.shape
    qkv = x @ p["qkv"]["w"] + p["qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda t: t.reshape(b, l, heads, d // heads).transpose(0, 2, 1, 3)
    q, k, v = split(q), split(k), split(v)
    scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(d / heads)
    w = jax.nn.softmax(scores, axis=-1)
    out = (w @ v).transpose(0, 2, 1, 3).reshape(b, l, d)
    return out @ p["proj"]["w"] + p["proj"]["b"]


def vit_forward(params, cfg, images):
    """images: (B, H, W, C) → logits."""
    b, h, w, c = images.shape
    p = cfg["patch"]
    # patchify: (B, H/p, p, W/p, p, C) → (B, N, p·p·C)
    x = images.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, p * p * c)
    x = x @ params["patch"]["w"] + params["patch"]["b"]
    cls = jnp.broadcast_to(params["cls"], (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"]
    for blk in params["blocks"]:
        x = x + attention(layer_norm(x, blk["ln1"]), blk, cfg["heads"])
        h_ = layer_norm(x, blk["ln2"])
        h_ = jax.nn.gelu(h_ @ blk["fc1"]["w"] + blk["fc1"]["b"])
        x = x + h_ @ blk["fc2"]["w"] + blk["fc2"]["b"]
    return x[:, 0] @ params["head"]["w"] + params["head"]["b"]


def main():
    params, cfg = init_vit(jax.random.key(0))
    # synthetic "digits": class = dominant quadrant intensity pattern
    rng = np.random.default_rng(0)
    x = rng.normal(size=(512, 28, 28, 1)).astype(np.float32)
    y = rng.integers(0, 10, 512)
    for i in range(512):
        q = y[i] % 4
        x[i, 14 * (q // 2):14 * (q // 2) + 14,
          14 * (q % 2):14 * (q % 2) + 14] += y[i] / 3.0

    def loss_fn(params, xb, yb):
        logits = vit_forward(params, cfg, xb)
        logp = jax.nn.log_softmax(logits)
        return -logp[jnp.arange(len(yb)), yb].mean()

    @jax.jit
    def step(params, xb, yb, lr=1e-2):
        loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
        params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return params, loss

    xb, yb = jnp.asarray(x), jnp.asarray(y)
    for epoch in range(10):
        params, loss = step(params, xb, yb)
        acc = (vit_forward(params, cfg, xb).argmax(-1) == yb).mean()
        print(f"epoch {epoch}: loss={float(loss):.4f} acc={float(acc):.3f}")


if __name__ == "__main__":
    main()
