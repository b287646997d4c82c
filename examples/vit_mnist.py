"""Tutorial: fine-tune a ViT on MNIST-style data with fer_vit_tpu.

JAX counterpart of the reference tutorial (reference:
sample_code/vit-mnist.py — torchvision vit_b_16 fine-tuned on MNIST). Uses
the framework's TimmViT + Harness; MNIST download needs network, so without
the dataset on disk this runs on synthetic digits to demonstrate the flow.

Run:  python examples/vit_mnist.py [--mnist_dir path/to/mnist_png]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from fer_vit_tpu.models.timm_vit import create_timm_vit
from fer_vit_tpu.train.harness import Harness, TrainConfig
from fer_vit_tpu.utils.metrics import metrics_from_confusion


def synthetic_digits(n=256, size=32):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, size, size, 3)).astype(np.float32) * 0.1
    y = rng.integers(0, 10, n).astype(np.int32)
    for i in range(n):  # draw y[i] horizontal bars
        for b in range(y[i]):
            r = 2 + 3 * b
            if r < size - 1:
                x[i, r:r + 2, 4:-4] += 1.0
        x[i] = np.clip(x[i], 0, 1) * 255
    return x.astype(np.uint8), y


def load_digit_dir(root, img_size):
    """MNIST-png layout: root/0..9/*.png. (ImageStore only scans the seven
    FER emotion class dirs, so digits need this local loader.)"""
    import os

    from PIL import Image

    xs, ys = [], []
    for digit in range(10):
        cls = os.path.join(root, str(digit))
        if not os.path.isdir(cls):
            continue
        for f in sorted(os.listdir(cls)):
            if f.lower().endswith((".png", ".jpg", ".jpeg")):
                with Image.open(os.path.join(cls, f)) as im:
                    xs.append(np.asarray(
                        im.convert("RGB").resize((img_size, img_size),
                                                 Image.BILINEAR), np.uint8))
                ys.append(digit)
    if not xs:
        raise ValueError(f"no digit-class (0..9) images under {root}")
    return np.stack(xs), np.asarray(ys, np.int32)


def main(args):
    if args.mnist_dir:
        x, y = load_digit_dir(args.mnist_dir, args.img_size)
    else:
        print("no --mnist_dir given: using synthetic digits")
        x, y = synthetic_digits(size=args.img_size)

    model, patch = create_timm_vit(
        "tiny", num_classes=10, img_size=args.img_size,
        pretrained_npz=args.pretrained_npz,
    )
    cfg = TrainConfig(epochs=args.epochs, batch_size=32, lr=1e-3,
                      weight_decay=0.0, scheduler="none",
                      label_smoothing=0.0, mixup=0.0, num_classes=10)

    norm = lambda xb: (xb.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    h = Harness(model=model, cfg=cfg, augment_fn=lambda k, xb: norm(xb),
                eval_transform=norm)
    state = h.init_state(jax.random.key(0),
                         jnp.zeros((1, args.img_size, args.img_size, 3)))
    if patch is not None:
        state = state.replace(params=patch(state.params))

    xb, yb = jnp.asarray(x), jnp.asarray(y)
    for epoch in range(1, cfg.epochs + 1):
        state, loss, _ = h.train_epoch(
            state, jax.random.fold_in(jax.random.key(0), epoch),
            xb, yb, jnp.float32(cfg.lr), None)
        _, cm = h.eval_epoch(state, xb, yb, None)
        acc = metrics_from_confusion(np.asarray(cm))["accuracy"]
        print(f"epoch {epoch}: loss={float(loss):.4f} train_acc={acc:.3f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mnist_dir", default=None,
                   help="class-dir MNIST PNGs (0..9); synthetic if absent")
    p.add_argument("--img_size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--pretrained_npz", default=None)
    args = p.parse_args()
    main(args)
