"""Legacy single-file ViT fine-tune trainer (the reference's ``vit-fer.py``).

Capability parity (reference: vit-fer.py:38-104): ViT-B/16 architecture
(ImageNet weights via a converted ``.npz`` if provided — torchvision isn't
in this environment), [−0.5, 0.5] normalization with grayscale→3ch handled
at decode, Adam(1e-4), plain CE, per-epoch train loss + test accuracy,
``metrics.csv`` (Epoch, Train Loss, Test Accuracy) and a ``loss_acc.png``
curve figure.
"""

from __future__ import annotations

import argparse
import csv
import os

import jax
import jax.numpy as jnp
import numpy as np

from fer_vit_tpu.data.image_pipeline import ImageStore
from fer_vit_tpu.models.timm_vit import create_timm_vit
from fer_vit_tpu.train.harness import Harness, TrainConfig
from fer_vit_tpu.utils.metrics import metrics_from_confusion


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Legacy ViT-B/16 FER fine-tune")
    p.add_argument("--train_dir", required=True)
    p.add_argument("--test_dir", required=True)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--out_dir", default="learning_process")
    p.add_argument("--pretrained_npz", default=None)
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--model_size", choices=["tiny", "small", "base"],
                   default="base")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume", default=None,
                   help="checkpoint path (out_dir/last_model.pt) to resume "
                        "from — params, optimizer, epoch, metric history")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (SURVEY.md §5 sanitizer)")
    return p


def main(args) -> dict:
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    os.makedirs(args.out_dir, exist_ok=True)
    train_store = ImageStore.load(args.train_dir, args.img_size)
    test_store = ImageStore.load(args.test_dir, args.img_size)

    model, patch = create_timm_vit(args.model_size, num_classes=7,
                                   img_size=args.img_size,
                                   pretrained_npz=args.pretrained_npz)
    cfg = TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        weight_decay=0.0,  # legacy script uses plain Adam
        scheduler="none", label_smoothing=0.0, mixup=0.0, seed=args.seed,
    )

    def norm(xb):
        # reference transform (vit-fer.py:19-24): Grayscale(3ch) THEN
        # (x − 0.5)/0.5 — color inputs must collapse to replicated luma
        # (ITU-R 601 weights, matching PIL/torchvision convert('L') up to
        # their integer rounding), not pass through as RGB
        x = xb.astype(jnp.float32) / 255.0
        luma = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
        x = jnp.stack([luma, luma, luma], axis=-1)
        return (x - 0.5) / 0.5

    harness = Harness(model=model, cfg=cfg,
                      augment_fn=lambda key, xb: norm(xb),
                      eval_transform=norm)
    state = harness.init_state(
        jax.random.key(args.seed),
        jnp.zeros((1, args.img_size, args.img_size, 3)),
    )
    if patch is not None:
        state = state.replace(params=patch(state.params))

    tx = jnp.asarray(train_store.images)
    ty = jnp.asarray(train_store.labels, jnp.int32)
    vx = jnp.asarray(test_store.images)
    vy = jnp.asarray(test_store.labels, jnp.int32)

    from flax import serialization

    ckpt_path = os.path.join(args.out_dir, "last_model.pt")
    train_losses, test_accuracies, start_epoch = [], [], 1
    if args.resume:
        with open(args.resume, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        state = serialization.from_bytes(state, payload["state"])
        start_epoch = int(payload["epoch"]) + 1
        train_losses = list(payload["train_losses"])
        test_accuracies = list(payload["test_accuracies"])
        print(f"Resumed from {args.resume} at epoch {payload['epoch']}")

    for epoch in range(start_epoch, args.epochs + 1):
        key = jax.random.fold_in(jax.random.key(args.seed), epoch)
        state, loss, _ = harness.train_epoch(state, key, tx, ty,
                                             jnp.float32(args.lr), None)
        _, cm = harness.eval_epoch(state, vx, vy, None)
        acc = metrics_from_confusion(np.asarray(cm))["accuracy"]
        train_losses.append(float(loss))
        test_accuracies.append(acc)
        print(f"Epoch {epoch}/{args.epochs}  loss={float(loss):.4f}  "
              f"test_acc={acc:.4f}")
        with open(ckpt_path, "wb") as f:
            f.write(serialization.msgpack_serialize({
                "epoch": epoch,
                "state": serialization.to_bytes(state),
                "train_losses": [float(v) for v in train_losses],
                "test_accuracies": [float(v) for v in test_accuracies],
            }))

    # curve figure + CSV (reference :92-104)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        # size by the actual history, not args.epochs — a resume with
        # --epochs at/below the checkpointed epoch has more entries
        n_hist = len(train_losses)
        fig, ax1 = plt.subplots(figsize=(8, 5))
        ax1.plot(range(1, n_hist + 1), train_losses, "b-",
                 label="Train Loss")
        ax1.set_xlabel("Epoch")
        ax1.set_ylabel("Train Loss", color="b")
        ax2 = ax1.twinx()
        ax2.plot(range(1, n_hist + 1), test_accuracies, "r-",
                 label="Test Accuracy")
        ax2.set_ylabel("Test Accuracy", color="r")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out_dir, "loss_acc.png"))
        plt.close(fig)
    except ImportError:
        pass

    csv_path = os.path.join(args.out_dir, "metrics.csv")
    with open(csv_path, "w", newline="", encoding="utf-8") as f:
        writer = csv.writer(f)
        writer.writerow(["Epoch", "Train Loss", "Test Accuracy"])
        for e in range(len(train_losses)):
            writer.writerow([e + 1, train_losses[e], test_accuracies[e]])
    print(f"metrics saved to {csv_path}")
    return {"train_losses": train_losses, "test_accuracies": test_accuracies}


if __name__ == "__main__":
    main(build_parser().parse_args())
