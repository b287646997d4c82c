"""Train the latent CNN baselines on pSp w+ latents.

Flag-for-flag CLI parity with the reference trainer (reference:
train/train_latent_cnn.py:380-407): ``--model_type light|standard|deep|2d``,
mixup hardcoded to α=1.0 (reference :115-120), experiment name
``latent_cnn_{type}_ep{E}_bs{B}_lr{LR}[_frac{F}]`` (reference :290-294).
"""

from __future__ import annotations

import argparse

from fer_vit_tpu.models import create_latent_cnn
from fer_vit_tpu.train.cli_common import (
    add_data_args,
    add_misc_args,
    add_training_args,
    load_stores,
    policy_from_args,
    run_latent_training,
)
from fer_vit_tpu.train.harness import TrainConfig


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train Latent CNN baselines")
    add_data_args(parser, augmentation=False)
    add_training_args(parser, mixup=False)
    parser.add_argument("--model_type",
                        choices=["light", "standard", "deep", "2d"],
                        default="standard")
    parser.add_argument("--latent_dim", type=int, default=512)
    parser.add_argument("--seq_len", type=int, default=0)
    parser.add_argument("--num_classes", type=int, default=7)
    parser.add_argument("--dropout", type=float, default=0.3)
    add_misc_args(parser)
    return parser


def main(args) -> dict:
    train_store, val_store = load_stores(args)
    policy = policy_from_args(args)

    model = create_latent_cnn(
        args.model_type,
        latent_dim=args.latent_dim,
        seq_len=args.seq_len,
        num_classes=args.num_classes,
        dropout=args.dropout,
        dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
    )

    cfg = TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        weight_decay=args.weight_decay, scheduler=args.scheduler,
        label_smoothing=args.label_smoothing,
        mixup=1.0,  # hardcoded in the reference (train_latent_cnn.py:115-120)
        use_class_weights=args.use_class_weights,
        num_classes=args.num_classes, seed=args.seed,
        clean_metrics_forward=True,  # reference train_latent_cnn.py:134
    )

    config = {
        "model": {
            "model_type": args.model_type, "latent_dim": args.latent_dim,
            "seq_len": args.seq_len, "num_classes": args.num_classes,
            "dropout": args.dropout,
        },
        "training": {
            "epochs": args.epochs, "batch_size": args.batch_size,
            "lr": args.lr, "weight_decay": args.weight_decay,
            "use_class_weights": args.use_class_weights,
            "scheduler": args.scheduler, "seed": args.seed,
            "data_fraction": args.data_fraction,
        },
        "data": {
            "train_dir": args.latent_train_dir,
            "val_dir": args.latent_val_dir,
            "train_samples_total": train_store.total_samples,
            "train_samples_used": len(train_store),
            "val_samples": len(val_store),
        },
    }

    base = (f"latent_cnn_{args.model_type}_ep{args.epochs}"
            f"_bs{args.batch_size}_lr{args.lr}")
    experiment_name = (
        f"{base}_frac{int(args.data_fraction * 100)}"
        if args.data_fraction < 1.0 else base
    )

    return run_latent_training(args, model, cfg, experiment_name, config,
                               train_store, val_store)


if __name__ == "__main__":
    parsed = build_parser().parse_args()
    main(parsed)
