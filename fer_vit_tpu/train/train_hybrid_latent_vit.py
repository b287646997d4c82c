"""Train HybridLatentViT (pretrained timm trunk over latents).

Flag-for-flag CLI parity with the reference trainer (reference:
train/train_hybrid_latent_vit.py:386-421): model sizes, freezing flags,
adapters, ``--use_layerwise_lr`` (input_proj/adapters/head ×10, pos/CLS ×5
wd=0, reference :63-117). No mixup/label-smoothing/data-fraction — the
reference has none here. seq_len/latent_dim always auto-detected from the
data (reference :211-215).

Freezing is an optax mask (not requires_grad mutation); pretrained
ImageNet trunk weights load from a converted ``.npz``
(``--pretrained_npz``, see fer_vit_tpu.encoders.convert_timm).
"""

from __future__ import annotations

import argparse

from fer_vit_tpu.models import create_hybrid_latent_vit
from fer_vit_tpu.models.hybrid_latent_vit import (
    graft_pretrained,
    layerwise_lr_mult,
    trainable_mask,
)
from fer_vit_tpu.train.cli_common import (
    add_misc_args,
    load_stores,
    policy_from_args,
    run_latent_training,
)
from fer_vit_tpu.train.harness import TrainConfig
from fer_vit_tpu.utils.experiment_logger import create_experiment_name

import jax


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train Hybrid Latent ViT")
    parser.add_argument("--latent_train_dir", required=True)
    parser.add_argument("--latent_val_dir", required=True)
    # model
    parser.add_argument("--model_size", choices=["tiny", "small", "base"],
                        default="small")
    parser.add_argument("--num_classes", type=int, default=7)
    parser.add_argument("--use_pretrained", action="store_true")
    parser.add_argument("--pretrained_npz", default=None,
                        help="converted timm trunk weights (.npz)")
    parser.add_argument("--freeze_transformer", action="store_true")
    parser.add_argument("--freeze_stages", type=int, default=0)
    parser.add_argument("--use_adapter", action="store_true")
    parser.add_argument("--adapter_dim", type=int, default=64)
    # training
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=0.01)
    parser.add_argument("--scheduler", choices=["none", "cosine", "plateau"],
                        default="plateau")
    parser.add_argument("--use_class_weights", action="store_true")
    parser.add_argument("--use_layerwise_lr", action="store_true")
    add_misc_args(parser)
    return parser


def main(args) -> dict:
    args.seq_len = 0
    args.data_fraction = 1.0
    train_store, val_store = load_stores(args)
    policy = policy_from_args(args)
    freeze_stages = args.freeze_stages if args.freeze_stages > 0 else None

    model = create_hybrid_latent_vit(
        latent_dim=train_store.latent_dim,
        seq_len=train_store.seq_len,
        model_size=args.model_size,
        num_classes=args.num_classes,
        use_adapter=args.use_adapter,
        adapter_dim=args.adapter_dim,
        dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
    )

    cfg = TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        weight_decay=args.weight_decay, scheduler=args.scheduler,
        label_smoothing=0.0, mixup=0.0,
        use_class_weights=args.use_class_weights,
        num_classes=args.num_classes, seed=args.seed,
    )

    # Freezing / layer-wise LR as per-leaf update multipliers.
    import jax.numpy as jnp

    sample = jnp.zeros((1, train_store.seq_len, train_store.latent_dim))
    probe_params = jax.eval_shape(
        lambda: model.init(jax.random.key(0), sample)
    )["params"]
    lr_mult = wd_mask = None
    if args.use_layerwise_lr:
        lr_mult, wd_mask = layerwise_lr_mult(
            probe_params, args.freeze_transformer, freeze_stages
        )
    elif args.freeze_transformer or freeze_stages:
        frozen = trainable_mask(probe_params, args.freeze_transformer,
                                freeze_stages)
        lr_mult = jax.tree_util.tree_map(lambda t: 1.0 if t else 0.0, frozen)

    init_params_patch = None
    if args.use_pretrained:
        if args.pretrained_npz:
            from fer_vit_tpu.encoders.convert_psp import load_npz_variables
            from fer_vit_tpu.encoders.convert_psp import _flatten

            pretrained = _flatten(load_npz_variables(
                args.pretrained_npz)["params"])

            def init_params_patch(params):
                return graft_pretrained(params, pretrained,
                                        train_store.seq_len)
        else:
            print("WARNING: --use_pretrained without --pretrained_npz → "
                  "random-initialized trunk (no timm/network here; convert "
                  "weights with fer_vit_tpu.encoders.convert_timm)")

    model_config = {
        "latent_dim": train_store.latent_dim, "seq_len": train_store.seq_len,
        "model_size": args.model_size, "use_pretrained": args.use_pretrained,
        "freeze_transformer": args.freeze_transformer,
        "freeze_stages": freeze_stages,
        "use_adapter": args.use_adapter,
        "adapter_dim": args.adapter_dim if args.use_adapter else None,
    }
    training_config = {
        "epochs": args.epochs, "batch_size": args.batch_size, "lr": args.lr,
        "weight_decay": args.weight_decay, "scheduler": args.scheduler,
        "use_class_weights": args.use_class_weights,
        "use_layerwise_lr": args.use_layerwise_lr, "seed": args.seed,
    }
    config = {"model": model_config, "training": training_config,
              "data": {"train_dir": args.latent_train_dir,
                       "val_dir": args.latent_val_dir}}
    experiment_name = (
        f"hybrid_vit_{create_experiment_name(model_config, training_config)}"
    )

    # wire wd_mask through the harness via a small shim
    results = run_latent_training(
        args, model, cfg, experiment_name, config, train_store, val_store,
        lr_mult=lr_mult, init_params_patch=init_params_patch,
        wd_mask=wd_mask,
        # reference optimizer-group order (train_hybrid_latent_vit.py:65-117):
        # input_proj x10, transformer x1, [adapters x10], head x10, pos/CLS x5
        lr_group_mults=([10.0, 1.0] + ([10.0] if args.use_adapter else [])
                        + [10.0, 5.0]) if args.use_layerwise_lr else None,
    )
    return results


if __name__ == "__main__":
    main(build_parser().parse_args())
