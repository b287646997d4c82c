"""Train ExpressionAwareViT (frozen SVM-direction decomposer + hybrid ViT).

Flag-for-flag CLI parity with the reference trainer (reference:
train/train_expression_aware_vit.py:304-330): decomposition modes, hybrid
ViT options, layer-wise LR. The decomposer is a constant transform, so the
trained params are exactly the ViT's (the reference's
``get_trainable_params`` restriction, expression_aware_vit.py:124-126, is
automatic here).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from fer_vit_tpu.models import ExpressionAwareViT
from fer_vit_tpu.models.hybrid_latent_vit import (
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


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train Expression-Aware ViT")
    parser.add_argument("--latent_train_dir", required=True)
    parser.add_argument("--latent_val_dir", required=True)
    parser.add_argument("--directions_path", required=True)
    parser.add_argument("--output_mode",
                        choices=["expr_only", "id_only", "enhanced", "concat"],
                        default="expr_only")
    parser.add_argument("--decompose_mode",
                        choices=["all_classes", "max_class"],
                        default="all_classes")
    parser.add_argument("--enhance_alpha", type=float, default=2.0)
    parser.add_argument("--model_size", choices=["tiny", "small", "base"],
                        default="small")
    parser.add_argument("--num_classes", type=int, default=7)
    parser.add_argument("--use_pretrained", action="store_true")
    parser.add_argument("--pretrained_npz", default=None)
    parser.add_argument("--freeze_transformer", action="store_true")
    parser.add_argument("--freeze_stages", type=int, default=0)
    parser.add_argument("--use_adapter", action="store_true")
    parser.add_argument("--adapter_dim", type=int, default=64)
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

    model = ExpressionAwareViT.from_config(
        args.directions_path,
        model_size=args.model_size,
        num_classes=args.num_classes,
        use_adapter=args.use_adapter,
        adapter_dim=args.adapter_dim,
        output_mode=args.output_mode,
        enhance_alpha=args.enhance_alpha,
        decompose_mode=args.decompose_mode,
        dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
    )
    print(f"[ExpressionAwareViT] decompose={args.decompose_mode} "
          f"output={args.output_mode} seq_len={model.vit.seq_len}")

    cfg = TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        weight_decay=args.weight_decay, scheduler=args.scheduler,
        label_smoothing=0.0, mixup=0.0,
        use_class_weights=args.use_class_weights,
        num_classes=args.num_classes, seed=args.seed,
    )

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

    model_cfg = {
        "model_size": args.model_size, "output_mode": args.output_mode,
        "decompose_mode": args.decompose_mode,
        "enhance_alpha": args.enhance_alpha,
        "use_pretrained": args.use_pretrained,
        "freeze_transformer": args.freeze_transformer,
        "freeze_stages": freeze_stages, "use_adapter": args.use_adapter,
        "directions_path": args.directions_path,
    }
    training_cfg = {
        "epochs": args.epochs, "batch_size": args.batch_size, "lr": args.lr,
        "weight_decay": args.weight_decay, "scheduler": args.scheduler,
        "use_class_weights": args.use_class_weights,
        "use_layerwise_lr": args.use_layerwise_lr, "seed": args.seed,
    }
    # pretrained trunk graft — same route as the hybrid trainer (the
    # reference passes use_pretrained into from_config, which pulls timm;
    # here converted .npz weights graft into the freshly-initialized ViT).
    # NOTE: pos-emb interpolation targets model.vit.seq_len, which is
    # DOUBLE the store's in concat output mode.
    init_params_patch = None
    if args.use_pretrained:
        if args.pretrained_npz:
            from fer_vit_tpu.encoders.convert_psp import (
                _flatten,
                load_npz_variables,
            )
            from fer_vit_tpu.models.hybrid_latent_vit import graft_pretrained

            pretrained = _flatten(load_npz_variables(
                args.pretrained_npz)["params"])
            vit_seq_len = model.vit.seq_len

            def init_params_patch(params):
                return graft_pretrained(params, pretrained, vit_seq_len)
        else:
            print("WARNING: --use_pretrained without --pretrained_npz → "
                  "random-initialized trunk (no timm/network here; convert "
                  "weights with fer_vit_tpu.encoders.convert_timm)")

    config = {"model": model_cfg, "training": training_cfg,
              "data": {"train_dir": args.latent_train_dir,
                       "val_dir": args.latent_val_dir}}
    exp_name = f"expr_aware_vit_{create_experiment_name(model_cfg, training_cfg)}"

    return run_latent_training(
        args, model, cfg, exp_name, config, train_store, val_store,
        lr_mult=lr_mult, wd_mask=wd_mask,
        init_params_patch=init_params_patch,
        # reference group order (train_expression_aware_vit.py:66-96
        # mirrors the hybrid trainer's): input_proj ×10, transformer ×1,
        # [adapters ×10], head ×10, pos/CLS ×5
        lr_group_mults=([10.0, 1.0] + ([10.0] if args.use_adapter else [])
                        + [10.0, 5.0]) if args.use_layerwise_lr else None)


if __name__ == "__main__":
    main(build_parser().parse_args())
