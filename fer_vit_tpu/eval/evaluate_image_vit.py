"""Evaluate a trained ImageViT checkpoint on a class-dir image set.

Same pattern as :mod:`fer_vit_tpu.eval.evaluate_model` for the image path
(reference: eval/evaluate_image_vit.py).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from fer_vit_tpu import EMOTION_NAMES
from fer_vit_tpu.data.image_pipeline import ImageStore, normalize_images
from fer_vit_tpu.eval.evaluate_model import _plots
from fer_vit_tpu.models import ImageViT
from fer_vit_tpu.models.timm_vit import create_timm_vit
from fer_vit_tpu.utils.compile_opts import tuned_jit
from fer_vit_tpu.utils.experiment_logger import ExperimentLogger
from fer_vit_tpu.utils.metrics import (
    classification_report,
    confusion_update,
    metrics_from_confusion,
)


def model_from_config(model_config: dict):
    model_config = dict(model_config)
    model_config.setdefault("num_classes", 7)
    if model_config.get("use_pretrained"):
        model, _ = create_timm_vit(
            model_config.get("model_size", "small"),
            num_classes=model_config["num_classes"],
            img_size=model_config.get("img_size", 224),
        )
        return model
    size_presets = {
        "tiny": dict(embed_dim=192, depth=12, heads=3, mlp_dim=768),
        "small": dict(embed_dim=384, depth=12, heads=6, mlp_dim=1536),
        "base": dict(embed_dim=768, depth=12, heads=12, mlp_dim=3072),
    }
    preset = size_presets.get(model_config.get("model_size", "custom"), {})
    return ImageViT(
        img_size=model_config.get("img_size", 224),
        patch_size=model_config.get("patch_size", 16),
        embed_dim=preset.get("embed_dim", model_config.get("embed_dim", 384)),
        depth=preset.get("depth", model_config.get("depth", 12)),
        heads=preset.get("heads", model_config.get("heads", 6)),
        mlp_dim=preset.get("mlp_dim", model_config.get("mlp_dim", 1536)),
        num_classes=model_config["num_classes"],
        dropout=model_config.get("dropout", 0.1),
    )


def _load_torch_model(checkpoint_path: str):
    """Reference-format torch ImageViT checkpoint → (model, variables,
    config, img_size) via fer_vit_tpu.interop (same route as
    evaluate_model.load_torch_model)."""
    from fer_vit_tpu.interop import (
        from_torch_state_dict,
        read_torch_checkpoint,
    )

    ckpt, config, model_config, sd = read_torch_checkpoint(checkpoint_path)
    model = model_from_config(model_config)
    img_size = model_config.get("img_size", 224)
    tv = model.init(jax.random.key(0), jnp.zeros((1, img_size, img_size, 3)))
    params, batch_stats = from_torch_state_dict(
        "image_vit", sd, tv["params"], tv.get("batch_stats"),
        config=model_config)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    print(f"Loaded torch ImageViT checkpoint (epoch "
          f"{ckpt.get('epoch', 'unknown')}) from {checkpoint_path}")
    return model, variables, config, img_size


def load_model(checkpoint_path: str):
    from fer_vit_tpu.eval.evaluate_model import _is_torch_checkpoint

    if _is_torch_checkpoint(checkpoint_path):
        return _load_torch_model(checkpoint_path)
    raw = ExperimentLogger.load_checkpoint(checkpoint_path)
    config = raw["config"]
    model_config = config.get("model", config)
    model = model_from_config(model_config)
    img_size = model_config.get("img_size", 224)

    from fer_vit_tpu.train.harness import TrainConfig, TrainState, make_optimizer

    tcfg = config.get("training", {})
    cfg = TrainConfig(optimizer=tcfg.get("optimizer", "adamw"),
                      weight_decay=tcfg.get("weight_decay", 0.05),
                      grad_clip=tcfg.get("grad_clip") or 0.0)
    tv = model.init(jax.random.key(0), jnp.zeros((1, img_size, img_size, 3)))
    template = TrainState(params=tv["params"],
                          batch_stats=tv.get("batch_stats", {}),
                          opt_state=make_optimizer(cfg).init(tv["params"]))
    # restore from the bytes already read above — no second file read
    from flax import serialization

    state = serialization.from_bytes(template, raw["state_bytes"])
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return model, variables, config, img_size


def build_parser() -> argparse.ArgumentParser:
    """Reference CLI contract (reference eval/evaluate_image_vit.py:208-213)
    plus this framework's conventions: ``--device`` is accepted as a
    documented no-op (device placement is JAX's job), ``--img_size 0``
    means auto-from-checkpoint (the reference always resizes to the flag's
    value; auto is the safer default for small custom checkpoints)."""
    parser = argparse.ArgumentParser(description="Evaluate ImageViT")
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--test_dir", required=True)
    parser.add_argument("--output_dir", default="eval_results")
    parser.add_argument("--device", default="cuda",
                        help="accepted for reference CLI compatibility; "
                             "ignored (JAX manages devices)")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--img_size", type=int, default=0,
                        help="expected eval resolution; must match the "
                             "checkpoint's img_size (0 = auto from the "
                             "checkpoint)")
    return parser


def main(args) -> dict:
    os.makedirs(args.output_dir, exist_ok=True)
    model, variables, config, img_size = load_model(args.checkpoint_path)
    if getattr(args, "img_size", 0):
        if args.img_size != img_size:
            # The model is built from the checkpoint's geometry; its learned
            # pos-embedding is fixed at that token count, so a different
            # eval resolution cannot work — fail with the reason instead of
            # a shape error deep inside model.apply.
            raise SystemExit(
                f"--img_size {args.img_size} != checkpoint img_size "
                f"{img_size}: ImageViT's pos-embedding is fixed at the "
                "training resolution; use --img_size 0 (auto).")
        img_size = args.img_size
    store = ImageStore.load(args.test_dir, img_size)

    apply = tuned_jit(lambda v, x: model.apply(v, normalize_images(x)))
    preds, probs = [], []
    for i in range(0, len(store), args.batch_size):
        logits = apply(variables, jnp.asarray(store.images[i:i + args.batch_size]))
        probs.append(np.asarray(jax.nn.softmax(logits, axis=-1)))
        preds.append(np.asarray(jnp.argmax(logits, axis=-1)))
    preds, probs = np.concatenate(preds), np.concatenate(probs)
    cm = np.asarray(confusion_update(
        jnp.zeros((7, 7)), jnp.asarray(preds), jnp.asarray(store.labels),
        jnp.ones(len(store)),
    ))

    m = metrics_from_confusion(cm)
    names = [n.capitalize() for n in EMOTION_NAMES]
    print("\nClassification Report:")
    print(classification_report(cm, names))
    _plots(cm, probs, preds, store.labels, args.output_dir)

    report = {
        "checkpoint": args.checkpoint_path, "test_dir": args.test_dir,
        "num_samples": len(store), "accuracy": m["accuracy"],
        "f1_macro": m["f1_macro"], "f1_weighted": m["f1_weighted"],
        "config": config,
    }
    with open(os.path.join(args.output_dir, "evaluation_report.json"), "w") as f:
        json.dump(report, f, indent=2)

    # the reference's exact output file + schema (frozen contract —
    # reference eval/evaluate_image_vit.py:286-299)
    from fer_vit_tpu.utils.metrics import classification_report_dict

    results_summary = {
        "accuracy": m["accuracy"],
        "classification_report": classification_report_dict(cm, names),
        "model_config": config.get("model", config),
        "checkpoint_path": args.checkpoint_path,
        "test_dataset_size": len(store),
    }
    with open(os.path.join(args.output_dir,
                           "evaluation_results.json"), "w") as f:
        json.dump(results_summary, f, indent=2)
    return report


if __name__ == "__main__":
    main(build_parser().parse_args())
