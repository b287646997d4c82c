"""Evaluate a trained latent-model checkpoint.

Capability parity with the reference evaluator (reference:
eval/evaluate_model.py): checkpoint-polymorphic loading (model class
discriminated from the embedded config — ``model_size`` → HybridLatentViT,
``model_type`` → latent CNN, ``use_lwn/spe/leam`` flags → LatentViTv2, else
LatentViT; reference :50-114), test metrics, confusion matrices (normalized
+ counts), per-class precision/recall/F1 bars, prediction-confidence
histograms, and a JSON report (reference :423-436).

CLI parity (reference :330-337): ``--checkpoint_path --latent_test_dir
--output_dir --batch_size``.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fer_vit_tpu import EMOTION_NAMES
from fer_vit_tpu.data.latent_store import LatentStore
from fer_vit_tpu.models import (
    LatentViT,
    LatentViTv2,
    create_hybrid_latent_vit,
    create_latent_cnn,
)
from fer_vit_tpu.utils.compile_opts import tuned_jit
from fer_vit_tpu.utils.experiment_logger import ExperimentLogger
from fer_vit_tpu.utils.metrics import (
    classification_report,
    classification_report_dict,
    confusion_update,
    metrics_from_confusion,
)


def is_image_config(model_config: dict) -> bool:
    """THE image-vs-latent checkpoint discrimination (reference
    eval/evaluate_model.py:79-114 discriminates by config keys the same
    way). Every checkpoint router (this module, serve.Predictor) must use
    this one predicate so a new image-config key can't split the routes."""
    return "img_size" in model_config or "patch_size" in model_config


def model_from_config(model_config: dict):
    """Rebuild the right model class from a checkpoint's model config
    (reference discrimination logic, eval/evaluate_model.py:50-114)."""
    model_config = dict(model_config)
    model_config.setdefault("num_classes", 7)
    if is_image_config(model_config):
        # rebuild extension: image checkpoints route here too (the
        # reference splits this into eval/evaluate_image_vit.py). Image
        # configs also carry model_size (tiny/small/base/custom, reference
        # train/train_image_vit.py:237-246) whose presets override the raw
        # CLI dims saved in the config, and use_pretrained selects the timm
        # architecture — delegate to the image evaluator's builder, which
        # owns that logic (lazy import: it imports us for _plots).
        from fer_vit_tpu.eval import evaluate_image_vit

        return evaluate_image_vit.model_from_config(model_config)
    if "model_size" in model_config:
        return create_hybrid_latent_vit(
            latent_dim=model_config.get("latent_dim", 512),
            seq_len=model_config.get("seq_len", 18),
            model_size=model_config.get("model_size", "small"),
            num_classes=model_config["num_classes"],
            use_adapter=bool(model_config.get("use_adapter")),
            adapter_dim=model_config.get("adapter_dim") or 64,
        )
    if "model_type" in model_config:
        return create_latent_cnn(
            model_config["model_type"],
            latent_dim=model_config.get("latent_dim", 512),
            seq_len=model_config.get("seq_len", 18),
            num_classes=model_config["num_classes"],
            dropout=model_config.get("dropout", 0.3),
        )
    common = dict(
        latent_dim=model_config.get("latent_dim", 512),
        seq_len=model_config.get("seq_len", 18),
        embed_dim=model_config.get("embed_dim", 512),
        depth=model_config.get("depth", 6),
        heads=model_config.get("heads", 8),
        mlp_dim=model_config.get("mlp_dim", 2048),
        num_classes=model_config["num_classes"],
        dropout=model_config.get("dropout", 0.1),
    )
    if any(model_config.get(k) for k in
           ("use_lwn", "use_spe", "use_leam", "use_lwn_residual")):
        return LatentViTv2(
            use_lwn=bool(model_config.get("use_lwn")),
            use_lwn_residual=bool(model_config.get("use_lwn_residual")),
            use_spe=bool(model_config.get("use_spe")),
            use_leam=bool(model_config.get("use_leam")),
            **common,
        )
    return LatentViT(**common)


def _is_torch_checkpoint(path: str) -> bool:
    """Reference-format checkpoints are torch zip archives (or legacy
    pickles); ours are flax msgpack. Sniff the container, not the suffix —
    both sides name the files ``*.pt``."""
    import zipfile

    if zipfile.is_zipfile(path):
        return True
    with open(path, "rb") as f:
        return f.read(2)[:1] == b"\x80"  # pickle protocol marker


def load_torch_model(checkpoint_path: str) -> Tuple[object, dict, dict]:
    """Load a REFERENCE-format torch checkpoint (torch-checkpoint interop,
    reference: eval/evaluate_model.py:30-132): rebuild the model from the
    embedded config (``config``/``args``/defaults), convert the state_dict
    into our pytrees, → (model, variables, full_config)."""
    from fer_vit_tpu.interop import (
        from_torch_state_dict,
        model_kind_from_config,
        read_torch_checkpoint,
    )

    ckpt, config, model_config, sd = read_torch_checkpoint(checkpoint_path)
    if is_image_config(model_config) and model_config.get("use_pretrained"):
        # the interop tables cover the reference's OWN ImageViT class; a
        # timm-pretrained trunk checkpoint converts through the dedicated
        # weight converter instead — fail with the route, not a KeyError
        # deep inside from_torch_state_dict
        raise NotImplementedError(
            "this torch checkpoint wraps a timm-pretrained ImageViT "
            "(use_pretrained=true); convert its trunk via "
            "fer_vit_tpu.encoders.convert_timm and evaluate with "
            "fer_vit_tpu.eval.evaluate_image_vit on the converted "
            "weights — direct state_dict interop covers the reference's "
            "from-scratch ImageViT only")
    model = model_from_config(model_config)

    if is_image_config(model_config):
        sample = jnp.zeros((1, model_config.get("img_size", 224),
                            model_config.get("img_size", 224), 3))
    else:
        sample = jnp.zeros((1, model_config.get("seq_len", 18) or 18,
                            model_config.get("latent_dim", 512)))
    template = model.init(jax.random.key(0), sample)
    kind = model_kind_from_config(model_config)
    params, batch_stats = from_torch_state_dict(
        kind, sd, template["params"], template.get("batch_stats"),
        config=model_config)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    print(f"Loaded torch checkpoint ({kind}, epoch "
          f"{ckpt.get('epoch', 'unknown')}) from {checkpoint_path}")
    return model, variables, (config if isinstance(config, dict) else {})


def load_model(checkpoint_path: str, with_meta: bool = False):
    """→ (model, variables, full_config)[, meta]. Polymorphic over BOTH
    checkpoint containers: this framework's flax-msgpack files and
    reference-format torch ``.pt`` files (converted on the fly via
    fer_vit_tpu.interop). ``with_meta`` additionally returns
    ``{epoch, metrics, run_id}`` without a second file read (msgpack
    checkpoints only — the torch route has no framework metadata)."""
    if _is_torch_checkpoint(checkpoint_path):
        if with_meta:
            raise ValueError("with_meta is only supported for this "
                             "framework's msgpack checkpoints")
        return load_torch_model(checkpoint_path)
    raw = ExperimentLogger.load_checkpoint(checkpoint_path)
    config = raw["config"]
    model_config = config.get("model", config)
    model = model_from_config(model_config)

    if is_image_config(model_config):
        img = model_config.get("img_size", 224)
        sample = jnp.zeros((1, img, img, 3))
    else:
        sample = jnp.zeros((1, model_config.get("seq_len", 18) or 18,
                            model_config.get("latent_dim", 512)))
    template_vars = model.init(jax.random.key(0), sample)
    from fer_vit_tpu.train.harness import TrainState, make_optimizer, TrainConfig

    # Rebuild the optimizer pytree with the run's own settings so the
    # serialized opt_state structure matches (grad_clip/sgd change it).
    tcfg = config.get("training", {})
    cfg = TrainConfig(
        optimizer=tcfg.get("optimizer", "adamw"),
        weight_decay=tcfg.get("weight_decay", 1e-2),
        grad_clip=tcfg.get("grad_clip") or 0.0,
    )
    template = TrainState(
        params=template_vars["params"],
        batch_stats=template_vars.get("batch_stats", {}),
        opt_state=make_optimizer(cfg).init(template_vars["params"]),
    )
    # restore from the bytes already read above — no second file read
    from flax import serialization

    state = serialization.from_bytes(template, raw["state_bytes"])
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    print(f"Loaded checkpoint (epoch {raw['epoch']}) from "
          f"{checkpoint_path}")
    if with_meta:
        meta = {k: raw[k] for k in ("epoch", "metrics", "run_id")}
        return model, variables, config, meta
    return model, variables, config


def evaluate(model, variables, store: LatentStore, batch_size: int = 32):
    """→ (predictions, probabilities, confusion_matrix)."""
    apply = tuned_jit(lambda v, x: model.apply(v, x))
    preds, probs = [], []
    for i in range(0, len(store), batch_size):
        logits = apply(variables, jnp.asarray(store.latents[i:i + batch_size]))
        probs.append(np.asarray(jax.nn.softmax(logits, axis=-1)))
        preds.append(np.asarray(jnp.argmax(logits, axis=-1)))
    preds = np.concatenate(preds)
    probs = np.concatenate(probs)
    cm = np.asarray(confusion_update(
        jnp.zeros((7, 7)), jnp.asarray(preds), jnp.asarray(store.labels),
        jnp.ones(len(store)),
    ))
    return preds, probs, cm


def _plots(cm, probs, preds, labels, out_dir):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns
    except ImportError:
        return
    names = [n.capitalize() for n in EMOTION_NAMES]

    # normalized + counts confusion matrices
    for norm, fname in ((True, "confusion_matrix_normalized.png"),
                        (False, "confusion_matrix_counts.png")):
        fig, ax = plt.subplots(figsize=(8, 6))
        data = cm / np.maximum(cm.sum(1, keepdims=True), 1) if norm else cm
        sns.heatmap(data, annot=True, fmt=".2f" if norm else ".0f",
                    cmap="Blues", xticklabels=names, yticklabels=names, ax=ax)
        ax.set_xlabel("Predicted")
        ax.set_ylabel("Actual")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, fname), dpi=120)
        plt.close(fig)

    # combined two-panel figure under the reference's filename
    # (reference eval/evaluate_model.py:162-189)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(16, 6))
    sns.heatmap(cm / np.maximum(cm.sum(1, keepdims=True), 1), annot=True,
                fmt=".2%", cmap="Blues", xticklabels=names,
                yticklabels=names, ax=ax1)
    ax1.set_title("Confusion Matrix (Normalized)")
    sns.heatmap(cm, annot=True, fmt=".0f", cmap="Greens",
                xticklabels=names, yticklabels=names, ax=ax2)
    ax2.set_title("Confusion Matrix (Counts)")
    for ax in (ax1, ax2):
        ax.set_xlabel("Predicted")
        ax.set_ylabel("Actual")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "confusion_matrix.png"), dpi=120)
    plt.close(fig)

    # per-class precision/recall/F1 bars
    m = metrics_from_confusion(cm)
    x = np.arange(7)
    fig, ax = plt.subplots(figsize=(10, 5))
    for i, key in enumerate(("precision", "recall", "f1")):
        ax.bar(x + (i - 1) * 0.25, m[key], width=0.25, label=key)
    ax.set_xticks(x, names)
    ax.legend()
    ax.set_title("Per-class metrics")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "class_metrics.png"), dpi=120)
    plt.close(fig)

    # confidence histograms (correct vs incorrect)
    conf = probs.max(axis=1)
    correct = preds == labels
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.hist(conf[correct], bins=30, alpha=0.6, label="correct")
    ax.hist(conf[~correct], bins=30, alpha=0.6, label="incorrect")
    ax.set_xlabel("Prediction confidence")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "prediction_confidence.png"), dpi=120)
    plt.close(fig)


def visualize_attention(model, variables, sample_latents: np.ndarray,
                        out_dir: str, n_samples: int = 5) -> None:
    """CLS-token similarity "attention" visualization (reference:
    eval/evaluate_model.py:231-296 replays model internals manually; here
    Flax ``capture_intermediates`` grabs every transformer layer's hidden
    states and we plot per-layer cosine similarity of the CLS token to each
    w+ token)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return

    x = jnp.asarray(sample_latents[:n_samples])
    _, inter = model.apply(
        variables, x,
        capture_intermediates=lambda mdl, name: name == "__call__",
    )
    # collect transformer layer outputs: (layers, B, L+1, D).
    # Match only DIRECT layer captures (.../layers_3/__call__ — LatentViT
    # naming — or .../blocks_3/__call__ — hybrid/timm naming), not nested
    # submodule calls, and sort NUMERICALLY (lexicographic order puts
    # layers_10 before layers_2 at depth ≥ 10).
    import re

    inters = inter["intermediates"]
    layer_outs = []
    def walk(node, path=""):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}/{k}")
            return
        parts = path.strip("/").split("/")
        if (len(parts) >= 2 and parts[-1] == "__call__"
                and re.fullmatch(r"(layers|blocks)_\d+", parts[-2])):
            layer_outs.append((int(parts[-2].rsplit("_", 1)[1]), node[0]))
    walk(inters)
    layer_outs.sort(key=lambda kv: kv[0])
    if not layer_outs:
        print("attention viz skipped: no transformer layer captures found")
        return
    for s in range(min(n_samples, x.shape[0])):
        sims = []
        for _, h in layer_outs:
            h_s = np.asarray(h[s], np.float32)  # (L+1, D)
            cls, toks = h_s[0], h_s[1:]
            denom = (np.linalg.norm(toks, axis=1)
                     * max(np.linalg.norm(cls), 1e-8))
            sims.append(toks @ cls / np.maximum(denom, 1e-8))
        sims = np.stack(sims)  # (layers, L)
        fig, ax = plt.subplots(figsize=(10, 4))
        im = ax.imshow(sims, cmap="viridis", aspect="auto")
        ax.set_xlabel("Latent Token Index")
        ax.set_ylabel("Transformer Layer")
        ax.set_title(f"CLS-token similarity — sample {s}")
        fig.colorbar(im, ax=ax)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"attention_sample_{s}.png"),
                    dpi=120)
        plt.close(fig)


def build_parser() -> argparse.ArgumentParser:
    """Reference CLI contract (reference eval/evaluate_model.py:332-337);
    ``--device`` accepted as a documented no-op (JAX manages devices)."""
    parser = argparse.ArgumentParser(description="Evaluate trained model")
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--latent_test_dir", required=True)
    parser.add_argument("--output_dir", default="eval_results")
    parser.add_argument("--device", default="cuda",
                        help="accepted for reference CLI compatibility; "
                             "ignored (JAX manages devices)")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--visualize_samples", type=int, default=5)
    return parser


def main(args) -> dict:
    os.makedirs(args.output_dir, exist_ok=True)
    model, variables, config = load_model(args.checkpoint_path)
    store = LatentStore.load(args.latent_test_dir)
    preds, probs, cm = evaluate(model, variables, store, args.batch_size)

    m = metrics_from_confusion(cm)
    names = [n.capitalize() for n in EMOTION_NAMES]
    print("\nClassification Report:")
    print(classification_report(cm, names))

    _plots(cm, probs, preds, store.labels, args.output_dir)
    if args.visualize_samples > 0:
        try:
            visualize_attention(model, variables, store.latents,
                                args.output_dir, args.visualize_samples)
        except Exception as e:  # CNN checkpoints have no transformer layers
            print(f"attention viz skipped: {type(e).__name__}: {e}")

    report = {
        "checkpoint": args.checkpoint_path,
        "test_dir": args.latent_test_dir,
        "num_samples": len(store),
        "accuracy": m["accuracy"],
        "f1_macro": m["f1_macro"],
        "f1_weighted": m["f1_weighted"],
        "per_class": {
            EMOTION_NAMES[i]: {
                "precision": float(m["precision"][i]),
                "recall": float(m["recall"][i]),
                "f1": float(m["f1"][i]),
                "support": int(m["support"][i]),
            }
            for i in range(7)
        },
        "config": config,
    }
    report_path = os.path.join(args.output_dir, "evaluation_report.json")
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nReport saved to {report_path}")

    # the reference's exact output file + schema (a frozen contract —
    # reference eval/evaluate_model.py:423-436); our richer report above
    # is an extension, this one is what downstream tooling reads
    results_summary = {
        "accuracy": m["accuracy"],
        "classification_report": classification_report_dict(cm, names),
        "model_config": config.get("model", config),
        "checkpoint_path": args.checkpoint_path,
        "test_dataset_size": len(store),
    }
    results_path = os.path.join(args.output_dir, "evaluation_results.json")
    with open(results_path, "w") as f:
        json.dump(results_summary, f, indent=2)
    print(f"Summary: {results_path}")
    return report


if __name__ == "__main__":
    main(build_parser().parse_args())
