"""Classification metrics computed from an on-device confusion matrix.

The reference accumulates host-side prediction lists and calls sklearn
``accuracy_score`` / ``f1_score`` per epoch (reference:
train/train_latent_vit.py:141-147,171-174). On TPU that would force a
device→host sync per batch; instead the train/eval scans accumulate a
(C, C) confusion matrix on device and these pure-numpy reductions derive
accuracy / macro-F1 / weighted-F1 / per-class P/R/F1 from it — bit-identical
to the sklearn values (both are exact functions of the confusion matrix).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def confusion_update(
    cm: jax.Array, preds: jax.Array, labels: jax.Array, weights: jax.Array
) -> jax.Array:
    """Add a batch to a (C, C) confusion matrix. ``weights`` masks padding."""
    c = cm.shape[0]
    idx = labels * c + preds
    upd = jnp.zeros((c * c,), cm.dtype).at[idx].add(weights.astype(cm.dtype))
    return cm + upd.reshape(c, c)


def metrics_from_confusion(cm: np.ndarray) -> Dict[str, float]:
    """accuracy, f1_macro, f1_weighted, per-class precision/recall/f1."""
    cm = np.asarray(cm, dtype=np.float64)
    support = cm.sum(axis=1)  # true counts per class
    pred_count = cm.sum(axis=0)
    tp = np.diag(cm)
    total = cm.sum()

    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(pred_count > 0, tp / pred_count, 0.0)
        recall = np.where(support > 0, tp / support, 0.0)
        denom = precision + recall
        f1 = np.where(denom > 0, 2 * precision * recall / denom, 0.0)

    accuracy = float(tp.sum() / total) if total > 0 else 0.0
    # sklearn's macro average (labels=None) runs over the union of observed
    # true and predicted labels, not the fixed class set — a class absent
    # from both must not deflate macro-F1 (it drives best-ckpt selection).
    present = (support > 0) | (pred_count > 0)
    f1_macro = float(f1[present].mean()) if present.any() else 0.0
    f1_weighted = float((f1 * support).sum() / total) if total > 0 else 0.0
    return {
        "present": present,
        "accuracy": accuracy,
        "f1_macro": f1_macro,
        "f1_weighted": f1_weighted,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "support": support,
    }


def classification_report_dict(cm: np.ndarray,
                               class_names: Sequence[str]) -> Dict:
    """sklearn ``classification_report(..., output_dict=True)`` equivalent
    derived from the confusion matrix — the reference's eval JSON embeds
    this structure verbatim (reference eval/evaluate_model.py:423-436), so
    the key names ('f1-score', 'macro avg', 'weighted avg') are a frozen
    contract."""
    m = metrics_from_confusion(cm)
    present = m["present"]
    total = float(m["support"].sum())
    out = {
        name: {
            "precision": float(m["precision"][i]),
            "recall": float(m["recall"][i]),
            "f1-score": float(m["f1"][i]),
            "support": float(m["support"][i]),
        }
        for i, name in enumerate(class_names)
    }
    out["accuracy"] = float(m["accuracy"])
    p_macro = float(m["precision"][present].mean()) if present.any() else 0.0
    r_macro = float(m["recall"][present].mean()) if present.any() else 0.0
    out["macro avg"] = {"precision": p_macro, "recall": r_macro,
                        "f1-score": float(m["f1_macro"]), "support": total}
    w = m["support"] / max(total, 1.0)
    out["weighted avg"] = {
        "precision": float((m["precision"] * w).sum()),
        "recall": float((m["recall"] * w).sum()),
        "f1-score": float(m["f1_weighted"]), "support": total,
    }
    return out


def classification_report(cm: np.ndarray, class_names: Sequence[str]) -> str:
    """sklearn-style text report derived from the confusion matrix."""
    m = metrics_from_confusion(cm)
    lines = [f"{'':>12s} {'precision':>9s} {'recall':>9s} {'f1-score':>9s} {'support':>9s}", ""]
    for i, name in enumerate(class_names):
        lines.append(
            f"{name:>12s} {m['precision'][i]:9.2f} {m['recall'][i]:9.2f} "
            f"{m['f1'][i]:9.2f} {int(m['support'][i]):9d}"
        )
    total = int(m["support"].sum())
    present = m["present"]
    lines.append("")
    lines.append(f"{'accuracy':>12s} {'':9s} {'':9s} {m['accuracy']:9.2f} {total:9d}")
    p_macro = m["precision"][present].mean() if present.any() else 0.0
    r_macro = m["recall"][present].mean() if present.any() else 0.0
    lines.append(
        f"{'macro avg':>12s} {p_macro:9.2f} {r_macro:9.2f} "
        f"{m['f1_macro']:9.2f} {total:9d}"
    )
    w = m["support"] / max(total, 1)
    lines.append(
        f"{'weighted avg':>12s} {(m['precision'] * w).sum():9.2f} "
        f"{(m['recall'] * w).sum():9.2f} {m['f1_weighted']:9.2f} {total:9d}"
    )
    return "\n".join(lines)
