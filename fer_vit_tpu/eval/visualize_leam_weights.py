"""Visualize learned LEAM layer weights from a checkpoint.

Capability parity with the reference tool (reference:
eval/visualize_leam_weights.py): extract the LEAM parameter, sigmoid it,
and draw the Coarse/Medium/Fine colored bar chart. Reads this framework's
checkpoint format (the param lives at ``params/leam/layer_weights`` —
the naming shim promised in SURVEY.md hard part #3).
"""

from __future__ import annotations

import argparse

import numpy as np

from fer_vit_tpu.utils.experiment_logger import ExperimentLogger


def extract_leam_weights(checkpoint_path: str) -> np.ndarray:
    """→ post-sigmoid (18,) weights from a LatentViTv2 checkpoint."""
    from flax import serialization

    raw = ExperimentLogger.load_checkpoint(checkpoint_path)
    state = serialization.msgpack_restore(raw["state_bytes"])
    params = state["params"]
    if "leam" not in params:
        raise KeyError(
            "checkpoint has no LEAM module (train with --use_leam)"
        )
    raw_weights = np.asarray(params["leam"]["layer_weights"])
    return 1.0 / (1.0 + np.exp(-raw_weights))


def visualize_leam_weights(checkpoint_path: str, save_path: str | None = None):
    weights = extract_leam_weights(checkpoint_path)
    n = len(weights)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.patches as mpatches
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 5))
    colors = ["#e74c3c"] * 4 + ["#2ecc71"] * 8 + ["#3498db"] * 6
    ax.bar(range(n), weights, color=colors[:n])
    ax.axvline(x=3.5, color="black", linestyle="--", linewidth=0.8)
    ax.axvline(x=11.5, color="black", linestyle="--", linewidth=0.8)
    patches = [
        mpatches.Patch(color="#e74c3c", label="Coarse (layers 1-4: structure)"),
        mpatches.Patch(color="#2ecc71", label="Medium (layers 5-12: expression)"),
        mpatches.Patch(color="#3498db", label="Fine (layers 13-18: texture)"),
    ]
    ax.legend(handles=patches, loc="upper right")
    ax.set_xlabel("StyleGAN Layer Index")
    ax.set_ylabel("LEAM Weight (after sigmoid)")
    ax.set_title("LEAM: Learned Layer Importance Weights")
    ax.set_xticks(range(n))
    ax.set_xticklabels([str(i + 1) for i in range(n)])
    ax.set_ylim(0, 1.0)
    ax.grid(axis="y", alpha=0.3)
    plt.tight_layout()
    out = save_path or "leam_weights.png"
    plt.savefig(out, dpi=300, bbox_inches="tight")
    print(f"Saved: {out}")
    plt.close()
    return weights


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Visualize LEAM weights from a checkpoint"
    )
    parser.add_argument("checkpoint")
    parser.add_argument("--save_path", default=None)
    args = parser.parse_args()
    visualize_leam_weights(args.checkpoint, args.save_path)
