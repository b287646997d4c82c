"""Dataset analysis / visualization / quick-inference helpers.

Mirrors the legacy utilities of the reference's ``preprocessing.py``
(reference: preprocessing.py:201-291): per-split class-count analysis,
a sample-grid figure, and a single-image emotion-prediction closure built
on the ViT-B/16 fine-tune (the reference uses torchvision ``vit_b_16``;
here it is the framework's timm-architecture ViT with converted weights,
the same model `fer_vit_tpu.train.vit_fer` trains).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np

from fer_vit_tpu import EMOTION_NAMES
from fer_vit_tpu.data.image_pipeline import IMAGE_EXTS as _IMG_EXTS
from fer_vit_tpu.utils.compile_opts import tuned_jit


def analyze_fer2013_dataset(root_dir: str,
                            splits=("train", "test")) -> Dict[str, Dict[str, int]]:
    """Per-split, per-class sample counts (reference: preprocessing.py:201-224).

    Prints the same report layout and returns {split: {emotion: count}}.
    """
    print("=== FER2013 dataset analysis ===\n")
    out: Dict[str, Dict[str, int]] = {}
    for split in splits:
        split_path = os.path.join(root_dir, split)
        if not os.path.exists(split_path):
            continue
        print(f"{split.upper()} data:")
        counts: Dict[str, int] = {}
        total = 0
        for emotion in EMOTION_NAMES:
            emotion_path = os.path.join(split_path, emotion)
            if os.path.exists(emotion_path):
                n = len([f for f in os.listdir(emotion_path)
                         if f.lower().endswith(_IMG_EXTS)])
                print(f"  {emotion.capitalize()}: {n}")
                counts[emotion] = n
                total += n
        print(f"  Total: {total}\n")
        out[split] = counts
    return out


def visualize_fer2013_samples(store, num_samples: int = 8,
                              figsize=(12, 8), out_path: Optional[str] = None,
                              seed: int = 0):
    """Sample-grid figure (reference: preprocessing.py:226-257).

    ``store`` is an :class:`fer_vit_tpu.data.image_pipeline.ImageStore`
    (device/array-resident uint8 images + labels). Saves to ``out_path``
    if given, else shows interactively.
    """
    import matplotlib

    if out_path is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(seed)
    indices = rng.choice(len(store), size=min(num_samples, len(store)),
                         replace=False)
    ncols = 4
    nrows = (len(indices) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=figsize)
    axes = np.atleast_1d(axes).ravel()
    for ax in axes[len(indices):]:
        ax.axis("off")
    for ax, idx in zip(axes, indices):
        img = np.asarray(store.images[int(idx)])
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        ax.imshow(img)
        ax.set_title(EMOTION_NAMES[int(store.labels[int(idx)])].capitalize())
        ax.axis("off")
    fig.tight_layout()
    if out_path is not None:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
    plt.show()
    return fig


def create_fer2013_inference_function(
    model_path: str, model_size: str = "base", img_size: int = 224,
) -> Callable[[str], Dict]:
    """Single-image emotion predictor (reference: preprocessing.py:258-291).

    ``model_path``: a ``last_model.pt`` written by
    :mod:`fer_vit_tpu.train.vit_fer` (flax msgpack), or a converted timm
    ``.npz`` for raw pretrained weights. Returns ``predict(image_path) ->
    {'emotion', 'confidence', 'probabilities'}``.
    """
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fer_vit_tpu.models.timm_vit import create_timm_vit

    model, patch = create_timm_vit(
        model_size, num_classes=7, img_size=img_size,
        pretrained_npz=model_path if model_path.endswith(".npz") else None,
    )
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, img_size, img_size, 3)))
    if patch is not None:
        variables = {**variables, "params": patch(variables["params"])}
    if not model_path.endswith(".npz"):
        from flax import serialization

        with open(model_path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        # vit_fer checkpoints hold a full TrainState; restore params from it
        state_bytes = payload["state"] if "state" in payload else payload
        restored = serialization.msgpack_restore(state_bytes) \
            if isinstance(state_bytes, bytes) else state_bytes
        params = restored["params"] if "params" in restored else restored
        variables = {**variables, "params": serialization.from_state_dict(
            variables["params"], params)}

    @tuned_jit
    def forward(variables, x):
        logits = model.apply(variables, x)
        return jax.nn.softmax(logits, axis=-1)

    def predict(image_path: str) -> Dict:
        img = Image.open(image_path).convert("RGB").resize(
            (img_size, img_size))
        x = jnp.asarray(np.asarray(img, np.float32))[None]
        x = (x / 255.0 - 0.5) / 0.5  # the reference ViT transform
        probs = np.asarray(forward(variables, x))[0]
        pred = int(probs.argmax())
        return {
            "emotion": EMOTION_NAMES[pred].capitalize(),
            "confidence": float(probs[pred]),
            "probabilities": {
                EMOTION_NAMES[i].capitalize(): float(p)
                for i, p in enumerate(probs)
            },
        }

    return predict
