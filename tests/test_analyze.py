"""Legacy preprocessing analysis utilities (reference preprocessing.py:201-291)."""

import os

import numpy as np
import pytest

from fer_vit_tpu.data.analyze import (
    analyze_fer2013_dataset,
    create_fer2013_inference_function,
    visualize_fer2013_samples,
)
from fer_vit_tpu.data.image_pipeline import ImageStore


def _make_split_tree(tmp_path, n_per=2, size=32):
    from PIL import Image

    from fer_vit_tpu import EMOTION_NAMES

    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        for c in EMOTION_NAMES:
            d = tmp_path / split / c
            d.mkdir(parents=True)
            for i in range(n_per):
                Image.fromarray(
                    rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
                ).save(str(d / f"{i}.png"))


class TestAnalyze:
    def test_counts(self, tmp_path, capsys):
        _make_split_tree(tmp_path, n_per=3)
        out = analyze_fer2013_dataset(str(tmp_path))
        assert set(out) == {"train", "test"}
        assert all(v == 3 for v in out["train"].values())
        printed = capsys.readouterr().out
        assert "TRAIN data:" in printed and "Total: 21" in printed

    def test_sample_grid(self, tmp_path):
        _make_split_tree(tmp_path)
        store = ImageStore.load(str(tmp_path / "train"), img_size=32)
        out = visualize_fer2013_samples(
            store, num_samples=6, out_path=str(tmp_path / "grid.png"))
        assert os.path.exists(out)

    def test_inference_function_from_vit_fer_checkpoint(self, tmp_path):
        """The predict closure must load a vit_fer last_model.pt and return
        the reference's result dict shape."""
        from PIL import Image

        from fer_vit_tpu.train.vit_fer import build_parser, main

        _make_split_tree(tmp_path, n_per=2)
        args = build_parser().parse_args([
            "--train_dir", str(tmp_path / "train"),
            "--test_dir", str(tmp_path / "test"),
            "--epochs", "1", "--batch_size", "7",
            "--img_size", "32", "--model_size", "tiny",
            "--out_dir", str(tmp_path / "out"),
        ])
        main(args)
        ckpt = str(tmp_path / "out" / "last_model.pt")
        assert os.path.exists(ckpt)

        predict = create_fer2013_inference_function(
            ckpt, model_size="tiny", img_size=32)
        result = predict(str(tmp_path / "test" / "happy" / "0.png"))
        assert set(result) == {"emotion", "confidence", "probabilities"}
        assert len(result["probabilities"]) == 7
        assert 0.0 <= result["confidence"] <= 1.0
        assert abs(sum(result["probabilities"].values()) - 1.0) < 1e-3
