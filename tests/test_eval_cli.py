"""End-to-end tests for the evaluation & observability tools (SURVEY §2.6):
train a tiny model through the real CLI, then drive the evaluators on the
produced checkpoints — exercising the checkpoint-polymorphic loader, the
figure outputs, and the JSON report contract the reference's
eval/evaluate_model.py establishes (reference: eval/evaluate_model.py:30-132,
:423-436; eval/visualize_leam_weights.py; eval/plot_logs.py)."""

import glob
import json
import os

import numpy as np
import pytest

from tests.test_train_cli import make_latent_dirs, run_cli


def _train_tiny_latent_vit(tmp_path, **extra):
    from fer_vit_tpu.train.train_latent_vit import build_parser, main

    dirs = make_latent_dirs(tmp_path)
    exp_dir = str(tmp_path / "experiments")
    argv = [
        "--latent_train_dir", dirs["train"],
        "--latent_val_dir", dirs["val"],
        "--epochs", "1", "--batch_size", "16",
        "--depth", "1", "--embed_dim", "64", "--heads", "2",
        "--mlp_dim", "128", "--experiments_dir", exp_dir, "--no_bf16",
    ]
    run_cli(main, build_parser(), argv)
    ckpts = glob.glob(os.path.join(exp_dir, "*", "*", "checkpoints",
                                   "best_model.pt"))
    assert len(ckpts) == 1
    return ckpts[0], dirs


class TestEvaluateModel:
    def test_latent_vit_checkpoint_end_to_end(self, tmp_path):
        from fer_vit_tpu.eval.evaluate_model import build_parser, main

        ckpt, dirs = _train_tiny_latent_vit(tmp_path)
        out_dir = str(tmp_path / "eval_out")
        report = run_cli(main, build_parser(), [
            "--checkpoint_path", ckpt,
            "--latent_test_dir", dirs["val"],
            "--output_dir", out_dir,
            "--visualize_samples", "2",
        ])

        # report contract (reference eval/evaluate_model.py:423-436)
        assert 0.0 <= report["accuracy"] <= 1.0
        assert 0.0 <= report["f1_macro"] <= 1.0
        assert set(report["per_class"]) == {
            "angry", "disgust", "fear", "happy", "neutral", "sad",
            "surprise"}
        assert report["num_samples"] == 14
        with open(os.path.join(out_dir, "evaluation_report.json")) as f:
            assert json.load(f)["accuracy"] == report["accuracy"]
        # the reference's own output file + schema (frozen contract)
        with open(os.path.join(out_dir, "evaluation_results.json")) as f:
            summary = json.load(f)
        assert set(summary) == {"accuracy", "classification_report",
                                "model_config", "checkpoint_path",
                                "test_dataset_size"}
        crep = summary["classification_report"]
        assert set(crep) == {"Angry", "Disgust", "Fear", "Happy", "Neutral",
                             "Sad", "Surprise", "accuracy", "macro avg",
                             "weighted avg"}
        assert set(crep["macro avg"]) == {"precision", "recall", "f1-score",
                                          "support"}
        assert summary["accuracy"] == report["accuracy"]
        assert summary["test_dataset_size"] == 14

        produced = set(os.listdir(out_dir))
        for fname in ("confusion_matrix.png",
                      "confusion_matrix_normalized.png",
                      "confusion_matrix_counts.png",
                      "class_metrics.png",
                      "prediction_confidence.png"):
            assert fname in produced, (fname, produced)
        # CLS-similarity attention replays for the requested samples
        assert "attention_sample_0.png" in produced
        assert "attention_sample_1.png" in produced

    def test_v2_checkpoint_polymorphism_and_leam_viz(self, tmp_path):
        """A LatentViTv2 checkpoint must be reconstructed from its config
        by the same loader, and the LEAM weights must stay findable for
        the visualizer (SURVEY §7 hard part 3 naming contract)."""
        from fer_vit_tpu.eval.evaluate_model import build_parser, main
        from fer_vit_tpu.eval.visualize_leam_weights import (
            extract_leam_weights, visualize_leam_weights)
        from fer_vit_tpu.train.train_latent_vit_v2 import (
            build_parser as v2_parser, main as v2_main)

        dirs = make_latent_dirs(tmp_path)
        exp_dir = str(tmp_path / "exp_v2")
        run_cli(v2_main, v2_parser(), [
            "--latent_train_dir", dirs["train"],
            "--latent_val_dir", dirs["val"],
            "--epochs", "1", "--batch_size", "16",
            "--depth", "1", "--embed_dim", "64", "--heads", "2",
            "--mlp_dim", "128", "--use_leam", "--use_spe", "--use_lwn",
            "--experiments_dir", exp_dir, "--no_bf16",
        ])
        ckpt = glob.glob(os.path.join(exp_dir, "*", "*", "checkpoints",
                                      "best_model.pt"))[0]

        report = run_cli(main, build_parser(), [
            "--checkpoint_path", ckpt,
            "--latent_test_dir", dirs["val"],
            "--output_dir", str(tmp_path / "eval_v2"),
            "--visualize_samples", "0",
        ])
        assert report["config"]["model"]["use_leam"] is True

        w = extract_leam_weights(ckpt)
        assert w.shape == (18,)
        assert np.all((w > 0) & (w < 1))  # post-sigmoid
        png = str(tmp_path / "leam.png")
        visualize_leam_weights(ckpt, save_path=png)
        assert os.path.exists(png)

    def test_cnn_checkpoint_skips_attention_viz(self, tmp_path):
        """CNN checkpoints flow through the polymorphic loader; the
        transformer-specific attention replay must degrade gracefully
        (reference loader discriminates by config keys)."""
        from fer_vit_tpu.eval.evaluate_model import build_parser, main
        from fer_vit_tpu.train.train_latent_cnn import (
            build_parser as cnn_parser, main as cnn_main)

        dirs = make_latent_dirs(tmp_path)
        exp_dir = str(tmp_path / "exp_cnn")
        run_cli(cnn_main, cnn_parser(), [
            "--latent_train_dir", dirs["train"],
            "--latent_val_dir", dirs["val"],
            "--epochs", "1", "--batch_size", "16",
            "--model_type", "light",
            "--experiments_dir", exp_dir, "--no_bf16",
        ])
        ckpt = glob.glob(os.path.join(exp_dir, "*", "*", "checkpoints",
                                      "best_model.pt"))[0]
        out_dir = str(tmp_path / "eval_cnn")
        report = run_cli(main, build_parser(), [
            "--checkpoint_path", ckpt,
            "--latent_test_dir", dirs["val"],
            "--output_dir", out_dir,
            "--visualize_samples", "2",
        ])
        assert 0.0 <= report["accuracy"] <= 1.0
        assert os.path.exists(
            os.path.join(out_dir, "evaluation_report.json"))


class TestEvaluateImageViT:
    def test_image_vit_checkpoint_end_to_end(self, tmp_path):
        from fer_vit_tpu.eval.evaluate_image_vit import build_parser, main
        from fer_vit_tpu.train.train_image_vit import (
            build_parser as iv_parser, main as iv_main)
        from tests.test_image_pipeline import _make_image_tree

        train_d, val_d = tmp_path / "train", tmp_path / "val"
        train_d.mkdir(), val_d.mkdir()
        _make_image_tree(train_d, n_per=3, size=32)
        _make_image_tree(val_d, n_per=2, size=32)
        exp_dir = str(tmp_path / "exp_img")
        run_cli(iv_main, iv_parser(), [
            "--train_dir", str(train_d), "--val_dir", str(val_d),
            "--img_size", "32", "--model_size", "custom",
            "--patch_size", "8", "--embed_dim", "32", "--depth", "1",
            "--heads", "2", "--mlp_dim", "64",
            "--epochs", "1", "--batch_size", "8",
            "--experiments_dir", exp_dir, "--no_bf16",
        ])
        ckpt = glob.glob(os.path.join(exp_dir, "*", "*", "checkpoints",
                                      "best_model.pt"))[0]
        out_dir = str(tmp_path / "eval_img")
        report = run_cli(main, build_parser(), [
            "--checkpoint_path", ckpt,
            "--test_dir", str(val_d),
            "--output_dir", out_dir,
        ])
        assert 0.0 <= report["accuracy"] <= 1.0
        # one corrupt file per tree decodes to the black-image fallback
        assert report["num_samples"] == 7 * 2 + 1
        assert os.path.exists(
            os.path.join(out_dir, "evaluation_report.json"))
        assert os.path.exists(
            os.path.join(out_dir, "confusion_matrix_normalized.png"))


class TestPlottingTools:
    def test_plot_logs_csv_and_jsonl(self, tmp_path):
        from fer_vit_tpu.eval.plot_logs import plot_learning_curves

        csv = tmp_path / "run-export.csv"
        csv.write_text("Wall time,Step,Value\n1,1,0.3\n2,2,0.4\n3,3,0.5\n")
        jsonl = tmp_path / "scalars.jsonl"
        with open(jsonl, "w") as f:
            for i, v in enumerate([0.2, 0.35, 0.45], 1):
                f.write(json.dumps(
                    {"tag": "val_acc", "step": i, "value": v}) + "\n")
        out = str(tmp_path / "curves.png")
        plot_learning_curves([str(csv), str(jsonl)],
                             custom_labels=["torch-export", "ours"],
                             save_path=out)
        assert os.path.exists(out)

    def test_plot_data_fraction(self, tmp_path):
        from fer_vit_tpu.eval.plot_data_fraction import plot

        out = str(tmp_path / "frac.png")
        plot(out_path=out)  # reference's hardcoded headline series
        assert os.path.exists(out)


EVAL_CLI_PAIRS = [
    ("fer_vit_tpu.eval.evaluate_model", "eval/evaluate_model.py"),
    ("fer_vit_tpu.eval.evaluate_image_vit", "eval/evaluate_image_vit.py"),
]


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference tree not present")
@pytest.mark.parametrize("module_name,ref_rel", EVAL_CLI_PAIRS,
                         ids=[m.rsplit(".", 1)[-1] for m, _ in EVAL_CLI_PAIRS])
def test_eval_cli_flags_superset_of_reference(module_name, ref_rel):
    """The eval CLIs keep every reference flag (--device is a documented
    no-op; reference eval/evaluate_model.py:332-337)."""
    import importlib
    import re

    mod = importlib.import_module(module_name)
    ours = {s for a in mod.build_parser()._actions
            for s in a.option_strings if s.startswith("--")}
    src = open(os.path.join("/root/reference", ref_rel)).read()
    ref = set(re.findall(r'add_argument\(\s*[\'"](--[\w\-]+)[\'"]', src))
    assert ref <= ours, f"{module_name} missing reference flags: {ref - ours}"


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference tree not present")
def test_evaluate_image_vit_loads_reference_torch_checkpoint(tmp_path):
    """A reference-format torch ImageViT checkpoint evaluates through our
    image eval CLI with predictions identical to the torch model's."""
    import sys

    import jax
    import jax.numpy as jnp
    torch = pytest.importorskip("torch")

    sys.path.insert(0, "/root/reference")
    try:
        from models_fer_vit.image_vit import ImageViT as RefImageViT
    finally:
        sys.path.remove("/root/reference")

    cfg = dict(img_size=32, patch_size=16, embed_dim=32, depth=1, heads=2,
               mlp_dim=64, num_classes=7, dropout=0.0)
    torch.manual_seed(0)
    ref_model = RefImageViT(**cfg).eval()
    ckpt = str(tmp_path / "ref_image_vit.pt")
    torch.save({"epoch": 2, "model_state_dict": ref_model.state_dict(),
                "config": {"model": dict(cfg, model_size="custom")}}, ckpt)

    # tiny class-dir image tree
    from PIL import Image

    from fer_vit_tpu import EMOTION_NAMES

    rng = np.random.default_rng(0)
    test_dir = tmp_path / "imgs"
    for c in EMOTION_NAMES:
        d = test_dir / c
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, size=(32, 32, 3),
                                         dtype=np.uint8)).save(
                str(d / f"{i}.png"))

    from fer_vit_tpu.eval.evaluate_image_vit import build_parser, main

    out_dir = str(tmp_path / "out")
    report = run_cli(main, build_parser(), [
        "--checkpoint_path", ckpt, "--test_dir", str(test_dir),
        "--output_dir", out_dir])
    assert report["num_samples"] == 14
    assert 0.0 <= report["accuracy"] <= 1.0

    # predictions equal the torch model's on the same normalized inputs
    from fer_vit_tpu.data.image_pipeline import ImageStore, normalize_images
    from fer_vit_tpu.eval.evaluate_image_vit import load_model

    model, variables, _, img_size = load_model(ckpt)
    store = ImageStore.load(str(test_dir), img_size)
    x = normalize_images(jnp.asarray(store.images))
    with jax.default_matmul_precision("highest"):
        ours_logits = np.asarray(model.apply(variables, x))
    with torch.no_grad():
        ref_logits = ref_model(
            torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours_logits, ref_logits, rtol=1e-4, atol=1e-4)
