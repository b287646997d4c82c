"""End-to-end CLI smoke tests (SURVEY.md §4 implication (e)): tiny synthetic
dataset through the real trainer entry points, checking the experiment-dir
contract (config.json, logs/, checkpoints/, experiment_summary.json)."""

import json
import os

import numpy as np
import pytest


def make_latent_dirs(tmp_path, n_train=40, n_val=14, seq_len=18, dim=512):
    rng = np.random.default_rng(0)
    dirs = {}
    for split, n in [("train", n_train), ("val", n_val)]:
        d = tmp_path / split
        d.mkdir()
        x = rng.normal(size=(n, seq_len, dim)).astype(np.float32)
        y = (np.arange(n) % 7).astype(np.int32)
        np.savez(str(d / "latents_pack.npz"), latents=x, labels=y)
        dirs[split] = str(d)
    return dirs


def run_cli(module_main, parser, argv):
    args = parser.parse_args(argv)
    return module_main(args)


REFERENCE_ROOT = "/root/reference"

# (our module, reference parser source) for the mechanical flag diff
CLI_PAIRS = [
    ("fer_vit_tpu.train.train_latent_vit", "train/train_latent_vit.py"),
    ("fer_vit_tpu.train.train_latent_vit_v2", "train/train_latent_vit_v2.py"),
    ("fer_vit_tpu.train.train_image_vit", "train/train_image_vit.py"),
    ("fer_vit_tpu.train.train_hybrid_latent_vit",
     "train/train_hybrid_latent_vit.py"),
    ("fer_vit_tpu.train.train_expression_aware_vit",
     "train/train_expression_aware_vit.py"),
    ("fer_vit_tpu.train.train_latent_cnn", "train/train_latent_cnn.py"),
    ("fer_vit_tpu.afs.train_style_extractor",
     "train/train_style_extractor.py"),
]


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT),
                    reason="reference tree not present")
@pytest.mark.parametrize("module_name,ref_rel", CLI_PAIRS,
                         ids=[m.rsplit(".", 1)[-1] for m, _ in CLI_PAIRS])
def test_cli_flags_superset_of_reference(module_name, ref_rel):
    """Every flag the reference parser accepts must exist on our parser
    (CLI contract, SURVEY.md §2.4). Extras (--resume, --debug_nans,
    --no_bf16, ...) are allowed — they are documented rebuild extensions."""
    import importlib
    import re

    mod = importlib.import_module(module_name)
    ours = {
        s
        for a in mod.build_parser()._actions
        for s in a.option_strings
        if s.startswith("--")
    }
    src = open(os.path.join(REFERENCE_ROOT, ref_rel)).read()
    ref = set(re.findall(r'add_argument\(\s*[\'"](--[\w\-]+)[\'"]', src))
    missing = ref - ours
    assert not missing, f"{module_name} missing reference flags: {missing}"


class TestTrainLatentViTCLI:
    def test_end_to_end(self, tmp_path):
        from fer_vit_tpu.train.train_latent_vit import build_parser, main

        dirs = make_latent_dirs(tmp_path)
        exp_dir = str(tmp_path / "experiments")
        results = run_cli(
            main, build_parser(),
            [
                "--latent_train_dir", dirs["train"],
                "--latent_val_dir", dirs["val"],
                "--epochs", "2", "--batch_size", "16",
                "--depth", "1", "--embed_dim", "64", "--heads", "2",
                "--mlp_dim", "128", "--use_class_weights",
                "--experiments_dir", exp_dir, "--no_bf16",
            ],
        )
        assert 0.0 <= results["best_f1"] <= 1.0
        assert len(results["history"]) == 2

        # experiment-dir contract
        exp_names = os.listdir(exp_dir)
        assert len(exp_names) == 1
        assert exp_names[0].startswith("latent_vit_d1_")
        assert exp_names[0].endswith("_frac100")
        runs = os.listdir(os.path.join(exp_dir, exp_names[0]))
        assert len(runs) == 1
        run_dir = os.path.join(exp_dir, exp_names[0], runs[0])
        assert os.path.isdir(os.path.join(run_dir, "checkpoints"))
        assert os.path.isdir(os.path.join(run_dir, "logs"))
        with open(os.path.join(run_dir, "config.json")) as f:
            config = json.load(f)
        assert config["model"]["depth"] == 1
        assert config["training"]["mixup"] == 1.0
        with open(os.path.join(run_dir, "experiment_summary.json")) as f:
            summary = json.load(f)
        assert set(summary) == {
            "experiment_name", "run_id", "duration_seconds",
            "final_metrics", "config",
        }
        assert "best_f1_macro" in summary["final_metrics"]
        assert os.path.exists(
            os.path.join(run_dir, "checkpoints", "best_model.pt")
        )

    def test_data_fraction(self, tmp_path):
        from fer_vit_tpu.train.train_latent_vit import build_parser, main

        dirs = make_latent_dirs(tmp_path, n_train=70)
        results = run_cli(
            main, build_parser(),
            [
                "--latent_train_dir", dirs["train"],
                "--latent_val_dir", dirs["val"],
                "--epochs", "1", "--batch_size", "8",
                "--depth", "1", "--embed_dim", "32", "--heads", "2",
                "--mlp_dim", "64", "--data_fraction", "0.5",
                "--experiments_dir", str(tmp_path / "exp2"), "--no_bf16",
            ],
        )
        assert len(results["history"]) == 1
