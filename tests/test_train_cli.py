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
    # eval CLIs share the same frozen flag contract
    ("fer_vit_tpu.eval.evaluate_model", "eval/evaluate_model.py"),
    ("fer_vit_tpu.eval.evaluate_image_vit", "eval/evaluate_image_vit.py"),
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


def _reference_arg_specs(path):
    """Mechanically extract every ``add_argument('--flag', ...)`` call from a
    reference script via ast — the parsers live inside ``if __name__``
    blocks, so they can't be imported. Literal kwargs only; non-literal
    defaults surface as '<expr:...>' and are compared by unparse text."""
    import ast

    specs = {}
    for node in ast.walk(ast.parse(open(path).read())):
        if (isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument" and node.args
                and isinstance(node.args[0], ast.Constant)
                and str(node.args[0].value).startswith("--")):
            kw = {}
            for k in node.keywords:
                if k.arg in ("default", "action", "required", "choices"):
                    try:
                        kw[k.arg] = ast.literal_eval(k.value)
                    except (ValueError, SyntaxError):
                        kw[k.arg] = f"<expr:{ast.unparse(k.value)}>"
            specs[node.args[0].value] = kw
    return specs


# Flags where our default deliberately differs from the reference's —
# any exception must be listed as
# (module, flag): (ref_default, our_default, reason).
DEFAULT_EXCEPTIONS = {
    ("fer_vit_tpu.eval.evaluate_image_vit", "--img_size"): (
        224, 0,
        "0 = auto-detect from the checkpoint geometry; the reference's "
        "fixed 224 silently crashes on non-224 checkpoints (its pos-emb "
        "is trained at the checkpoint resolution)"),
}


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT),
                    reason="reference tree not present")
@pytest.mark.parametrize("module_name,ref_rel", CLI_PAIRS,
                         ids=[m.rsplit(".", 1)[-1] for m, _ in CLI_PAIRS])
def test_cli_flag_defaults_match_reference(module_name, ref_rel):
    """Default VALUES (not just names) are part of the frozen CLI contract
    (VERDICT r2 #6; reference train/train_latent_vit.py:388-421): for every
    reference flag, our parser's default / required-ness / choices must
    match the reference parser's."""
    import importlib

    mod = importlib.import_module(module_name)
    ours = {}
    for a in mod.build_parser()._actions:
        for s in a.option_strings:
            if s.startswith("--"):
                ours[s] = a
    mismatches = []
    for flag, kw in _reference_arg_specs(
            os.path.join(REFERENCE_ROOT, ref_rel)).items():
        if flag not in ours:
            continue  # the superset test reports missing flags
        a = ours[flag]
        if kw.get("required"):
            if not a.required:
                mismatches.append(f"{flag}: reference requires it, ours "
                                  "doesn't")
            continue
        ref_default = kw.get("default")
        if kw.get("action") == "store_true" and ref_default is None:
            ref_default = False
        if kw.get("action") == "store_false" and ref_default is None:
            ref_default = True
        if (module_name, flag) in DEFAULT_EXCEPTIONS:
            exc_ref, exc_ours, _ = DEFAULT_EXCEPTIONS[(module_name, flag)]
            assert ref_default == exc_ref and a.default == exc_ours
            continue
        if a.default != ref_default:
            mismatches.append(
                f"{flag}: ref default={ref_default!r} ours={a.default!r}")
        ref_choices = kw.get("choices")
        if (ref_choices and not isinstance(ref_choices, str)
                and a.choices is not None
                and not set(ref_choices) <= set(a.choices)):
            mismatches.append(
                f"{flag}: ref choices={ref_choices!r} ours={a.choices!r}")
    assert not mismatches, f"{module_name}: {mismatches}"


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
