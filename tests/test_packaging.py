"""Packaging contract (VERDICT r2 #7): the framework installs via
pyproject.toml and works from an installed (non-cwd) checkout — package
boundary imports, console entry points, shipped native source.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def installed(tmp_path_factory):
    """pip-install the repo into an isolated --target dir (no deps pulled:
    the baked-in env already has them; no build isolation: offline)."""
    target = str(tmp_path_factory.mktemp("install"))
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps",
         "--no-build-isolation", "--quiet", "--target", target, REPO],
        capture_output=True, text=True, timeout=300)
    if r.returncode != 0:
        pytest.skip(f"pip install unavailable here: {r.stderr[-500:]}")
    return target


def _run_py(code: str, target: str, cwd: str):
    env = dict(os.environ, PYTHONPATH=target, JAX_PLATFORMS="cpu",
               JAX_PLATFORM_NAME="cpu")
    return subprocess.run([sys.executable, "-c", code], env=env, cwd=cwd,
                          capture_output=True, text=True, timeout=300)


def test_installed_package_imports_outside_repo(installed, tmp_path):
    r = _run_py(
        "import fer_vit_tpu, inspect;"
        f"assert inspect.getfile(fer_vit_tpu).startswith({installed!r}), "
        "inspect.getfile(fer_vit_tpu);"
        "from fer_vit_tpu.models import LatentViT;"
        "from fer_vit_tpu.train.harness import Harness, TrainConfig;"
        "from fer_vit_tpu.cli import train_latent_vit;"
        "print('ok')",
        installed, str(tmp_path))
    assert r.returncode == 0, r.stderr[-1000:]
    assert "ok" in r.stdout


def test_native_source_ships_with_package(installed):
    src = os.path.join(installed, "fer_vit_tpu", "native_src", "decode.cpp")
    assert os.path.exists(src)


def test_console_entry_points_exist(installed):
    bin_dir = os.path.join(installed, "bin")
    expected = {
        "fervit-train-latent-vit", "fervit-train-latent-vit-v2",
        "fervit-train-image-vit", "fervit-train-hybrid-latent-vit",
        "fervit-train-expression-aware-vit", "fervit-train-latent-cnn",
        "fervit-train-style-extractor", "fervit-vit-fer",
        "fervit-evaluate-model", "fervit-evaluate-image-vit",
        "fervit-generate-latents", "fervit-compute-expression-direction",
        "fervit-export-torch-checkpoint",
        "fervit-predict", "fervit-serve", "fervit-pack-images",
        "fervit-export",
    }
    assert expected <= set(os.listdir(bin_dir))


def test_entry_point_trains_from_installed_checkout(installed, tmp_path):
    """End-to-end: the installed console script trains on synthetic latents
    from a non-repo cwd and writes the experiment-dir contract."""
    import numpy as np
    import torch

    for split, n in (("train", 16), ("val", 8)):
        d = tmp_path / split
        d.mkdir()
        rng = np.random.default_rng(0)
        for i in range(n):
            torch.save({"latent": torch.tensor(
                rng.normal(size=(18, 512)), dtype=torch.float32),
                "label": int(i % 7)}, str(d / f"s{i:03d}.pt"))

    env = dict(os.environ, PYTHONPATH=installed, JAX_PLATFORMS="cpu",
               JAX_PLATFORM_NAME="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(installed, "bin",
                                      "fervit-train-latent-vit"),
         "--latent_train_dir", str(tmp_path / "train"),
         "--latent_val_dir", str(tmp_path / "val"),
         "--epochs", "1", "--batch_size", "16", "--depth", "1",
         "--embed_dim", "32", "--heads", "2", "--mlp_dim", "64",
         "--mixup", "0.0", "--scheduler", "none"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    exp = tmp_path / "experiments"
    runs = list(exp.glob("*/*/config.json"))
    assert runs, list(exp.rglob("*"))
    assert list(exp.glob("*/*/checkpoints/best_model.pt"))


def test_validate_args_rejects_bad_fraction():
    """The CLI wrapper honors the module's validate_args hook (the check
    the reference performs in its __main__ block)."""
    from fer_vit_tpu.train.train_latent_vit import build_parser, validate_args

    args = build_parser().parse_args(
        ["--latent_train_dir", "a", "--latent_val_dir", "b",
         "--data_fraction", "1.5"])
    with pytest.raises(ValueError):
        validate_args(args)
