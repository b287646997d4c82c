"""Console entry points (``[project.scripts]`` in pyproject.toml).

Each wrapper reproduces the module's ``__main__`` block: parse with the
module's reference-flag-compatible ``build_parser()``, run the module's
optional ``validate_args``, then call ``main``. The modules stay runnable
as ``python -m fer_vit_tpu.train.train_latent_vit`` too — the reference's
invocation style (reference: train/train_latent_vit.py:387-426).
"""

from __future__ import annotations

import importlib


def _run(module_name: str) -> None:
    mod = importlib.import_module(module_name)
    args = mod.build_parser().parse_args()
    validate = getattr(mod, "validate_args", None)
    if validate is not None:
        validate(args)
    # Console scripts run as ``sys.exit(wrapper())`` — main()'s result
    # (a metrics dict, or generate_latents' encoded-image count) is data,
    # not an exit code, and must NOT propagate (sys.exit(non-None) would
    # turn it into a nonzero exit). Failures raise and exit 1 normally.
    mod.main(args)
    return None


# -- trainers (reference train/*.py, SURVEY.md §2.4) -------------------------

def train_latent_vit():
    return _run("fer_vit_tpu.train.train_latent_vit")


def train_latent_vit_v2():
    return _run("fer_vit_tpu.train.train_latent_vit_v2")


def train_image_vit():
    return _run("fer_vit_tpu.train.train_image_vit")


def train_hybrid_latent_vit():
    return _run("fer_vit_tpu.train.train_hybrid_latent_vit")


def train_expression_aware_vit():
    return _run("fer_vit_tpu.train.train_expression_aware_vit")


def train_latent_cnn():
    return _run("fer_vit_tpu.train.train_latent_cnn")


def train_style_extractor():
    return _run("fer_vit_tpu.afs.train_style_extractor")


def vit_fer():
    return _run("fer_vit_tpu.train.vit_fer")


# -- eval / data / analysis tools --------------------------------------------

def evaluate_model():
    return _run("fer_vit_tpu.eval.evaluate_model")


def evaluate_image_vit():
    return _run("fer_vit_tpu.eval.evaluate_image_vit")


def generate_latents():
    return _run("fer_vit_tpu.data.generate_latents")


def compute_expression_direction():
    return _run("fer_vit_tpu.analysis.expression_directions")


def export_torch_checkpoint():
    return _run("fer_vit_tpu.interop.export_torch_checkpoint")


# -- serving (rebuild extension; fer_vit_tpu/serve.py) ------------------------

def predict():
    from fer_vit_tpu import serve as _serve

    _serve.predict_main(_serve.build_predict_parser().parse_args())
    return None


def serve():
    from fer_vit_tpu import serve as _serve

    _serve.serve_main(_serve.build_serve_parser().parse_args())
    return None


def pack_images():
    return _run("fer_vit_tpu.data.image_packs")


def export_aot():
    return _run("fer_vit_tpu.export")
