"""AOT export tests (fer_vit_tpu/export.py): StableHLO artifact roundtrip
for both predictor routes, meta/dtype contracts, and CLI wiring. Rebuild
extension — the reference deploys model code + torch checkpoints
(reference: eval/evaluate_model.py:60-104); here the deployment unit is
the serialized compiled program."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fer_vit_tpu.encoders.psp import EncoderWrapper, PSpEncoder
from fer_vit_tpu.export import export_predictor, load_exported
from fer_vit_tpu.models import ImageViT, LatentViT
from fer_vit_tpu.serve import Predictor

TINY_PLAN = ((64, 16, 1), (16, 32, 2), (32, 32, 2), (32, 64, 1))
MODEL_KW = dict(latent_dim=16, seq_len=18, embed_dim=32, depth=1, heads=2,
                mlp_dim=64, num_classes=7, dropout=0.0)


@pytest.fixture(scope="module")
def latent_predictor():
    enc = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                     n_styles=18, dtype=jnp.float32)
    psp = EncoderWrapper(encoder=enc, seed=0, fold_bn=False)
    model = LatentViT(**MODEL_KW)
    variables = model.init(jax.random.key(1), jnp.zeros((1, 18, 16)))
    return Predictor(model, variables, psp=psp, batch_size=4)


@pytest.fixture(scope="module")
def image_predictor():
    model = ImageViT(img_size=32, patch_size=8, embed_dim=32, depth=1,
                     heads=2, num_classes=7)
    variables = model.init(
        jax.random.key(2), jnp.zeros((1, 32, 32, 3)), deterministic=True)
    return Predictor(model, variables, image_route=True, batch_size=4,
                     input_size=32)


def _images(n, size=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8)


def _assert_roundtrip(predictor, artifact_dir, n_images=6):
    meta = export_predictor(predictor, artifact_dir)
    reloaded = Predictor.from_exported(artifact_dir)
    # both exported input signatures, each vs the live predictor's own
    # trace of that dtype — same program, same weights: allow only float
    # noise from the one re-lowering
    for images in (_images(n_images),
                   _images(n_images).astype(np.float32)):
        labels_live, probs_live = predictor.predict(images)
        labels_aot, probs_aot = reloaded.predict(images)
        np.testing.assert_array_equal(labels_live, labels_aot)
        np.testing.assert_allclose(probs_live, probs_aot, atol=1e-6)
    return meta, reloaded


def test_latent_route_roundtrip(latent_predictor, tmp_path):
    meta, reloaded = _assert_roundtrip(latent_predictor,
                                       str(tmp_path / "art"))
    assert meta["route"] == "latent"
    assert meta["num_weight_args"] == 2  # (enc_vars, cls_vars)
    assert reloaded.describe()["model"] == "LatentViT"
    assert reloaded.batch_size == 4 and reloaded.input_size == 32


def test_image_route_roundtrip(image_predictor, tmp_path):
    meta, reloaded = _assert_roundtrip(image_predictor,
                                       str(tmp_path / "art"))
    assert meta["route"] == "image"
    assert meta["num_weight_args"] == 1
    assert reloaded.describe()["model"] == "ImageViT"


def test_artifact_layout_and_meta(latent_predictor, tmp_path):
    art = str(tmp_path / "art")
    meta = export_predictor(latent_predictor, art)
    assert sorted(os.listdir(art)) == ["meta.json",
                                       "predict_fn_float32.stablehlo",
                                       "predict_fn_uint8.stablehlo",
                                       "weights.msgpack"]
    with open(os.path.join(art, "meta.json")) as f:
        on_disk = json.load(f)
    assert on_disk == meta
    for key in ("format_version", "model", "route", "batch_size",
                "input_size", "num_classes", "input_dtypes",
                "num_weight_args", "platforms", "jax_version"):
        assert key in meta, key
    assert jax.default_backend() in meta["platforms"]
    assert meta["input_dtypes"] == ["uint8", "float32"]


def test_padding_arbitrary_request_counts(latent_predictor, tmp_path):
    """N not a multiple of the pinned batch still answers exactly."""
    art = str(tmp_path / "art")
    export_predictor(latent_predictor, art)
    reloaded = Predictor.from_exported(art)
    images = _images(7)  # batch 4 → one full + one padded chunk
    labels_full, probs_full = reloaded.predict(images)
    labels_one, probs_one = reloaded.predict(images[:1])
    assert labels_full.shape == (7,) and probs_full.shape == (7, 7)
    np.testing.assert_array_equal(labels_full[:1], labels_one)
    np.testing.assert_allclose(probs_full[:1], probs_one, atol=1e-6)


def test_pinned_dtype_rejected_loudly(latent_predictor, tmp_path):
    art = str(tmp_path / "art")
    export_predictor(latent_predictor, art)
    reloaded = Predictor.from_exported(art)
    with pytest.raises(ValueError, match="pins input dtypes"):
        reloaded.predict(_images(2).astype(np.float64))


def test_mesh_predictor_refused(latent_predictor):
    class _FakeMesh:  # never reached past the guard
        pass

    latent_predictor_mesh = Predictor.__new__(Predictor)
    latent_predictor_mesh.mesh = _FakeMesh()
    with pytest.raises(ValueError, match="mesh-bound"):
        export_predictor(latent_predictor_mesh, "/nonexistent")


def test_wrong_platform_refused(latent_predictor, tmp_path):
    art = str(tmp_path / "art")
    export_predictor(latent_predictor, art)
    meta_path = os.path.join(art, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["platforms"] = ["tpu"] if jax.default_backend() != "tpu" else [
        "cpu"]
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="exported for platforms"):
        load_exported(art)


def test_not_an_artifact_dir(tmp_path):
    with pytest.raises(FileNotFoundError, match="fervit-export"):
        load_exported(str(tmp_path))


def test_weight_swap_without_retrace(latent_predictor, tmp_path):
    """Weights are artifact *arguments*: swapping weights.msgpack for a
    differently-initialized model changes the answers without touching
    the StableHLO module."""
    art = str(tmp_path / "art")
    export_predictor(latent_predictor, art)
    calls_by_dtype, weight_args, meta = load_exported(art)
    call = calls_by_dtype[np.dtype(np.uint8)]
    images = jnp.asarray(_images(4))
    _, probs_orig = call(*weight_args, images)

    model = LatentViT(**MODEL_KW)
    new_vars = model.init(jax.random.key(99), jnp.zeros((1, 18, 16)))
    from flax import serialization

    new_cls = jax.tree.map(np.asarray,
                           serialization.to_state_dict(new_vars))
    _, probs_swapped = call(weight_args[0], new_cls, images)
    assert not np.allclose(np.asarray(probs_orig),
                           np.asarray(probs_swapped), atol=1e-3)


def test_predict_cli_exported_route(latent_predictor, tmp_path):
    """fervit-predict --exported end-to-end over image files."""
    from PIL import Image

    from fer_vit_tpu.serve import build_predict_parser, predict_main

    art = str(tmp_path / "art")
    export_predictor(latent_predictor, art)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i, img in enumerate(_images(3, seed=5)):
        Image.fromarray(img).save(img_dir / f"im{i}.png")
    out = str(tmp_path / "pred.json")
    args = build_predict_parser().parse_args(
        ["--exported", art, "--input", str(img_dir), "--output", out])
    report = predict_main(args)
    assert report["model"]["model"] == "LatentViT"
    assert len(report["predictions"]) == 3
    assert report["checkpoint"] == art

    live_labels, _ = latent_predictor.predict_files(
        [p["path"] for p in report["predictions"]])
    assert [p["label"] for p in report["predictions"]] == list(
        map(int, live_labels))


def test_http_server_over_exported_artifact(latent_predictor, tmp_path):
    """make_server + dynamic batcher on a from_exported predictor: the
    full serving stack runs against the AOT artifact."""
    import io
    import json as json_mod
    import threading
    import urllib.request

    from PIL import Image

    from fer_vit_tpu.serve import make_server

    art = str(tmp_path / "art")
    export_predictor(latent_predictor, art)
    reloaded = Predictor.from_exported(art)
    srv = make_server(reloaded, host="127.0.0.1", port=0, max_wait_ms=5.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        image = _images(1, seed=11)[0]
        expected_label, _ = latent_predictor.predict(image[None])
        buf = io.BytesIO()
        Image.fromarray(image).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_port}/predict",
            data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json_mod.loads(r.read())
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.server_port}/healthz",
                timeout=30) as r:
            health = json_mod.loads(r.read())
    finally:
        srv.shutdown()
        srv.batcher.close()
        srv.server_close()
        thread.join(timeout=5)
    assert body["label"] == int(expected_label[0])
    assert health["model"]["model"] == "LatentViT"


def test_predict_cli_flag_exclusivity(tmp_path):
    from fer_vit_tpu.serve import build_predict_parser, predict_main

    args = build_predict_parser().parse_args(["--input", str(tmp_path)])
    with pytest.raises(SystemExit, match="exactly one of"):
        predict_main(args)
    args = build_predict_parser().parse_args(
        ["--checkpoint_path", "x", "--exported", "y",
         "--input", str(tmp_path)])
    with pytest.raises(SystemExit, match="exactly one of"):
        predict_main(args)
    args = build_predict_parser().parse_args(
        ["--exported", "y", "--input", str(tmp_path), "--dp_devices", "2"])
    with pytest.raises(SystemExit, match="single-device"):
        predict_main(args)
