"""Hardware smoke validation: drives the framework's real-TPU surfaces
end-to-end with synthetic data. Run on a chip-attached machine:

    python scripts/validate_tpu.py            # all stages, ~10-20 min cold
    python scripts/validate_tpu.py train      # one stage

Stages
  encoder   plain vs fused-residual PSpEncoder forward at 256px (the
            integrated Pallas path; bf16-tolerance output equality)
  train     real training on the chip: ImageViT (197 tokens → the Pallas
            flash-attention path under jax.grad — the round-1 advisor's
            crash scenario, now custom-VJP'd) + LatentViT via the CLI
            with the experiment-dir contract
  genlat    the north-star generate_latents pipeline (SURVEY §3.2):
            native decode → jitted pSp encode → sharded packs +
            resumable manifest → LatentStore roundtrip
  afs       the fused AFS train step (SURVEY §3.4): 3 StyleExtractor
            forwards + 3 StyleGAN2 syntheses + ArcFace + LPIPS +
            backward + clipped Adam, finiteness-checked
  serve     the serving surface (fer_vit_tpu/serve.py): checkpoint →
            Predictor → native-decode file predictions → HTTP server
            round-trip equality against the offline path
  export    the AOT export path (fer_vit_tpu/export.py): Predictor →
            StableHLO artifact → from_exported → identical answers
            (production-scale pSp variant: scripts/validate_export.py)

Each stage prints `<stage> OK`; a failing stage is recorded and the run
exits non-zero at the end. Per-round machine-readable record:
VALIDATE_r<k>.json (all stages passed on the v5e tunnel chip).
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stage_encoder() -> None:
    import jax
    import jax.numpy as jnp

    from fer_vit_tpu.encoders.psp import PSpEncoder

    enc = PSpEncoder(dtype=jnp.bfloat16, fuse_bn=True)
    enc_f = PSpEncoder(dtype=jnp.bfloat16, fuse_bn=True,
                       fused_residual=True)
    v = enc.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)))
    x = jnp.asarray(
        np.random.default_rng(1).normal(scale=0.5, size=(4, 256, 256, 3)),
        jnp.float32)
    t0 = time.perf_counter()
    ref = jax.jit(enc.apply)(v, x)
    ref.block_until_ready()
    got = jax.jit(enc_f.apply)(v, x)
    got.block_until_ready()
    rel = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 0.03, f"fused encoder diverges: rel={rel}"
    print(f"encoder OK (rel={rel:.1e}, {time.perf_counter() - t0:.0f}s)",
          flush=True)


def _image_tree(root: str, n_per: int, size: int = 48) -> None:
    from PIL import Image

    from fer_vit_tpu import EMOTION_NAMES

    rng = np.random.default_rng(0)
    for c in EMOTION_NAMES:
        d = os.path.join(root, c)
        os.makedirs(d)
        for i in range(n_per):
            Image.fromarray(
                rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
            ).save(os.path.join(d, f"{i}.png"))


def stage_train() -> None:
    td = tempfile.mkdtemp(prefix="fervit_validate_")
    for split, n in [("train", 3), ("val", 2)]:
        _image_tree(os.path.join(td, split), n)

    from fer_vit_tpu.train.train_image_vit import build_parser, main
    res = main(build_parser().parse_args([
        "--train_dir", os.path.join(td, "train"),
        "--val_dir", os.path.join(td, "val"),
        "--img_size", "224", "--model_size", "custom", "--patch_size", "16",
        "--embed_dim", "64", "--depth", "1", "--heads", "2",
        "--mlp_dim", "128", "--epochs", "2", "--batch_size", "8",
        "--dropout", "0.0",  # selects the fused-attention path under grad
        "--experiments_dir", os.path.join(td, "exp"),
    ]))
    assert len(res["history"]) == 2
    print("train(image_vit/flash-attn-grad) OK", flush=True)

    ld = os.path.join(td, "lat")
    for split, n in [("train", 40), ("val", 14)]:
        d = os.path.join(ld, split)
        os.makedirs(d)
        rng = np.random.default_rng(1)
        np.savez(os.path.join(d, "pack.npz"),
                 latents=rng.normal(size=(n, 18, 512)).astype(np.float32),
                 labels=(np.arange(n) % 7).astype(np.int32))
    from fer_vit_tpu.train.train_latent_vit import (
        build_parser as lp, main as lm)
    lm(lp().parse_args([
        "--latent_train_dir", os.path.join(ld, "train"),
        "--latent_val_dir", os.path.join(ld, "val"),
        "--epochs", "2", "--batch_size", "16", "--depth", "2",
        "--experiments_dir", os.path.join(td, "exp2"),
    ]))
    assert glob.glob(os.path.join(td, "exp2", "*", "*", "checkpoints",
                                  "best_model.pt"))
    print("train(latent_vit CLI) OK", flush=True)


def stage_genlat() -> None:
    from fer_vit_tpu.data.generate_latents import generate_latents
    from fer_vit_tpu.data.latent_store import LatentStore
    from fer_vit_tpu.encoders.psp import EncoderWrapper

    td = tempfile.mkdtemp(prefix="fervit_validate_")
    root = os.path.join(td, "images")
    _image_tree(root, 5, size=64)
    out = os.path.join(td, "latents")
    wrapper = EncoderWrapper()  # random init; real weights via from_npz
    n = generate_latents(root, out, encoder=wrapper, batch_size=16)
    assert n == 35, n
    assert generate_latents(root, out, encoder=wrapper,
                            batch_size=16) == 0  # resumable manifest
    store = LatentStore.load(out)
    assert store.latents.shape == (35, 18, 512)
    print("genlat OK", flush=True)


def stage_afs() -> None:
    """The full AFS loss graph on chip: three StyleExtractor forwards
    (MaskedBatchNorm train mode), three StyleGAN2 syntheses, ArcFace ×2,
    LPIPS, backward + clipped Adam — one jitted step (SURVEY §3.4)."""
    import jax
    import jax.numpy as jnp
    import optax

    from fer_vit_tpu.afs.losses import AFSLoss
    from fer_vit_tpu.afs.style_extractor import StyleExtractor
    from fer_vit_tpu.afs.train_style_extractor import make_train_step
    from fer_vit_tpu.encoders.stylegan2 import Generator

    plan = [(64, 64, 1), (64, 128, 1), (128, 256, 1), (256, 512, 1)]
    n_latent = 10  # matches a size-64 generator (2·log2(64) − 2)
    h = StyleExtractor(n_layers=n_latent)
    variables = h.init(jax.random.key(0), jnp.zeros((2, n_latent, 512)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    gen = Generator(size=64, channel_multiplier=1)
    w0 = jnp.zeros((1, gen.n_latent, 512))
    gen_vars = gen.init(jax.random.key(1), [w0])
    criterion = AFSLoss(lambda_cons=0.1, arcface_plan=plan)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1.0))
    opt_state = tx.init(params)
    jit_step, _ = make_train_step(h, gen, gen_vars, criterion,
                                  use_provider_a=True)
    rng = np.random.default_rng(2)
    w_src = jnp.asarray(rng.normal(size=(4, n_latent, 512)), jnp.float32)
    w_tgt = jnp.asarray(rng.normal(size=(4, n_latent, 512)), jnp.float32)
    dummy = jnp.zeros((4, 256, 256, 3), jnp.float32)
    last = None
    for _ in range(2):
        params, batch_stats, opt_state, loss, metrics = jit_step(
            params, batch_stats, opt_state, jnp.float32(1e-3),
            w_src, w_tgt, dummy, dummy)
        last = float(loss)
        assert np.isfinite(last), last
    for leaf in jax.tree_util.tree_leaves((params, batch_stats)):
        assert np.isfinite(np.asarray(leaf)).all()
    print(f"afs OK (loss={last:.4f})", flush=True)


def stage_serve() -> None:
    """The serving surface on chip: an ImageViT checkpoint through
    Predictor.from_checkpoint, offline file predictions via the
    native-decode feed, and an HTTP round-trip that must agree with the
    offline path (see fer_vit_tpu/serve.py; tests/test_serve.py is the
    CPU-side coverage)."""
    import io
    import json
    import threading
    import urllib.request

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fer_vit_tpu.eval.evaluate_image_vit import model_from_config
    from fer_vit_tpu.serve import Predictor, _collect_inputs, make_server
    from fer_vit_tpu.train.harness import Harness, TrainConfig
    from fer_vit_tpu.utils.experiment_logger import ExperimentLogger

    td = tempfile.mkdtemp(prefix="fervit_validate_")
    cfg = dict(img_size=64, patch_size=8, embed_dim=64, depth=2, heads=2,
               mlp_dim=128, num_classes=7, dropout=0.0)
    model = model_from_config(dict(cfg))
    h = Harness(model=model,
                cfg=TrainConfig(epochs=1, batch_size=8, mixup=0.0))
    state = h.init_state(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    logger = ExperimentLogger("validate_serve", base_dir=td)
    logger.log_config({"model": cfg, "training": {}})
    logger.save_checkpoint(state, 1, {"f1_macro": 0.0}, is_best=True)
    logger.close()
    ckpt = os.path.join(logger.run_dir, "checkpoints", "best_model.pt")

    img_root = os.path.join(td, "imgs")
    _image_tree(img_root, 2, size=64)  # 14 PNGs over the 7 class dirs
    paths = _collect_inputs([img_root])
    predictor = Predictor.from_checkpoint(ckpt, batch_size=8)
    labels, probs = predictor.predict_files(paths)
    assert labels.shape == (14,), labels.shape
    assert np.isfinite(probs).all()
    assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-3)

    srv = make_server(predictor, port=0, max_wait_ms=10.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        buf = io.BytesIO()
        Image.open(paths[0]).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_port}/predict",
            data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=300) as r:
            body = json.loads(r.read())
    finally:
        srv.shutdown()
        srv.batcher.close()
        srv.server_close()
    assert body["label"] == int(labels[0]), (body, int(labels[0]))
    print(f"serve OK (http label={body['label_name']})", flush=True)


def stage_export() -> None:
    """The AOT export path on chip: export a Predictor to a StableHLO
    artifact (fer_vit_tpu/export.py), reload with from_exported, and
    require the reloaded program to answer identically. Small ImageViT
    config (fast chip compile); scripts/validate_export.py runs the
    production-scale pSp variant."""
    import jax
    import jax.numpy as jnp

    from fer_vit_tpu.export import export_predictor
    from fer_vit_tpu.models import ImageViT
    from fer_vit_tpu.serve import Predictor

    model = ImageViT(img_size=64, patch_size=8, embed_dim=64, depth=2,
                     heads=2, num_classes=7)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                           deterministic=True)
    predictor = Predictor(model, variables, image_route=True,
                          batch_size=8, input_size=64)
    images = np.random.default_rng(0).integers(
        0, 256, size=(11, 64, 64, 3), dtype=np.uint8)
    labels_live, probs_live = predictor.predict(images)

    td = tempfile.mkdtemp(prefix="fervit_validate_export_")
    art = os.path.join(td, "artifact")
    export_predictor(predictor, art)
    reloaded = Predictor.from_exported(art)
    labels_aot, probs_aot = reloaded.predict(images)
    assert (labels_live == labels_aot).all(), (labels_live, labels_aot)
    assert np.allclose(probs_live, probs_aot, atol=1e-3), float(
        np.max(np.abs(probs_live - probs_aot)))
    print("export OK (AOT artifact answers == live)", flush=True)


STAGES = {"encoder": stage_encoder, "train": stage_train,
          "genlat": stage_genlat, "afs": stage_afs,
          "serve": stage_serve, "export": stage_export}


def main() -> None:
    """Run stages; emit a machine-readable record (VERDICT r2 #8) to
    VALIDATE_r<k>.json (k from $FERVIT_ROUND, default file VALIDATE.json)
    so the driver/judge can see hardware validation without re-running."""
    import json

    import jax

    from fer_vit_tpu.utils.watchdog import arm_device_init_watchdog

    wanted = [a for a in sys.argv[1:] if not a.startswith("--")] or list(STAGES)
    unknown = [w for w in wanted if w not in STAGES]
    if unknown:
        # a typo'd stage must not merge an ok:false row into (and flip)
        # a previously green record — checked BEFORE device init
        raise SystemExit(f"unknown stage(s) {unknown}; "
                         f"choose from {list(STAGES)}")

    wd = arm_device_init_watchdog()  # hung tunnel → die loudly, not hang
    jax.devices()
    wd.cancel()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rnd = os.environ.get("FERVIT_ROUND")
    if rnd is not None and not rnd.isdigit():
        print(f"FERVIT_ROUND={rnd!r} is not an integer; "
              "writing VALIDATE.json", file=sys.stderr)
        rnd = None
    out_path = os.path.join(
        repo, f"VALIDATE_r{int(rnd):02d}.json" if rnd else "VALIDATE.json")

    # Single-stage runs merge into an existing same-device record so the
    # per-round artifact can be refreshed incrementally when a stage is
    # added without re-running the ~20-min encoder compile. Each stage
    # carries its own run timestamp; stages no longer in STAGES are
    # dropped on merge so a renamed stage can't gate ok forever.
    record = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "stages": {},
    }
    if len(wanted) < len(STAGES) and os.path.exists(out_path):
        prev = json.load(open(out_path))
        if prev.get("device") == record["device"]:
            record["stages"] = {k: v for k, v in
                                prev.get("stages", {}).items()
                                if k in STAGES}

    for name in wanted:
        t0 = time.perf_counter()
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        try:
            STAGES[name]()
            record["stages"][name] = {
                "ok": True, "seconds": round(time.perf_counter() - t0, 1),
                "timestamp": stamp}
        except Exception as e:  # record, keep going, fail at the end
            record["stages"][name] = {
                "ok": False, "seconds": round(time.perf_counter() - t0, 1),
                "timestamp": stamp,
                "error": f"{type(e).__name__}: {e}"}
            print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
    ok = all(s["ok"] for s in record["stages"].values())
    record["ok"] = ok

    with open(out_path, "w") as f:
        json.dump(record, f, indent=2)
    print(f"record → {out_path}")
    print(("VALIDATE_TPU OK: " if ok else "VALIDATE_TPU FAIL: ")
          + ", ".join(wanted))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
