"""Prove trainer equivalence against the REFERENCE's actual torch trainers.

VERDICT r2 #1: the accuracy half of the north star (val-acc parity ±0.5%)
rests on optimizer-trajectory equivalence — AdamW coupling, CE smoothing,
clip ordering, metric semantics — which unit tests can miss. This harness
runs the reference's real code (reference: train/train_latent_vit.py:108-183,
train/train_latent_vit_v2.py:107-148) head-to-head with this framework:

Part A (rigorous, step-level): both frameworks start from IDENTICAL weights
  (our init exported through fer_vit_tpu.interop) and consume IDENTICAL
  batches (shuffle off, mixup 0, dropout 0, f32/HIGHEST). The reference's
  own ``train_epoch`` runs the torch side; per-step losses, per-epoch
  metrics, final parameters, val loss and val LOGITS must agree to tight
  tolerance (argmax metrics may differ only on knife-edge samples whose
  top-2 margin is within the numerical logit drift). Covered trainers:
  latent_vit (AdamW), latent_vit_v2 (AdamW + grad-clip + LWN/SPE/LEAM
  preprocessing stack), latent_cnn (BatchNorm running-stat semantics via
  MaskedBatchNorm, mixup pinned to an exact no-op), hybrid (timm-block
  trunk + adapters; the absent timm package is stubbed with a faithful
  donor — tests/torch_refs_aux.py — while the reference's wrapper/trainer
  code runs unmodified), expression_aware (frozen SVM-direction
  decomposer + hybrid ViT from a shared synthetic directions .pt),
  image_vit (the reference's from-scratch post-norm image ViT on synthetic
  32px images; timm/torchvision import-time stubs only).

Part B (full-run, loose): the CLIs (latent_vit, latent_cnn,
  latent_vit_v2 with the full LWN/SPE/LEAM stack) run as subprocesses on the same
  synthetic dataset written in the reference's per-file .pt schema, each
  with its own native init/shuffling (seeds differ by framework). The
  per-epoch val trajectories must land in the same band — the statistical
  claim behind learning-curve comparability.

Part C (rigorous, step-level): the 7th reference trainer — AFS style
  extractor (reference: train/train_style_extractor.py:86-143). The
  reference's own run_epoch/evaluate drive a torch race against our fused
  jitted AFS step with identical extractor init, identical frozen
  StyleGAN2/ArcFace/LPIPS donors (through the real-checkpoint converters),
  and identical fixed pairs; per-step total losses, per-epoch loss
  components, val metrics and final params+BN stats must agree.

Part D (analysis stack): the reference's latent_analysis SVM CLI
  (sklearn LinearSVC) raced as a subprocess against our on-device vmapped
  squared-hinge SVM on the same synthetic latent dir — the saved per-class
  direction vectors must align (signed cosine ≥ 0.98; measured ≥ 0.9999).

Part E (SeFa): the reference's own sefa package run as-is — factorization
  directions/eigenvalues on the same mapping-fc0 weight, and its
  triple-loop direction verification (driving its own LatentViT loaded
  with our converted weights) vs our single vmapped forward.

Part F (eval contract): the reference's eval/evaluate_model.py CLI vs
  ours on the same torch checkpoint + latent dir — identical
  evaluation_results.json schema and numbers, artifact filenames a
  superset.

Part G (long horizon): one 60-epoch latent_vit race with the plateau
  decays firing; gates scheduler EXACTNESS (cross-replay of each side's
  realized LR sequence through the other side's scheduler). The
  outcome band itself is gated by part H, not by this single pair.

Part H (seed distribution): the part-G config raced over N seeds per
  side, each side with its native init/shuffle/dropout draws; the
  tail-val-acc distributions must be statistically indistinguishable
  (exact permutation test on the seed means). This is what separates
  'one lucky draw' from 'something systematic favors one framework'.

Writes EQUIVALENCE.json. Exit code 0 iff every check passes.

Usage:
    python scripts/verify_reference_equivalence.py            # full
    python scripts/verify_reference_equivalence.py --quick    # CI-sized
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
from types import SimpleNamespace

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
REFERENCE_ROOT = os.environ.get("FERVIT_REFERENCE_ROOT", "/root/reference")

# The comparison design is CPU-vs-CPU at HIGHEST matmul precision: the
# torch oracle runs on CPU, so the jax side must too — on the TPU the
# in-process parts pick up ~4e-5 step-loss noise (bf16-adjacent non-matmul
# ops) and blow the 1e-5 val-loss gate that was calibrated on CPU. Force
# it here so the harness is env-proof (the shell default is the axon TPU).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# -- Part A: step-level equivalence ------------------------------------------


def _make_data(n, seed, scale=3.0, seq_len=18, dim=512):
    """Clustered, LEARNABLE data: the 7 class means are FIXED (seed 1234)
    so train and val splits share the class structure — only the noise and
    sample draw vary with ``seed``. (A per-split mean draw would make val
    unlearnable and both frameworks would sit at chance, turning the
    trajectory-band comparison vacuous.)"""
    rng_means = np.random.default_rng(1234)
    means = rng_means.normal(size=(7, seq_len, dim)).astype(np.float32)
    rng = np.random.default_rng(seed)
    y = (np.arange(n) % 7).astype(np.int64)
    x = means[y] * (scale / np.sqrt(seq_len * dim) * 4.0) + rng.normal(
        size=(n, seq_len, dim)).astype(np.float32)
    return x.astype(np.float32), y


def _make_image_data(n, seed, img=32):
    """Clustered image data (NHWC, [0,1]) for the image trainer's race —
    same fixed-class-means scheme as :func:`_make_data`."""
    rng_means = np.random.default_rng(4321)
    means = rng_means.normal(size=(7, img, img, 3)).astype(np.float32)
    rng = np.random.default_rng(seed)
    y = (np.arange(n) % 7).astype(np.int64)
    x = (means[y] * 0.35
         + rng.normal(size=(n, img, img, 3)).astype(np.float32) * 0.25 + 0.5)
    return np.clip(x, 0.0, 1.0).astype(np.float32), y


class _RecordingCriterion:
    """Wraps the torch criterion; records every scalar it produces. The
    reference computes lam*CE(y) + (1-lam)*CE(y[perm]) per step — with
    mixup 0 (lam == 1.0 exactly) the FIRST call of each pair is the step
    loss."""

    def __init__(self, base):
        self.base = base
        self.calls = []

    def __call__(self, logits, target):
        out = self.base(logits, target)
        self.calls.append(float(out.detach()))
        return out


_NP_BETA = np.random.beta  # restored after the latent_cnn lam pin


def _torch_side(trainer, cfg, sd, x, y, vx, vy, epochs):
    """Run the REFERENCE trainer's train_epoch/evaluate on converted
    weights; returns per-step losses, per-epoch metrics, final params."""
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        if trainer == "latent_vit":
            import train.train_latent_vit as ref_mod
            from models_fer_vit.latent_vit import LatentViT as RefModel

            model = RefModel(latent_dim=512, seq_len=18,
                             embed_dim=cfg["embed_dim"], depth=cfg["depth"],
                             heads=cfg["heads"], mlp_dim=cfg["mlp_dim"],
                             num_classes=7, dropout=0.0)
        elif trainer == "latent_cnn":
            import train.train_latent_cnn as ref_mod
            from models_fer_vit.latent_cnn import create_latent_cnn

            model = create_latent_cnn("light", dropout=0.0)
        elif trainer == "image_vit":
            # train_image_vit imports timm at module top (only used for
            # --use_pretrained); a stub satisfies the import while the
            # model under test is the reference's OWN from-scratch ImageViT.
            from tests.torch_refs_aux import (
                install_fake_timm,
                install_fake_torchvision,
            )

            install_fake_timm({})
            install_fake_torchvision()
            import train.train_image_vit as ref_mod
            from models_fer_vit.image_vit import ImageViT as RefImageViT

            model = RefImageViT(img_size=cfg["img_size"], patch_size=16,
                                embed_dim=cfg["embed_dim"],
                                depth=cfg["depth"], heads=cfg["heads"],
                                mlp_dim=cfg["mlp_dim"], num_classes=7,
                                dropout=0.0)
            x = np.transpose(x, (0, 3, 1, 2)).copy()   # NHWC → torch NCHW
            vx = np.transpose(vx, (0, 3, 1, 2)).copy()
        elif trainer in ("hybrid", "expression_aware"):
            # timm is absent from this image; the reference imports it to
            # donate blocks to HybridLatentViT (hybrid_latent_vit.py:68-93).
            # A faithful stub (tests/torch_refs_aux.py) supplies the same
            # surface; every learned weight is then overwritten by
            # load_state_dict, so the reference's wrapper/trainer code is
            # what runs — only the donor architecture is synthetic.
            from tests.torch_refs_aux import install_fake_timm

            install_fake_timm({"vit_tiny_patch16_224": dict(
                embed_dim=cfg["embed_dim"], depth=cfg["depth"],
                num_heads=cfg["heads"], mlp_hidden=cfg["mlp_dim"])})
            if trainer == "hybrid":
                import train.train_hybrid_latent_vit as ref_mod
                from models_fer_vit.hybrid_latent_vit import (
                    create_hybrid_latent_vit as ref_create,
                )

                model = ref_create(model_size="tiny", use_pretrained=False,
                                   use_adapter=True,
                                   adapter_dim=cfg["adapter_dim"])
            else:
                import train.train_expression_aware_vit as ref_mod
                from models_fer_vit.expression_aware_vit import (
                    ExpressionAwareViT as RefExpr,
                )

                model = RefExpr.from_config(
                    directions_path=cfg["directions_path"],
                    model_size="tiny", use_pretrained=False,
                    output_mode="expr_only")
            # The reference hardcodes head Dropout(0.1)
            # (hybrid_latent_vit.py:110-114); pin p=0 (like the Beta pin)
            # so the step race is deterministic.
            for m in model.modules():
                if isinstance(m, torch.nn.Dropout):
                    m.p = 0.0
        else:
            import train.train_latent_vit_v2 as ref_mod
            from models_fer_vit.latent_vit_v2 import LatentViTv2 as RefModel

            model = RefModel(latent_dim=512, seq_len=18,
                             embed_dim=cfg["embed_dim"], depth=cfg["depth"],
                             heads=cfg["heads"], mlp_dim=cfg["mlp_dim"],
                             num_classes=7, dropout=0.0,
                             use_lwn=True, use_lwn_residual=True,
                             use_spe=True, use_leam=True)
        if trainer == "expression_aware":
            # The decomposer is a frozen buffer derived deterministically
            # from the shared directions file on BOTH sides (never
            # trained); take the torch side's own value so strict loading
            # still covers every learned key.
            sd = dict(sd)
            sd["decomposer.directions"] = \
                model.decomposer.directions.detach().clone()
        model.load_state_dict(sd, strict=True)
        # v1's train_epoch reads the module-global `args`
        # (train/train_latent_vit.py:119); v2 takes it as a parameter
        # (train/train_latent_vit_v2.py:107) — provide both ways. The CNN
        # trainer hardcodes mixup α=1.0 inside train_epoch
        # (train/train_latent_cnn.py:115-120); pinning the Beta(1,1) draw
        # to 1.0 makes it an exact no-op (mixed == original, second CE
        # term weighted 0) so the step race is deterministic.
        ns = SimpleNamespace(mixup=0.0, grad_clip=cfg["grad_clip"])
        ref_mod.args = ns
        extra = (ns,) if trainer == "latent_vit_v2" else ()
        if trainer == "latent_cnn":
            np.random.beta = lambda *a, **k: 1.0

        loader = DataLoader(
            TensorDataset(torch.tensor(x), torch.tensor(y)),
            batch_size=cfg["batch_size"], shuffle=False, num_workers=0)
        val_loader = DataLoader(
            TensorDataset(torch.tensor(vx), torch.tensor(vy)),
            batch_size=cfg["batch_size"], shuffle=False, num_workers=0)
        criterion = _RecordingCriterion(torch.nn.CrossEntropyLoss(
            label_smoothing=cfg["label_smoothing"]))
        optimizer = torch.optim.AdamW(model.parameters(), lr=cfg["lr"],
                                      weight_decay=cfg["weight_decay"])
        epoch_metrics = []
        for _ in range(epochs):
            tr_loss, tr_acc, tr_f1 = ref_mod.train_epoch(
                model, loader, optimizer, criterion, torch.device("cpu"),
                *extra)
            epoch_metrics.append((tr_loss, tr_acc, tr_f1))
        # v1/v2/cnn train_epochs call the criterion twice per step (the
        # lam/1-lam mixup pair); hybrid/expression_aware/image call it once.
        stride = 1 if trainer in ("hybrid", "expression_aware",
                                  "image_vit") else 2
        step_losses = criterion.calls[0::stride]
        val = ref_mod.evaluate(model, val_loader, criterion,
                               torch.device("cpu"))
        model.eval()
        with torch.no_grad():
            val_logits = torch.cat(
                [model(xb) for xb, _ in val_loader]).numpy()
        final_sd = {k: v.detach().numpy().copy()
                    for k, v in model.state_dict().items()}
        return {
            "step_losses": step_losses,
            "epoch_metrics": epoch_metrics,
            "val": {k: val[k] for k in ("loss", "accuracy", "f1_macro")},
            "val_logits": val_logits,
            "final_sd": final_sd,
        }
    finally:
        sys.path.remove(REFERENCE_ROOT)
        np.random.beta = _NP_BETA


def _jax_side(trainer, cfg, x, y, vx, vy, epochs):
    """Run OUR engine on the same weights/batches; per-step losses via
    direct train_step calls in the reference's (sequential) batch order."""
    import jax
    import jax.numpy as jnp

    from fer_vit_tpu.interop import to_torch_state_dict
    from fer_vit_tpu.models import LatentViT, LatentViTv2, create_latent_cnn
    from fer_vit_tpu.models.expression_aware_vit import ExpressionAwareViT
    from fer_vit_tpu.models.hybrid_latent_vit import create_hybrid_latent_vit
    from fer_vit_tpu.train.harness import Harness, TrainConfig

    sd_prefix = ""
    if trainer == "latent_vit":
        model = LatentViT(embed_dim=cfg["embed_dim"], depth=cfg["depth"],
                          heads=cfg["heads"], mlp_dim=cfg["mlp_dim"],
                          dropout=0.0)
        kind, kcfg = "latent_vit", {}
    elif trainer == "latent_cnn":
        model = create_latent_cnn("light", dropout=0.0)
        kind, kcfg = "latent_cnn_light", {}
    elif trainer == "image_vit":
        from fer_vit_tpu.models.image_vit import ImageViT as OurImageViT

        model = OurImageViT(img_size=cfg["img_size"], patch_size=16,
                            embed_dim=cfg["embed_dim"], depth=cfg["depth"],
                            heads=cfg["heads"], mlp_dim=cfg["mlp_dim"],
                            dropout=0.0)
        kind, kcfg = "image_vit", {}
    elif trainer == "hybrid":
        model = create_hybrid_latent_vit(
            model_size="tiny", embed_dim=cfg["embed_dim"],
            depth=cfg["depth"], num_heads=cfg["heads"],
            mlp_dim=cfg["mlp_dim"], use_adapter=True,
            adapter_dim=cfg["adapter_dim"], head_dropout=0.0)
        kind, kcfg = "hybrid", {}
    elif trainer == "expression_aware":
        model = ExpressionAwareViT.from_config(
            cfg["directions_path"], model_size="tiny",
            output_mode="expr_only", embed_dim=cfg["embed_dim"],
            depth=cfg["depth"], num_heads=cfg["heads"],
            mlp_dim=cfg["mlp_dim"], head_dropout=0.0)
        # params pytree IS the inner ViT's (the decomposer is a constant);
        # reference keys carry the submodule prefix (expression_aware_vit
        # registers it as ``self.vit``).
        kind, kcfg, sd_prefix = "hybrid", {}, "vit."
    else:
        flags = dict(use_lwn=True, use_lwn_residual=True, use_spe=True,
                     use_leam=True)
        model = LatentViTv2(embed_dim=cfg["embed_dim"], depth=cfg["depth"],
                            heads=cfg["heads"], mlp_dim=cfg["mlp_dim"],
                            dropout=0.0, **flags)
        kind, kcfg = "latent_vit_v2", flags

    # The latent v1/v2/cnn reference trainers record train metrics from a
    # clean post-step forward; the hybrid/expression_aware/image trainers
    # take preds from the training forward itself
    # (train/train_hybrid_latent_vit.py:139-141, train_image_vit.py:133-136).
    clean_fwd = trainer in ("latent_vit", "latent_vit_v2", "latent_cnn")
    tc = TrainConfig(epochs=epochs, batch_size=cfg["batch_size"],
                     lr=cfg["lr"], weight_decay=cfg["weight_decay"],
                     mixup=0.0, label_smoothing=cfg["label_smoothing"],
                     grad_clip=cfg["grad_clip"], scheduler="none",
                     clean_metrics_forward=clean_fwd)
    h = Harness(model=model, cfg=tc)
    state = h.init_state(jax.random.key(0),
                         jnp.zeros((1,) + tuple(x.shape[1:])))
    sd0 = {sd_prefix + k: v for k, v in to_torch_state_dict(
        kind, state.params, state.batch_stats, config=kcfg).items()}

    bs = cfg["batch_size"]
    n = x.shape[0]
    step_losses, epoch_metrics = [], []
    mask = jnp.ones(bs)
    with jax.default_matmul_precision("highest"):
        for _ in range(epochs):
            preds_all = []
            loss_sum = 0.0
            for i in range(0, n, bs):
                xb = jnp.asarray(x[i:i + bs])
                yb = jnp.asarray(y[i:i + bs].astype(np.int32))
                state, stats = h.train_step(
                    state, jax.random.key(0), xb, yb, mask,
                    jnp.float32(cfg["lr"]), None)
                loss = float(stats["loss_sum"]) / float(stats["n"])
                step_losses.append(loss)
                loss_sum += loss * xb.shape[0]
                preds_all.append(np.asarray(stats["preds"]))
            from sklearn.metrics import accuracy_score, f1_score

            preds_all = np.concatenate(preds_all)
            epoch_metrics.append((
                loss_sum / n,
                accuracy_score(y, preds_all),
                f1_score(y, preds_all, average="macro"),
            ))
        vl, vcm = h.eval_epoch(state, jnp.asarray(vx),
                               jnp.asarray(vy.astype(np.int32)), None)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        val_logits = np.asarray(
            model.apply(variables, jnp.asarray(vx), deterministic=True))
    from fer_vit_tpu.utils.metrics import metrics_from_confusion

    vm = metrics_from_confusion(np.asarray(vcm))
    final_sd = {sd_prefix + k: np.asarray(v) for k, v in to_torch_state_dict(
        kind, state.params, state.batch_stats, config=kcfg,
        as_tensors=False).items()}
    return {
        "init_sd": sd0,
        "step_losses": step_losses,
        "epoch_metrics": epoch_metrics,
        "val": {"loss": float(vl), "accuracy": vm["accuracy"],
                "f1_macro": vm["f1_macro"]},
        "val_logits": val_logits,
        "final_sd": final_sd,
    }


def part_a(trainer: str, epochs: int = 2) -> dict:
    cfg = dict(embed_dim=64, depth=2, heads=4, mlp_dim=128, batch_size=16,
               lr=1e-3, weight_decay=1e-2, label_smoothing=0.1,
               grad_clip=(1.0 if trainer == "latent_vit_v2" else 0.0))
    if trainer in ("hybrid", "expression_aware"):
        # the hybrid-family reference trainers use plain CE (no smoothing,
        # no mixup, no clip: train_hybrid_latent_vit.py:120-148,
        # train_expression_aware_vit.py:99-122); reduced donor-ViT plan
        # (heads must divide embed_dim).
        cfg.update(embed_dim=96, depth=3, heads=3, mlp_dim=192,
                   adapter_dim=16, label_smoothing=0.0)
    if trainer == "expression_aware":
        import torch

        rng = np.random.default_rng(99)
        dirs = {i: torch.tensor(rng.normal(size=(18, 512)), dtype=torch.float32)
                for i in range(7)}
        fd, path = tempfile.mkstemp(suffix=".pt", prefix="directions_")
        os.close(fd)
        torch.save({"directions": dirs, "seq_len": 18, "latent_dim": 512,
                    "method": "synthetic"}, path)
        cfg["directions_path"] = path
    if trainer == "image_vit":
        # plain CE, no mixup/clip by default (train_image_vit.py:110-144)
        cfg.update(label_smoothing=0.0, img_size=32)
        x, y = _make_image_data(64, seed=0)
        vx, vy = _make_image_data(32, seed=1)
    else:
        x, y = _make_data(64, seed=0)
        vx, vy = _make_data(32, seed=1)

    try:
        ours = _jax_side(trainer, cfg, x, y, vx, vy, epochs)
        theirs = _torch_side(trainer, cfg, ours["init_sd"], x, y, vx, vy,
                             epochs)
    finally:
        if trainer == "expression_aware":
            os.unlink(cfg["directions_path"])

    step_ref = np.asarray(theirs["step_losses"])
    step_our = np.asarray(ours["step_losses"])
    assert step_ref.shape == step_our.shape, (step_ref.shape, step_our.shape)
    step_diff = np.abs(step_ref - step_our)

    param_diffs, bnstat_diffs = {}, {}
    for k, ref_v in theirs["final_sd"].items():
        if k.endswith("num_batches_tracked") or k.endswith("spe.groups") \
                or k.startswith("decomposer."):
            continue
        our_v = ours["final_sd"][k]
        d = float(np.max(np.abs(ref_v - our_v)))
        # BN running stats are not Adam-bounded: they're O(1)-magnitude
        # activation moments, so ulp-level forward differences surface at
        # ~1e-3 absolute (observed 8.6e-3 @ 8 steps) — judged separately.
        if ".running_" in k:
            bnstat_diffs[k] = d
        else:
            param_diffs[k] = d
    max_param_diff = max(param_diffs.values())
    max_bnstat_diff = max(bnstat_diffs.values()) if bnstat_diffs else 0.0

    val_diffs = {k: abs(theirs["val"][k] - ours["val"][k])
                 for k in ("loss", "accuracy", "f1_macro")}
    epoch_diffs = [
        tuple(abs(a - b) for a, b in zip(er, eo))
        for er, eo in zip(theirs["epoch_metrics"], ours["epoch_metrics"])
    ]

    # Val-set agreement is judged on the LOGITS (strictly stronger than
    # argmax metrics): both frameworks' final models must produce the same
    # class scores on every val sample. argmax metrics (accuracy/f1) may
    # still legitimately differ when a sample's top-2 margin is below the
    # numerical logit drift — a knife-edge flip, not a semantic gap — so
    # each flip must be margin-limited on the torch side.
    vl_ref = theirs["val_logits"]
    vl_our = ours["val_logits"]
    logit_diff = float(np.max(np.abs(vl_ref - vl_our)))
    flips = np.nonzero(vl_ref.argmax(1) != vl_our.argmax(1))[0]
    srt = np.sort(vl_ref[flips], axis=1) if flips.size else None
    flip_margins = (srt[:, -1] - srt[:, -2]) if flips.size else np.zeros(0)
    flips_margin_limited = bool(
        np.all(flip_margins <= 4.0 * max(logit_diff, 1e-7)))

    result = {
        "trainer": trainer,
        "steps_compared": int(step_ref.size),
        "per_step_loss": {
            "torch_first3": [round(v, 6) for v in step_ref[:3]],
            "ours_first3": [round(v, 6) for v in step_our[:3]],
            "max_abs_diff": float(step_diff.max()),
        },
        "final_param_max_abs_diff": max_param_diff,
        "final_bnstat_max_abs_diff": max_bnstat_diff,
        "val_metric_abs_diffs": val_diffs,
        "val_logit_max_abs_diff": logit_diff,
        "val_argmax_flips": int(flips.size),
        "val_flip_margins": [float(m) for m in flip_margins],
        "epoch_metric_abs_diffs": [list(map(float, d)) for d in epoch_diffs],
        # Tolerances: losses/metrics are the tight comparands (observed
        # ~2e-6). Params are the loosest: Adam normalizes each update to
        # ~±lr, so a 1-ulp gradient difference where vhat≈mhat² can shift
        # one element by O(lr) per step — worst-case drift grows linearly
        # in steps (observed: 6.3e-4 @ 4 steps, 1.4e-3 @ 8 steps for the
        # ViTs; 4.0e-3 @ 4 steps for the BN CNN, whose rsqrt(var)
        # normalization amplifies ulp noise — all f32-numerical, not
        # semantic; step losses stay at ~4e-6). lr*(1+steps) sits just
        # above Adam's theoretical free-drift envelope (~lr/step);
        # semantic divergence lands orders of magnitude beyond it.
        # Accuracy/f1 must be exact unless every argmax flip is a
        # knife-edge sample (top-2 margin within 4x the logit drift).
        "pass": bool(
            step_diff.max() < 5e-5
            and max(d[0] for d in epoch_diffs) < 5e-5
            and max_param_diff < cfg["lr"] * (1.0 + step_ref.size)
            and max_bnstat_diff < 5e-2
            and val_diffs["loss"] < 1e-5
            and logit_diff < 5e-2
            and (flips.size == 0
                 or (flips_margin_limited
                     and flips.size <= max(1, vl_ref.shape[0] // 16)))
        ),
    }
    return result


# -- Part B: full CLI trajectory ----------------------------------------------

EPOCH_RE = re.compile(
    r"Epoch (\d+)/\d+: train_loss=([\d.]+) train_acc=([\d.]+) "
    r"train_f1=([\d.]+) val_loss=([\d.]+) val_acc=([\d.]+) val_f1=([\d.]+)")


def _write_pt_dir(path, x, y):
    import torch

    os.makedirs(path, exist_ok=True)
    for i in range(x.shape[0]):
        torch.save({"latent": torch.tensor(x[i]), "label": int(y[i]),
                    "img_path": f"s{i}.jpg"},
                   os.path.join(path, f"s{i:05d}.pt"))


def _parse_epochs(stdout: str):
    out = {}
    for m in EPOCH_RE.finditer(stdout):
        out[int(m.group(1))] = dict(
            train_loss=float(m.group(2)), train_acc=float(m.group(3)),
            train_f1=float(m.group(4)), val_loss=float(m.group(5)),
            val_acc=float(m.group(6)), val_f1=float(m.group(7)))
    return out


# per-trainer (reference script, our module, model flags). latent_cnn has
# no --mixup flag on either side (hardcoded α=1.0 both sides, reference
# train/train_latent_cnn.py:115-120), so its race includes live mixup —
# a strictly harder statistical comparison.
PART_B_TRAINERS = {
    "latent_vit": ("train/train_latent_vit.py",
                   "fer_vit_tpu.train.train_latent_vit",
                   ["--depth", "2", "--embed_dim", "64", "--heads", "4",
                    "--mlp_dim", "128", "--dropout", "0.1",
                    "--mixup", "0.0"]),
    "latent_cnn": ("train/train_latent_cnn.py",
                   "fer_vit_tpu.train.train_latent_cnn",
                   ["--model_type", "light", "--dropout", "0.1"]),
    # full preprocessing stack on: LWN(residual) + SPE + LEAM + grad-clip
    "latent_vit_v2": ("train/train_latent_vit_v2.py",
                      "fer_vit_tpu.train.train_latent_vit_v2",
                      ["--depth", "2", "--embed_dim", "64", "--heads", "4",
                       "--mlp_dim", "128", "--dropout", "0.1",
                       "--mixup", "0.0", "--use_lwn", "--use_lwn_residual",
                       "--use_spe", "--use_leam"]),
}


def part_b(trainer: str = "latent_vit", epochs: int = 6, n_train: int = 420,
           n_val: int = 280) -> dict:
    ref_rel, our_mod, model_flags = PART_B_TRAINERS[trainer]
    x, y = _make_data(n_train, seed=10)
    vx, vy = _make_data(n_val, seed=11)
    work = tempfile.mkdtemp(prefix="refequiv_")
    _write_pt_dir(os.path.join(work, "train"), x, y)
    _write_pt_dir(os.path.join(work, "val"), vx, vy)

    flags = ["--latent_train_dir", os.path.join(work, "train"),
             "--latent_val_dir", os.path.join(work, "val"),
             "--epochs", str(epochs), "--batch_size", "64",
             "--lr", "1e-3", "--scheduler", "plateau", "--seed", "42",
             ] + model_flags

    try:
        ref_cwd = os.path.join(work, "ref_run")
        os.makedirs(ref_cwd)
        r_ref = subprocess.run(
            [sys.executable, os.path.join(REFERENCE_ROOT, ref_rel)] + flags,
            cwd=ref_cwd, capture_output=True, text=True, timeout=1800)
        if r_ref.returncode != 0:
            raise RuntimeError(
                f"reference trainer failed:\n{r_ref.stderr[-3000:]}")

        our_cwd = os.path.join(work, "our_run")
        os.makedirs(our_cwd)
        from tests.env_utils import cpu_env

        env = cpu_env(REPO)
        r_our = subprocess.run(
            [sys.executable, "-m", our_mod] + flags + ["--no_bf16"],
            cwd=our_cwd, env=env, capture_output=True, text=True,
            timeout=1800)
        if r_our.returncode != 0:
            raise RuntimeError(f"our trainer failed:\n{r_our.stderr[-3000:]}")
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)

    ref_tr = _parse_epochs(r_ref.stdout)
    our_tr = _parse_epochs(r_our.stdout)
    assert set(ref_tr) == set(our_tr) == set(range(1, epochs + 1))

    tail = list(range(max(1, epochs - 2), epochs + 1))

    def tail_mean(tr, key):
        return sum(tr[e][key] for e in tail) / len(tail)

    # Tail MEANS are the gate: each per-epoch val_acc carries binomial
    # sampling noise σ ≈ sqrt(p(1−p)/n_val) ≈ 0.03 per run at n_val=280
    # (≈0.04 on the diff), and the runs differ by init + batch order by
    # design, so a max-statistic over the tail epochs scales with the
    # number of epochs compared and rejects healthy runs (observed: ours
    # AHEAD of the reference in acc with val losses within 0.005). The
    # 3-epoch tail mean is the estimator matched to the claim — "the
    # trajectories land in the same band". Per-epoch maxima and the
    # best-val-acc diff stay in the report as diagnostics.
    tail_acc_mean_diff = abs(tail_mean(ref_tr, "val_acc")
                             - tail_mean(our_tr, "val_acc"))
    tail_loss_mean_diff = abs(tail_mean(ref_tr, "val_loss")
                              - tail_mean(our_tr, "val_loss"))
    tail_acc_diff = max(abs(ref_tr[e]["val_acc"] - our_tr[e]["val_acc"])
                        for e in tail)
    tail_loss_diff = max(abs(ref_tr[e]["val_loss"] - our_tr[e]["val_loss"])
                         for e in tail)
    best_acc_diff = abs(max(m["val_acc"] for m in ref_tr.values())
                        - max(m["val_acc"] for m in our_tr.values()))
    return {
        "trainer": trainer,
        "epochs": epochs,
        "n_val": n_val,
        "reference_trajectory": ref_tr,
        "our_trajectory": our_tr,
        "tail_val_acc_mean_abs_diff": tail_acc_mean_diff,
        "tail_val_loss_mean_abs_diff": tail_loss_mean_diff,
        "tail_val_acc_max_abs_diff": tail_acc_diff,
        "best_val_acc_abs_diff": best_acc_diff,
        "tail_val_loss_max_abs_diff": tail_loss_diff,
        # gates tightened r5 (VERDICT r4 weak #2): round-4 observed maxima
        # were 0.068 / 0.121 across the three trainers; 0.08 / 0.20 keeps
        # deterministic reruns green while halving the slack of the old
        # 0.10 / 0.30. The long-horizon outcome-band claim is gated
        # distributionally by part H.
        "pass": bool(tail_acc_mean_diff <= 0.08
                     and tail_loss_mean_diff <= 0.20),
    }


# -- Part G: long-horizon race (60 epochs, plateau decays firing) -------------


def _tb_lr_sequence(run_root: str) -> dict:
    """{epoch: Learning_Rate/Group_0} from the newest experiment run under
    ``run_root`` — TB event files when present (the reference side writes
    only those), else this framework's ``logs/scalars.jsonl``."""
    import glob as _glob

    logs_dirs = sorted(_glob.glob(
        os.path.join(run_root, "experiments", "*", "*", "logs")))
    if not logs_dirs:
        raise RuntimeError(f"no experiment logs under {run_root}")
    logs = logs_dirs[-1]
    jsonl = os.path.join(logs, "scalars.jsonl")
    if os.path.exists(jsonl):
        out = {}
        with open(jsonl) as f:
            for line in f:
                rec = json.loads(line)
                if rec["tag"] == "Learning_Rate/Group_0":
                    out[int(rec["step"])] = float(rec["value"])
        if out:
            return out
    from tensorboard.backend.event_processing import event_accumulator

    ea = event_accumulator.EventAccumulator(
        logs, size_guidance={event_accumulator.SCALARS: 0})
    ea.Reload()
    return {int(e.step): float(e.value)
            for e in ea.Scalars("Learning_Rate/Group_0")}


def _decay_epochs(lr_seq: dict) -> list:
    epochs = sorted(lr_seq)
    return [e for prev, e in zip(epochs, epochs[1:])
            if lr_seq[e] < lr_seq[prev] * 0.999]


def part_g_long_horizon(epochs: int = 60, n_train: int = 420,
                        n_val: int = 280) -> dict:
    """VERDICT r3 #3: one full 60-epoch latent_vit race with the plateau
    scheduler's patience-5 decays actually firing inside the window
    (reference: train/train_latent_vit.py:346-356) — the short part-B
    races never reach a decay. Checks, beyond the part-B trajectory band:

    * both runs' realized LR sequences show the plateau decays firing;
    * cross-replay EXACTNESS: this framework's PlateauScheduler fed the
      reference run's per-epoch val_f1 reproduces the reference's
      realized LR sequence bit-for-bit, and torch's ReduceLROnPlateau
      fed this framework's val_f1 reproduces ours — the scheduler
      semantics match on a real 60-epoch trace, not just unit vectors.
      (The two runs' decay epochs need not coincide with each other:
      they follow each run's own val_f1 noise by design.)
    """
    x, y = _make_data(n_train, seed=10)
    vx, vy = _make_data(n_val, seed=11)
    work = tempfile.mkdtemp(prefix="refequiv_g_")
    _write_pt_dir(os.path.join(work, "train"), x, y)
    _write_pt_dir(os.path.join(work, "val"), vx, vy)

    flags = ["--latent_train_dir", os.path.join(work, "train"),
             "--latent_val_dir", os.path.join(work, "val"),
             "--epochs", str(epochs), "--batch_size", "64",
             "--lr", "1e-3", "--scheduler", "plateau", "--seed", "42",
             "--depth", "2", "--embed_dim", "64", "--heads", "4",
             "--mlp_dim", "128", "--dropout", "0.1", "--mixup", "0.0"]

    try:
        ref_cwd = os.path.join(work, "ref_run")
        os.makedirs(ref_cwd)
        r_ref = subprocess.run(
            [sys.executable,
             os.path.join(REFERENCE_ROOT, "train/train_latent_vit.py")]
            + flags,
            cwd=ref_cwd, capture_output=True, text=True, timeout=7200)
        if r_ref.returncode != 0:
            raise RuntimeError(
                f"reference trainer failed:\n{r_ref.stderr[-3000:]}")

        our_cwd = os.path.join(work, "our_run")
        os.makedirs(our_cwd)
        from tests.env_utils import cpu_env

        env = cpu_env(REPO)
        r_our = subprocess.run(
            [sys.executable, "-m", "fer_vit_tpu.train.train_latent_vit"]
            + flags + ["--no_bf16"],
            cwd=our_cwd, env=env, capture_output=True, text=True,
            timeout=7200)
        if r_our.returncode != 0:
            raise RuntimeError(f"our trainer failed:\n{r_our.stderr[-3000:]}")

        ref_tr = _parse_epochs(r_ref.stdout)
        our_tr = _parse_epochs(r_our.stdout)
        assert set(ref_tr) == set(our_tr) == set(range(1, epochs + 1))
        ref_lr = _tb_lr_sequence(ref_cwd)
        our_lr = _tb_lr_sequence(our_cwd)
        assert set(ref_lr) == set(our_lr) == set(range(1, epochs + 1)), (
            sorted(ref_lr)[:3], sorted(our_lr)[:3])
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)

    # -- cross-replay: our scheduler on the reference's val_f1 trace --------
    from fer_vit_tpu.train.schedulers import make_scheduler

    sch = make_scheduler("plateau", 1e-3, epochs)
    replay_ref = {}
    for e in range(1, epochs + 1):
        replay_ref[e] = sch.epoch_lr(e)
        sch.step(ref_tr[e]["val_f1"])
    ours_replays_ref = max(abs(replay_ref[e] - ref_lr[e])
                           for e in range(1, epochs + 1))

    # -- and torch's scheduler on OUR val_f1 trace --------------------------
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=1e-3)
    tsch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", patience=5, factor=0.5)
    replay_our = {}
    for e in range(1, epochs + 1):
        replay_our[e] = opt.param_groups[0]["lr"]
        tsch.step(our_tr[e]["val_f1"])
    torch_replays_ours = max(abs(replay_our[e] - our_lr[e])
                             for e in range(1, epochs + 1))

    ref_decays = _decay_epochs(ref_lr)
    our_decays = _decay_epochs(our_lr)

    tail = list(range(max(1, epochs - 4), epochs + 1))

    def tail_mean(tr, key):
        return sum(tr[e][key] for e in tail) / len(tail)

    tail_acc_mean_diff = abs(tail_mean(ref_tr, "val_acc")
                             - tail_mean(our_tr, "val_acc"))
    tail_loss_mean_diff = abs(tail_mean(ref_tr, "val_loss")
                              - tail_mean(our_tr, "val_loss"))
    result = {
        "trainer": "latent_vit",
        "epochs": epochs,
        "reference_val_acc": {e: ref_tr[e]["val_acc"] for e in ref_tr},
        "our_val_acc": {e: our_tr[e]["val_acc"] for e in our_tr},
        "reference_lr_sequence": ref_lr,
        "our_lr_sequence": our_lr,
        "reference_decay_epochs": ref_decays,
        "our_decay_epochs": our_decays,
        "our_scheduler_replays_reference_lr_max_abs_diff": ours_replays_ref,
        "torch_scheduler_replays_our_lr_max_abs_diff": torch_replays_ours,
        # DIAGNOSTIC ONLY (round 5): this is ONE seed pair, and after the
        # plateau decays collapse the LR the tail is frozen — a 60-epoch
        # run contributes ~one independent sample of final val-acc, so a
        # single-pair band gate can neither confirm nor refute a
        # systematic offset. The outcome-band claim is gated
        # distributionally by part H (5 seeds per side, this exact
        # config; seed 42 = this pair).
        "tail_val_acc_mean_abs_diff": tail_acc_mean_diff,
        "tail_val_loss_mean_abs_diff": tail_loss_mean_diff,
        # exactness up to logging precision: the reference's LR sequence
        # comes back through TB event files, which store float32 (1e-3
        # round-trips with ~5e-11 error) — 1e-9 absolute still separates
        # sequences by >5 orders of magnitude from one halving step
        "pass": bool(
            ours_replays_ref <= 1e-9
            and torch_replays_ours <= 1e-9
            and len(ref_decays) >= 1 and len(our_decays) >= 1),
    }
    return result


# -- Part H: seed-distribution race (is the part-G offset systematic?) --------


def _exact_permutation_p(a, b) -> float:
    """Exact two-sided permutation p-value for |mean(a) − mean(b)| under
    label exchange — every C(n+m, n) reassignment of the pooled values
    (n=m=5 → 252, trivially enumerable; ties handled by construction)."""
    import itertools

    pooled = list(a) + list(b)
    n, total = len(a), len(pooled)
    s_all = sum(pooled)
    obs = abs(sum(a) / n - (s_all - sum(a)) / (total - n))
    count = hits = 0
    for idx in itertools.combinations(range(total), n):
        sa = sum(pooled[i] for i in idx)
        stat = abs(sa / n - (s_all - sa) / (total - n))
        hits += stat >= obs - 1e-12
        count += 1
    return hits / count


def part_h_seed_distribution(seeds=(42, 43, 44, 45, 46), epochs: int = 60,
                             n_train: int = 420, n_val: int = 280,
                             trainer: str = "latent_vit") -> dict:
    """VERDICT r4 weak #2: part G's single pair showed a sustained +0.055
    tail offset (ours higher). Race the SAME config over several seeds per
    side — each side trains with its own native init/shuffle/dropout
    draws, exactly like part G — and compare the tail-val-acc
    DISTRIBUTIONS: an exact permutation test on the seed means plus a
    Welch interval. One seed pair is one draw; N pairs distinguish 'one
    lucky draw' from 'something systematic favors one framework'.
    ``trainer`` selects any PART_B_TRAINERS entry: ``latent_cnn`` is the
    strongest generalization check (BatchNorm running stats + live
    mixup — the two mechanisms most able to hide a systematic offset).
    Reference protocol: train/train_latent_vit.py:30-40 (set_seed) +
    :346-356 (plateau best tracking)."""
    ref_rel, our_mod, model_flags = PART_B_TRAINERS[trainer]
    x, y = _make_data(n_train, seed=10)
    vx, vy = _make_data(n_val, seed=11)
    work = tempfile.mkdtemp(prefix="refequiv_h_")
    _write_pt_dir(os.path.join(work, "train"), x, y)
    _write_pt_dir(os.path.join(work, "val"), vx, vy)

    base_flags = ["--latent_train_dir", os.path.join(work, "train"),
                  "--latent_val_dir", os.path.join(work, "val"),
                  "--epochs", str(epochs), "--batch_size", "64",
                  "--lr", "1e-3", "--scheduler", "plateau",
                  ] + model_flags
    tail = list(range(max(1, epochs - 4), epochs + 1))

    ref_tails, our_tails, pair_diffs = [], [], []
    try:
        from tests.env_utils import cpu_env

        env = cpu_env(REPO)
        for seed in seeds:
            flags = base_flags + ["--seed", str(seed)]
            ref_cwd = os.path.join(work, f"ref_{seed}")
            os.makedirs(ref_cwd)
            r_ref = subprocess.run(
                [sys.executable, os.path.join(REFERENCE_ROOT, ref_rel)]
                + flags,
                cwd=ref_cwd, capture_output=True, text=True, timeout=7200)
            if r_ref.returncode != 0:
                raise RuntimeError(
                    f"reference trainer failed (seed {seed}):\n"
                    f"{r_ref.stderr[-3000:]}")
            our_cwd = os.path.join(work, f"our_{seed}")
            os.makedirs(our_cwd)
            r_our = subprocess.run(
                [sys.executable, "-m", our_mod]
                + flags + ["--no_bf16"],
                cwd=our_cwd, env=env, capture_output=True, text=True,
                timeout=7200)
            if r_our.returncode != 0:
                raise RuntimeError(
                    f"our trainer failed (seed {seed}):\n"
                    f"{r_our.stderr[-3000:]}")
            ref_tr = _parse_epochs(r_ref.stdout)
            our_tr = _parse_epochs(r_our.stdout)
            assert set(ref_tr) == set(our_tr) == set(range(1, epochs + 1))
            rt = sum(ref_tr[e]["val_acc"] for e in tail) / len(tail)
            ot = sum(our_tr[e]["val_acc"] for e in tail) / len(tail)
            ref_tails.append(rt)
            our_tails.append(ot)
            pair_diffs.append(ot - rt)
            print(f"  [part H] seed {seed}: ref_tail={rt:.4f} "
                  f"our_tail={ot:.4f} diff={ot - rt:+.4f}", flush=True)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)

    n = len(seeds)
    ref_mean = sum(ref_tails) / n
    our_mean = sum(our_tails) / n
    mean_diff = our_mean - ref_mean

    def _std(v, m):
        return (sum((t - m) ** 2 for t in v) / max(1, len(v) - 1)) ** 0.5

    ref_std = _std(ref_tails, ref_mean)
    our_std = _std(our_tails, our_mean)
    welch_se = (ref_std ** 2 / n + our_std ** 2 / n) ** 0.5
    p_perm = _exact_permutation_p(our_tails, ref_tails)
    ranges_overlap = (max(ref_tails) >= min(our_tails)
                      and max(our_tails) >= min(ref_tails))
    # Gate: the two seed-distributions must be statistically
    # indistinguishable (exact permutation p ≥ 0.05 on the means) or the
    # offset must be within 2 Welch standard errors — either way the
    # part-G pair is a draw from overlapping distributions, not evidence
    # of a framework-systematic bias.
    passed = bool(p_perm >= 0.05 or abs(mean_diff) <= 2 * welch_se)
    return {
        "trainer": trainer,
        "epochs": epochs,
        "seeds": list(seeds),
        "tail_epochs": tail,
        "reference_tail_val_acc": [round(t, 4) for t in ref_tails],
        "our_tail_val_acc": [round(t, 4) for t in our_tails],
        "pair_diffs": [round(d, 4) for d in pair_diffs],
        "reference_mean": round(ref_mean, 4),
        "our_mean": round(our_mean, 4),
        "mean_diff": round(mean_diff, 4),
        "reference_std": round(ref_std, 4),
        "our_std": round(our_std, 4),
        "welch_se": round(welch_se, 4),
        "ranges_overlap": ranges_overlap,
        "exact_permutation_p": round(p_perm, 4),
        "pass": passed,
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="CI-sized: 1 epoch part A, 5 epochs part B, "
                             "20-epoch part G")
    parser.add_argument("--skip_part_b", action="store_true")
    parser.add_argument("--skip_part_g", action="store_true",
                        help="skip the 60-epoch long-horizon race")
    parser.add_argument("--skip_part_h", action="store_true",
                        help="skip the multi-seed distribution race "
                             "(10× 60-epoch runs — the slowest part)")
    parser.add_argument("--only_part_h", action="store_true",
                        help="run ONLY part H and merge it into --out "
                             "(for iterating on the seed race)")
    parser.add_argument("--part_h_seeds", type=int, default=5)
    parser.add_argument("--part_h_trainer", default="latent_vit",
                        choices=tuple(PART_B_TRAINERS),
                        help="which trainer to race in part H "
                             "(latent_cnn = BN running stats + live "
                             "mixup, the strongest generalization check)")
    parser.add_argument("--out", default=os.path.join(REPO,
                                                      "EQUIVALENCE.json"))
    args = parser.parse_args(argv)
    if not os.path.isdir(REFERENCE_ROOT):
        # the module contract is 'exit 0 iff every check passes' — with no
        # reference tree NOTHING ran, so a gating caller must not read PASS
        print("reference tree not present; nothing to compare "
              "(set FERVIT_REFERENCE_ROOT)", file=sys.stderr)
        return 2

    if args.only_part_h:
        seeds = tuple(range(42, 42 + args.part_h_seeds))
        res_h = part_h_seed_distribution(
            seeds=seeds, epochs=20 if args.quick else 60,
            trainer=args.part_h_trainer)
        print(f"[part H] {args.part_h_trainer}, {len(seeds)} seeds/side: "
              f"ref={res_h['reference_tail_val_acc']} "
              f"ours={res_h['our_tail_val_acc']} "
              f"mean_diff={res_h['mean_diff']:+.4f} "
              f"p={res_h['exact_permutation_p']:.4f} "
              f"pass={res_h['pass']}")
        report = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                report = json.load(f)
        # merge by trainer: iterating on one trainer's race must not
        # clobber the others' recorded results
        kept = [r for r in report.get("part_h", [])
                if r.get("trainer") != args.part_h_trainer]
        report["part_h"] = kept + [res_h]
        parts = [k for k in report if k.startswith("part_")]
        report["pass"] = bool(all(
            r["pass"] for k in parts for r in report[k]))
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report → {args.out}  PASS={report['pass']}")
        return 0 if res_h["pass"] else 1

    report = {"part_a": [], "part_b": [], "part_f": []}
    for trainer in ("latent_vit", "latent_vit_v2", "latent_cnn",
                    "hybrid", "expression_aware", "image_vit"):
        res = part_a(trainer, epochs=1 if args.quick else 2)
        report["part_a"].append(res)
        print(f"[part A] {trainer}: steps={res['steps_compared']} "
              f"max_step_loss_diff={res['per_step_loss']['max_abs_diff']:.2e} "
              f"max_param_diff={res['final_param_max_abs_diff']:.2e} "
              f"val_logit_diff={res['val_logit_max_abs_diff']:.2e} "
              f"flips={res['val_argmax_flips']} pass={res['pass']}")
    res_c = part_c_style_extractor(epochs=1 if args.quick else 2)
    report["part_c"] = [res_c]
    print(f"[part C] style_extractor: steps={res_c['steps_compared']} "
          f"max_step_loss_diff={res_c['per_step_loss']['max_abs_diff']:.2e} "
          f"max_param_diff={res_c['final_param_max_abs_diff']:.2e} "
          f"bn_stat_diff={res_c['final_bnstat_max_abs_diff']:.2e} "
          f"pass={res_c['pass']}")
    res_d = part_d_expression_directions()
    report["part_d"] = [res_d]
    print(f"[part D] expression_directions: min_cosine="
          f"{res_d['min_cosine_overall']:.6f} pass={res_d['pass']}")
    res_e = part_e_sefa()
    report["part_e"] = [res_e]
    print(f"[part E] sefa: factorize min_cos="
          f"{res_e['factorize_full']['min_abs_cosine']:.6f} "
          f"verify max_rate_diff={res_e['verify_max_rate_diff']:.3f} "
          f"pass={res_e['pass']}")
    report["part_f"] = []
    for fn in (part_f_eval_cli, part_f2_eval_image_cli):
        res_f = fn()
        report["part_f"].append(res_f)
        print(f"[part F] {res_f['trainer']}: acc_diff="
              f"{res_f['accuracy_abs_diff']:.2e} max_report_diff="
              f"{res_f['max_report_value_diff']:.2e} "
              f"missing={res_f['missing_artifacts']} pass={res_f['pass']}")
    if not args.skip_part_b:
        for trainer in (("latent_vit",) if args.quick
                        else tuple(PART_B_TRAINERS)):
            res_b = part_b(trainer, epochs=5 if args.quick else 8)
            report["part_b"].append(res_b)
            print(f"[part B] {trainer}: tail val_acc mean diff="
                  f"{res_b['tail_val_acc_mean_abs_diff']:.4f} "
                  f"val_loss mean diff="
                  f"{res_b['tail_val_loss_mean_abs_diff']:.4f} "
                  f"pass={res_b['pass']}")

    if not args.skip_part_g:
        res_g = part_g_long_horizon(epochs=20 if args.quick else 60)
        report["part_g"] = [res_g]
        print(f"[part G] long-horizon latent_vit ({res_g['epochs']} ep): "
              f"decays ref={res_g['reference_decay_epochs']} "
              f"ours={res_g['our_decay_epochs']} "
              f"replay_diffs=({res_g['our_scheduler_replays_reference_lr_max_abs_diff']:.1e}, "
              f"{res_g['torch_scheduler_replays_our_lr_max_abs_diff']:.1e}) "
              f"tail_acc_diff={res_g['tail_val_acc_mean_abs_diff']:.4f} "
              f"pass={res_g['pass']}")

    if not args.skip_part_h:
        seeds = tuple(range(42, 42 + args.part_h_seeds))
        res_h = part_h_seed_distribution(
            seeds=seeds, epochs=20 if args.quick else 60)
        report["part_h"] = [res_h]
        print(f"[part H] {len(seeds)} seeds/side: "
              f"mean_diff={res_h['mean_diff']:+.4f} "
              f"p={res_h['exact_permutation_p']:.4f} "
              f"pass={res_h['pass']}")

    ok = all(r["pass"] for r in report["part_a"]) and all(
        r["pass"] for r in report["part_b"]) and all(
        r["pass"] for r in report["part_c"]) and all(
        r["pass"] for r in report["part_d"]) and all(
        r["pass"] for r in report["part_e"]) and all(
        r["pass"] for r in report["part_f"]) and all(
        r["pass"] for r in report.get("part_g", [])) and all(
        r["pass"] for r in report.get("part_h", []))
    report["pass"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report → {args.out}  PASS={ok}")
    return 0 if ok else 1


# -- Part C: AFS style-extractor trainer (the 7th reference trainer) ----------


class _RecordingAFSCriterion:
    """Wraps an AFSLoss-like callable returning (loss, metrics); records
    every total-loss scalar. The caller snapshots ``calls`` before the val
    pass so the recorded list covers exactly the train steps."""

    def __init__(self, base):
        self.base = base
        self.calls = []

    def __call__(self, *a, **k):
        loss, metrics = self.base(*a, **k)
        self.calls.append(float(loss.detach()))
        return loss, metrics


def part_c_style_extractor(epochs: int = 1) -> dict:
    """Head-to-head with the reference's AFS trainer (reference:
    train/train_style_extractor.py:86-143 run_epoch / evaluate): identical
    StyleExtractor init (ours, exported through interop), identical frozen
    StyleGAN2/ArcFace/LPIPS donor weights flowing through the SAME
    converters used for real checkpoints, identical fixed (src, tgt)
    pairs, generated-image provider (strategy A). The absent
    third_party/pixel2style2pixel repo is stubbed with the oracle replicas
    (tests/torch_refs_aux.py) on the torch side; the reference's own
    StyleExtractor / AFSLoss / GeneratedImageProvider / run_epoch /
    evaluate code runs unmodified. Compares per-step total losses,
    per-epoch loss components (id/lpips/cons), val metrics, and final
    extractor params incl. BatchNorm running stats."""
    import torch

    from tests.torch_refs_aux import (
        ArcFaceBackboneRef,
        install_fake_psp_modules,
        install_fake_torchvision,
    )
    from tests.torch_stylegan2_ref import GeneratorRef

    plan = [(64, 64, 1), (64, 128, 1), (128, 256, 1), (256, 512, 1)]
    size, cm, n_latent = 64, 1, 10
    bs, n_train, n_val, lr, lambda_cons = 4, 8, 4, 1e-3, 0.1

    # shared frozen donors (seeded once; both sides consume the same sd)
    torch.manual_seed(0)
    arc_ref = ArcFaceBackboneRef(plan=plan, feat_hw=7).eval()
    gen_ref = GeneratorRef(size=size, channel_multiplier=cm).eval()
    fd, arc_path = tempfile.mkstemp(suffix=".pth", prefix="ir_se_")
    os.close(fd)
    torch.save(arc_ref.state_dict(), arc_path)

    # fixed (src, tgt) pairs — shuffle off on both sides
    rng = np.random.default_rng(7)
    w_src = rng.normal(size=(n_train, n_latent, 512)).astype(np.float32)
    w_tgt = rng.normal(size=(n_train, n_latent, 512)).astype(np.float32)
    v_src = rng.normal(size=(n_val, n_latent, 512)).astype(np.float32)
    v_tgt = rng.normal(size=(n_val, n_latent, 512)).astype(np.float32)

    install_fake_torchvision()
    install_fake_psp_modules(arcface_plan=plan, feat_hw=7)
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import train.train_style_extractor as ref_mod

        device = torch.device("cpu")
        # The reference criterion is built FIRST: its constructor draws the
        # LPIPS stub's random weights, which become the shared frozen donor
        # (harvested below and fed through our converter) — no RNG replay.
        torch.manual_seed(1)
        crit_ref = ref_mod.AFSLoss(arcface_path=arc_path,
                                   lambda_cons=lambda_cons)
        alex_sd = {k: v.detach().numpy().astype(np.float32)
                   for k, v in crit_ref.lpips.alex.state_dict().items()}
        lin_sd = {k: v.detach().numpy().astype(np.float32)
                  for k, v in crit_ref.lpips.lin_state_dict().items()}
        arc_sd = {k: v.detach().numpy().astype(np.float32)
                  for k, v in arc_ref.state_dict().items()}
        gen_sd = {k: v.detach().numpy().astype(np.float32)
                  for k, v in gen_ref.state_dict().items()}

        # ---- our side (its exported init seeds the torch race) ----
        import jax
        import jax.numpy as jnp
        import optax

        from fer_vit_tpu.afs.losses import AFSLoss
        from fer_vit_tpu.afs.style_extractor import StyleExtractor
        from fer_vit_tpu.afs.train_style_extractor import make_train_step
        from fer_vit_tpu.encoders.arcface import convert_arcface_state_dict
        from fer_vit_tpu.encoders.convert_stylegan2 import (
            convert_generator_state_dict,
        )
        from fer_vit_tpu.encoders.lpips import convert_lpips_state_dict
        from fer_vit_tpu.encoders.stylegan2 import Generator
        from fer_vit_tpu.interop import style_extractor_to_torch_state_dict

        h = StyleExtractor(n_layers=n_latent)
        variables = h.init(jax.random.key(0), jnp.zeros((2, n_latent, 512)))
        params, batch_stats = variables["params"], variables["batch_stats"]
        sd0 = style_extractor_to_torch_state_dict(params, batch_stats)

        gen = Generator(size=size, channel_multiplier=cm)
        gen_vars = convert_generator_state_dict(gen_sd)
        criterion = AFSLoss(
            arcface_variables=convert_arcface_state_dict(arc_sd, plan=plan),
            lpips_variables=convert_lpips_state_dict(alex_sd, lin_sd),
            lambda_cons=lambda_cons, arcface_plan=plan)
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1.0))
        opt_state = tx.init(params)
        jit_step, jit_eval = make_train_step(h, gen, gen_vars, criterion,
                                             use_provider_a=True)

        dummy = jnp.zeros((bs, 256, 256, 3), jnp.float32)
        our_steps, our_epochs = [], []
        with jax.default_matmul_precision("highest"):
            for _ in range(epochs):
                tot = {"loss": 0.0, "id": 0.0, "lpips": 0.0, "cons": 0.0}
                n_steps = n_train // bs
                for s in range(n_steps):
                    sl = slice(s * bs, (s + 1) * bs)
                    params, batch_stats, opt_state, loss, metrics = jit_step(
                        params, batch_stats, opt_state, jnp.float32(lr),
                        jnp.asarray(w_src[sl]), jnp.asarray(w_tgt[sl]),
                        dummy, dummy)
                    our_steps.append(float(loss))
                    tot["loss"] += float(loss)
                    for mk in ("id", "lpips", "cons"):
                        tot[mk] += float(metrics[mk])
                our_epochs.append({k: v / n_steps for k, v in tot.items()})
            vt = {"loss": 0.0, "id": 0.0, "lpips": 0.0, "cons": 0.0}
            nv = n_val // bs
            for s in range(nv):
                sl = slice(s * bs, (s + 1) * bs)
                loss, metrics = jit_eval(params, batch_stats,
                                         jnp.asarray(v_src[sl]),
                                         jnp.asarray(v_tgt[sl]), dummy, dummy)
                vt["loss"] += float(loss)
                for mk in ("id", "lpips", "cons"):
                    vt[mk] += float(metrics[mk])
            our_val = {k: v / nv for k, v in vt.items()}
        our_final_sd = {k: np.asarray(v) for k, v in
                        style_extractor_to_torch_state_dict(
                            params, batch_stats, as_tensors=False).items()}

        # ---- torch race: the reference's own code ----
        h_ref = ref_mod.StyleExtractor(n_layers=n_latent)
        h_ref.load_state_dict(sd0, strict=True)
        crit_rec = _RecordingAFSCriterion(crit_ref)
        face_pool_t = torch.nn.AdaptiveAvgPool2d((256, 256))
        provider = ref_mod.GeneratedImageProvider(gen_ref, face_pool_t)
        opt = torch.optim.Adam(h_ref.parameters(), lr=lr)

        def mk_loader(a, b):
            from torch.utils.data import DataLoader

            rows = [(torch.from_numpy(a[i]), 0, f"s{i}",
                     torch.from_numpy(b[i]), 0, f"t{i}")
                    for i in range(a.shape[0])]
            return DataLoader(rows, batch_size=bs, shuffle=False)

        loader = mk_loader(w_src, w_tgt)
        val_loader = mk_loader(v_src, v_tgt)
        ref_epochs = []
        for _ in range(epochs):
            ref_epochs.append(ref_mod.train_one_epoch(
                h_ref, gen_ref, face_pool_t, crit_rec, provider, loader,
                opt, device))
        ref_steps = list(crit_rec.calls)
        ref_val = ref_mod.evaluate(h_ref, gen_ref, face_pool_t, crit_rec,
                                   provider, val_loader, device)
        ref_final_sd = {k: v.detach().numpy().copy()
                        for k, v in h_ref.state_dict().items()}
    finally:
        sys.path.remove(REFERENCE_ROOT)
        os.unlink(arc_path)

    step_ref = np.asarray(ref_steps)
    step_our = np.asarray(our_steps)
    assert step_ref.shape == step_our.shape, (step_ref.shape, step_our.shape)
    step_diff = np.abs(step_ref - step_our)

    param_diffs, bnstat_diffs = {}, {}
    for k, rv in ref_final_sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        d = float(np.max(np.abs(rv - our_final_sd[k])))
        (bnstat_diffs if ".running_" in k else param_diffs)[k] = d
    max_param_diff = max(param_diffs.values())
    max_bnstat_diff = max(bnstat_diffs.values())

    epoch_diffs = [
        {k: abs(re[k] - oe[k]) for k in ("loss", "id", "lpips", "cons")}
        for re, oe in zip(ref_epochs, our_epochs)
    ]
    val_diffs = {k: abs(ref_val[k] - our_val[k])
                 for k in ("loss", "id", "lpips", "cons")}

    n_steps_total = int(step_ref.size)
    result = {
        "trainer": "style_extractor",
        "steps_compared": n_steps_total,
        "per_step_loss": {
            "torch_first3": [round(v, 6) for v in step_ref[:3]],
            "ours_first3": [round(v, 6) for v in step_our[:3]],
            "max_abs_diff": float(step_diff.max()),
        },
        "final_param_max_abs_diff": max_param_diff,
        "final_bnstat_max_abs_diff": max_bnstat_diff,
        "epoch_component_abs_diffs": epoch_diffs,
        "val_component_abs_diffs": val_diffs,
        # The loss graph crosses a full StyleGAN2 synthesis + ArcFace +
        # AlexNet stack, so tolerances are one decade looser than the
        # classifier races (depth amplifies ulp noise); semantic
        # divergence (wrong clip/stop-grad/loss composition) shows up
        # orders of magnitude above these bands.
        "pass": bool(
            step_diff.max() < 5e-4
            and max(max(d.values()) for d in epoch_diffs) < 5e-4
            and max(val_diffs.values()) < 5e-4
            and max_param_diff < lr * (1.0 + n_steps_total)
            and max_bnstat_diff < 5e-2
        ),
    }
    return result


# -- Part D: the analysis stack vs the reference's actual SVM CLI -------------


def part_d_expression_directions(n: int = 210) -> dict:
    """Race the reference's latent_analysis/compute_expression_direction.py
    CLI (subprocess: its own sklearn LinearSVC pipeline, reference
    :36-151) against our analysis CLI (jax backend: vmapped squared-hinge
    SVM on device) on the same synthetic per-file ``.pt`` latent dir, both
    methods (binary one-vs-rest + 7-class OvR). Compares the saved
    direction tensors per class by signed cosine similarity — the
    direction vectors ARE the product (LatentDecomposer consumes them
    verbatim), so cosine alignment is the complete functional claim."""
    import torch

    x, y = _make_data(n, seed=20)
    work = tempfile.mkdtemp(prefix="refdirs_")
    try:
        lat_dir = os.path.join(work, "latents")
        _write_pt_dir(lat_dir, x, y)
        ref_out = os.path.join(work, "ref_dirs")
        our_out = os.path.join(work, "our_dirs")

        r_ref = subprocess.run(
            [sys.executable,
             os.path.join(REFERENCE_ROOT,
                          "latent_analysis/compute_expression_direction.py"),
             "--latent_dir", lat_dir, "--output_dir", ref_out,
             "--method", "both"],
            capture_output=True, text=True, timeout=1200)
        if r_ref.returncode != 0:
            raise RuntimeError(
                f"reference SVM CLI failed:\n{r_ref.stderr[-3000:]}")

        from tests.env_utils import cpu_env

        env = cpu_env(REPO)
        r_our = subprocess.run(
            [sys.executable, "-m", "fer_vit_tpu.analysis.expression_directions",
             "--latent_dir", lat_dir, "--output_dir", our_out,
             "--method", "both", "--backend", "jax", "--steps", "3000",
             "--also_pt"],
            env=env, capture_output=True, text=True, timeout=1200)
        if r_our.returncode != 0:
            raise RuntimeError(
                f"our analysis CLI failed:\n{r_our.stderr[-3000:]}")

        result = {"trainer": "compute_expression_direction", "methods": {}}
        worst = 1.0
        for method in ("binary", "multiclass"):
            ref_pt = torch.load(
                os.path.join(ref_out, f"{method}_directions.pt"),
                map_location="cpu", weights_only=False)
            our_pt = torch.load(
                os.path.join(our_out, f"{method}_directions.pt"),
                map_location="cpu", weights_only=False)
            assert ref_pt["seq_len"] == our_pt["seq_len"] == 18
            cosines = []
            for cls in range(7):
                a = np.asarray(ref_pt["directions"][cls]).ravel()
                b = np.asarray(our_pt["directions"][cls]).ravel()
                cosines.append(float(
                    np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))))
            worst = min(worst, min(cosines))
            result["methods"][method] = {
                "per_class_cosine": [round(c, 6) for c in cosines],
                "min_cosine": min(cosines),
            }
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)

    result["min_cosine_overall"] = worst
    # Signed cosine ≥ 0.98: the two optimizers (liblinear dual coordinate
    # descent vs jitted Adam on the same squared-hinge objective) reach
    # the same separator up to solver tolerance; a sign flip or a wrong
    # objective (wrong C, unbalanced weights, hinge vs squared-hinge)
    # lands far below this band.
    result["pass"] = bool(worst >= 0.98)
    return result


# -- Part E: SeFa (factorize + direction verification) -------------------------


class _FakeMapping:
    """Pickleable stand-in for a StyleGAN2 mapping network: only the
    ``fc0.weight`` attribute the reference's factorizer reads
    (reference sefa/factorize.py:35-38)."""

    def __init__(self, weight):
        self.fc0 = SimpleNamespace(weight=weight)


class _FakeG:
    def __init__(self, weight):
        self.mapping = _FakeMapping(weight)

    def to(self, device):
        return self


def part_e_sefa(d: int = 64, k: int = 8, n: int = 20) -> dict:
    """Race the reference's OWN ``sefa`` package against
    ``fer_vit_tpu.analysis.sefa`` on identical inputs.

    E1 — factorize: ``sefa.factorize.factorize_stylegan_weights`` runs
    unmodified on a pickled fake ``G_ema`` carrying a random mapping-fc0
    weight; ours factorizes the same matrix (full and ``layer_idx``-sliced
    paths). Eigenvector signs are arbitrary → per-direction |cosine| and
    eigenvalue agreement are the claim (reference sefa/factorize.py:44-59).

    E2 — verification: ``sefa.verify_directions`` (the triple Python loop,
    reference sefa/verify_directions.py:38-78) drives the reference's OWN
    LatentViT loaded with weights converted from ours via interop, over the
    same latents/directions/steps as our single vmapped forward — the
    per-direction label-change rates must agree.
    """
    import contextlib
    import io
    import pickle

    import jax
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models_fer_vit.latent_vit import LatentViT as RefLatentViT
        from sefa.factorize import factorize_stylegan_weights as ref_factorize
        from sefa.verify_directions import (
            verify_non_expression_directions as ref_verify,
        )
    finally:
        sys.path.remove(REFERENCE_ROOT)

    from fer_vit_tpu.analysis.sefa import (
        factorize_weights,
        verify_non_expression_directions,
    )
    from fer_vit_tpu.interop import to_torch_state_dict
    from fer_vit_tpu.models.latent_vit import LatentViT

    rng = np.random.default_rng(7)
    weight = rng.normal(size=(d, d)).astype(np.float32)
    layer_idx = list(range(0, d, 2))

    with tempfile.TemporaryDirectory(prefix="sefa_") as work:
        pkl = os.path.join(work, "g.pkl")
        with open(pkl, "wb") as f:
            pickle.dump({"G_ema": _FakeG(torch.from_numpy(weight))}, f)
        ref_full = ref_factorize(pkl, num_semantics=k)
        ref_sliced = ref_factorize(pkl, layer_idx=layer_idx,
                                   num_semantics=k)
    with jax.default_matmul_precision("highest"):
        our_full = factorize_weights(weight, num_semantics=k)
        our_sliced = factorize_weights(weight, layer_idx=layer_idx,
                                       num_semantics=k)

    def _fac_stats(ref_fac, our_fac):
        cosines = [
            abs(float(np.dot(a, b)
                      / (np.linalg.norm(a) * np.linalg.norm(b))))
            for a, b in zip(ref_fac["directions"], our_fac["directions"])]
        eig_rel = float(np.max(
            np.abs(ref_fac["eigenvalues"] - our_fac["eigenvalues"])
            / np.abs(ref_fac["eigenvalues"])))
        return {"min_abs_cosine": min(cosines),
                "max_eigenvalue_rel_diff": eig_rel}

    fac_full = _fac_stats(ref_full, our_full)
    fac_sliced = _fac_stats(ref_sliced, our_sliced)

    cfg = dict(embed_dim=64, depth=1, heads=4, mlp_dim=128)
    model = LatentViT(latent_dim=512, seq_len=18, num_classes=7,
                      dropout=0.0, **cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 18, 512)))
    sd = to_torch_state_dict(
        "latent_vit", variables["params"], None,
        config=dict(cfg, latent_dim=512, seq_len=18, num_classes=7))
    ref_model = RefLatentViT(latent_dim=512, seq_len=18, num_classes=7,
                             dropout=0.0, **cfg)
    res = ref_model.load_state_dict(sd, strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    ref_model.eval()

    lat = rng.normal(size=(n, 18, 512)).astype(np.float32)
    dirs = rng.normal(size=(4, 512)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    steps = [-1.5, 0.0, 1.5]

    buf = io.StringIO()
    with torch.no_grad(), contextlib.redirect_stdout(buf):
        ref_rates = ref_verify(dirs, torch.from_numpy(lat), ref_model,
                               None, step_sizes=steps, device="cpu")
        with jax.default_matmul_precision("highest"):
            our_rates = verify_non_expression_directions(
                dirs, lat, lambda w: model.apply(variables, w),
                step_sizes=steps, max_samples=n)
    rate_diffs = [
        abs(r["label_change_rate"] - o["label_change_rate"])
        for r, o in zip(ref_rates, our_rates)]

    result = {
        "trainer": "sefa",
        "factorize_full": fac_full,
        "factorize_sliced": fac_sliced,
        "verify_ref_rates": [r["label_change_rate"] for r in ref_rates],
        "verify_our_rates": [o["label_change_rate"] for o in our_rates],
        "verify_max_rate_diff": max(rate_diffs),
        # factorize: both sides run f32 LAPACK eigh on the same ATA —
        # only sign/roundoff separates them. verify: rates are counts/n;
        # one knife-edge argmax flip (logit parity ~1e-6) is 1/n.
        "pass": bool(
            fac_full["min_abs_cosine"] >= 0.9999
            and fac_sliced["min_abs_cosine"] >= 0.9999
            and fac_full["max_eigenvalue_rel_diff"] <= 1e-3
            and fac_sliced["max_eigenvalue_rel_diff"] <= 1e-3
            and max(rate_diffs) <= 1.0 / n),
    }
    return result


# -- Part F: eval CLI contract race --------------------------------------------


def part_f_eval_cli(n: int = 140) -> dict:
    """Race the reference's eval/evaluate_model.py CLI (subprocess: its own
    torch loader, sklearn metrics, matplotlib/seaborn plots, reference
    :330-443) against ``fer_vit_tpu.eval.evaluate_model`` on the SAME
    reference-format torch checkpoint and latent dir. The claim is the
    frozen output contract: ``evaluation_results.json`` keys and every
    number in the embedded sklearn-style classification_report, plus the
    reference's plot artifact filenames all being produced."""
    import jax
    import jax.numpy as jnp
    import torch

    from fer_vit_tpu.interop import to_torch_state_dict
    from fer_vit_tpu.models.latent_vit import LatentViT

    x, y = _make_data(n, seed=33)
    cfg = dict(latent_dim=512, seq_len=18, embed_dim=64, depth=1, heads=4,
               mlp_dim=128, num_classes=7, dropout=0.0)
    model = LatentViT(**cfg)
    variables = model.init(jax.random.key(3), jnp.zeros((1, 18, 512)))
    sd = to_torch_state_dict("latent_vit", variables["params"], None,
                             config=cfg)

    work = tempfile.mkdtemp(prefix="refeval_")
    try:
        lat_dir = os.path.join(work, "latents")
        _write_pt_dir(lat_dir, x, y)
        ckpt = os.path.join(work, "model.pt")
        torch.save({"epoch": 3, "model_state_dict": sd,
                    "metrics": {"val_f1_macro": 0.0}, "config": cfg,
                    "run_id": "equiv"}, ckpt)
        ref_out = os.path.join(work, "ref_eval")
        our_out = os.path.join(work, "our_eval")

        r_ref = subprocess.run(
            [sys.executable,
             os.path.join(REFERENCE_ROOT, "eval/evaluate_model.py"),
             "--checkpoint_path", ckpt, "--latent_test_dir", lat_dir,
             "--output_dir", ref_out, "--device", "cpu",
             "--visualize_samples", "2"],
            capture_output=True, text=True, timeout=1200)
        if r_ref.returncode != 0:
            raise RuntimeError(
                f"reference eval CLI failed:\n{r_ref.stderr[-3000:]}")

        # HIGHEST matmul precision: the dev CPU's AMX would otherwise add
        # ~1e-3 bf16 noise to our logits and manufacture argmax flips the
        # TPU/torch race doesn't have (CLAUDE.md environment note)
        from tests.env_utils import cpu_env

        env = cpu_env(REPO)
        env["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
        r_our = subprocess.run(
            [sys.executable, "-m", "fer_vit_tpu.eval.evaluate_model",
             "--checkpoint_path", ckpt, "--latent_test_dir", lat_dir,
             "--output_dir", our_out, "--visualize_samples", "2"],
            env=env, capture_output=True, text=True, timeout=1200)
        if r_our.returncode != 0:
            raise RuntimeError(f"our eval CLI failed:\n{r_our.stderr[-3000:]}")

        result = _compare_eval_outputs("evaluate_model_cli", ref_out,
                                       our_out, n)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)

    return result


def _compare_eval_outputs(name: str, ref_out: str, our_out: str,
                          n: int) -> dict:
    """Diff two eval output dirs on the frozen evaluation_results.json
    contract + artifact filenames; see part_f_eval_cli for the claim."""
    ref_js = json.load(open(os.path.join(ref_out,
                                         "evaluation_results.json")))
    our_js = json.load(open(os.path.join(our_out,
                                         "evaluation_results.json")))

    def _flat(d, pre=""):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out.update(_flat(v, pre + k + "/"))
            else:
                out[pre + k] = float(v)
        return out

    fr = _flat(ref_js["classification_report"])
    fo = _flat(our_js["classification_report"])
    keys_match = set(fr) == set(fo)
    schema_match = set(ref_js) == set(our_js)
    max_report_diff = (max(abs(fr[k] - fo[k]) for k in fr)
                       if keys_match else float("inf"))
    acc_diff = abs(float(ref_js["accuracy"]) - float(our_js["accuracy"]))
    ref_files = {f for f in os.listdir(ref_out) if f.endswith(
        (".png", ".json"))}
    missing_artifacts = sorted(ref_files - set(os.listdir(our_out)))

    return {
        "trainer": name,
        "schema_match": schema_match,
        "report_keys_match": keys_match,
        "accuracy_abs_diff": acc_diff,
        "max_report_value_diff": max_report_diff,
        "missing_artifacts": missing_artifacts,
        "test_dataset_size_match": (ref_js["test_dataset_size"]
                                    == our_js["test_dataset_size"]),
        # identical preds (acc_diff == 0) make every report number an
        # exact float64 rational — require near-bit equality then. With a
        # knife-edge argmax flip (explicitly allowed, ≤1/n on accuracy)
        # the report bound is NOT 1/support: a flip on a rarely-predicted
        # class moves that row's precision by up to 1.0, so no tight
        # per-row bound exists — the accuracy bound carries the claim.
        "pass": bool(schema_match and keys_match and not missing_artifacts
                     and acc_diff <= 1.0 / n + 1e-9
                     and (max_report_diff <= 1e-9 or acc_diff > 0)
                     and ref_js["test_dataset_size"]
                     == our_js["test_dataset_size"]),
    }


def part_f2_eval_image_cli(n: int = 140, img: int = 48) -> dict:
    """Same race for the image evaluator: the reference's
    eval/evaluate_image_vit.py CLI (its own ImageFERDataset + torchvision
    val transforms + sklearn metrics, reference :27-82,205-300) vs
    ``fer_vit_tpu.eval.evaluate_image_vit`` on the SAME torch ImageViT
    checkpoint and the SAME class-dir PNG tree. torchvision is absent from
    this image, so the reference side gets a faithful functional stub
    (tests/torch_refs_aux.install_fake_torchvision_functional): PNGs are
    written at exactly ``img`` px so Resize is identity, and
    ToTensor/Normalize are exact arithmetic — no stub semantics in play."""
    import jax
    import jax.numpy as jnp
    import torch
    from PIL import Image

    from fer_vit_tpu.interop import to_torch_state_dict
    from fer_vit_tpu.models.image_vit import ImageViT

    x, y = _make_image_data(n, seed=44, img=img)
    names = ["angry", "disgust", "fear", "happy", "neutral", "sad",
             "surprise"]

    cfg = dict(img_size=img, patch_size=16, embed_dim=64, depth=1, heads=4,
               mlp_dim=128, num_classes=7, dropout=0.0)
    model = ImageViT(**cfg)
    variables = model.init(jax.random.key(5), jnp.zeros((1, img, img, 3)))
    sd = to_torch_state_dict("image_vit", variables["params"], None,
                             config=cfg)

    work = tempfile.mkdtemp(prefix="refevalimg_")
    try:
        img_dir = os.path.join(work, "images")
        for i in range(n):
            d = os.path.join(img_dir, names[int(y[i])])
            os.makedirs(d, exist_ok=True)
            arr = np.clip(x[i] * 255.0, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"s{i:05d}.png"))
        ckpt = os.path.join(work, "model.pt")
        torch.save({"epoch": 3, "model_state_dict": sd,
                    "metrics": {"val_f1_macro": 0.0}, "config": cfg,
                    "run_id": "equiv"}, ckpt)
        ref_out = os.path.join(work, "ref_eval")
        our_out = os.path.join(work, "our_eval")

        runner = os.path.join(work, "run_ref_eval.py")
        with open(runner, "w") as f:
            f.write(
                "import sys\n"
                f"sys.path.insert(0, {REPO!r})\n"
                # the reference script derives its project root from
                # __file__, which under exec() is this runner — insert it
                # explicitly so `from data.image_dataset import ...` works
                f"sys.path.insert(0, {REFERENCE_ROOT!r})\n"
                "from tests.torch_refs_aux import (\n"
                "    install_fake_torchvision_functional)\n"
                "install_fake_torchvision_functional()\n"
                f"sys.argv = ['evaluate_image_vit.py',\n"
                f"    '--checkpoint_path', {ckpt!r},\n"
                f"    '--test_dir', {img_dir!r},\n"
                f"    '--output_dir', {ref_out!r},\n"
                f"    '--device', 'cpu', '--img_size', '{img}']\n"
                f"exec(open({os.path.join(REFERENCE_ROOT, 'eval/evaluate_image_vit.py')!r}).read())\n"
            )
        r_ref = subprocess.run([sys.executable, runner],
                               capture_output=True, text=True, timeout=1200)
        if r_ref.returncode != 0:
            raise RuntimeError(
                f"reference image eval CLI failed:\n{r_ref.stderr[-3000:]}")

        from tests.env_utils import cpu_env

        env = cpu_env(REPO)
        env["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
        r_our = subprocess.run(
            [sys.executable, "-m", "fer_vit_tpu.eval.evaluate_image_vit",
             "--checkpoint_path", ckpt, "--test_dir", img_dir,
             "--output_dir", our_out],
            env=env, capture_output=True, text=True, timeout=1200)
        if r_our.returncode != 0:
            raise RuntimeError(
                f"our image eval CLI failed:\n{r_our.stderr[-3000:]}")

        result = _compare_eval_outputs("evaluate_image_vit_cli", ref_out,
                                       our_out, n)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)

    return result


if __name__ == "__main__":
    sys.exit(main())
