"""Train the AFS style extractor h.

Flag-for-flag CLI parity with the reference trainer (reference:
train/train_style_extractor.py:173-202): provider a|b, pSp/ArcFace
checkpoint paths, Adam + cosine(eta_min=1e-6), grad clip 1.0 (:133), best
checkpoint on monitored val loss (fallback train loss) + ``last_model.pt``
every epoch for resume (:308-322), ``train_log.json`` (:324-325).

Per step (reference :86-141, SURVEY.md §3.4):

    w_sty_src = h(w_src); w_sty_tgt = h(w_tgt)
    w_new     = (w_src − w_sty_src) + w_sty_tgt
    w_sty_new = h(w_new)
    img_gen   = face_pool(G(w_new))            ← dominant FLOPs
    AFSLoss(img_gen, provider imgs, w_sty_new, w_sty_tgt)

TPU design: with provider A (generated references) the ENTIRE step — three
h() forwards, three G() synthesis passes, ArcFace ×2, LPIPS, backward,
Adam update — is one jitted function; pairs are drawn on device. Provider B
does a host image load per batch (same trade-off as the reference).
Checkpoints reuse the framework's msgpack format under the same filenames.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from fer_vit_tpu.afs.image_provider import DiskImageProvider
from fer_vit_tpu.afs.losses import AFSLoss
from fer_vit_tpu.afs.pair_sampling import PairLatentStore, sample_pair_indices
from fer_vit_tpu.afs.style_extractor import StyleExtractor
from fer_vit_tpu.encoders.stylegan2 import Generator, face_pool
from fer_vit_tpu.utils.compile_opts import tuned_jit


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train AFS style extractor")
    p.add_argument("--latent_dir", required=True)
    p.add_argument("--val_latent_dir", default=None)
    p.add_argument("--psp_path", required=True,
                   help="pSp checkpoint (.pt) or converted generator .npz")
    p.add_argument("--arcface_path", required=True,
                   help="model_ir_se50.pth or converted .npz ('random' to skip)")
    p.add_argument("--lpips_path", default=None,
                   help="converted LPIPS .npz (optional; random init if absent)")
    p.add_argument("--out_dir", default="outputs/afs")
    p.add_argument("--provider", choices=["a", "b"], default="b")
    p.add_argument("--img_root", default=None)
    p.add_argument("--val_img_root", default=None)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lambda_cons", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--generator_size", type=int, default=1024)
    p.add_argument("--device", default="cuda",
                   help="accepted for reference CLI parity (reference: "
                        "train/train_style_extractor.py:202); ignored — "
                        "device placement is JAX's")
    p.add_argument("--resume", default=None,
                   help="checkpoint path (checkpoints/last_model.pt) to "
                        "resume from — params, batch stats, optimizer, "
                        "epoch, best loss")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (SURVEY.md §5 sanitizer)")
    return p


def _load_generator(path: str, size: int):
    from fer_vit_tpu.encoders.convert_psp import load_npz_variables

    gen = Generator(size=size, dtype=jnp.bfloat16
                    if jax.default_backend() == "tpu" else jnp.float32)
    if path.endswith(".npz"):
        variables = load_npz_variables(path)
    elif path == "random":  # smoke-test escape hatch
        w = jnp.zeros((1, gen.n_latent, 512))
        variables = gen.init(jax.random.key(0), [w])
    else:
        from fer_vit_tpu.encoders.convert_stylegan2 import convert_psp_decoder

        variables = convert_psp_decoder(path)
    return gen, variables


def _load_afs_loss(arcface_path: Optional[str], lpips_path: Optional[str],
                   lambda_cons: float) -> AFSLoss:
    from fer_vit_tpu.encoders.convert_psp import load_npz_variables

    arc_vars = None
    if arcface_path and arcface_path != "random":
        if arcface_path.endswith(".npz"):
            arc_vars = load_npz_variables(arcface_path)
        else:
            from fer_vit_tpu.encoders.arcface import convert_arcface_checkpoint

            arc_vars = convert_arcface_checkpoint(arcface_path)
    lpips_vars = load_npz_variables(lpips_path) if lpips_path else None
    return AFSLoss(arcface_variables=arc_vars, lpips_variables=lpips_vars,
                   lambda_cons=lambda_cons)


def make_train_step(h: StyleExtractor, gen: Generator, gen_vars,
                    criterion: AFSLoss, use_provider_a: bool):
    """One fused AFS step. With provider A everything is in-graph; with
    provider B the reference images come in as arguments."""
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1.0))

    def decode(w):
        img, _ = gen.apply(gen_vars, [w], input_is_latent=True,
                           randomize_noise=False)
        return face_pool(img, 256).astype(jnp.float32)

    def step(params, batch_stats, opt_state, lr_now, w_src, w_tgt,
             img_src, img_tgt):
        def loss_fn(params):
            def h_apply(w, bs):
                out, upd = h.apply(
                    {"params": params, "batch_stats": bs}, w,
                    deterministic=False, mutable=["batch_stats"],
                )
                return out, upd["batch_stats"]

            w_sty_src, bs1 = h_apply(w_src, batch_stats)
            w_sty_tgt, bs2 = h_apply(w_tgt, bs1)
            w_new = (w_src - w_sty_src) + w_sty_tgt
            w_sty_new, bs3 = h_apply(w_new, bs2)
            img_gen = decode(w_new)
            src = decode(w_src) if use_provider_a else img_src
            tgt = decode(w_tgt) if use_provider_a else img_tgt
            loss, metrics = criterion(img_gen, src, tgt, w_sty_new, w_sty_tgt)
            return loss, (metrics, bs3)

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr_now, updates)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss, metrics

    def eval_step(params, batch_stats, w_src, w_tgt, img_src, img_tgt):
        variables = {"params": params, "batch_stats": batch_stats}
        w_sty_src = h.apply(variables, w_src)
        w_sty_tgt = h.apply(variables, w_tgt)
        w_new = (w_src - w_sty_src) + w_sty_tgt
        w_sty_new = h.apply(variables, w_new)
        img_gen = decode(w_new)
        src = decode(w_src) if use_provider_a else img_src
        tgt = decode(w_tgt) if use_provider_a else img_tgt
        loss, metrics = criterion(img_gen, src, tgt, w_sty_new, w_sty_tgt)
        return loss, metrics

    return (tuned_jit(step, program_class="train"),
            tuned_jit(eval_step, program_class="train"))


def run_epoch(jit_step, params, batch_stats, opt_state, lr, pair_store,
              disk_provider, batch_size, key, train: bool, jit_eval=None):
    n = len(pair_store)
    steps = max(1, n // batch_size)
    totals = {"loss": 0.0, "id": 0.0, "lpips": 0.0, "cons": 0.0}
    dummy = jnp.zeros((batch_size, 256, 256, 3), jnp.float32)
    if disk_provider is not None and pair_store.img_paths is None:
        raise ValueError(
            "provider B needs source image paths, but these latents carry "
            "none — regenerate with fer_vit_tpu.data.generate_latents "
            "(packs store 'paths'; reference .pt dirs store 'img_path') "
            "or use --provider a")
    latents = pair_store.device_latents  # ONE upload, not one per step
    for s in range(steps):
        k = jax.random.fold_in(key, s)
        src_idx, tgt_idx = sample_pair_indices(k, n, batch_size)
        w_src, w_tgt = latents[src_idx], latents[tgt_idx]
        if disk_provider is not None:
            paths = pair_store.img_paths
            img_src = disk_provider.get_images(
                w_src, [paths[int(i)] for i in np.asarray(src_idx)])
            img_tgt = disk_provider.get_images(
                w_tgt, [paths[int(i)] for i in np.asarray(tgt_idx)])
        else:
            img_src = img_tgt = dummy
        if train:
            params, batch_stats, opt_state, loss, metrics = jit_step(
                params, batch_stats, opt_state, jnp.float32(lr),
                w_src, w_tgt, img_src, img_tgt)
        else:
            loss, metrics = jit_eval(params, batch_stats, w_src, w_tgt,
                                     img_src, img_tgt)
        totals["loss"] += float(loss)
        for mk in ("id", "lpips", "cons"):
            totals[mk] += float(metrics[mk])
    return params, batch_stats, opt_state, {
        k: v / steps for k, v in totals.items()
    }


def main(args) -> dict:
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    os.makedirs(args.out_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.out_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "config.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    pair_store = PairLatentStore.load(args.latent_dir)
    val_store = (PairLatentStore.load(args.val_latent_dir)
                 if args.val_latent_dir else None)

    gen, gen_vars = _load_generator(args.psp_path, args.generator_size)
    criterion = _load_afs_loss(args.arcface_path, args.lpips_path,
                               args.lambda_cons)

    h = StyleExtractor(n_layers=pair_store.store.seq_len,
                       latent_dim=pair_store.store.latent_dim)
    variables = h.init(
        jax.random.key(args.seed),
        jnp.zeros((2, pair_store.store.seq_len, pair_store.store.latent_dim)),
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1.0))
    opt_state = tx.init(params)

    use_a = args.provider == "a"
    disk = None if use_a else DiskImageProvider(args.img_root)
    val_disk = None if use_a else DiskImageProvider(
        args.val_img_root or args.img_root)
    jit_step, jit_eval = make_train_step(h, gen, gen_vars, criterion,
                                         use_provider_a=use_a)

    best_loss = float("inf")
    monitor_key = "val_loss" if val_store else "train_loss"
    log = []
    start_epoch = 1
    if args.resume:
        with open(args.resume, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        params = serialization.from_bytes(params, payload["params"])
        batch_stats = serialization.from_bytes(batch_stats,
                                               payload["batch_stats"])
        opt_state = serialization.from_bytes(opt_state, payload["opt_state"])
        start_epoch = int(payload["epoch"]) + 1
        best_loss = float(json.loads(payload.get("best_loss", "Infinity")))
        log = json.loads(payload.get("log_history", "[]"))
        print(f"Resumed from {args.resume} at epoch {payload['epoch']} "
              f"(best {monitor_key}={best_loss:.4f})")
    base_key = jax.random.key(args.seed)
    for epoch in range(start_epoch, args.epochs + 1):
        # cosine(eta_min=1e-6) as in the reference (:67-69)
        import math as _m

        lr = 1e-6 + (args.lr - 1e-6) * 0.5 * (
            1 + _m.cos(_m.pi * (epoch - 1) / args.epochs))
        t0 = time.time()
        params, batch_stats, opt_state, tr = run_epoch(
            jit_step, params, batch_stats, opt_state, lr, pair_store, disk,
            args.batch_size, jax.random.fold_in(base_key, epoch), True)
        entry = {"epoch": epoch, "lr": lr,
                 **{f"train_{k}": v for k, v in tr.items()}}
        if val_store is not None:
            _, _, _, va = run_epoch(
                jit_step, params, batch_stats, opt_state, lr, val_store,
                val_disk, args.batch_size,
                jax.random.fold_in(base_key, 1_000_000 + epoch), False,
                jit_eval)
            entry.update({f"val_{k}": v for k, v in va.items()})
        entry["seconds"] = time.time() - t0
        log.append(entry)
        print(f"Epoch {epoch:3d}/{args.epochs}  "
              f"train_loss={tr['loss']:.4f} id={tr['id']:.4f} "
              f"lpips={tr['lpips']:.4f} cons={tr['cons']:.4f}"
              + (f"  val_loss={entry['val_loss']:.4f}" if val_store else ""))

        monitor_loss = entry.get(monitor_key, tr["loss"])
        new_best = monitor_loss < best_loss
        if new_best:
            best_loss = monitor_loss
        payload = serialization.msgpack_serialize({
            "epoch": epoch,
            "params": serialization.to_bytes(params),
            "batch_stats": serialization.to_bytes(batch_stats),
            "opt_state": serialization.to_bytes(opt_state),
            "log": json.dumps(entry),
            "best_loss": json.dumps(best_loss),
            "log_history": json.dumps(log),
        })
        with open(os.path.join(ckpt_dir, "last_model.pt"), "wb") as f:
            f.write(payload)
        if new_best:
            with open(os.path.join(ckpt_dir, "best_model.pt"), "wb") as f:
                f.write(payload)
            print(f"  → best_model saved ({monitor_key}={best_loss:.4f})")

    with open(os.path.join(args.out_dir, "train_log.json"), "w") as f:
        json.dump(log, f, indent=2)
    return {"best_loss": best_loss, "log": log,
            "params": params, "batch_stats": batch_stats}


if __name__ == "__main__":
    main(build_parser().parse_args())
