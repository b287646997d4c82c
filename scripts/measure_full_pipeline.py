"""Latency + throughput harness for the full FER pipeline.

Capability parity with the reference harness (reference:
scripts/measure_full_pipeline.py:17-45,83-114): 20 warmup + 100 timed runs
per component — ImageViT scratch/pretrained-arch, LatentViT-d2 alone, pSp
encoder alone — reporting mean latency, the proposed-total, and speedup
ratios; plus a throughput mode reporting images/sec/chip (the north-star
metric) and optional ``jax.profiler`` trace capture.

Timing protocol: N iterations inside one jitted ``lax.scan`` returning a
scalar (this environment's TPU tunnel makes ``block_until_ready``-based
eager timing unreliable — see bench.py).

Usage:
    python scripts/measure_full_pipeline.py [--batch_size 1]
        [--encoder_path psp.npz] [--throughput] [--profile_dir /tmp/trace]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_WARMUP = 20
N_RUNS = 100


def measure_latency(fn, args, n_warmup=N_WARMUP, n_runs=N_RUNS):
    """Mean ms/iter via scan-in-jit (one warmup call compiles + runs all)."""

    @jax.jit
    def run(*args):
        def body(carry, _):
            return fn(carry, *args), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_runs)
        return carry

    _ = float(run(*args))  # compile + warm (runs n_runs once)
    for _ in range(max(1, n_warmup // n_runs)):
        _ = float(run(*args))
    t0 = time.perf_counter()
    _ = float(run(*args))
    dt = time.perf_counter() - t0
    return dt / n_runs * 1000.0, 0.0


def main(args) -> None:
    from fer_vit_tpu.encoders.psp import EncoderWrapper, PSpEncoder, preprocess_images
    from fer_vit_tpu.models import ImageViT, LatentViT
    from fer_vit_tpu.models.timm_vit import create_timm_vit

    b = args.batch_size
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    print(f"Using devices: {jax.devices()}  batch={b}")
    print("=" * 60)
    print("Loading models...")

    if args.encoder_type != "psp":
        raise NotImplementedError(
            "e4e is stubbed in the reference too (encoder_wrapper.py:97-133)")
    if args.encoder_path:
        if not os.path.exists(args.encoder_path):
            # a silent random-init fallback would measure an unfused
            # random encoder and label it as the checkpointed one
            raise FileNotFoundError(
                f"--encoder_path {args.encoder_path!r} not found")
        wrapper = EncoderWrapper.from_npz(args.encoder_path, dtype=dtype)
        enc, enc_vars = wrapper.encoder, wrapper.variables
    else:
        print("no --encoder_path: timing a RANDOM-init unfused PSpEncoder")
        enc = PSpEncoder(dtype=dtype)
        enc_vars = enc.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)))

    latent_vit = LatentViT(depth=2, embed_dim=512, heads=8, seq_len=18,
                           dtype=dtype)
    lv_vars = latent_vit.init(jax.random.key(1), jnp.zeros((1, 18, 512)))

    image_vit_scratch = ImageViT(img_size=224, patch_size=16, embed_dim=512,
                                 depth=6, heads=8, mlp_dim=2048,
                                 num_classes=7, dtype=dtype)
    ivs_vars = image_vit_scratch.init(jax.random.key(2),
                                      jnp.zeros((1, 224, 224, 3)))

    image_vit_pre, _ = create_timm_vit("small", num_classes=7, dtype=dtype)
    ivp_vars = image_vit_pre.init(jax.random.key(3),
                                  jnp.zeros((1, 224, 224, 3)))

    rng = np.random.default_rng(0)
    img_psp = jnp.asarray(rng.normal(size=(b, 256, 256, 3)), jnp.float32)
    img_vit = jnp.asarray(rng.normal(size=(b, 224, 224, 3)), jnp.float32)
    latent = jnp.asarray(rng.normal(size=(b, 18, 512)), jnp.float32)

    print("\nStarting measurement...")
    print("-" * 60)
    print(f"{'Component':<35} | {'Mean Latency (ms)':<20}")
    print("-" * 60)

    def probe(model, variables, x):
        def step(carry, variables, x):
            out = model.apply(variables, x + carry)
            return jnp.sum(out) * 0.0
        return measure_latency(step, (variables, x))[0]

    t_img_scratch = probe(image_vit_scratch, ivs_vars, img_vit)
    print(f"{'Image ViT (Scratch, d=6)':<35} | {t_img_scratch:.2f} ms")
    t_img_pre = probe(image_vit_pre, ivp_vars, img_vit)
    print(f"{'Image ViT (Pretrained-arch, d=12)':<35} | {t_img_pre:.2f} ms")
    print("-" * 60)
    t_lat_vit = probe(latent_vit, lv_vars, latent)
    print(f"{'Latent ViT (Model Only, d=2)':<35} | {t_lat_vit:.2f} ms")

    def psp_step(carry, enc_vars, img):
        w = enc.apply(enc_vars, preprocess_images(img + carry))
        return jnp.sum(w) * 0.0

    t_psp = measure_latency(psp_step, (enc_vars, img_psp))[0]
    print(f"{'pSp Encoder (Preprocessing)':<35} | {t_psp:.2f} ms")
    print("-" * 60)

    total_proposed = t_psp + t_lat_vit
    print(f"{'Proposed Total (pSp + ViT)':<35} | {total_proposed:.2f} ms")
    print("\n[Speedup Ratios]")
    print(f"Proposed vs Scratch (d=6):    {total_proposed / t_img_scratch:.2f}x"
          " (lower is faster)")
    print(f"Proposed vs Pretrained (d=12): {total_proposed / t_img_pre:.2f}x")
    print(f"Latent ViT ONLY vs Scratch:   {t_lat_vit / t_img_scratch:.2f}x")

    if args.throughput or args.serving:
        def e2e_step(carry, enc_vars, lv_vars, img):
            w = enc.apply(enc_vars, preprocess_images(img + carry))
            logits = latent_vit.apply(lv_vars, w)
            return jnp.sum(logits) * 0.0

        ms, _ = measure_latency(e2e_step, (enc_vars, lv_vars, img_psp),
                                n_runs=20)
        ips = b / (ms / 1000.0)
        print("\n[Throughput]")
        print(f"pSp→LatentViT end-to-end: {ips:.0f} images/sec/chip "
              f"(batch {b})")

    if args.serving:
        # Serving-path accounting (fer_vit_tpu/serve.py): the offline CLI /
        # HTTP server run a double-buffered feed — host decode overlaps the
        # device step — so the steady-state rate is min(decode, device).
        # We report the two sides separately rather than wall-clocking
        # predict_files: per-batch host↔device round-trips through this
        # image's TPU tunnel measure RPC latency, not production serving
        # (same reason bench.py times inside one jitted scan).
        import shutil
        import tempfile

        from PIL import Image

        from fer_vit_tpu.data import native_decode

        n = args.serving
        td = tempfile.mkdtemp(prefix="fervit_serving_")
        try:
            rng2 = np.random.default_rng(7)
            paths = []
            for i in range(n):
                p = os.path.join(td, f"{i:05d}.jpg")
                Image.fromarray(rng2.integers(
                    0, 256, size=(256, 256, 3), dtype=np.uint8)).save(
                        p, quality=90)
                paths.append(p)

            if native_decode.available():
                native_decode.decode_batch(paths[:64], 256)  # warm the lib
                t0 = time.perf_counter()
                native_decode.decode_batch(paths, 256)
                route = "native C++"
            else:
                from fer_vit_tpu.data.generate_latents import _load_image

                t0 = time.perf_counter()
                for p in paths:
                    _load_image(p, 256)
                route = "PIL fallback"
            decode_ips = n / (time.perf_counter() - t0)
        finally:
            shutil.rmtree(td, ignore_errors=True)

        bound = min(decode_ips, ips)
        side = "host decode" if decode_ips < ips else "device compute"
        print("\n[Serving]")
        print(f"host JPEG decode ({route}, {n} × 256px): "
              f"{decode_ips:.0f} images/sec")
        print(f"device pSp→LatentViT: {ips:.0f} images/sec/chip (batch {b})")
        print(f"sustained serving bound (double-buffered feed): "
              f"{bound:.0f} images/sec — limited by {side}")
        if decode_ips < ips:
            print("  note: decode scales with host cores/processes and "
                  "shards across hosts; the device side is the "
                  "per-chip ceiling")

        # The JPEG-free route (VERDICT r3 #1): pre-decoded uint8 packs
        # (fervit-pack-images → Predictor.predict_packed). Feed becomes a
        # memory copy, so one feeder core can sustain a multi-chip slice.
        import math

        from fer_vit_tpu.data.image_packs import (iter_packed_batches,
                                                  write_image_pack)

        td2 = tempfile.mkdtemp(prefix="fervit_packfeed_")
        try:
            rng3 = np.random.default_rng(11)
            from PIL import Image as _Image

            psrc = []
            for i in range(min(n, 512)):
                p = os.path.join(td2, f"{i:05d}.jpg")
                _Image.fromarray(rng3.integers(
                    0, 256, size=(256, 256, 3), dtype=np.uint8)).save(
                        p, quality=90)
                psrc.append(p)
            pack = os.path.join(td2, "pack")
            write_image_pack(psrc, pack, size=256)
            total = sum(k for _, k in iter_packed_batches(pack, 256))  # warm
            t0 = time.perf_counter()
            sink = 0
            for imgs, k in iter_packed_batches(pack, 256):
                sink += int(imgs[0, 0, 0, 0])
            packed_ips = total / (time.perf_counter() - t0)
        finally:
            shutil.rmtree(td2, ignore_errors=True)
        print(f"packed-uint8 feed (fervit-pack-images route): "
              f"{packed_ips:.0f} images/sec")
        for n_chips in (8,):
            need = n_chips * ips
            jpeg_hosts = math.ceil(need / decode_ips)
            print(f"feed budget for a {n_chips}-chip slice "
                  f"(needs {need:.0f} img/s): raw JPEG ≈ {jpeg_hosts} "
                  f"host-core(s) of this class; packed route sustains "
                  f"{packed_ips / ips:.1f} chips from one feeder core")

    if args.profile_dir:
        print(f"\nCapturing profiler trace to {args.profile_dir} ...")
        with jax.profiler.trace(args.profile_dir):
            def step(carry, enc_vars, img):
                return psp_step(carry, enc_vars, img)
            _ = measure_latency(step, (enc_vars, img_psp), n_runs=5)
        print("trace saved (view with tensorboard or xprof)")
    print("=" * 60)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder_path", default=None,
                        help="converted pSp weights (.npz); random init if absent")
    parser.add_argument("--encoder_type", choices=["psp", "e4e"], default="psp")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--throughput", action="store_true",
                        help="also report images/sec/chip at this batch size")
    parser.add_argument("--serving", type=int, default=0, metavar="N",
                        help="measure the serving feed: decode N synthetic "
                             "256px JPEGs and report the sustained "
                             "min(decode, device) rate")
    parser.add_argument("--profile_dir", default=None,
                        help="capture a jax.profiler trace to this directory")
    main(parser.parse_args())
