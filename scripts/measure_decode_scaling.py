"""Feed-budget measurement (VERDICT r3 #1): how fast can this host feed
TPU chips, per input route?

Measures, on a synthetic 256px JPEG corpus (same protocol the reference's
decode hot loop would see — reference: data/generate_latents.py:66-73):

  1. native C++ decode rate vs thread count (in-process pool),
  2. decode rate vs process count (multiprocessing fan-out, for hosts
     where a single pool is limited; on a 1-core host this honestly
     shows no gain),
  3. packed-uint8 read rate (``iter_packed_batches`` consumption — the
     JPEG-free path written once by ``fervit-pack-images``),
  4. pack WRITE rate (``write_image_pack`` — the offline JPEG→pack
     conversion is itself decode-bound, so the packed route's cold-start
     cost must be priced, not assumed; VERDICT r4 weak #4),

then prints the feed-budget table: images/sec per route, how many
chips each route sustains at the measured per-chip device rate
(``--device_ips``, default the 1,038 img/s/chip bench number), and the
cold-start budget (JPEG→pack→first-serve). Writes ``FEED_BUDGET.json``
at the repo root for docs/SERVING.md.

Run on an idle host (the axon relay competes for CPU — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import math
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def make_corpus(td: str, n: int, size: int = 256) -> list:
    """Synthetic photo-like JPEGs (smooth base + mild noise — noise-only
    images are unrealistically slow to Huffman-decode)."""
    from PIL import Image

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    up = np.asarray(Image.fromarray(base).resize((size, size),
                                                 Image.BILINEAR), np.int16)
    paths = []
    for i in range(n):
        img = np.clip(up + rng.integers(-8, 8, size=up.shape),
                      0, 255).astype(np.uint8)
        p = os.path.join(td, f"{i:05d}.jpg")
        Image.fromarray(img).save(p, quality=90)
        paths.append(p)
    return paths


def _decode_chunk(args) -> int:
    paths, size, threads = args
    from fer_vit_tpu.data import native_decode

    native_decode.decode_batch(paths, size, n_threads=threads)
    return len(paths)


def sweep_threads(paths, size, thread_counts):
    from fer_vit_tpu.data import native_decode

    native_decode.decode_batch(paths[:32], size)  # warm lib + page cache
    rows = []
    for t in thread_counts:
        t0 = time.perf_counter()
        native_decode.decode_batch(paths, size, n_threads=t)
        rate = len(paths) / (time.perf_counter() - t0)
        rows.append({"threads": t, "img_per_s": round(rate, 1)})
        print(f"  threads={t:2d}: {rate:7.0f} img/s")
    return rows


def sweep_procs(paths, size, proc_counts):
    rows = []
    for p in proc_counts:
        chunks = [paths[i::p] for i in range(p)]
        with mp.get_context("fork").Pool(p) as pool:
            pool.map(_decode_chunk, [(c[:8], size, 1) for c in chunks])  # warm
            t0 = time.perf_counter()
            pool.map(_decode_chunk, [(c, size, 1) for c in chunks])
            rate = len(paths) / (time.perf_counter() - t0)
        rows.append({"procs": p, "img_per_s": round(rate, 1)})
        print(f"  procs={p:2d} (1 thread each): {rate:7.0f} img/s")
    return rows


def measure_pack_write(paths, size):
    from fer_vit_tpu.data.image_packs import write_image_pack

    pack = tempfile.mkdtemp(prefix="fervit_packw_")
    try:
        t0 = time.perf_counter()
        write_image_pack(paths, pack, size=size)
        rate = len(paths) / (time.perf_counter() - t0)
        print(f"  pack write (decode+save): {rate:7.0f} img/s")
        return rate
    finally:
        shutil.rmtree(pack, ignore_errors=True)


def measure_packed(paths, size, batch_size=256):
    from fer_vit_tpu.data.image_packs import (iter_packed_batches,
                                              write_image_pack)

    pack = tempfile.mkdtemp(prefix="fervit_pack_")
    try:
        write_image_pack(paths, pack, size=size)
        total = 0
        for imgs, k in iter_packed_batches(pack, batch_size):  # warm cache
            total += k
        sink = 0
        t0 = time.perf_counter()
        for imgs, k in iter_packed_batches(pack, batch_size):
            sink += int(imgs[0, 0, 0, 0])  # touch data; defeat laziness
        rate = total / (time.perf_counter() - t0)
        print(f"  packed read (batch {batch_size}): {rate:7.0f} img/s "
              f"(sink={sink})")
        return rate
    finally:
        shutil.rmtree(pack, ignore_errors=True)


def main(args) -> None:
    from fer_vit_tpu.data import native_decode

    if not native_decode.available():
        raise SystemExit("native decoder unavailable (g++/libjpeg/libpng)")
    cores = os.cpu_count() or 1
    td = tempfile.mkdtemp(prefix="fervit_feed_")
    try:
        print(f"corpus: {args.n} synthetic 256px JPEGs; host cores={cores}")
        paths = make_corpus(td, args.n)

        print("[1] native decode, thread sweep")
        threads = sweep_threads(paths, 256, [1, 2, 4, 8, 16])
        print("[2] native decode, process sweep")
        procs = sweep_procs(paths, 256, sorted({1, 2, min(4, max(2, cores)),
                                                cores} | {cores}))
        print("[3] packed-uint8 read rate")
        packed = measure_packed(paths, 256)
        print("[4] pack write rate (the cold-start cost of the packed route)")
        pack_write = measure_pack_write(paths, 256)

        best_jpeg = max(r["img_per_s"] for r in threads + procs)
        d = args.device_ips
        budget = {
            "host_cores": cores,
            "host_class": f"{cores}-core host (os.cpu_count); per-core "
                          f"figures and the 8-chip extrapolation are "
                          f"linear scalings from THIS host class",
            "device_img_per_s_per_chip": d,
            "jpeg_thread_sweep": threads,
            "jpeg_proc_sweep": procs,
            "jpeg_best_img_per_s": best_jpeg,
            "packed_read_img_per_s": round(packed, 1),
            "pack_write_img_per_s": round(pack_write, 1),
            "chips_sustained_jpeg": round(best_jpeg / d, 2),
            "chips_sustained_packed": round(packed / d, 2),
            "cores_needed_for_8_chips_jpeg": math.ceil(
                8 * d / (best_jpeg / cores)),
            # cold start = convert the corpus once, then serve from the
            # pack; conversion is decode-bound so it costs about what one
            # pass of the JPEG route costs
            "coldstart_seconds_per_10k_images": round(10_000 / pack_write, 1),
        }
        print("\n[feed budget]")
        print(f"  best JPEG feed on this host: {best_jpeg:.0f} img/s "
              f"→ sustains {budget['chips_sustained_jpeg']:.2f} chips "
              f"at {d} img/s/chip")
        print(f"  packed-uint8 feed:           {packed:.0f} img/s "
              f"→ sustains {budget['chips_sustained_packed']:.2f} chips")
        print(f"  pack write (one-time):       {pack_write:.0f} img/s "
              f"→ cold start ≈"
              f"{budget['coldstart_seconds_per_10k_images']:.0f} s per "
              f"10k images before the packed rate applies")
        print(f"  8-chip slice from raw JPEG needs ≈"
              f"{budget['cores_needed_for_8_chips_jpeg']} host cores of "
              f"this class (measured {best_jpeg / cores:.0f} img/s/core "
              f"on a {cores}-core host; linear extrapolation)")
        out = os.path.join(REPO, "FEED_BUDGET.json")
        with open(out, "w") as f:
            json.dump(budget, f, indent=2)
        print(f"wrote {out}")
    finally:
        shutil.rmtree(td, ignore_errors=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024,
                    help="corpus size (JPEG files)")
    ap.add_argument("--device_ips", type=float, default=1038.0,
                    help="measured per-chip device rate (bench.py)")
    main(ap.parse_args())
