"""Serving latency distribution under concurrent clients (VERDICT r3 #6).

Builds the real serving pipeline (pSp 256px bf16 → LatentViT), serves it
over the actual HTTP server (`fer_vit_tpu.serve.make_server`, dynamic
batcher), then drives it two ways and reports both side by side
(VERDICT r4 weak #5 — the bulk route is the one docs/SERVING.md tells
latency-sensitive users to prefer, so it must be quantified too):

  1. per-request route (``POST /predict``): K concurrent clients × M
     single-image requests → p50/p90/p99 per-request latency + req/s;
  2. bulk route (``POST /predict_batch``): one keep-alive client
     shipping (N, S, S, 3) uint8 ``.npy`` payloads → per-payload
     p50/p99 + sustained img/s.

Writes SERVING_LATENCY.json at the repo root.

Honesty note: per-request wall-clock here includes the HTTP hop and —
on this image — the axon tunnel's host↔device RPC per batch. That IS the
user-visible latency of this deployment; the throughput ceiling of the
chip itself is measured separately by bench.py's in-scan protocol
(CLAUDE.md). Run on an idle host.

Usage:
    python scripts/measure_serving_latency.py [--clients 8] [--per 25]
        [--batch_size 64] [--max_wait_ms 5] [--tiny]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

os.environ.setdefault("JAX_CACHE_DIR", "/root/.jax_cache")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_predictor(args):
    from fer_vit_tpu.encoders.psp import EncoderWrapper, PSpEncoder
    from fer_vit_tpu.models import LatentViT
    from fer_vit_tpu.serve import Predictor

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    if args.tiny:
        enc = PSpEncoder(plan=((64, 16, 1), (16, 32, 2), (32, 32, 2),
                               (32, 64, 1)),
                         input_size=32, style_dim=16, n_styles=18,
                         dtype=jnp.float32)
        psp = EncoderWrapper(encoder=enc, seed=0, fold_bn=False)
        clf = LatentViT(depth=1, latent_dim=16, embed_dim=64, heads=2,
                        mlp_dim=128)
        clf_vars = clf.init(jax.random.key(1), jnp.zeros((1, 18, 16)))
    else:
        enc = PSpEncoder(dtype=dtype, fuse_bn=True, fused_residual=True)
        psp = EncoderWrapper(encoder=enc, seed=0, fold_bn=True)
        clf = LatentViT(dtype=dtype)  # d6 headline config
        clf_vars = clf.init(jax.random.key(1), jnp.zeros((1, 18, 512)))
    return Predictor(clf, clf_vars, psp=psp, batch_size=args.batch_size)


def measure_batch_route(host: str, port: int, size: int, batch_n: int,
                        reps: int) -> dict:
    """Drive ``POST /predict_batch`` over ONE keep-alive connection with
    (batch_n, size, size, 3) uint8 .npy payloads; per-payload latency +
    sustained img/s."""
    import http.client

    rng = np.random.default_rng(1)
    buf = io.BytesIO()
    np.save(buf, rng.integers(0, 256, size=(batch_n, size, size, 3),
                              dtype=np.uint8))
    payload = buf.getvalue()
    headers = {"Content-Type": "application/octet-stream",
               "Content-Length": str(len(payload))}

    conn = http.client.HTTPConnection(host, port, timeout=300)
    lat = []
    try:
        for rep in range(reps + 1):  # +1 warm rep, dropped below
            t0 = time.perf_counter()
            conn.request("POST", "/predict_batch", body=payload,
                         headers=headers)
            resp = conn.getresponse()
            body = resp.read()
            if resp.status != 200:
                raise RuntimeError(
                    f"batch route HTTP {resp.status}: {body[:200]!r}")
            preds = json.loads(body)["predictions"]
            assert len(preds) == batch_n, (len(preds), batch_n)
            if rep > 0:
                lat.append(time.perf_counter() - t0)
    finally:
        conn.close()
    arr = np.asarray(lat) * 1000.0
    p50, p99 = np.percentile(arr, [50, 99])
    return {
        "batch_n": batch_n,
        "reps": reps,
        "payload_mb": round(len(payload) / 2**20, 1),
        "p50_ms": round(float(p50), 1),
        "p99_ms": round(float(p99), 1),
        "mean_ms": round(float(arr.mean()), 1),
        "img_per_s": round(batch_n / (arr.mean() / 1000.0), 1),
    }


def main(args) -> None:
    from PIL import Image

    from fer_vit_tpu.serve import make_server

    print(f"devices: {jax.devices()}")
    predictor = build_predictor(args)
    print(f"compiling {predictor.describe()} ...")
    t0 = time.perf_counter()
    predictor.warmup()
    print(f"compiled in {time.perf_counter() - t0:.1f}s")

    srv = make_server(predictor, host="127.0.0.1", port=0,
                      max_wait_ms=args.max_wait_ms,
                      submit_timeout=args.submit_timeout)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_port}/predict"
    print(f"serving on {url}; {args.clients} clients × {args.per} requests")

    s = predictor.input_size
    rng = np.random.default_rng(0)
    bodies = []
    for _ in range(8):
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 256, size=(s, s, 3),
                                     dtype=np.uint8)).save(buf, format="JPEG",
                                                           quality=90)
        bodies.append(buf.getvalue())

    import urllib.request

    lat, errors = [], []
    lock = threading.Lock()

    def client(ci: int) -> None:
        for j in range(args.per):
            req = urllib.request.Request(url, data=bodies[(ci + j) % 8])
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    json.loads(r.read())
            except Exception as e:
                with lock:
                    errors.append(repr(e))
                continue
            with lock:
                lat.append(time.perf_counter() - t0)

    # one warm sequential round (server already compiled; primes HTTP)
    client0 = threading.Thread(target=client, args=(0,))
    client0.start()
    client0.join()
    lat.clear()

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    wall0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - wall0

    print(f"bulk route: {args.batch_reps}×(N={args.batch_n}) .npy payloads "
          f"over one keep-alive connection")
    batch_record = measure_batch_route("127.0.0.1", srv.server_port,
                                       s, args.batch_n, args.batch_reps)
    print(json.dumps(batch_record))

    srv.shutdown()
    srv.batcher.close()
    srv.server_close()

    if errors:
        print(f"{len(errors)} request error(s): {errors[:3]}")
    arr = np.asarray(lat) * 1000.0
    p50, p90, p99 = np.percentile(arr, [50, 90, 99])
    record = {
        "platform": jax.devices()[0].platform,
        "pipeline": predictor.describe(),
        "clients": args.clients,
        "requests_ok": len(lat),
        "requests_failed": len(errors),
        "max_wait_ms": args.max_wait_ms,
        "p50_ms": round(float(p50), 1),
        "p90_ms": round(float(p90), 1),
        "p99_ms": round(float(p99), 1),
        "mean_ms": round(float(arr.mean()), 1),
        "throughput_req_per_s": round(len(lat) / wall, 1),
        "batch_route": batch_record,
    }
    print(json.dumps(record, indent=2))
    out = os.path.join(REPO, "SERVING_LATENCY.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--per", type=int, default=25)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--submit_timeout", type=float, default=120.0)
    ap.add_argument("--batch_n", type=int, default=128,
                    help="images per /predict_batch payload (128×256² "
                         "uint8 ≈ 24 MB, under the 32 MB request cap)")
    ap.add_argument("--batch_reps", type=int, default=10)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny pipeline (CI smoke, no TPU needed)")
    main(ap.parse_args())
