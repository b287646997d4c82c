"""Pipeline-depth sweep on the bulk offline predict route (round 5).

``Predictor._run_pipelined`` keeps up to ``pipeline_depth`` async device
dispatches in flight so each chunk's host→device transfer + compute
overlaps the previous chunk's fetch. The HTTP measurement
(SERVING_LATENCY.json) only exercises 2 chunks per payload; this script
quantifies the overlap where it matters most — a long offline stream of
chunks (the ``fervit-predict`` bulk CLI shape) — by sweeping the depth
on the REAL headline pipeline (pSp 256px bf16 → LatentViT d6, batch 64).

Protocol: wall-clock around the full ``predict()`` call on an
N-image uint8 array (N/batch chunks), median of ``--reps``, one warm-up
per depth. This is host-dispatch pipelining, so wall-clock around many
dispatch+fetch round-trips IS the quantity under test (same honesty
note as the serving harness: through the axon tunnel each synchronous
round-trip costs ~0.7 s, which is exactly the cost the overlap hides;
bench.py's in-scan protocol measures the chip itself). A ``sync``
baseline drives the same chunks one ``predict()`` call each — one
chunk per call can never overlap, so it is the true no-pipelining
floor.

Writes PIPELINE_DEPTH.json at the repo root. Run on an idle host.

Usage:
    python scripts/measure_pipeline_depth.py [--images 1024]
        [--batch_size 64] [--reps 3] [--depths 1,2,4] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

os.environ.setdefault("JAX_CACHE_DIR", "/root/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", type=int, default=1024)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--depths", default="1,2,4")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny model for CI/CPU smoke")
    parser.add_argument("--out", default=os.path.join(REPO,
                                                      "PIPELINE_DEPTH.json"))
    args = parser.parse_args()

    from scripts.measure_serving_latency import build_predictor

    size = 32 if args.tiny else 256
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255,
                          size=(args.images, size, size, 3), dtype=np.uint8)
    depths = [int(d) for d in args.depths.split(",")]
    n_chunks = -(-args.images // args.batch_size)

    results = {}
    ref_labels = ref_probs = None

    def timed(fn) -> dict:
        nonlocal ref_labels, ref_probs
        fn()  # warm-up: compile + first stream
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            labels, probs = fn()
            times.append(time.perf_counter() - t0)
        if ref_labels is None:
            ref_labels, ref_probs = labels, probs
        else:  # every variant must return identical answers
            np.testing.assert_array_equal(labels, ref_labels)
            np.testing.assert_allclose(probs, ref_probs, atol=2e-5)
        med = statistics.median(times)
        return {"seconds_median": round(med, 3),
                "seconds_all": [round(t, 3) for t in times],
                "img_per_s": round(args.images / med, 1)}

    # ONE predictor for every variant: the depth is read per call in
    # _run_pipelined, so mutating it avoids recompiling the pSp pipeline
    # (slow through the remote-compile tunnel) per variant.
    pred = build_predictor(argparse.Namespace(
        tiny=args.tiny, batch_size=args.batch_size))

    for depth in depths:
        pred.pipeline_depth = depth
        results[f"depth_{depth}"] = timed(lambda: pred.predict(images))
        print(f"depth={depth}: {results[f'depth_{depth}']}")

    # true synchronous floor: one chunk per call never overlaps
    pred.pipeline_depth = 2

    def sync_stream():
        labs, prbs = [], []
        for i in range(0, args.images, args.batch_size):
            l, p = pred.predict(images[i:i + args.batch_size])
            labs.append(l)
            prbs.append(p)
        return np.concatenate(labs), np.concatenate(prbs)

    results["sync_one_call_per_chunk"] = timed(sync_stream)
    print(f"sync: {results['sync_one_call_per_chunk']}")

    best = max((k for k in results if k.startswith("depth_")),
               key=lambda k: results[k]["img_per_s"])
    report = {
        "protocol": f"predict() on ({args.images}, {size}, {size}, 3) uint8 "
                    f"({n_chunks} chunks of batch {args.batch_size}), "
                    f"median of {args.reps} reps after 1 warm-up; all "
                    f"variants asserted answer-identical",
        "platform": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
        "pipeline": "tiny" if args.tiny else
                    "pSp 256px bf16 -> LatentViT d6 (headline serving "
                    "pipeline)",
        "variants": results,
        "best_depth": int(best.split("_")[1]),
        "best_speedup_vs_sync": round(
            results[best]["img_per_s"]
            / results["sync_one_call_per_chunk"]["img_per_s"], 4),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"best_depth": report["best_depth"],
                      "best_speedup_vs_sync":
                          report["best_speedup_vs_sync"]}))


if __name__ == "__main__":
    main()
