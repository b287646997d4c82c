"""Hardware validation of the AOT export path (fer_vit_tpu/export.py).

Runs the PRODUCTION serving pipeline (pSp-256 bf16 fuse_bn → LatentViT,
the bench.py/serve.py configuration, random init — weights don't change
what this validates: the exported program) on the real chip, twice:

  1. live   — Predictor built in-process, predict() over 2 chunks
  2. AOT    — the same predictor exported to a StableHLO artifact,
              reloaded via Predictor.from_exported, same images

and gates on answer equality (probs within bf16 re-lowering tolerance,
label agreement), then reports per-call wall for both routes (tunnel-RPC
dominated here; recorded for the artifact, not gated). Writes
VALIDATE_EXPORT.json.

    python scripts/validate_export.py [--batch 64] [--images 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--images", type=int, default=128)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "VALIDATE_EXPORT.json"))
    args = ap.parse_args()

    from fer_vit_tpu.encoders.psp import EncoderWrapper
    from fer_vit_tpu.export import export_predictor
    from fer_vit_tpu.models import LatentViT
    from fer_vit_tpu.serve import Predictor

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    psp = EncoderWrapper(seed=0)  # production config: bf16, fuse_bn
    model = LatentViT(depth=args.depth, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(1), jnp.zeros((1, 18, 512)))
    predictor = Predictor(model, variables, psp=psp,
                          batch_size=args.batch)

    images = np.random.default_rng(0).integers(
        0, 256, size=(args.images, 256, 256, 3), dtype=np.uint8)

    t0 = time.perf_counter()
    labels_live, probs_live = predictor.predict(images)
    live_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    labels_live, probs_live = predictor.predict(images)
    live_warm = time.perf_counter() - t0
    print(f"live: first {live_first:.1f}s, warm {live_warm:.2f}s",
          flush=True)

    with tempfile.TemporaryDirectory() as tmp:
        art = os.path.join(tmp, "artifact")
        t0 = time.perf_counter()
        # uint8 only: halves the chip-compile bill; the dual-dtype
        # dispatch is covered by tests/test_export.py + the validate_tpu
        # export stage on a small model
        meta = export_predictor(predictor, art, input_dtypes=("uint8",))
        export_s = time.perf_counter() - t0
        sizes = {f: os.path.getsize(os.path.join(art, f))
                 for f in sorted(os.listdir(art))}
        print(f"exported in {export_s:.1f}s: "
              f"{ {k: f'{v/1e6:.1f}MB' for k, v in sizes.items()} }",
              flush=True)

        reloaded = Predictor.from_exported(art)
        t0 = time.perf_counter()
        labels_aot, probs_aot = reloaded.predict(images)
        aot_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        labels_aot, probs_aot = reloaded.predict(images)
        aot_warm = time.perf_counter() - t0
        print(f"AOT:  first {aot_first:.1f}s, warm {aot_warm:.2f}s",
              flush=True)

    label_match = float(np.mean(labels_live == labels_aot))
    prob_max_diff = float(np.max(np.abs(probs_live - probs_aot)))
    # same program, re-lowered once: bf16 trunk noise only
    ok = label_match >= 0.99 and prob_max_diff <= 5e-3
    report = {
        "ok": bool(ok),
        "device": dev.device_kind,
        "config": {"batch": args.batch, "images": args.images,
                   "model": meta["model"], "route": meta["route"],
                   "platforms": meta["platforms"]},
        "label_match_fraction": label_match,
        "prob_max_abs_diff": prob_max_diff,
        "artifact_bytes": sizes,
        "export_s": round(export_s, 1),
        "live_first_call_s": round(live_first, 1),
        "live_warm_call_s": round(live_warm, 2),
        "aot_first_call_s": round(aot_first, 1),
        "aot_warm_call_s": round(aot_warm, 2),
        "note": "warm calls are tunnel-RPC dominated in this image; "
                "equality is the gate, timing is recorded context",
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("ok", "label_match_fraction", "prob_max_abs_diff")}))
    print(f"wrote {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
