"""Headline benchmark: 256px face images/sec/chip through pSp → LatentViT.

Protocol mirrors the reference latency harness (reference:
scripts/measure_full_pipeline.py:17-45 — 20 warmup + 100 timed runs), with
``block_until_ready`` in place of CUDA events. The end-to-end path is the
north-star metric (BASELINE.md: ≥5,000 images/sec/chip on v5e); until the
pSp encoder port lands the script falls back to the LatentViT-classification
stage alone and says so in the metric name.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TARGET_IPS = 5000.0  # BASELINE.md rebuild target, images/sec/chip
WARMUP = 20
TIMED = 100


def _throughput(fn, args, items_per_call: int,
                warmup: int = WARMUP, timed: int = TIMED) -> float:
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(timed):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return items_per_call * timed / dt


def bench_end_to_end(batch: int = 512) -> float:
    """256px images → pSp encode (w+ 18×512) → LatentViT-d2 logits."""
    from fer_vit_tpu.encoders.psp import PSpEncoder  # raises if not yet built
    from fer_vit_tpu.models import LatentViT

    encoder = PSpEncoder()
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 256, 256, 3)),
        jnp.float32,
    )
    enc_vars = encoder.init(jax.random.key(0), images[:1])
    clf = LatentViT(depth=2)
    clf_vars = clf.init(jax.random.key(1), jnp.zeros((1, 18, 512)))

    @jax.jit
    def pipeline(enc_vars, clf_vars, images):
        w_plus = encoder.apply(enc_vars, images)
        return clf.apply(clf_vars, w_plus)

    return _throughput(pipeline, (enc_vars, clf_vars, images), batch)


def bench_latent_vit(batch: int = 4096) -> float:
    from fer_vit_tpu.models import LatentViT

    model = LatentViT(depth=2, dtype=jnp.bfloat16)
    latents = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 18, 512)), jnp.float32
    )
    variables = model.init(jax.random.key(0), latents[:1])
    fn = jax.jit(model.apply)
    return _throughput(fn, (variables, latents), batch)


def main() -> None:
    try:
        value = bench_end_to_end()
        metric = "psp_to_latent_vit_images_per_sec_per_chip"
    except Exception:
        value = bench_latent_vit()
        metric = "latent_vit_d2_classifications_per_sec_per_chip"
    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / BASELINE_TARGET_IPS, 3),
    }))


if __name__ == "__main__":
    main()
