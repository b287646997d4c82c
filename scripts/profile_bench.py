"""Capture + parse a TPU profile of the headline bench step.

Runs the exact bench.py pipeline (pSp fuse_bn bf16 -> LatentViT d2, batch
BENCH_BATCH) under ``jax.profiler.trace`` and prints the device op table
(self-time per HLO, grouped) parsed from the captured xplane.

Usage (idle machine):  python scripts/profile_bench.py [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.environ.get("BENCH_BATCH", "512"))


def build_step():
    from fer_vit_tpu.encoders.psp import PSpEncoder, preprocess_images
    from fer_vit_tpu.models import LatentViT

    enc = PSpEncoder(dtype=jnp.bfloat16, fuse_bn=True)
    enc_vars = enc.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)))
    clf = LatentViT(depth=2, dtype=jnp.bfloat16)
    clf_vars = clf.init(jax.random.key(1), jnp.zeros((1, 18, 512)))
    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, size=(BATCH, 256, 256, 3)),
        jnp.float32,
    )

    @jax.jit
    def step(enc_vars, clf_vars, images, carry):
        x = preprocess_images(images + carry)
        w = enc.apply(enc_vars, x)
        logits = clf.apply(clf_vars, w)
        return jnp.sum(logits) * 0.0

    return step, (enc_vars, clf_vars, images)


def parse_xplane(profile_dir: str, top: int):
    """Aggregate device self-time per HLO op name from the xplane proto
    (dependency-free wire-format reader — the tensorflow +
    tensorboard-plugin-profile stack in this image is version-incompatible;
    see fer_vit_tpu/utils/xplane.py)."""
    from fer_vit_tpu.utils.xplane import device_op_totals

    paths = sorted(glob.glob(
        os.path.join(profile_dir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane under {profile_dir}"
    totals = device_op_totals(paths[-1])
    device_total = sum(totals.values())
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"\ndevice op self-time total: {device_total * 1e3:.1f} ms "
          f"(all traced iterations)")
    print(f"{'ms':>9s} {'%':>6s}  op")
    for name, dur in rows[:top]:
        print(f"{dur * 1e3:9.2f} {100 * dur / device_total:6.2f}  {name[:120]}")
    # grouped by coarse kind
    groups: dict = defaultdict(float)
    for name, dur in rows:
        key = name.split(".")[0].split("_dot")[0]
        groups[key] += dur
    print("\ngrouped:")
    for name, dur in sorted(groups.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur * 1e3:9.2f} {100 * dur / device_total:6.2f}  {name[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--dir", default="/tmp/fer_profile")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    step, sargs = build_step()
    out = step(*sargs, jnp.float32(0.0))  # compile + warm
    float(out)  # force full sync (block_until_ready lies through the tunnel)

    with jax.profiler.trace(args.dir):
        for _ in range(args.iters):
            out = step(*sargs, out)
        # fetch a scalar INSIDE the trace context: block_until_ready does
        # not reliably block through the axon tunnel (CLAUDE.md), and an
        # early trace __exit__ truncates the device plane
        float(out)
    print("trace captured; parsing ...")
    parse_xplane(args.dir, args.top)


if __name__ == "__main__":
    main()
