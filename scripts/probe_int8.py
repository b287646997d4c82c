"""Honest int8-vs-bf16 probe on the pipeline's dominant convolutions.

VERDICT r1 ruled that dismissing int8 from one small conv microbenchmark was
not evidence; this probe times the *actual dominant shapes* of the pSp
encoder (PARITY.md round-2 profile):

  fine-heads conv_0   : (B, 64, 64, 512) -> 3x3 s2 -> (B, 32, 32, 5632)   31% of step
  fine-heads conv_1   : grouped 11x[512->512] @ 32^2 -> 16^2               7.8%
  stage-3 trunk conv  : (B, 32, 32, 256) -> 3x3 s1 -> 256                  bulk of "rest"

Protocol: same scan-in-jit timing as bench.py (the axon tunnel makes eager
block_until_ready timing meaningless). Each op runs ITERS times inside one
jitted lax.scan with a carry dependency; we fetch one scalar.

Run on an otherwise-idle machine:  python scripts/probe_int8.py
Prints one JSON line per (shape, dtype) with achieved TFLOP/s (TOP/s for
int8) and the int8:bf16 speedup ratio per shape.
"""

from __future__ import annotations

import json
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

B = int(os.environ.get("PROBE_BATCH", "128"))
ITERS = int(os.environ.get("PROBE_ITERS", "30"))


def time_scan(step, args, n_iters=ITERS):
    @jax.jit
    def run(*args):
        def body(carry, _):
            return step(carry, *args), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_iters)
        return carry

    _ = float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    _ = float(run(*args))
    return (time.perf_counter() - t0) / n_iters


def conv_flops(b, h, w, cin, cout, kh, kw, stride):
    return 2 * b * (h // stride) * (w // stride) * cin * cout * kh * kw


def probe_shape(name, h, w, cin, cout, stride, feature_group_count=1):
    rng = np.random.default_rng(0)
    kin = cin // feature_group_count
    x_f = jnp.asarray(rng.normal(size=(B, h, w, cin)), jnp.bfloat16)
    k_f = jnp.asarray(rng.normal(size=(3, 3, kin, cout)) * 0.05, jnp.bfloat16)
    x_q = jnp.asarray(rng.integers(-127, 128, size=(B, h, w, cin)), jnp.int8)
    k_q = jnp.asarray(rng.integers(-127, 128, size=(3, 3, kin, cout)), jnp.int8)
    dn = ("NHWC", "HWIO", "NHWC")
    flops = conv_flops(B, h, w, kin, cout, 3, 3, stride)

    def step_bf16(carry, x, k):
        y = jax.lax.conv_general_dilated(
            x + carry.astype(x.dtype), k, (stride, stride), "SAME",
            dimension_numbers=dn, feature_group_count=feature_group_count)
        return jnp.sum(y).astype(jnp.float32) * 0.0

    def step_int8(carry, x, k):
        # carry dependency via a data-independent select keeps iterations live
        xi = jnp.where(carry > 0, x ^ 1, x)
        y = jax.lax.conv_general_dilated(
            xi, k, (stride, stride), "SAME", dimension_numbers=dn,
            feature_group_count=feature_group_count,
            preferred_element_type=jnp.int32)
        return jnp.sum(y).astype(jnp.float32) * 0.0

    t_f = time_scan(step_bf16, (x_f, k_f))
    t_q = time_scan(step_int8, (x_q, k_q))
    for dtype, t in (("bf16", t_f), ("int8", t_q)):
        print(json.dumps({
            "shape": name, "dtype": dtype, "ms": round(t * 1e3, 3),
            "tflops": round(flops / t / 1e12, 1),
            "speedup_vs_bf16": round(t_f / t, 3),
        }))


def main():
    # the three dominant shapes from the PARITY.md round-2 profile
    probe_shape("fine_conv0_512to5632_s2_64px", 64, 64, 512, 5632, 2)
    probe_shape("fine_conv1_grouped11_512to512_s2_32px", 32, 32,
                11 * 512, 11 * 512, 2, feature_group_count=11)
    probe_shape("stage3_trunk_256ch_s1_32px", 32, 32, 256, 256, 1)
    # one MXU-starved stride-2 trunk conv for reference
    probe_shape("body0_64ch_s2_256px", 256, 256, 64, 64, 2)


if __name__ == "__main__":
    main()
