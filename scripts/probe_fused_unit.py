"""TPU probe: Pallas fused IR-SE residual branch vs the isolated XLA op
sequence, on the trunk's hardware-eligible unit shapes at bench batch.

Eligibility (Mosaic constraints, see fer_vit_tpu/ops/fused_irse_unit.py):
Cin % 128 == 0, and Cout % 128 == 0 for stride 2. Run idle:

    python scripts/probe_fused_unit.py

Measured v2 result (double-buffered DMA, 48 MB VMEM blocks, batch 512):
109-130 TF/s vs isolated XLA's 141-154 TF/s — the kernel is a strong
NEGATIVE result kept for its hardware-verified Mosaic layout idioms
(PARITY.md "Known gaps" has the measurement history).
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

from fer_vit_tpu.ops.fused_irse_unit import (
    fused_irse_residual, fused_irse_residual_reference)

B = int(os.environ.get("PROBE_BATCH", "512"))
ITERS = int(os.environ.get("PROBE_ITERS", "20"))


def time_scan(step, args, n_iters=ITERS):
    @jax.jit
    def run(*args):
        def body(carry, _):
            return step(carry, *args), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_iters)
        return carry

    _ = float(run(*args))
    t0 = time.perf_counter()
    _ = float(run(*args))
    return (time.perf_counter() - t0) / n_iters


def probe(name, H, W, cin, cout, stride, rb=None):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, cin)), jnp.bfloat16)
    a1 = jnp.asarray(rng.normal(size=cin) * 0.2 + 1.0, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=cin) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) / np.sqrt(9 * cin),
                     jnp.float32)
    al = jnp.asarray(rng.uniform(0.1, 0.4, size=cout), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, cout, cout)) / np.sqrt(9 * cout),
                     jnp.float32)
    b2 = jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32)

    def xla_seq(x, a1, b1, w1, al, w2, b2):
        dn = ("NHWC", "HWIO", "NHWC")
        h = x * a1.astype(x.dtype) + b1.astype(x.dtype)
        h = jax.lax.conv_general_dilated(
            h, w1.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn)
        h = jnp.where(h >= 0, h, al.astype(h.dtype) * h)
        h = jax.lax.conv_general_dilated(
            h, w2.astype(x.dtype), (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=dn)
        h = h + b2.astype(h.dtype)
        return h, jnp.sum(h.astype(jnp.float32), axis=(1, 2))

    # numerics check (small slice, f32 oracle)
    xs = x[:2]
    ref, _ = fused_irse_residual_reference(xs, a1, b1, w1, al, w2, b2,
                                           stride=stride)
    got, _ = fused_irse_residual(xs, a1, b1, w1, al, w2, b2,
                                 stride=stride, rb=rb)
    d = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert d / scale < 0.02, (name, d, scale)

    flops = 2 * 9 * (H * W * cin * cout + (H // stride) * (W // stride)
                     * cout * cout) * B

    def step_fused(carry, x, *p):
        xi = x + carry.astype(x.dtype)
        out, sums = fused_irse_residual(xi, *p, stride=stride, rb=rb)
        return jnp.sum(sums) * 0.0

    def step_xla(carry, x, *p):
        xi = x + carry.astype(x.dtype)
        out, sums = xla_seq(xi, *p)
        return jnp.sum(sums) * 0.0

    args = (x, a1, b1, w1, al, w2, b2)
    t_xla = time_scan(step_xla, args)
    t_fused = time_scan(step_fused, args)
    for label, t in (("xla", t_xla), ("fused", t_fused)):
        print(json.dumps({
            "unit": name, "impl": label, "ms": round(t * 1e3, 3),
            "tflops": round(flops / t / 1e12, 1),
            "speedup_vs_xla": round(t_xla / t, 3),
            "max_rel_err": round(d / scale, 5),
        }), flush=True)


def main():
    probe("body4_s1_128_64px", 64, 64, 128, 128, 1)
    probe("body7_s2_128to256_64px", 64, 64, 128, 256, 2)
    probe("body8_s1_256_32px", 32, 32, 256, 256, 1)
    probe("body21_s2_256to512_32px", 32, 32, 256, 512, 2)
    probe("body22_s1_512_16px", 16, 16, 512, 512, 1)


if __name__ == "__main__":
    main()
