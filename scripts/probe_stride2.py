"""Probe alternatives for the MXU-starved 3x3 stride-2 trunk convs.

The PARITY.md round-2 profile shows the three stage-entry stride-2 convs at
24-39 TF/s (bold rows). Space-to-depth fixed the MXU rate but lost end-to-end
(1036 -> 901 img/s: pad+transpose HBM passes over multi-GB activations).

This probes, at the real bench batch (512), per trunk shape:
  direct    : lax.conv stride 2 (the current path)
  s2d       : 2x2/s1 conv on space-to-depth input (1.78x FLOPs, wide K)
  polyphase : out = sum_{a,b in {0,1}} conv_s1(x_phase[a,b], W[a::2-ish])
              exact FLOP count, four stride-1 convs on pre-strided slices

Run idle:  python scripts/probe_stride2.py
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

B = int(os.environ.get("PROBE_BATCH", "512"))
ITERS = int(os.environ.get("PROBE_ITERS", "20"))
DN = ("NHWC", "HWIO", "NHWC")


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


def conv_direct(x, k):
    return jax.lax.conv_general_dilated(x, k, (2, 2), [(1, 1), (1, 1)],
                                        dimension_numbers=DN)


def conv_s2d(x, k):
    cin, cout = k.shape[2], k.shape[3]
    k2 = jnp.zeros((2, 2, 2, 2, cin, cout), k.dtype)
    for bp in range(2):
        for a in range(2):
            di = 2 * bp + a - 1
            if not -1 <= di <= 1:
                continue
            for bq in range(2):
                for b in range(2):
                    dj = 2 * bq + b - 1
                    if not -1 <= dj <= 1:
                        continue
                    k2 = k2.at[bp, bq, a, b].set(k[di + 1, dj + 1])
    k2 = k2.reshape(2, 2, 4 * cin, cout)
    bsz, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = (xp.reshape(bsz, (h + 2) // 2, 2, (w + 2) // 2, 2, cin)
          .transpose(0, 1, 3, 2, 4, 5)
          .reshape(bsz, (h + 2) // 2, (w + 2) // 2, 4 * cin))
    return jax.lax.conv_general_dilated(xs, k2, (1, 1), "VALID",
                                        dimension_numbers=DN)


def conv_polyphase(x, k):
    """3x3 stride-2 SAME(pad 1) conv as 4 phase-split stride-1 convs.

    out(i,j) reads x[2i+di, 2j+dj], di,dj in {-1,0,1}. Split taps by parity:
    even taps di in {0} -> phase row a=0 slice x[0::2]; odd taps di in
    {-1,+1} -> phase a=1 slice x[1::2] shifted. Each phase conv has kernel
    (1 or 2, 1 or 2, cin, cout) and runs stride-1 on a half-res slice.
    """
    bsz, h, w, cin = x.shape
    cout = k.shape[3]
    # pad so that index arithmetic is uniform, then phase-slice
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # index o = orig + 1
    oh, ow = h // 2, w // 2
    out = jnp.zeros((bsz, oh, ow, cout), x.dtype)
    # taps grouped by (parity of di, parity of dj):
    #   di=-1,+1 are odd (rows of xp at even offsets 0,2 from 2i),
    #   di=0 is even (row 2i+1 in xp).
    # odd rows: xp rows 2i+0 and 2i+2 -> slice xp[:, 0::2][i] and [i+1]
    #   => 2-tap kernel over the even-row plane with VALID on length oh+1
    # even row: xp row 2i+1 -> slice xp[:, 1::2][i], 1-tap kernel.
    planes_h = {0: xp[:, 1::2][:, :oh], 1: xp[:, 0::2]}  # even di / odd di
    for ph in (0, 1):
        for pw in (0, 1):
            if ph == 0 and pw == 0:
                kk = k[1:2, 1:2]
                xin = planes_h[0][:, :, 1::2][:, :, :ow]
            elif ph == 0 and pw == 1:
                kk = jnp.stack([k[1, 0], k[1, 2]], 0)[None]  # (1,2,ci,co)
                xin = planes_h[0][:, :, 0::2]
            elif ph == 1 and pw == 0:
                kk = jnp.stack([k[0, 1], k[2, 1]], 0)[:, None]  # (2,1)
                xin = planes_h[1][:, :, 1::2][:, :, :ow]
            else:
                kk = jnp.stack(
                    [jnp.stack([k[0, 0], k[0, 2]], 0),
                     jnp.stack([k[2, 0], k[2, 2]], 0)], 0)  # (2,2,ci,co)
                xin = planes_h[1][:, :, 0::2]
            y = jax.lax.conv_general_dilated(xin, kk, (1, 1), "VALID",
                                             dimension_numbers=DN)
            out = out + y[:, :oh, :ow]
    return out


def probe(name, h, w, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, h, w, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.bfloat16)

    # correctness first (f32, small batch)
    xs = jnp.asarray(np.asarray(x[:2], np.float32))
    ks = jnp.asarray(np.asarray(k, np.float32))
    ref = conv_direct(xs, ks)
    for label, fn in (("s2d", conv_s2d), ("poly", conv_polyphase)):
        got = fn(xs, ks)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-2, (label, err)

    flops = 2 * B * (h // 2) * (w // 2) * cin * cout * 9
    results = {}
    for label, fn in (("direct", conv_direct), ("s2d", conv_s2d),
                      ("poly", conv_polyphase)):
        def step(carry, x, k, fn=fn):
            y = fn(x + carry.astype(x.dtype), k)
            return jnp.sum(y).astype(jnp.float32) * 0.0

        t = time_scan(step, (x, k))
        results[label] = t
        print(json.dumps({
            "shape": name, "impl": label, "ms": round(t * 1e3, 3),
            "tflops": round(flops / t / 1e12, 1),
            "speedup_vs_direct": round(results["direct"] / t, 3),
        }), flush=True)


def main():
    probe("body0_64to64_256px", 256, 256, 64, 64)
    probe("body3_64to128_128px", 128, 128, 64, 128)
    probe("body7_128to256_64px", 64, 64, 128, 256)


if __name__ == "__main__":
    main()
