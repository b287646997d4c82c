"""Cheap screen of XLA compiler options over the bandwidth-bound trunk.

The roofline (PARITY.md round-3) puts ~50 ms/step of the headline bench in
the bandwidth regime: input conv 3→64 @256² + stage0 (3× IR-SE units
64→64, →128²). A full-bench sweep costs one fresh ~15-20 min remote pSp
compile per option set, so this script screens candidate knobs on JUST
that region (same modules, same batch, same scan-in-jit protocol) where a
variant compiles in ~1-2 min. Winners (and near-winners) then get
confirmed end-to-end by scripts/xla_flag_sweep.py.

Options ride ``jax.jit(..., compiler_options=...)`` — the only channel
that reaches the remote TPU compiler through the axon tunnel (XLA_FLAGS
is parsed client-side and aborts on TPU-only flags; see xla_flag_sweep).

    python scripts/xla_opt_screen.py [--iters 30] [--out XLA_SCREEN.json]
"""

from __future__ import annotations

import argparse
import functools
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

import flax.linen as nn

from fer_vit_tpu.encoders.irse import BottleneckIRSE, PReLU

B = int(os.environ.get("SCREEN_BATCH", "512"))

# Every knob here was probe-accepted by the remote compiler on a tiny
# matmul (a bogus name fails remote_compile loudly, so acceptance is
# validation). Values bracket the defaults.
VARIANTS = [
    ("baseline", {}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_128m", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
    ("rerun_sched_0", {"xla_latency_hiding_scheduler_rerun": "0"}),
    ("rerun_sched_2", {"xla_latency_hiding_scheduler_rerun": "2"}),
    ("no_multi_level_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": False}),
    ("all_experimental_sched",
     {"xla_tpu_enable_all_experimental_scheduler_features": True}),
    ("no_conv_input_fusion", {"xla_jf_conv_input_fusion": False}),
    ("no_conv_output_fusion", {"xla_jf_conv_output_fusion": False}),
    ("short_transfer_chunks_16",
     {"xla_tpu_nd_short_transfer_max_chunks": "16"}),
    ("remat_smem_90",
     {"xla_jf_rematerialization_percent_shared_memory_limit": "90"}),
    ("no_dot_strength_reduction",
     {"xla_tpu_enable_dot_strength_reduction": False}),
    ("licm_inflation_2", {"xla_tpu_licm_size_inflation_ratio": "2"}),
    ("memory_bound_loop_opt",
     {"xla_tpu_memory_bound_loop_optimizer_options": "enabled:true"}),
    ("vmem_to_vmem_dmas", {"xla_tpu_enable_vmem_to_vmem_dmas": True}),
    ("vector_load_fusion_2048",
     {"xla_tpu_vector_load_fusion_window": "2048"}),
    ("vector_store_fusion_1024",
     {"xla_tpu_vector_store_fusion_window": "1024"}),
    ("async_copy_bw_2x",
     {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}),
    ("msa_use_to_copy_0.8",
     {"xla_tpu_msa_inefficient_use_to_copy_ratio": "0.8"}),
]


class EarlyTrunk(nn.Module):
    """Input layer + stage0, exactly as the bench encoder runs them
    (fuse_bn=True eval mode, bf16) — the roofline's bandwidth rows."""

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.bfloat16)
        x = nn.Conv(64, (3, 3), padding=1, use_bias=True,
                    dtype=jnp.bfloat16, name="input_conv")(x)
        x = PReLU(64, dtype=jnp.bfloat16, name="input_prelu")(x)
        for u in range(3):
            x = BottleneckIRSE(64, 64, 2 if u == 0 else 1, fuse_bn=True,
                               dtype=jnp.bfloat16, name=f"body_{u}")(x)
        return x


def time_variant(model, variables, images, opts, n_iters):
    @functools.partial(jax.jit, compiler_options=opts or None)
    def run(variables, images):
        def body(carry, _):
            y = model.apply(variables, images + carry)
            return jnp.sum(y).astype(jnp.float32) * 0.0, ()

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=n_iters)
        return carry

    t0 = time.perf_counter()
    _ = float(run(variables, images))  # compile + first execution
    compile_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(run(variables, images))
    return (time.perf_counter() - t0) / n_iters, compile_wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "XLA_SCREEN.json"))
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    model = EarlyTrunk()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)))
    images = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (B, 256, 256, 3)),
        jnp.float32)

    rows = []
    print(f"screen: early trunk (input+stage0), batch {B}, "
          f"{args.iters} iters/variant")
    for name, opts in VARIANTS:
        if args.only and name not in args.only:
            continue
        try:
            secs, compile_wall = time_variant(model, variables, images,
                                              opts, args.iters)
            row = {"variant": name, "compiler_options": opts,
                   "status": "ok", "ms_per_iter": round(secs * 1e3, 2),
                   "img_per_s": round(B / secs, 1),
                   "compile_s": round(compile_wall, 1)}
            print(f"  {name:26s} {row['ms_per_iter']:7.2f} ms/iter  "
                  f"{row['img_per_s']:8.1f} img/s  "
                  f"(compile {compile_wall:.0f}s)", flush=True)
        except Exception as e:
            row = {"variant": name, "compiler_options": opts,
                   "status": "failed", "detail": str(e)[:300]}
            print(f"  {name:26s} FAILED: {str(e)[:120]}", flush=True)
        rows.append(row)
        with open(args.out, "w") as f:  # crash-safe incremental write
            json.dump({"rows": rows, "batch": B, "iters": args.iters,
                       "region": "input_conv+stage0 (bandwidth regime)",
                       "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")},
                      f, indent=2)

    base = next((r for r in rows if r["variant"] == "baseline"
                 and r["status"] == "ok"), None)
    for r in rows:
        if base and r["status"] == "ok":
            r["vs_baseline"] = round(r["img_per_s"] / base["img_per_s"], 4)
    with open(args.out, "w") as f:
        json.dump({"rows": rows, "batch": B, "iters": args.iters,
                   "region": "input_conv+stage0 (bandwidth regime)",
                   "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}, f,
                  indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
