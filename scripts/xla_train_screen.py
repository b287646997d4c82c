"""Screen XLA compiler options over the TRAIN program class (TPU).

The 20-knob screen (scripts/xla_opt_screen.py) that found the
inference-class winner only ever ran on the forward pSp trunk; the
train class ships compiler defaults on the strength of ONE A/B
(scoped-VMEM 64 MiB = 0.96x, TRAIN_OPTIONS.json). This script runs the
full knob list against the real trainer program — a Harness
``train_epoch`` (one jitted ``lax.scan`` over every step of the epoch:
fwd + bwd + optimizer + mixup), the program class every trainer CLI
compiles — so the train default rests on the same evidence base as the
inference default.

Protocol per variant (tunnel-safe, per CLAUDE.md): the epoch scan is one
dispatch + scalar fetch, timed over ``--reps`` epochs after TWO warm-up
epochs (the first compiles against ``init_state``'s avals, the second
against the donated-return avals — weak-type differences retrace
otherwise); a sanity check asserts the first timed rep is within 2x the
median. Options are injected through ``FERVIT_COMPILER_OPTIONS`` so the
program compiles through the shipped ``tuned_jit`` path exactly as a
user override would.

Writes XLA_TRAIN_SCREEN.json (crash-safe incremental). Run on an idle
machine — the axon relay competes for host CPU.

    python scripts/xla_train_screen.py [--reps 3] [--only name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(os.environ.get("TRAINSCREEN_N", str(512 * 256)))
BATCH = int(os.environ.get("TRAINSCREEN_BATCH", "512"))

# Same knob list the inference screen validated against the remote
# compiler (xla_opt_screen.py) — acceptance there means a bogus name
# would have failed loudly, so every name below reaches the TPU build.
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


def time_variant(harness, data_x, data_y, cw, opts, reps):
    if opts:
        os.environ["FERVIT_COMPILER_OPTIONS"] = json.dumps(opts)
    else:
        os.environ.pop("FERVIT_COMPILER_OPTIONS", None)
    lr = jnp.float32(1e-4)
    state = harness.init_state(jax.random.key(0), jnp.zeros((1, 18, 512)))
    t0 = time.perf_counter()
    for wkey in (1, 100):  # two warm-ups: fresh-build + returned-avals
        state, loss, _ = harness.train_epoch(
            state, jax.random.key(wkey), data_x, data_y, lr, cw)
        _ = float(loss)
    compile_wall = time.perf_counter() - t0
    times = []
    for rep in range(reps):
        t0 = time.perf_counter()
        state, loss, _ = harness.train_epoch(
            state, jax.random.key(2 + rep), data_x, data_y, lr, cw)
        _ = float(loss)
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    if times[0] > 2.0 * med:
        raise RuntimeError(
            f"first timed rep {times[0]:.2f}s > 2x median {med:.2f}s — "
            "warm-up did not absorb compilation; protocol invalid")
    return med, times, compile_wall, float(loss)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "XLA_TRAIN_SCREEN.json"))
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from fer_vit_tpu.models import LatentViT
    from fer_vit_tpu.train.harness import Harness, TrainConfig

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    model = LatentViT(depth=2, heads=8)
    cfg = TrainConfig(batch_size=BATCH, mixup=1.0, label_smoothing=0.1)
    harness = Harness(model=model, cfg=cfg)

    rng = np.random.default_rng(0)
    data_x = jax.device_put(
        rng.normal(size=(N, 18, 512)).astype(np.float32), dev)
    data_y = jax.device_put((np.arange(N) % 7).astype(np.int32), dev)
    cw = jnp.ones(7, jnp.float32)
    jax.block_until_ready(data_x)

    rows = []
    meta = {"protocol": f"LatentViT d2 h8 train_epoch (one jitted scan "
                        f"over {N // BATCH} steps of batch {BATCH}), "
                        f"median of {args.reps} epochs after 2 warm-up "
                        f"epochs, fetch-scalar sync; options via "
                        f"FERVIT_COMPILER_OPTIONS through tuned_jit",
            "device": dev.device_kind}
    print(f"train screen: {N // BATCH} steps x batch {BATCH}, "
          f"{args.reps} reps/variant", flush=True)
    for name, opts in VARIANTS:
        if args.only and name not in args.only:
            continue
        try:
            med, times, compile_wall, loss = time_variant(
                harness, data_x, data_y, cw, opts, args.reps)
            row = {"variant": name, "compiler_options": opts,
                   "status": "ok",
                   "epoch_seconds_median": round(med, 4),
                   "epoch_seconds_all": [round(t, 4) for t in times],
                   "img_per_s": round(N / med, 1),
                   "compile_s": round(compile_wall, 1),
                   "final_loss": loss}
            print(f"  {name:26s} {med:7.3f} s/epoch  "
                  f"{row['img_per_s']:9.1f} img/s  "
                  f"(compile {compile_wall:.0f}s)", flush=True)
        except Exception as e:
            row = {"variant": name, "compiler_options": opts,
                   "status": "failed", "detail": str(e)[:300]}
            print(f"  {name:26s} FAILED: {str(e)[:120]}", flush=True)
        rows.append(row)
        with open(args.out, "w") as f:  # crash-safe incremental write
            json.dump({**meta, "rows": rows,
                       "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")},
                      f, indent=2)

    os.environ.pop("FERVIT_COMPILER_OPTIONS", None)
    base = next((r for r in rows if r["variant"] == "baseline"
                 and r["status"] == "ok"), None)
    for r in rows:
        if base and r["status"] == "ok":
            r["vs_baseline"] = round(r["img_per_s"] / base["img_per_s"], 4)
    with open(args.out, "w") as f:
        json.dump({**meta, "rows": rows,
                   "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}, f,
                  indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
