"""A/B the compiler options on the TRAINING path (TPU).

The round-4 sweep tuned ``xla_tpu_scoped_vmem_limit_kib=65536`` on the
*inference* headline (pSp trunk — XLA_SWEEP.json, +3.7 % end-to-end),
and the first rollout applied it blanket to every hot jit — which this
script then measured at 0.9614× on the trainer epoch scan. Round 5
scoped the defaults per program class (``utils/compile_opts.py``): the
``train`` class now ships compiler defaults. This script verifies that
decision stays right: the shipped train default (env unset) must be
≥ 1.0× the forced 64 MiB option on the same program.

Protocol (tunnel-safe, per CLAUDE.md): a Harness ``train_epoch`` is
already ONE jitted call scanning every step of the epoch and returning
a scalar loss, so wall-clock around that single dispatch+fetch is the
sanctioned "N iterations inside one jit" shape. The env flip works
in-process because ``tuned_jit`` caches the built jit per
(platform, canonicalized options) — setting the env var forces a fresh
build with the other options. TWO warm-up epochs per variant: the first
compiles with ``init_state``'s avals, the second with the avals of the
state the donated scan returns (they differ in weak-types, so rep 1
used to retrace — the old run recorded a 116 s first rep); a protocol
sanity check asserts the first timed rep lands within 2× of the median.

Writes TRAIN_OPTIONS.json. Run on an idle machine.
"""

from __future__ import annotations

import json
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("TRAINOPT_N", str(512 * 256)))  # samples/epoch
BATCH = int(os.environ.get("TRAINOPT_BATCH", "512"))
REPS = int(os.environ.get("TRAINOPT_REPS", "5"))
OUT = os.path.join(os.path.dirname(__file__), "..", "TRAIN_OPTIONS.json")

VARIANTS = {
    # env unset → train-class default = compiler defaults (round 5)
    "shipped_train_default": None,
    # the inference-class winner, forced onto the train program
    "scoped_vmem_64mib": '{"xla_tpu_scoped_vmem_limit_kib": "65536"}',
    # the one train-screen candidate above the ±0.6 % neutral band
    # (XLA_TRAIN_SCREEN.json: 1.016×) — confirm at 5 reps before any
    # default change
    "async_copy_bw_2x":
        '{"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}',
}


def main() -> None:
    from fer_vit_tpu.models import LatentViT
    from fer_vit_tpu.train.harness import Harness, TrainConfig

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    # The flagship trainer's measured-baseline config (d2 h8 bs512 here —
    # batch raised from the reference's 64 to keep the chip fed; both
    # arms see identical shapes so the comparison is internal).
    model = LatentViT(depth=2, heads=8)
    cfg = TrainConfig(batch_size=BATCH, mixup=1.0, label_smoothing=0.1)
    harness = Harness(model=model, cfg=cfg)

    rng = np.random.default_rng(0)
    data_x = jax.device_put(
        rng.normal(size=(N, 18, 512)).astype(np.float32), dev)
    data_y = jax.device_put((np.arange(N) % 7).astype(np.int32), dev)
    cw = jnp.ones(7, jnp.float32)
    lr = jnp.float32(1e-4)
    jax.block_until_ready(data_x)

    results = {}
    for name, env in VARIANTS.items():
        if env is None:
            os.environ.pop("FERVIT_COMPILER_OPTIONS", None)
        else:
            os.environ["FERVIT_COMPILER_OPTIONS"] = env

        # fresh state per variant: train_epoch donates it (donate_argnums=1)
        state = harness.init_state(jax.random.key(0), jnp.zeros((1, 18, 512)))
        # warm-up 1: fresh build (env key) + compile against init_state's
        # avals; warm-up 2: compile against the returned state's avals
        # (weak-type differences made rep 1 retrace under a single warm-up)
        for wkey in (1, 100):
            state, loss, _ = harness.train_epoch(
                state, jax.random.key(wkey), data_x, data_y, lr, cw)
            _ = float(loss)

        times = []
        for rep in range(REPS):
            t0 = time.perf_counter()
            state, loss, _ = harness.train_epoch(
                state, jax.random.key(2 + rep), data_x, data_y, lr, cw)
            _ = float(loss)  # fetch the scalar → full epoch synced
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        warmup_ok = times[0] <= 2.0 * med
        if not warmup_ok:
            raise RuntimeError(
                f"{name}: first timed rep {times[0]:.2f}s > 2x median "
                f"{med:.2f}s — warm-up did not absorb compilation; "
                "protocol invalid")
        results[name] = {
            "epoch_seconds_median": round(med, 4),
            "epoch_seconds_all": [round(t, 4) for t in times],
            "img_per_sec": round(N / med, 1),
            "final_loss": float(loss),
            "first_rep_within_2x_median": warmup_ok,
        }
        print(f"{name}: {med:.3f} s/epoch  "
              f"({N / med:,.0f} img/s)  loss={float(loss):.4f}")

    os.environ.pop("FERVIT_COMPILER_OPTIONS", None)
    ratio = (results["scoped_vmem_64mib"]["epoch_seconds_median"]
             / results["shipped_train_default"]["epoch_seconds_median"])
    async_ratio = (
        results["shipped_train_default"]["epoch_seconds_median"]
        / results["async_copy_bw_2x"]["epoch_seconds_median"]
        if "async_copy_bw_2x" in results else None)
    report = {
        "protocol": f"LatentViT d2 h8 train_epoch (one jitted scan over "
                    f"{N // BATCH} steps of batch {BATCH}), median of "
                    f"{REPS} epochs after 2 warm-up epochs, fetch-scalar "
                    f"sync",
        "device": dev.device_kind,
        "shipped_train_default": "compiler defaults "
                                 "(program_class='train', round 5)",
        "variants": results,
        # ≥ 1.0 ⇒ the shipped train default is at least as fast as the
        # 64 MiB scoped-VMEM option on this program class
        "shipped_speedup_vs_scoped_vmem_64mib": round(ratio, 4),
        # > 1.0 ⇒ async_copy_bw_2x beats the shipped train default
        # (candidate from XLA_TRAIN_SCREEN.json; the shipping bar)
        "async_copy_bw_2x_speedup_vs_shipped": (
            round(async_ratio, 4) if async_ratio else None),
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(
        {"shipped_speedup_vs_scoped_vmem_64mib": round(ratio, 4),
         "async_copy_bw_2x_speedup_vs_shipped": (
             round(async_ratio, 4) if async_ratio else None)}))


if __name__ == "__main__":
    main()
