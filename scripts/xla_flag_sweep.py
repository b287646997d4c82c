"""XLA compiler-option sweep over the bandwidth-regime trunk (VERDICT r3 #5).

The roofline (PARITY.md round-3) leaves ~50 ms/step of bandwidth-bound
early trunk (input conv + stage0 + FPN ≈ 78 MB/img of activations). This
script re-probes that region with compiler knobs rather than graph
rewrites: each variant runs the REAL headline bench (bench.py, scan-in-
jit protocol) in a subprocess and records images/sec. Rejected options
are recorded as such — the deliverable is a number (or an explicit
rejection) per knob, no silent abandonment.

Channel finding (2026-08-19, recorded in XLA_SWEEP.json): XLA_FLAGS is
the WRONG channel through the axon tunnel — it is parsed by the client-
side XLA build (parse_flags_from_env aborts the process on TPU-only
flags before any compile is attempted). Per-jit ``compiler_options``
ride the PJRT compile request to the remote TPU compiler and are
validated there (a bogus option name fails the remote_compile HTTP call
with a tpu_compile_helper error), so this sweep passes each variant as
``BENCH_COMPILER_OPTIONS`` (JSON) which bench.py forwards to
``jax.jit(..., compiler_options=...)``.

Costs real TPU time: each distinct option set misses the persistent
compile cache, so expect one fresh remote encoder compile per variant
(~4-20 min each). Run on an otherwise-idle machine (CLAUDE.md bench
protocol).

    python scripts/xla_flag_sweep.py [--iters 10] [--out XLA_SWEEP.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Knobs plausibly relevant to conv-trunk fusion depth / scheduling on
# this generation. Values chosen around the defaults; a rejected option
# is itself a recorded result.
VARIANTS = [
    ("baseline", {}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_128m", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
    ("rerun_sched_0", {"xla_latency_hiding_scheduler_rerun": "0"}),
    ("rerun_sched_2", {"xla_latency_hiding_scheduler_rerun": "2"}),
    # bools must be real JSON booleans: XLA's option parser rejects the
    # lowercase strings "true"/"false" (INVALID_ARGUMENT)
    ("no_multi_level_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": False}),
    ("all_experimental_sched",
     {"xla_tpu_enable_all_experimental_scheduler_features": True}),
]

JSON_RE = re.compile(r'\{"metric".*\}')


def run_variant(name: str, opts: dict, iters: int) -> dict:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    if opts:
        env["BENCH_COMPILER_OPTIONS"] = json.dumps(opts)
    else:
        env.pop("BENCH_COMPILER_OPTIONS", None)
    env["BENCH_ITERS"] = str(iters)
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, cwd=REPO, capture_output=True, text=True,
                       timeout=3600)
    wall = time.perf_counter() - t0
    row = {"variant": name, "compiler_options": opts,
           "wall_s": round(wall, 1)}
    m = JSON_RE.search(r.stdout)
    if r.returncode != 0 or not m:
        tail = (r.stderr or r.stdout)[-500:]
        row.update(status="rejected/failed", detail=tail.strip()[-300:])
        print(f"  {name:26s} REJECTED/FAILED ({wall:.0f}s): "
              f"{tail.splitlines()[-1] if tail.splitlines() else '?'}")
        return row
    rec = json.loads(m.group(0))
    row.update(status="ok", img_per_s=rec["value"], metric=rec["metric"])
    print(f"  {name:26s} {rec['value']:8.1f} img/s  ({wall:.0f}s incl "
          f"compile)", flush=True)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(REPO, "XLA_SWEEP.json"))
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of variant names")
    args = ap.parse_args()

    rows = []
    print(f"XLA compiler-option sweep over bench.py "
          f"({len(VARIANTS)} variants)")
    for name, opts in VARIANTS:
        if args.only and name not in args.only:
            continue
        rows.append(run_variant(name, opts, args.iters))
        # incremental write: a crash mid-sweep keeps the finished rows
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "channel": "jit compiler_options "
                       "(XLA_FLAGS is client-parsed and aborts on TPU "
                       "flags through the axon tunnel)",
                       "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")},
                      f, indent=2)

    base = next((r for r in rows
                 if r["variant"] == "baseline" and r["status"] == "ok"),
                None)
    for r in rows:
        if base and r["status"] == "ok":
            r["vs_baseline"] = round(r["img_per_s"] / base["img_per_s"], 4)
    with open(args.out, "w") as f:
        json.dump({"rows": rows, "channel": "jit compiler_options "
                   "(XLA_FLAGS is client-parsed and aborts on TPU flags "
                   "through the axon tunnel)",
                   "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}, f,
                  indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
