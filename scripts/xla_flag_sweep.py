"""XLA flag sweep over the bandwidth-regime trunk (VERDICT r3 #5).

The roofline (PARITY.md round-3) leaves ~50 ms/step of bandwidth-bound
early trunk (input conv + stage0 + FPN ≈ 78 MB/img of activations). This
script re-probes that region with compiler knobs rather than graph
rewrites: each variant runs the REAL headline bench (bench.py, scan-in-
jit protocol) in a subprocess with a different XLA_FLAGS value and
records images/sec. Unknown/rejected flags are recorded as such — the
deliverable is a number (or an explicit rejection) per knob, no silent
abandonment.

Costs real TPU time: each distinct XLA_FLAGS value misses the persistent
compile cache, so expect one fresh encoder compile per variant. Run on
an otherwise-idle machine (CLAUDE.md bench protocol).

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
# this generation. Values chosen around the defaults; a rejected flag is
# itself a recorded result.
VARIANTS = [
    ("baseline", ""),
    ("vmem_32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem_128m", "--xla_tpu_scoped_vmem_limit_kib=131072"),
    ("no_latency_hiding_sched",
     "--xla_latency_hiding_scheduler_rerun=0"),
    ("no_multi_level_fusion",
     "--xla_tpu_enable_multi_level_nested_loop_fusion=false"),
    ("no_async_host_offload",
     "--xla_tpu_enable_all_experimental_scheduler_features=false"),
    ("rerun_sched_2", "--xla_latency_hiding_scheduler_rerun=2"),
]

JSON_RE = re.compile(r'\{"metric".*\}')


def run_variant(name: str, flags: str, iters: int) -> dict:
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    env["BENCH_ITERS"] = str(iters)
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, cwd=REPO, capture_output=True, text=True,
                       timeout=3600)
    wall = time.perf_counter() - t0
    row = {"variant": name, "xla_flags": flags, "wall_s": round(wall, 1)}
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
          f"compile)")
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(REPO, "XLA_SWEEP.json"))
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of variant names")
    args = ap.parse_args()

    rows = []
    print(f"XLA flag sweep over bench.py ({len(VARIANTS)} variants)")
    for name, flags in VARIANTS:
        if args.only and name not in args.only:
            continue
        rows.append(run_variant(name, flags, args.iters))

    base = next((r for r in rows
                 if r["variant"] == "baseline" and r["status"] == "ok"),
                None)
    for r in rows:
        if base and r["status"] == "ok":
            r["vs_baseline"] = round(r["img_per_s"] / base["img_per_s"], 4)
    with open(args.out, "w") as f:
        json.dump({"rows": rows,
                   "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}, f,
                  indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
