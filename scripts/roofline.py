"""Analytic roofline/MFU accounting for the headline pSp→LatentViT bench
(VERDICT r2 perf item (c)): per-region FLOPs and HBM bytes of the 256px
encoder, achieved TF/s / GB/s at a measured step time, and the roofline
verdict per region. Pure arithmetic — no jax; run anywhere:

    python scripts/roofline.py --ips 1035.9 --batch 512

Peaks (v5e, this chip): 197 TF/s dense bf16 (MXU), ~819 GB/s HBM; the
measured conv ceiling on this chip is ~178-188 TF/s (PARITY.md op table).
"""

from __future__ import annotations

import argparse
import json

BF16 = 2  # bytes

PLAN = [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)]


def conv_flops(cin, cout, hout, wout, k=3):
    return 2 * k * k * cin * cout * hout * wout


def analyze(batch: int):
    """Per-region (name, flops/img, hbm_bytes/img) with a simple traffic
    model: each conv fusion reads its input once and writes its output once
    (bf16); inter-unit tensors are read twice (bn1→conv1 path + shortcut);
    elementwise/BN/PReLU/SE-mean are fused into the adjacent conv fusions
    (confirmed by the round-2 xplane profile)."""
    rows = []

    def region(name, flops, read, write):
        rows.append({"region": name, "flops": flops,
                     "bytes": (read + write)})

    # input layer: conv 3→64 @256² (+PReLU fused)
    region("input_conv 3→64 @256²",
           conv_flops(3, 64, 256, 256),
           256 * 256 * 3 * 4,          # f32 preprocessed input
           256 * 256 * 64 * BF16)

    h = 256
    for si, (cin, cout, n_units) in enumerate(PLAN):
        f = r = w = 0
        for u in range(n_units):
            stride = 2 if u == 0 else 1
            ci = cin if u == 0 else cout
            hin, hout = h, h // stride
            if u == 0:
                h = hout
            x_bytes = hin * hin * ci * BF16
            mid_bytes = hin * hin * cout * BF16  # conv1 out (full res)
            y_bytes = hout * hout * cout * BF16
            # conv1: read x, write mid; conv2: read mid, write y(+SE sums);
            # shortcut: re-read x (subsample or 1×1 conv), add fused into
            # conv2's consumer... modeled as one extra read of x + final
            # write of y (the unit output tensor).
            f += conv_flops(ci, cout, hin, hin)          # conv1
            f += conv_flops(cout, cout, hout, hout)      # conv2
            f += 2 * 2 * cout * (cout // 16)             # SE MLP (1×1)
            if ci != cout:
                f += 2 * ci * cout * hout * hout         # 1×1 shortcut
            r += x_bytes + mid_bytes + x_bytes           # conv1-in, conv2-in, shortcut-in
            w += mid_bytes + y_bytes
        region(f"stage{si} {cin}→{cout}×{n_units} (→{h}²)", f, r, w)

    # FPN lat layers + upsample-adds
    region("latlayers+upsample",
           2 * 256 * 512 * 32 * 32 + 2 * 128 * 512 * 64 * 64
           + 2 * 512 * (32 * 32 * (16 + 32) + 64 * 64 * (32 + 64)),
           (16 * 16 * 512 + 32 * 32 * (256 + 512)
            + 64 * 64 * (128 + 512)) * BF16,
           (32 * 32 * 512 + 64 * 64 * 512) * BF16)

    # style heads: log2(spatial) stride-2 512→512 convs per head
    for name, n_heads, spatial, src_c in (
            ("coarse heads ×3", 3, 16, 512),
            ("middle heads ×4", 4, 32, 512),
            ("fine heads ×11", 11, 64, 512)):
        f = r = w = 0
        s = spatial
        first = True
        while s > 1:
            s //= 2
            cin = src_c
            f += n_heads * conv_flops(cin, 512, s, s)
            r += (1 if first else n_heads) * (2 * s) ** 2 * cin * BF16
            w += n_heads * s * s * 512 * BF16
            first = False
        f += n_heads * 2 * 512 * 512  # EqualLinear
        region(name, f, r, w)

    region("LatentViT d2 classify",
           2 * (18 * 512 * 512 + 2 * (4 * 19 * 512 * 512
                                      + 2 * 19 * 512 * 2048)
                + 512 * 7),
           18 * 512 * 4, 7 * 4)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ips", type=float, required=True,
                   help="measured images/sec/chip")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--peak_tf", type=float, default=197.0)
    p.add_argument("--peak_gbs", type=float, default=819.0)
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    rows = analyze(args.batch)
    tot_f = sum(r["flops"] for r in rows)
    tot_b = sum(r["bytes"] for r in rows)
    step_s = args.batch / args.ips
    per_img_s = 1.0 / args.ips

    print(f"batch {args.batch}: {step_s * 1e3:.1f} ms/step at "
          f"{args.ips:.1f} img/s")
    print(f"{'region':34s} {'GFLOP/img':>10s} {'MB/img':>8s} "
          f"{'AI(F/B)':>8s}")
    for r in rows:
        ai = r["flops"] / max(r["bytes"], 1)
        print(f"{r['region']:34s} {r['flops'] / 1e9:10.2f} "
              f"{r['bytes'] / 1e6:8.1f} {ai:8.0f}")
    ai_tot = tot_f / tot_b
    ach_tf = tot_f / per_img_s / 1e12
    ach_gb = tot_b / per_img_s / 1e9
    crit_ai = args.peak_tf * 1e12 / (args.peak_gbs * 1e9)
    print("-" * 64)
    print(f"{'TOTAL':34s} {tot_f / 1e9:10.2f} {tot_b / 1e6:8.1f} "
          f"{ai_tot:8.0f}")
    print(f"achieved: {ach_tf:.1f} TF/s ({100 * ach_tf / args.peak_tf:.0f}% "
          f"of {args.peak_tf:.0f} peak bf16) | {ach_gb:.0f} GB/s "
          f"({100 * ach_gb / args.peak_gbs:.0f}% of {args.peak_gbs:.0f} "
          f"peak HBM)")
    print(f"arithmetic intensity {ai_tot:.0f} FLOP/B vs critical "
          f"{crit_ai:.0f} → {'COMPUTE' if ai_tot > crit_ai else 'BANDWIDTH'}"
          "-bound overall (per-region varies; see table)")
    if args.json:
        print(json.dumps({"rows": rows, "total_flops": tot_f,
                          "total_bytes": tot_b, "achieved_tf": ach_tf,
                          "achieved_gbs": ach_gb}))


if __name__ == "__main__":
    main()
