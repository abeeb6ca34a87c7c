"""Analytic roofline for the fused inference program (VERDICT r1 #1).

CLI printer over segtpu.utils.roofline.compute_roofline (the library
form bench.py also imports). The table goes into docs/DESIGN.md;
re-run after kernel changes.

Usage: python scripts/roofline.py [HxW] [arch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from segtpu.utils.roofline import (compute_roofline, PEAK_BF16_TFLOPS,
                                       PEAK_HBM_GBS)

    hw = sys.argv[1] if len(sys.argv) > 1 else "1024x2048"
    h, w = (int(v) for v in hw.split("x"))
    arch = sys.argv[2] if len(sys.argv) > 2 else "arch0"
    num_classes = 19

    r = compute_roofline(h, w, arch, num_classes=num_classes)
    print(f"# roofline @ {h}x{w}, {arch}, {num_classes} classes, bf16, "
          f"per FRAME (v5e: {PEAK_BF16_TFLOPS} TF/s, {PEAK_HBM_GBS} GB/s)")
    print(f"{'segment':34s} {'GFLOP':>8s} {'MB':>9s} {'bnd':>4s} "
          f"{'achv ms':>8s} {'attn ms':>8s}")
    for s in r["segments"]:
        print(f"{s['name']:34s} {s['gflop']:8.2f} {s['mb']:9.1f} "
              f"{s['bound']:>4s} {s['achievable_ms']:8.3f} "
              f"{s['attain_ms']:8.3f}  {s['note']}")
    print(f"{'TOTAL (achievable)':34s} {'':8s} {'':9s} {'':4s} "
          f"{r['total_ms']:8.3f}  -> {r['roofline_ips']:.0f} img/s/chip "
          f"roofline ({r['gflop_total']:.1f} GF/frame analytic)")
    print(f"{'TOTAL (attainable: +VPU dw, K/128)':34s} {'':8s} {'':9s} "
          f"{'':4s} {r['attainable_ms']:8.3f}  -> "
          f"{r['attainable_ips']:.0f} img/s/chip attainable")


if __name__ == "__main__":
    main()
