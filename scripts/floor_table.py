"""Per-kernel measured-vs-attainable floor table (VERDICT r4 next#3).

Joins a `scripts/trace_infer.py` per-op device trace against the
measured-hardware-term attainable model (`segtpu.utils.roofline`,
detail=True) and prints the markdown floor table for docs/DESIGN.md:
every trace op is attributed to a model block, rows reconcile to the
trace's total dispatch time (an `unattributed` row keeps the join
honest), and each row carries measured/attainable utilization.

The op->block attribution is an explicit table (kernel names are
stable across traces of the same program: inv_res_chw.N enumerates
encoder blocks in graph order, infer.N are the whole-cell fused
decoder cells in resolution order). When the program changes, re-run
`scripts/trace_infer.py` and update MAP below — the reconciliation
assert catches silent drift.

Usage: python scripts/floor_table.py /tmp/trace_r5.txt [--hw 1024x2048]
"""

import argparse
import re
import sys

sys.path.insert(0, ".")

# trace op name -> attainable-model block (arch0 @ 1024x2048 b8 program,
# round-5 trace). Aux XLA ops ride with the block that owns them:
#   fusion{,.2,.4,.6}  b1-s2 quadrant-deinterleave perm dots (Mosaic
#                      cannot lower strided vector slices - DESIGN r2)
#   copy.882/.883      stem->b0 half-plane handoff copies
#   convert_reduce_fusion[.1]  GAP vector pre-reduce (cell op 4)
#   resize_chw/fusion.8        agg-tap resize into the cell's input
MAP = {
    "normalize_s2d_front.1": "front",
    "conv_chw.4": "stem",
    "copy.882": "stem", "copy.883": "stem",
    "inv_res_chw.8": "b0-s1",
    "inv_res_s2_chw.4": "b1-s2",
    "fusion": "b1-s2", "fusion.2": "b1-s2", "fusion.4": "b1-s2",
    "fusion.6": "b1-s2",
    "inv_res_chw.9": "b1-s1.1",
    "inv_res_s2_chw.5": "b2-s2", "fusion.9": "b2-s2",
    "fusion.11": "b2-s2", "fusion.13": "b2-s2", "fusion.15": "b2-s2",
    "inv_res_chw.10": "b2-s1", "inv_res_chw.11": "b2-s1",
    "inv_res_s2_chw.6": "b3-s2", "copy.885": "b3-s2",
    "inv_res_chw.16": "b3-s1", "inv_res_chw.17": "b3-s1",
    "inv_res_chw.18": "b3-s1",
    "inv_res_chw.12": "b4-s1", "inv_res_chw.13": "b4-s1",
    "inv_res_chw.14": "b4-s1",
    "inv_res_s2_chw.7": "b5-s2",
    "inv_res_chw.19": "b5-s1", "inv_res_chw.20": "b5-s1",
    "inv_res_chw.15": "b6-s1",
    # post-lazy-tap-fusion adapt remnants: the non-lazy (multi-consumer/
    # collected) agg pointwises + the pw_chain kernel + the einsum-path
    # chain at the small 1/8 resize (fast_decoder.py:135)
    "conv_chw.6": "dec-adapts", "infer.9": "dec-adapts",
    "fusion.8": "dec-adapts",
    "infer.8": "cell@1/16",
    "infer.10": "cell@1/8", "sep_conv_chw.4": "cell@1/8",
    "reshape.234": "cell@1/8",
    "convert_reduce_fusion.1": "cell@1/8",
    "infer.11": "cell@1/4", "sep_conv_chw.5": "cell@1/4",
    "resize_chw_pallas.1": "cell@1/4",
    "convert_reduce_fusion": "cell@1/4",
    "conv_chw.7": "clf",
    "upsample_argmax.1": "tail",
}

# model rows collapsed for readability (sub-rows share one floor story)
COLLAPSE = {
    "b2-s1.1": "b2-s1", "b2-s1.2": "b2-s1",
    "b3-s1.1": "b3-s1", "b3-s1.2": "b3-s1", "b3-s1.3": "b3-s1",
    "b4-s1.0": "b4-s1", "b4-s1.1": "b4-s1", "b4-s1.2": "b4-s1",
    "b5-s1.1": "b5-s1", "b5-s1.2": "b5-s1",
}

ORDER = ["front", "stem", "b0-s1", "b1-s2", "b1-s1.1", "b2-s2", "b2-s1",
         "b3-s2", "b3-s1", "b4-s1", "b5-s2", "b5-s1", "b6-s1",
         "dec-adapts", "cell@1/16", "cell@1/8", "cell@1/4", "clf",
         "tail"]


def parse_trace(path):
    ops = {}
    total = None
    pat = re.compile(r"^\s*([\d.]+) ms/dispatch x\s+\d+\s+(\S+)")
    for line in open(path):
        m = pat.match(line)
        if not m:
            continue
        ms, name = float(m.group(1)), m.group(2)
        if name.startswith("jit_infer"):
            total = ms
            continue
        ops[name] = ms
    return total, ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--hw", default="1024x2048")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))

    from segtpu.utils.roofline import compute_roofline
    detail = compute_roofline(h, w, detail=True)
    attain = {}
    for b in detail["blocks"]:
        name = COLLAPSE.get(b["name"], b["name"])
        attain[name] = attain.get(name, 0.0) + b["attain_ms"] * args.batch

    total, ops = parse_trace(args.trace)
    measured = {}
    unattributed = 0.0
    for name, ms in ops.items():
        blk = MAP.get(name)
        if blk is None:
            unattributed += ms
        else:
            measured[blk] = measured.get(blk, 0.0) + ms

    print(f"| block | measured ms/b{args.batch} | attainable | util % |")
    print("|---|---|---|---|")
    msum = 0.0
    for blk in ORDER:
        m = measured.get(blk, 0.0)
        a = attain.get(blk, 0.0)
        msum += m
        util = f"{100 * a / m:.0f}" if m else "-"
        print(f"| {blk} | {m:.3f} | {a:.3f} | {util} |")
    gap = total - msum - unattributed
    print(f"| unattributed trace ops | {unattributed:.3f} | — | — |")
    print(f"| dispatch residue (total − Σops) | {gap:.3f} | — | — |")
    print(f"| **total** | **{total:.3f}** | "
          f"**{sum(attain.values()):.3f}** | "
          f"**{100 * sum(attain.values()) / total:.0f}** |")
    # reconciliation: every row must be a real trace op; the residue is
    # inter-op gaps inside the dispatch, not lost attribution
    assert unattributed <= 0.15 * total, (unattributed, total)


if __name__ == "__main__":
    main()
