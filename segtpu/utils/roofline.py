"""Analytic roofline for the fused inference program (library form).

Walks the MBV2 encoder config + a decoder genotype at a given input
shape and returns, per segment: FLOPs, minimum HBM bytes (each tensor
written once / read once under perfect fusion), the binding resource,
and the achievable time on the target chip. ``scripts/roofline.py`` is
the CLI printer; ``bench.py`` imports :func:`compute_roofline` so the
bench JSON can report analytic FLOPs/frame and ``pct_of_roofline``
instead of XLA's custom-call-blind lower bound (VERDICT r2 weak #4).

Two ceilings are reported (round 4):

* ``roofline_ips`` — the ORIGINAL optimistic model: every FLOP at MXU
  bf16 peak, every byte at HBM peak, perfect fusion. Kept unchanged as
  the round-over-round yardstick (arch0@1024x2048 = 1077 img/s).
* ``attainable_ips`` — adds two hardware terms the optimistic model
  ignores, with no change to the workload: (1) depthwise taps are VPU
  work, charged at PEAK_VPU_F32_TFLOPS (they cannot run on the MXU —
  the dense-diagonal and block-diag im2col reformulations both LOST on
  hardware, docs/DESIGN.md round-3 A/Bs); (2) a dot with contraction
  depth K occupies the full 128-deep systolic pipeline, so its
  effective rate is PEAK * min(1, K/128) — MBV2's narrow expands
  (K=16/24/32) and the 48-channel decoder are architecturally capped.
  The tail is charged in its banded W-first form (the implemented
  kernel), not the dense-matmul form. attainable >= measured would
  mean a kernel beats physics; measured/attainable is the honest
  utilization number.
"""

from __future__ import annotations

from typing import Dict, List

# chip constants: TPU v5e (single core)
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0
#: VPU f32 FMA ceiling: 8x128 lanes x ~8 ALUs... the spec-plausible
#: 1024 lanes x 2 FLOP x ~1.74 GHz = 3.6; empirically
#: scripts/exp_vpu_floor.py measures 1.28 TF/s for VMEM-streaming FMA
#: chains and production fused tap chains reach >=2.6 in situ, so 3.6
#: is kept as the not-exceedable ceiling (attainable stays a ceiling).
PEAK_VPU_F32_TFLOPS = 3.6


def _mxu_eff(k: int) -> float:
    """Effective MXU rate fraction for contraction depth K (a K<128
    dot still occupies the full 128-deep pipeline)."""
    return min(1.0, k / 128.0)


def _segment(name: str, flops_g: float, bytes_mb: float, note: str = "",
             mxu_attain_g_eff: float | None = None,
             vpu_g: float = 0.0,
             attain_bytes_mb: float | None = None) -> Dict:
    """mxu_attain_g_eff: GFLOP already divided by the per-dot K
    efficiency (i.e. equivalent full-rate GFLOP); defaults to flops_g.
    vpu_g: GFLOP of VPU-only work (depthwise taps, elementwise).
    attain_bytes_mb: bytes for the ATTAINABLE bound when the
    implemented kernels move less HBM than the optimistic model's
    accounting (whole-cell fusion — the optimistic bytes stay as-is so
    roofline_ips remains the round-over-round yardstick)."""
    t_flop = flops_g / PEAK_BF16_TFLOPS            # ms (GF / TF/s = ms)
    t_mem = bytes_mb / PEAK_HBM_GBS                # ms (MB / GB/s = ms)
    if mxu_attain_g_eff is None:
        mxu_attain_g_eff = flops_g
    t_mem_att = (bytes_mb if attain_bytes_mb is None
                 else attain_bytes_mb) / PEAK_HBM_GBS
    # max(), not sum: MXU and VPU issue concurrently — the round-4
    # serial-sum combiner put the fused 1/4 cell's "attainable" ABOVE
    # its measured time (2.58 vs 2.27 ms/b8), i.e. the kernel proved
    # the units overlap; a ceiling the hardware beats is not a ceiling
    t_attain = max(t_mem_att, mxu_attain_g_eff / PEAK_BF16_TFLOPS,
                   vpu_g / PEAK_VPU_F32_TFLOPS)
    return {"name": name, "gflop": flops_g, "mb": bytes_mb,
            "bound": "MXU" if t_flop > t_mem else "HBM",
            "achievable_ms": max(t_flop, t_mem),
            "attain_ms": t_attain, "vpu_gflop": vpu_g, "note": note}


def compute_roofline(h: int, w: int, arch: str = "arch0",
                     num_classes: int = 19, agg: int = 48,
                     detail: bool = False) -> Dict:
    """Per-FRAME analytic model. Returns a dict with ``segments`` (list
    of per-segment dicts), ``total_ms``, ``roofline_ips``,
    ``attainable_ips``, and ``gflop_total`` (the analytic FLOPs/frame —
    includes the Pallas custom-call work XLA's cost analysis cannot
    see). With ``detail=True`` also returns ``blocks``: per-encoder-
    block and per-decoder-resolution attainable times, named to match
    the production kernel labels in traces (stem, b0, b1-s2, …,
    cell@1/4), for the measured-vs-attainable floor table."""
    from segtpu.models.encoders import _MBV2_CFG
    from segtpu.models import ARCHS
    from segtpu.ops.layer_factory import OP_NAMES, _CONV_SPECS

    bpe = 2  # bf16
    segs: List[Dict] = []

    # --- front: u8 -> normalized s2d (perm matmuls) ---
    px = h * w
    front_flops = 2 * (h // 2) * ((w * 3) // 384) * 2 * 384 * 768 / 1e9
    front_bytes = (px * 3 * 1 + (px // 4) * 12 * bpe * 2) / 1e6
    segs.append(_segment("front: normalize+s2d (perm mm)", front_flops,
                         front_bytes))   # K=768/384: full MXU depth

    # --- encoder stem ---
    ph, pw_ = h // 2, w // 2
    enc_flops = 2 * ph * pw_ * (2 * 2 * 12) * 32 / 1e9
    enc_bytes = (px // 4 * 12 * bpe + ph * pw_ * 32 * bpe) / 1e6
    segs.append(_segment("encoder stem 2x2x12->32", enc_flops, enc_bytes,
                         mxu_attain_g_eff=enc_flops / _mxu_eff(24)))

    # --- encoder inverted-residual blocks (fused: mid stays in VMEM) ---
    cin = 32
    eh, ew = ph, pw_
    enc_f = enc_b = enc_att = enc_vpu = 0.0
    blocks: List[Dict] = []
    if detail:
        blocks.append({"name": "stem", "attain_ms": segs[-1]["attain_ms"],
                       "gflop": enc_flops, "vpu_gflop": 0.0})
    for bi, (t, c, n, s) in enumerate(_MBV2_CFG):
        for i in range(n):
            stride = s if i == 0 else 1
            mid = cin * t
            oh, ow = eh // stride, ew // stride
            f_exp = 2 * eh * ew * cin * mid / 1e9 if t != 1 else 0.0
            f_dw = 2 * 9 * oh * ow * mid / 1e9            # VPU work
            f_prj = 2 * oh * ow * mid * c / 1e9
            b = (eh * ew * cin + oh * ow * c) * bpe
            enc_f += f_exp + f_dw + f_prj
            enc_b += b / 1e6
            # stride-2 blocks run the expand quadrant-STACKED (K=4*cin)
            k_exp = 4 * cin if (stride == 2 and 4 * cin <= 128) else cin
            att = f_exp / _mxu_eff(k_exp) + f_prj / _mxu_eff(mid)
            enc_att += att
            enc_vpu += f_dw
            if detail:
                t_mem = b / 1e6 / PEAK_HBM_GBS
                blocks.append({
                    "name": f"b{bi}-s{stride}" + (f".{i}" if n > 1 and
                                                  stride == 1 else ""),
                    "attain_ms": max(t_mem, att / PEAK_BF16_TFLOPS,
                                     f_dw / PEAK_VPU_F32_TFLOPS),
                    "gflop": f_exp + f_dw + f_prj, "vpu_gflop": f_dw})
            cin = c
            eh, ew = oh, ow
    segs.append(_segment("encoder inv-res blocks (fused)", enc_f, enc_b,
                         "mid tensors in VMEM; dw on VPU",
                         mxu_attain_g_eff=enc_att, vpu_g=enc_vpu))

    # --- decoder (per-genotype) ---
    genotype = ARCHS[arch]
    cell, conns = genotype
    taps_hw = [(h // 4, w // 4), (h // 8, w // 8), (h // 16, w // 16),
               (h // 32, w // 32)]
    tap_ch = [24, 32, 96, 320]
    dec_f = dec_b = dec_att = dec_vpu = 0.0
    pool_hw = list(taps_hw)
    for (th, tw), c in zip(taps_hw, tap_ch):
        f = 2 * th * tw * c * agg / 1e9
        dec_f += f
        dec_att += f / _mxu_eff(c)
        dec_b += (th * tw * (c + agg)) * bpe / 1e6
    dec_b_att = dec_b   # adapts move the same bytes either way
    if detail:
        t_mem = dec_b / PEAK_HBM_GBS
        blocks.append({"name": "dec-adapts",
                       "attain_ms": max(t_mem,
                                        dec_att / PEAK_BF16_TFLOPS),
                       "gflop": dec_f, "vpu_gflop": 0.0})
    ops_used = [cell[0]] + [o for nd in cell[1:] for o in (nd[2], nd[3])]
    # whole-cell fusion start: last GAP-read entry (models.fast_decoder.
    # _cell_plan) — everything after it runs in ONE kernel, so the
    # ATTAINABLE byte charge is srcs-read + collect-write, not per-op
    # round trips (the stale per-op charge put the fused 1/4 cell's
    # attainable ABOVE its round-4 measured time)
    fuse_start = 0
    if OP_NAMES[cell[0]] == "global_average_pool":
        fuse_start = 1   # gap node0 reads entry 0; suffix from node 0 ok
    for k_, nd in enumerate(cell[1:]):
        p1, p2, o1, o2 = nd
        if OP_NAMES[o1] == "global_average_pool":
            fuse_start = max(fuse_start, p1)
        if OP_NAMES[o2] == "global_average_pool":
            fuse_start = max(fuse_start, p2)
    for bi, (i, j) in enumerate(conns):
        bh = max(pool_hw[i][0], pool_hw[j][0])
        bw = max(pool_hw[i][1], pool_hw[j][1])
        pool_hw.append((bh, bw))
        npx = bh * bw
        # 2 agg 1x1 convs + resize (2-tap lerp) + cell ops
        bf_ = 2 * 2 * npx * agg * agg / 1e9
        batt = bf_ / _mxu_eff(agg)
        bvpu = 0.0
        bb = 4 * npx * agg * bpe / 1e6
        for o in ops_used:
            name = OP_NAMES[o]
            if name in ("skip_connect", "none", "global_average_pool"):
                bb += 2 * npx * agg * bpe / 1e6
                continue
            k, dil, sep = _CONV_SPECS[name]
            if sep:
                f_dw = 2 * k * k * npx * agg / 1e9       # VPU
                f_pw = 2 * npx * agg * agg / 1e9
                bf_ += f_dw + f_pw
                bvpu += f_dw
                batt += f_pw / _mxu_eff(agg)
            else:
                f = 2 * k * k * npx * agg * agg / 1e9
                bf_ += f
                # dy-concat im2col: K = agg * k (dx groups)
                batt += f / _mxu_eff(agg * k)
            bb += 2 * npx * agg * bpe / 1e6
        if bw % 128 == 0 and fuse_start < len(cell):
            # fused: aggs+resize (4) + prefix per-op round trips
            # (node0 = 1 op, nodes 1..start-1 = 2 ops each) + one GAP
            # re-read of its source + suffix srcs reads (start+1) +
            # collect write (1)
            n_prefix_ops = (1 if fuse_start >= 1 else 0) + \
                2 * max(fuse_start - 1, 0)
            units = 4 + 2 * n_prefix_ops + \
                (1 if fuse_start else 0) + (fuse_start + 1) + 1
            bb_att = units * npx * agg * bpe / 1e6
        else:
            bb_att = bb
        dec_f += bf_
        dec_att += batt
        dec_vpu += bvpu
        dec_b += bb
        dec_b_att += bb_att
        if detail:
            t_mem = bb_att / PEAK_HBM_GBS
            blocks.append({"name": f"cell@1/{h // bh}",
                           "attain_ms": max(t_mem,
                                            batt / PEAK_BF16_TFLOPS,
                                            bvpu / PEAK_VPU_F32_TFLOPS),
                           "gflop": bf_, "vpu_gflop": bvpu})
    # head: concat collect + classifier at stride-4
    npx = (h // 4) * (w // 4)
    f = 2 * npx * 2 * agg * num_classes / 1e9
    hd_b = (npx * 2 * agg * bpe + npx * num_classes * bpe) / 1e6
    dec_f += f
    dec_att += f / _mxu_eff(2 * agg)
    dec_b += hd_b
    dec_b_att += hd_b
    if detail:
        blocks.append({"name": "clf", "gflop": f, "vpu_gflop": 0.0,
                       "attain_ms": max(hd_b / PEAK_HBM_GBS,
                                        f / _mxu_eff(2 * agg)
                                        / PEAK_BF16_TFLOPS)})
    segs.append(_segment(f"decoder ({arch}, {agg}ch cells)", dec_f, dec_b,
                         "per-op HBM round trips; sep dw on VPU; "
                         "attain bytes = whole-cell-fused traffic",
                         mxu_attain_g_eff=dec_att, vpu_g=dec_vpu,
                         attain_bytes_mb=dec_b_att))

    # --- tail: upsample+argmax ---
    qh, qw = h // 4, w // 4
    # optimistic model: dense two-matmul form (kept for roofline_ips
    # continuity with rounds 2-3)
    tail_f = num_classes * (2 * h * qh * qw + 2 * h * w * qw) / 1e9
    tail_b = (qh * qw * num_classes * bpe + h * w) / 1e6
    # attainable: the implemented banded W-first form — W-interp as
    # K=72 chunk dots (redundancy ~36x over the 2-tap truth), H-interp
    # as a 2-tap VPU FMA per output px, argmax compare ~1 VPU op
    tail_att = num_classes * 2 * qh * w * 72 / 1e9
    tail_vpu = num_classes * (2 * 2 + 1) * h * w / 1e9
    segs.append(_segment("tail: upsample+argmax", tail_f, tail_b,
                         "roofline: dense mm; attainable: banded W-first",
                         mxu_attain_g_eff=tail_att, vpu_g=tail_vpu))

    if detail:
        blocks.insert(0, {"name": "front",
                          "attain_ms": segs[0]["attain_ms"],
                          "gflop": segs[0]["gflop"], "vpu_gflop": 0.0})
        blocks.append({"name": "tail",
                       "attain_ms": segs[-1]["attain_ms"],
                       "gflop": segs[-1]["gflop"],
                       "vpu_gflop": segs[-1]["vpu_gflop"]})

    total = sum(s["achievable_ms"] for s in segs)
    total_att = sum(s["attain_ms"] for s in segs)
    return {"segments": segs, "total_ms": total,
            "roofline_ips": 1e3 / total,
            "attainable_ms": total_att,
            "attainable_ips": 1e3 / total_att,
            "gflop_total": sum(s["gflop"] for s in segs),
            "blocks": blocks,      # per-kernel rows; empty w/o detail
            "peak_bf16_tflops": PEAK_BF16_TFLOPS,
            "peak_hbm_gbs": PEAK_HBM_GBS,
            "peak_vpu_f32_tflops": PEAK_VPU_F32_TFLOPS}
