"""EXPERIMENTAL: MobileNet-v2 in CHW on the fused Pallas block.

Eval-only twin of encoders.mbv2_apply: BN folded at trace time, every
stride-1 inverted residual runs as ONE Pallas kernel
(kernels.chw_ops.inv_res_chw — expand+dw+project+residual in a single
HBM round-trip), stride-2 blocks and the stem stay XLA convs expressed
directly in NCHW dimension numbers. Taps come out channel-first, feeding
models.fast_decoder without transposes.

STATUS — measured SLOWER than the XLA NHWC encoder on v5e (4.0 vs 2.3
ms/frame at 8×1024×2048): unlike the 48-channel decoder, MobileNet's
channel counts don't suffer lane padding, and XLA's conv pipeline beats
these kernels' tile scheduling. The engine therefore uses the XLA
encoder; this module is kept (tested for exact parity) as the starting
point for future tile-size/pipeline tuning.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from jax import lax

from segtpu.kernels.chw_ops import fold_bn, inv_res_chw
from segtpu.models.encoders import _MBV2_CFG, _TAP_STAGES, stem_s2d_kernel


def _fold(p, s):
    return fold_bn(p["w"], p["scale"], p["bias"], s["mean"], s["var"])


def _conv_nchw(x, w_hwio, stride=1, groups=1):
    return lax.conv_general_dilated(
        x, jnp.transpose(w_hwio, (3, 2, 0, 1)).astype(x.dtype),
        (stride, stride),
        ((1, 1), (1, 1)) if w_hwio.shape[0] == 3 else "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups)


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def fast_mbv2_apply(params, stats, x, *, input_format: str = "nhwc3",
                    interpret: bool = False) -> List[jnp.ndarray]:
    """Eval forward -> 4 CHW taps [B, C, H/s, W/s] (s = 4/8/16/32).

    x: [B, H, W, 3] normalized (or [B, H/2, W/2, 12] with
    input_format='s2d12' — the space-to-depth fast stem).
    """
    # stem (XLA): s2d-folded 2x2 or plain 3x3/s2, then to CHW once
    wf, bf = _fold(params["stem"], stats["stem"])
    if input_format == "s2d12":
        w2 = stem_s2d_kernel(wf)
        y = lax.conv_general_dilated(
            x, w2.astype(x.dtype), (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        y = lax.conv_general_dilated(
            x, wf.astype(x.dtype), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = _relu6(y + bf.astype(y.dtype))
    y = jnp.transpose(y, (0, 3, 1, 2))  # -> CHW for the block stack

    taps = []
    bi = 0
    cin = 32
    for stage, (t, c, n, s) in enumerate(_MBV2_CFG):
        for i in range(n):
            stride = s if i == 0 else 1
            residual = stride == 1 and cin == c
            p, st = params["blocks"][bi], stats["blocks"][bi]
            has_exp = "expand" in p
            if stride == 1:
                we, be = _fold(p["expand"], st["expand"]) if has_exp \
                    else (None, None)
                wd, bd = _fold(p["dw"], st["dw"])
                wp, bp = _fold(p["project"], st["project"])
                y = inv_res_chw(y, we, be, wd, bd, wp, bp,
                                residual=residual, interpret=interpret)
            else:  # stride-2 blocks: XLA NCHW convs (4 of 17 blocks)
                z = y
                if has_exp:
                    we, be = _fold(p["expand"], st["expand"])
                    z = _relu6(_conv_nchw(z, we) +
                               be.astype(z.dtype)[:, None, None])
                wd, bd = _fold(p["dw"], st["dw"])
                z = _relu6(_conv_nchw(z, wd, stride=2, groups=z.shape[1]) +
                           bd.astype(z.dtype)[:, None, None])
                wp, bp = _fold(p["project"], st["project"])
                y = _conv_nchw(z, wp) + bp.astype(z.dtype)[:, None, None]
            cin = c
            bi += 1
        if stage in _TAP_STAGES:
            taps.append(y)
    return taps


def _halo_exchange(x, axis_name: str, up: int, dn: int):
    """Extend a spatially-H-sharded CHW tensor with neighbour rows over
    the mesh axis ``axis_name``: ``up`` rows from the shard above
    (previous H rows) and ``dn`` rows from the shard below. Mesh-end
    shards receive zeros from the incomplete ppermute — exactly the
    SAME-padding zeros the unsharded conv would use, so overlap-discard
    around each conv kernel is bit-exact (SURVEY.md §5.7: spatial
    partitioning, the CV analogue of context parallelism)."""
    n = jax.lax.axis_size(axis_name)
    parts = []
    if up:
        parts.append(jax.lax.ppermute(
            x[..., -up:, :], axis_name, [(i, i + 1) for i in range(n - 1)]))
    parts.append(x)
    if dn:
        parts.append(jax.lax.ppermute(
            x[..., :dn, :], axis_name, [(i + 1, i) for i in range(n - 1)]))
    return jnp.concatenate(parts, axis=-2) if len(parts) > 1 else x


def mbv2_chw_apply(params, stats, x12, *, interpret: bool = False,
                   spatial_axis: str = None) -> List[jnp.ndarray]:
    """Full-CHW MobileNet-v2 eval forward — every block a Pallas kernel.

    x12: [B, 12, H/2, W/2] CHW space-to-depth planes of the normalized
    image (engine._normalize_s2d_chw). Returns 4 CHW taps. Unlike
    fast_mbv2_apply (the round-1 experiment), no tensor ever takes an
    XLA NHWC layout: stride-1 blocks run kernels.inv_res_chw, stride-2
    blocks kernels.inv_res_s2_chw (quadrant-plane taps), and the stem is
    the s2d-folded 2x2 conv as a CHW Pallas conv. Rationale: the XLA
    NHWC encoder's activations at C < 128 tile as (N, C->128-padded)
    lanes — up to 10.7x HBM inflation at the early stages (profiled:
    stem+block0 alone ~8.4 ms of a 29 ms batch-8 1024x2048 dispatch).
    """
    from segtpu.kernels.chw_ops import conv_chw, inv_res_chw, inv_res_s2_chw

    sh = spatial_axis is not None   # H-sharded SPMD mode (overlap-discard)

    wf, bf = _fold(params["stem"], stats["stem"])
    w2 = stem_s2d_kernel(wf)   # 2x2/s1 over the s2d grid, pad (1,0)(1,0)
    if sh:
        # k=2 taps are dy in {-1, 0}: one true halo row above replaces
        # the kernel's zero pad; its own (wrong-zero-padded) top output
        # row is discarded
        x12 = _halo_exchange(x12, spatial_axis, 1, 0)
        y = conv_chw(x12, w2, bf, k=2, relu="relu6",
                     interpret=interpret)[:, :, 1:]
    else:
        y = conv_chw(x12, w2, bf, k=2, relu="relu6", interpret=interpret)

    # flatten the (stage, i) loop to know each block's successor: a
    # stride-1 block whose output feeds a stride-2 block AND is not a
    # decoder tap emits row-parity planes straight from its kernel
    # (inv_res_chw row_split) — the following inv_res_s2_chw then skips
    # the strided row gather of the quadrant split
    flat = []
    for stage, (t, c, n, s) in enumerate(_MBV2_CFG):
        for i in range(n):
            flat.append((stage, s if i == 0 else 1, c,
                         stage in _TAP_STAGES and i == n - 1))
    taps = []
    cin = 32
    pair_hw = None   # (H/2, W) when y is a flat row-split pair
    for bi, (stage, stride, c, is_tap) in enumerate(flat):
        residual = stride == 1 and cin == c
        p, st = params["blocks"][bi], stats["blocks"][bi]
        we, be = (_fold(p["expand"], st["expand"])
                  if "expand" in p else (None, None))
        wd, bd = _fold(p["dw"], st["dw"])
        wp, bp = _fold(p["project"], st["project"])
        if sh:
            # overlap-discard: extend with true neighbour rows, run the
            # unmodified kernel, drop the edge rows it computed with
            # wrong-zero padding. 3x3/s1 needs 1 row each side; 3x3/s2
            # reads rows 2i-1..2i+1, so 2 rows above (keeping local H
            # even for the quadrant split) and the top output row off.
            # row_split handoffs are disabled — parity planes don't
            # survive the odd-offset crop.
            if stride == 1:
                y = inv_res_chw(_halo_exchange(y, spatial_axis, 1, 1),
                                we, be, wd, bd, wp, bp, residual=residual,
                                interpret=interpret)[:, :, 1:-1]
            else:
                y = inv_res_s2_chw(_halo_exchange(y, spatial_axis, 2, 0),
                                   we, be, wd, bd, wp, bp,
                                   interpret=interpret)[:, :, 1:]
            if is_tap:
                taps.append(y)
        elif stride == 1:
            next_s2 = bi + 1 < len(flat) and flat[bi + 1][1] == 2
            split = next_s2 and y.shape[-2] % 2 == 0
            if split and is_tap:
                # tap AND stride-2 feed: one kernel, two outputs (the
                # extra sequential write beats a read + strided gather)
                hw2 = (y.shape[-2] // 2, y.shape[-1])
                y, tap = inv_res_chw(y, we, be, wd, bd, wp, bp,
                                     residual=residual, row_split="dual",
                                     interpret=interpret)
                taps.append(tap)
                pair_hw = hw2
            elif split:
                hw2 = (y.shape[-2] // 2, y.shape[-1])
                y = inv_res_chw(y, we, be, wd, bd, wp, bp,
                                residual=residual, row_split=True,
                                interpret=interpret)
                pair_hw = hw2
            else:
                y = inv_res_chw(y, we, be, wd, bd, wp, bp,
                                residual=residual, interpret=interpret)
                if is_tap:
                    taps.append(y)
        else:
            y = inv_res_s2_chw(y, we, be, wd, bd, wp, bp,
                               pair_hw=pair_hw, interpret=interpret)
            pair_hw = None
            if is_tap:
                taps.append(y)
        cin = c
    return taps
