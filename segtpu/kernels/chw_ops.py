"""Pallas decoder ops in flat-pixel CHW layout: conv/dw/sep + folded BN.

Why: the decoder runs every op at 48 channels. In the default NHWC
layout XLA pads the channel (lane) dim 48 -> 128, wasting ~2.7x of both
bandwidth and compute lanes — measured: a 48ch conv1x1 at 8×256×512 runs
at 2.4 TFLOP/s (sub-2% of its lane-adjusted MXU ceiling). These kernels
use the layout [C, P] with P = H·W flattened pixels:

  * channels sit in sublanes (exactly C of them, no 128-padding),
    pixels in lanes (H·W-wide — always fully occupied);
  * a spatial tap (dy, dx) is a STATIC lane shift by dy*W + dx of the
    [C, 3·TILE] halo-stacked tile, with an iota-derived validity mask
    reproducing SAME zero-padding (rows via p//W, cols via p%W);
  * channel mixing is a plain 2D [Cout, Cin] x [Cin, TILE] MXU matmul —
    the Mosaic-canonical form (3D dots / shape-collapses don't lower);
  * BN (eval) is pre-folded into weights, ReLU applied in-register;
  * sep conv fuses dw + pw in ONE kernel: the depthwise intermediate
    never touches HBM.

Row-tiles take their halo from the neighbouring blocks (three clamped
views of x), so dilations 3/6/12 need no DMA plumbing. Eval/inference
fast path only (segtpu.models.fast_decoder); training and CPU keep the
NHWC reference implementation.
"""

from __future__ import annotations

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Tuning knobs, read ONCE at import time. Their values are baked into
# jitted programs at trace time — changing the env after first import
# (or first compile) has no effect on already-traced functions.
#: Target px/tile for conv/sep/pair row tiles. 32768 (not the round-2
#: 4096): large-dilation ops (sep5x5 dil6: 12 halo rows) found no thin
#: halo DIVISOR at 16-row tiles and fell back to FULL-TILE halo views —
#: 3x read traffic. 64-row tiles take a 16-row halo (1.5x) and cut the
#: b8 1024x2048 dispatch 15.30 -> 14.56 ms on v5e (sep_dil6 0.76 ->
#: 0.62, stem 0.80 -> 0.66); 131072 overflows the pair kernel's 100 MB
#: VMEM scope at 48ch (compile error, recorded). Read ONCE at import.
_TILE_PX = int(os.environ.get("SEGTPU_TILE_PX", "32768"))
_INVRES_BUDGET = float(os.environ.get("SEGTPU_INVRES_BUDGET", "6e6"))
#: Stride-2 column deinterleave INSIDE the s2 kernel (round 5): the
#: exact-bf16 MXU permutation dots move from standalone XLA einsums
#: into the kernel's tile entry. Bit-exact either way (0/1 matmul, f32
#: accum, one nonzero per output; forced-both-paths parity test).
#: MEASURED NEGATIVE on v5e (1024x2048 b8 traces): dispatch 12.800 ->
#: 13.051 ms - the standalone einsums cost 0.38 ms of op time but the
#: in-kernel dots cost ~0.63 (b1-s2 kernel 0.825 -> 1.055, b2-s2 0.335
#: -> 0.438): the perm dot SERIALIZES with the kernel's expand->dw->
#: project chain (separate XLA ops pipeline against neighbouring
#: kernels) and every tile re-perms its halo rows. Same loss shape as
#: the round-4 im2col-in-cell. Default OFF; knob kept for re-measure.
_S2_INKERNEL_PERM = os.environ.get("SEGTPU_S2_INKERNEL_PERM", "0") == "1"
#: Depthwise tap loops accumulate in the input's NATIVE dtype (bf16 in
#: production) instead of f32 when 1. A/B knob — see _dw_tap_sum.
#: MEASURED NEGATIVE on v5e (round 4, 1024x2048 b8 traces): 13.33 ->
#: 19.85 ms/dispatch — every dw kernel ~doubled (invres.9 0.89->1.58,
#: sep.11 0.64->1.33, pair.11 0.74->1.39). Mosaic lowers bf16 VPU
#: adds/muls through f32 with per-op converts, so "half the data" buys
#: nothing and the converts dominate. Default stays f32 stacks (one
#: convert at stack build, exact accumulation, XLA-dw parity).
_DW_NATIVE = os.environ.get("SEGTPU_DW_NATIVE", "0") == "1"
#: Max c*taps for the dense-conv dx-group im2col path (stacked tap
#: slices raise the MXU dot's K from C to taps_in_group*C). Round-4 A/B
#: on v5e: 512 (engaging the 48-ch 3x3 convs, K=48 -> 144 per dx group)
#: cut the conv3x3_dil3+sep3x3 pair kernel 0.957 -> 0.713 ms/b8-dispatch
#: at 1024x2048 with every other kernel flat; 256 (the round-3 gate)
#: left those convs on 9 separate K=48 dots.
_IM2COL_MAX = int(os.environ.get("SEGTPU_IM2COL_MAX", "512"))

#: im2col for fused-cell node-sourced dense convs via the
#: shift-the-dot-output form (_conv_body "shift_out"): one dot on the
#: UNSHIFTED dy-concat (offset-0 pieces lower on fused value chains)
#: with the dx shift applied to the f32 dot output. Default OFF — a
#: negative result on v5e: 566.5 -> 540.2 img/s (per-dx-group dots) and
#: 538.4 (single [C_out*n_dx, C*n_dy] dot) at the 1024x2048 headline;
#: the [3C, tile] dy-concat materialization costs more than the saved
#: MXU passes, so the per-tap K=48 dense dot loop stands (same shape of
#: loss as round-3's block-diag dw im2col). Kept as the lowering-proven
#: A/B path: it is the ONLY known im2col form Mosaic accepts on fused
#: value chains (slice windows and scratch spills hit offset-mismatch;
#: pltpu.roll has no bf16 lowering).
_CELL_ROLL_IM2COL = os.environ.get("SEGTPU_CELL_ROLL_IM2COL", "0") == "1"


def _round_up(x, m):
    return -(-x // m) * m


def _dw_dtype(native_dtype):
    """Depthwise tap-loop compute dtype: f32 by default (one convert at
    stack build, exact accumulation); the input's native dtype under
    SEGTPU_DW_NATIVE=1 — halves the tap loop's VPU data movement at the
    cost of bf16 accumulation across the k*k taps (A/B knob; the XLA dw
    path accumulates f32, so 0 stays the parity default)."""
    return native_dtype if _DW_NATIVE else jnp.float32


def fold_bn(w, scale, bias, mean, var, eps: float = 1e-5):
    """conv weight HWIO + BN -> (w_folded HWIO, bias_folded)."""
    inv = scale * jax.lax.rsqrt(jnp.asarray(var, jnp.float32) + eps)
    return w * inv, bias - mean * inv


def _taps(k: int, dilation: int, h: int, w: int):
    """(tap index, dy, dx) triples; taps that can never touch the image
    (|dy| >= h or |dx| >= w — possible for dil 12 on tiny maps) are
    dropped at trace time: they contribute only SAME-padding zeros, and
    dropping them also keeps every halo slice in-bounds."""
    half = k // 2
    out = []
    for ky in range(k):
        for kx in range(k):
            dy, dx = dilation * (ky - half), dilation * (kx - half)
            if abs(dy) < h and abs(dx) < w:
                out.append((ky * k + kx, dy, dx))
    return out


def _masked_stack(xm_ref, x0_ref, xp_ref, row0, tile_p: int, w: int,
                  h: int, halo_px: int, center_valid: bool,
                  dtype=jnp.float32):
    """Halo-stack [tail of prev | center | head of next], zero
    out-of-image rows, and convert to `dtype` — each ONCE. (Round 1
    kept the stack bf16 and cast per tap; at 25 taps the per-tap
    converts dominated the dw loop — so depthwise paths take f32 here.
    Dense-dot paths keep the NATIVE dtype instead: bf16 dot operands
    with f32 accumulation run the MXU at full rate — f32 operands
    quarter it — and match the XLA conv path's numerics exactly.)

    xm_ref/xp_ref are THIN halo-row views holding exactly halo_px lanes
    (round 2 passed full neighbour tiles: every grid step then DMA'd
    3 tiles, tripling read traffic — the reason every kernel sat at
    ~2.5x its HBM floor in the round-2 trace).

    center_valid: with divisor row-tiles (hp == h) the center tile's
    rows are always in-image, so only the two halo_px-wide slices need
    the row-validity `where` — a full-window mask pass costs ~tile/halo
    times more VPU movement than the halo-only masks."""
    head = xm_ref[0].astype(dtype)
    tail = xp_ref[0].astype(dtype)
    ph = jax.lax.broadcasted_iota(jnp.int32, (1, halo_px), 1)
    head = jnp.where(row0 - (halo_px // w) + ph // w >= 0, head,
                     jnp.zeros_like(head))
    tail = jnp.where(row0 + (tile_p // w) + ph // w < h, tail,
                     jnp.zeros_like(tail))
    center = x0_ref[0].astype(dtype)
    if not center_valid:  # _flatten padded rows: mask the center too
        pc = jax.lax.broadcasted_iota(jnp.int32, (1, tile_p), 1)
        center = jnp.where(row0 + pc // w < h, center,
                           jnp.zeros_like(center))
    return jnp.concatenate([head, center, tail], axis=1)


def _halo_rows(rows: int, w: int, needed: int) -> int:
    """Rows of neighbour-tile halo to DMA per grid step: the smallest
    divisor of `rows` that covers `needed` halo rows with a
    128-divisible lane count. Falls back to the full tile (`rows`) —
    the round-2 behavior — when no thinner divisor qualifies."""
    for d in range(min(needed, rows), rows):
        if rows % d == 0 and (d * w) % 128 == 0:
            return d
    return rows


def _dw_tap_sum(stack_masked, taps, combine, tile_p: int, w: int,
                halo_px: int):
    """Σ over taps of combine(j, shifted-input), computed dx-major.

    A tap slice at offset dy*w + dx is a lane-MISALIGNED relayout (dx is
    1..12 lanes) — the dominant VPU cost of the dw loop at 25 taps.
    Shifting (and column-masking) once per distinct dx and letting each
    tap take a dy*w sub-slice makes the per-tap slice lane-block-aligned
    whenever w % 128 == 0 (all CityScapes/VOC decoder widths): k*k
    misaligned relayouts + masks become k. Only one window is live at a
    time (VMEM: window is ~(1 + 2*halo_rows/rows) x tile).

    stack_masked is [C, halo_px + tile_p + halo_px] (_masked_stack);
    halo_px must be >= dmax|dy|*w + dmax|dx|."""
    dmax_w = max((abs(dy) for _, dy, _ in taps), default=0) * w
    width = tile_p + 2 * dmax_w
    p = jax.lax.broadcasted_iota(jnp.int32, (1, tile_p), 1)
    acc = None
    for dx in sorted({t[2] for t in taps}):
        start = halo_px + dx - dmax_w
        win = jax.lax.slice_in_dim(stack_masked, start, start + width,
                                   axis=1)
        part = None
        for j, dy, dx_t in taps:
            if dx_t != dx:
                continue
            base = dmax_w + dy * w
            xs = win[:, base:base + tile_p]
            term = combine(j, xs)
            part = term if part is None else part + term
        if dx != 0:
            # column validity depends on (pixel, dx) only — never dy
            # (dy*w shifts preserve the column) — so ONE tile-sized mask
            # multiply on the dy-summed partial replaces masking the
            # (tile + 2*dmax|dy|*w)-wide window, which at dilation 12
            # is 2.5x the tile
            colv = ((p % w) + dx >= 0) & ((p % w) + dx < w)
            part = part * colv.astype(part.dtype)
        acc = part if acc is None else acc + part
    return acc


def _act(y, relu):
    """relu: True -> ReLU, 'relu6' -> ReLU6, False -> identity."""
    if relu == "relu6":
        return jnp.clip(y, 0.0, 6.0)
    return jnp.maximum(y, 0.0) if relu else y


def _pw_kernel(wm_ref, b_ref, *refs, relu, has_acc: bool,
               has_vec: bool = False, rows_w=None):
    """1x1 conv: no halo, no masks — one MXU dot per tile. With has_acc
    the last input is summed into the (post-activation) result — fusing
    the cell-node branch add saves one HBM round-trip per node. has_vec
    adds a per-(batch, channel) [C, 1] vector instead (a GAP branch
    partner — the broadcast never materializes).

    rows_w=(rows, w): store the tile as a 4-D (C, rows, w) block — an
    in-register lane->sublane retile Mosaic lowers fine (measured ~free
    in-kernel on v5e), replacing the 0.29 ms/b8 XLA (C,px)->(h,w) copy
    the 4-D banded tail otherwise forces after the classifier.

    Dot operands keep their NATIVE dtype (bf16 in production) with f32
    accumulation — f32 operands quarter the MXU rate; bf16-in/f32-accum
    is exactly the XLA conv path's numerics."""
    x_ref, out_ref = refs[0], refs[-1]
    y = jax.lax.dot_general(
        wm_ref[0], x_ref[0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = _act(y + b_ref[:].astype(jnp.float32), relu)
    extra = 1
    if has_acc:
        y = y + refs[extra][0].astype(jnp.float32)
        extra += 1
    if has_vec:
        y = y + refs[extra][0].astype(jnp.float32)   # [C, 1] broadcast
    if rows_w is not None:
        out_ref[0] = y.reshape(y.shape[0], *rows_w).astype(out_ref.dtype)
    else:
        out_ref[0] = y.astype(out_ref.dtype)


def _pw_multi_kernel(b_ref, *refs, n_src: int, relu, rows_w=None):
    """Multi-source 1x1 conv: out = act(Σ_i w_i @ x_i + b). The decoder
    head's `concat(collect) -> classifier` is algebraically this with
    the clf weight split at the source channel boundaries — computing
    it directly skips the XLA concat's HBM materialization of the
    [B, 2*agg, H, W] feats tensor (write + read ≈ 50 MB/frame at the
    arch0 1024x2048 headline) that a custom-call consumer cannot alias
    away. f32 accumulation; association differs from the single K=96
    dot by one partial-sum split (bf16 output rounding unchanged in
    spirit — parity tests stay allclose; sharded and single-device
    paths both route here so they stay bit-equal to each other)."""
    wms = refs[:n_src]
    xs = refs[n_src:2 * n_src]
    out_ref = refs[-1]
    y = jax.lax.dot_general(
        wms[0][0], xs[0][0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    for i in range(1, n_src):
        y = y + jax.lax.dot_general(
            wms[i][0], xs[i][0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = _act(y + b_ref[:].astype(jnp.float32), relu)
    if rows_w is not None:
        out_ref[0] = y.reshape(y.shape[0], *rows_w).astype(out_ref.dtype)
    else:
        out_ref[0] = y.astype(out_ref.dtype)


def pw_multi_chw(xs, w_foldeds, bias, *, relu: bool = False,
                 flat_out: bool = False, out_4d: bool = False,
                 interpret: bool = False):
    """Concat-free multi-source pointwise conv (see _pw_multi_kernel):
    xs[i] [B, C_i, H, W] + w_foldeds[i] HWIO [1, 1, C_i, Cout] ->
    [B, Cout, H, W] (or flat / 4-D-stored like conv_chw's k=1 path).
    Equivalent to conv_chw(concatenate(xs, 1), concat(w, 2), bias)."""
    b, _, h, w = xs[0].shape
    assert all(x.shape[0] == b and x.shape[2:] == (h, w) for x in xs)
    c_out = w_foldeds[0].shape[3]
    wms = [jnp.transpose(wf, (0, 1, 3, 2)).reshape(
               1, c_out, wf.shape[2]).astype(xs[0].dtype)
           for wf in w_foldeds]
    rows = _pick_rows(h, w, 1, 1)
    flats = [_flatten(x, rows) for x in xs]
    hp = flats[0][1]
    xfs = [f[0] for f in flats]
    tile_p = rows * w
    n_tiles = hp * w // tile_p
    out_4d = out_4d and w % 128 == 0
    if out_4d:
        out_shape = jax.ShapeDtypeStruct((b, c_out, hp, w), xs[0].dtype)
        out_spec = pl.BlockSpec((1, c_out, rows, w),
                                lambda bi, i: (bi, 0, i, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((b, c_out, hp * w), xs[0].dtype)
        out_spec = pl.BlockSpec((1, c_out, tile_p),
                                lambda bi, i: (bi, 0, i),
                                memory_space=pltpu.VMEM)
    x_specs = [pl.BlockSpec((1, x.shape[1], tile_p),
                            lambda bi, i: (bi, 0, i),
                            memory_space=pltpu.VMEM) for x in xs]
    out = pl.pallas_call(
        functools.partial(_pw_multi_kernel, n_src=len(xs), relu=relu,
                          rows_w=(rows, w) if out_4d else None),
        out_shape=out_shape,
        grid=(b, n_tiles),
        in_specs=[_full_spec((c_out, 1)),
                  *[_full_spec(wm.shape) for wm in wms],
                  *x_specs],
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(bias.reshape(c_out, 1), *wms, *xfs)
    if out_4d:
        return out[:, :, :h]
    return (out[:, :, :h * w] if flat_out else
            out.reshape(b, c_out, hp, w)[:, :, :h])


def _pw_chain_kernel(*refs, n_stage: int, relu, rows_w=None):
    """Chained 1x1 convs in ONE kernel: y = actN(wN @ ... act1(w1 @ x
    + b1) ... + bN). The decoder's adapt -> aggregate pointwise pair
    (reference: AggregateCell's per-branch 1x1 after MicroDecoder's
    per-tap adapt, SURVEY.md §3.5) otherwise hands a full [B, 48, H, W]
    intermediate through HBM (write + read = 25 MB/frame at the arch0
    1/4-res block) purely to feed the next 1x1.

    BIT-EXACT vs the unfused pair: each stage casts its f32 result to
    the output dtype before the next dot (exactly the HBM storage
    rounding of the two-kernel version) and every dot keeps bf16
    operands + f32 accumulation, so fused-vs-unfused equality is
    assertable with array_equal, and the sharded decoder path can fuse
    independently of the single-device one without numeric drift."""
    wms = refs[:n_stage]
    bs = refs[n_stage:2 * n_stage]
    x_ref, out_ref = refs[2 * n_stage], refs[-1]
    y = x_ref[0]
    for i in range(n_stage):
        z = jax.lax.dot_general(
            wms[i][0], y,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        z = _act(z + bs[i][:].astype(jnp.float32), relu[i])
        y = z.astype(out_ref.dtype)
    if rows_w is not None:
        out_ref[0] = y.reshape(y.shape[0], *rows_w)
    else:
        out_ref[0] = y


def pw_chain_chw(x, stages, *, relu=None, out_4d: bool = False,
                 interpret: bool = False):
    """x [B, C0, H, W] through stages [(w_folded HWIO [1,1,Ci,Ci+1],
    bias), ...] -> [B, Cn, H, W]; bit-equal to feeding the stages
    through conv_chw(k=1) one at a time (see _pw_chain_kernel). relu:
    per-stage activation list (default: all True)."""
    b, c0, h, w = x.shape
    n = len(stages)
    relu = [True] * n if relu is None else list(relu)
    assert len(relu) == n and n >= 1
    cs = [c0] + [wf.shape[3] for wf, _ in stages]
    assert all(wf.shape[2] == ci for (wf, _), ci in zip(stages, cs))
    c_out = cs[-1]
    wms = [jnp.transpose(wf, (0, 1, 3, 2)).reshape(
               1, wf.shape[3], wf.shape[2]).astype(x.dtype)
           for wf, _ in stages]
    bss = [bias.reshape(bias.shape[0], 1) for _, bias in stages]
    rows = _pick_rows(h, w, 1, 1)
    xf, hp = _flatten(x, rows)
    tile_p = rows * w
    n_tiles = hp * w // tile_p
    out_4d = out_4d and w % 128 == 0
    if out_4d:
        out_shape = jax.ShapeDtypeStruct((b, c_out, hp, w), x.dtype)
        out_spec = pl.BlockSpec((1, c_out, rows, w),
                                lambda bi, i: (bi, 0, i, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((b, c_out, hp * w), x.dtype)
        out_spec = pl.BlockSpec((1, c_out, tile_p),
                                lambda bi, i: (bi, 0, i),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_pw_chain_kernel, n_stage=n, relu=relu,
                          rows_w=(rows, w) if out_4d else None),
        out_shape=out_shape,
        grid=(b, n_tiles),
        in_specs=[*[_full_spec(wm.shape) for wm in wms],
                  *[_full_spec(bb.shape) for bb in bss],
                  pl.BlockSpec((1, c0, tile_p), lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*wms, *bss, xf)
    if out_4d:
        return out[:, :, :h]
    return out.reshape(b, c_out, hp, w)[:, :, :h]


def _conv_body(wm_ref, b_ref, stack, *, taps, depthwise: bool, w: int,
               tile_p: int, halo_px: int, relu, im2col: bool):
    """Post-stack compute of a dense/depthwise conv: tap loop (+ bias
    + activation), returning the f32 result. Shared by _conv_kernel and
    the fused pair kernel (_pair_kernel)."""
    if im2col and not depthwise:
        # small-C dense conv: per-tap dots have K = C (the stem's K=12
        # wastes ~90% of each MXU pass). Stack tap slices channel-wise
        # per dx GROUP — within a group the slices differ only by dy*w
        # lanes, so their vreg offsets match and the sublane concat
        # lowers (concatenating across dx groups does NOT: Mosaic
        # rejects offset mismatches on the non-concat dim) — then one
        # dot per group with K = C * taps_in_group, col-masking the
        # group's dot OUTPUT (validity depends on dx only).
        #
        # im2col == "shift_out": the dx shift COMMUTES with the dot —
        # Σ_dy W·x(px + dy·w + dx) = [Σ_dy W·x(·+dy·w)](px + dx) — so
        # compute each dx group's dot on the UNSHIFTED dy-concat over a
        # 128-lane-padded window (every piece then sits at lane offset
        # ≡ 0 mod 128 and the sublane concat lowers even on fused-node
        # VALUE chains, whose dx-shifted input slices carry the
        # mismatched lazy offsets Mosaic's concat rejects) and take the
        # lane-misaligned slice of the f32 dot OUTPUT instead. Costs
        # 2·PAD/tile_p extra dot columns (~1.6% at 32768) and moves the
        # per-dx relayout from the bf16 input to the f32 output; needed
        # because the direct fixes both fail to lower (scratch
        # spill+reload does not re-anchor slice offsets; pltpu.roll has
        # no bf16 lowering: "Rotate with non-32-bit data").
        if im2col == "shift_out":
            # the dx shift COMMUTES with the dot — Σ_dy W·x(px+dy·w+dx)
            # = [Σ_dy W·x(·+dy·w)](px+dx) — so run ONE dot on the
            # UNSHIFTED dy-concat over a 128-lane-padded window (every
            # piece sits at lane offset ≡ 0 mod 128, so the sublane
            # concat lowers even on fused-node VALUE chains, whose
            # dx-shifted input slices carry the mismatched lazy offsets
            # Mosaic's concat rejects; a scratch spill+reload does not
            # re-anchor them and pltpu.roll has no bf16 lowering). The
            # weight is packed [C_out·n_dx, C·n_dy] (zero rows for
            # edge-dropped taps), the f32 dot output then sliced per dx
            # (aligned sublanes, lane shift = the commuted dx) and
            # column-masked. ~2 MXU passes where the per-tap loop pays
            # k², at 2·PAD/tile extra dot columns (~0.8%).
            dys = sorted({t[1] for t in taps})
            dxs = sorted({t[2] for t in taps})
            c_in = stack.shape[0]
            c_out = wm_ref.shape[1] // max(len(dxs), 1)
            dmax_w = max(abs(d) for d in dys) * w if dys else 0
            pad = 128 if any(dxs) else 0
            win = jax.lax.slice_in_dim(
                stack, halo_px - dmax_w - pad,
                halo_px + tile_p + dmax_w + pad, axis=1)
            pieces = [win[:, dmax_w + dy * w:
                          dmax_w + dy * w + tile_p + 2 * pad]
                      for dy in dys]
            part_all = jax.lax.dot_general(
                wm_ref[0],
                jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                else pieces[0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = jax.lax.broadcasted_iota(jnp.int32, (1, tile_p), 1)
            acc = None
            for di, dx in enumerate(dxs):
                part = part_all[di * c_out:(di + 1) * c_out,
                                pad + dx:pad + dx + tile_p]
                if dx != 0:
                    colv = ((p % w) + dx >= 0) & ((p % w) + dx < w)
                    part = part * colv.astype(jnp.float32)
                acc = part if acc is None else acc + part
            return _act(acc + b_ref[:].astype(jnp.float32), relu)
        dmax_w = max((abs(dy) for _, dy, _ in taps), default=0) * w
        width = tile_p + 2 * dmax_w
        p = jax.lax.broadcasted_iota(jnp.int32, (1, tile_p), 1)
        acc = None
        off = 0
        for dx in sorted({t[2] for t in taps}):
            grp = [t for t in taps if t[2] == dx]
            win = jax.lax.slice_in_dim(stack, halo_px + dx - dmax_w,
                                       halo_px + dx - dmax_w + width,
                                       axis=1)
            pieces = [win[:, dmax_w + dy * w:dmax_w + dy * w + tile_p]
                      for _, dy, _ in grp]
            gk = len(grp) * pieces[0].shape[0]
            part = jax.lax.dot_general(
                wm_ref[0][:, off:off + gk],
                jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                else pieces[0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            off += gk
            if dx != 0:
                colv = ((p % w) + dx >= 0) & ((p % w) + dx < w)
                part = part * colv.astype(jnp.float32)
            acc = part if acc is None else acc + part
    else:
        if depthwise:
            def combine(j, xs):
                return wm_ref[j].astype(xs.dtype) * xs
        else:
            def combine(j, xs):
                return jax.lax.dot_general(
                    wm_ref[j], xs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc = _dw_tap_sum(stack, taps, combine, tile_p, w, halo_px)
    return _act(acc + b_ref[:].astype(jnp.float32), relu)


def _conv_kernel(wm_ref, b_ref, xm_ref, x0_ref, xp_ref, *refs,
                 k: int, dilation: int, depthwise: bool, h: int, w: int,
                 tile_p: int, halo_px: int, relu, im2col: bool = False,
                 has_acc: bool = False, has_vec: bool = False,
                 center_valid: bool = True):
    out_ref = refs[-1]
    ti = pl.program_id(1)
    row0 = ti * (tile_p // w)
    taps = _taps(k, dilation, h, w)
    # depthwise taps convert to f32 ONCE here (per-tap converts dominate
    # at 25 taps); dense dots keep the native dtype — bf16 operands with
    # f32 accumulation run the MXU at full rate (f32 operands quarter
    # it) and match the XLA conv path's numerics
    stack = _masked_stack(xm_ref, x0_ref, xp_ref, row0, tile_p, w, h,
                          halo_px, center_valid,
                          dtype=_dw_dtype(x0_ref.dtype) if depthwise
                          else x0_ref.dtype)
    y = _conv_body(wm_ref, b_ref, stack, taps=taps, depthwise=depthwise,
                   w=w, tile_p=tile_p, halo_px=halo_px, relu=relu,
                   im2col=im2col)
    extra = 0
    if has_acc:
        y = y + refs[extra][0].astype(jnp.float32)
        extra += 1
    if has_vec:
        y = y + refs[extra][0].astype(jnp.float32)   # [C, 1] broadcast
    out_ref[0] = y.astype(out_ref.dtype)


def _sep_body(wdw_ref, bdw_ref, wpw_ref, bpw_ref, stack, *, taps,
              w: int, tile_p: int, halo_px: int):
    """Post-stack compute of a fused separable conv (dw + ReLU + pw +
    ReLU), returning the f32 result. Shared by _sep_kernel and
    _pair_kernel."""
    acc = _dw_tap_sum(stack, taps,
                      lambda j, xs: wdw_ref[j].astype(xs.dtype) * xs,
                      tile_p, w, halo_px)
    mid = jnp.maximum(acc + bdw_ref[:].astype(jnp.float32), 0.0)
    # pw dot in native dtype (full-rate MXU; the XLA path also rounds
    # the dw output to bf16 between ops)
    y = jax.lax.dot_general(
        wpw_ref[0], mid.astype(wpw_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jnp.maximum(y + bpw_ref[:].astype(jnp.float32), 0.0)


def _sep_kernel(wdw_ref, bdw_ref, wpw_ref, bpw_ref, xm_ref, x0_ref, xp_ref,
                *refs, k: int, dilation: int, h: int, w: int,
                tile_p: int, halo_px: int, has_acc: bool = False,
                has_vec: bool = False, center_valid: bool = True):
    out_ref = refs[-1]
    ti = pl.program_id(1)
    row0 = ti * (tile_p // w)
    taps = _taps(k, dilation, h, w)
    stack = _masked_stack(xm_ref, x0_ref, xp_ref, row0, tile_p, w, h,
                          halo_px, center_valid,
                          dtype=_dw_dtype(x0_ref.dtype))
    y = _sep_body(wdw_ref, bdw_ref, wpw_ref, bpw_ref, stack, taps=taps,
                  w=w, tile_p=tile_p, halo_px=halo_px)
    extra = 0
    if has_acc:
        y = y + refs[extra][0].astype(jnp.float32)
        extra += 1
    if has_vec:
        y = y + refs[extra][0].astype(jnp.float32)   # [C, 1] broadcast
    out_ref[0] = y.astype(out_ref.dtype)


def _pair_kernel(*refs, specs, im2cols, h: int, w: int, tile_p: int,
                 halo_pxs, center_valid: bool):
    """Fused cell branch pair: act(op1(x1)) + act(op2(x2)) in ONE kernel
    — the unfused form writes op1's activated output to HBM and reads it
    back as op2's acc operand (one full [B,48,H,W] round trip per cell
    node). specs: two ('conv'|'sep', k, dilation) descriptors; ref
    order: op1 weights, op2 weights, op1 views (xm,x0,xp), op2 views,
    out."""
    out_ref = refs[-1]
    ti = pl.program_id(1)
    row0 = ti * (tile_p // w)
    idx = 0
    wrefs = []
    for kind, _, _ in specs:
        n = 4 if kind == "sep" else 2
        wrefs.append(refs[idx:idx + n])
        idx += n
    total = None
    for (kind, k, dil), wr, halo_px, im2 in zip(specs, wrefs, halo_pxs,
                                                im2cols):
        xm, x0, xp = refs[idx:idx + 3]
        idx += 3
        taps = _taps(k, dil, h, w)
        if kind == "sep":
            stack = _masked_stack(xm, x0, xp, row0, tile_p, w, h,
                                  halo_px, center_valid,
                                  dtype=_dw_dtype(x0.dtype))
            y = _sep_body(*wr, stack, taps=taps, w=w, tile_p=tile_p,
                          halo_px=halo_px)
        else:
            stack = _masked_stack(xm, x0, xp, row0, tile_p, w, h,
                                  halo_px, center_valid, dtype=x0.dtype)
            y = _conv_body(*wr, stack, taps=taps, depthwise=False, w=w,
                           tile_p=tile_p, halo_px=halo_px, relu=True,
                           im2col=im2)
        total = y if total is None else total + y
    out_ref[0] = total.astype(out_ref.dtype)


def _x_specs(c, tile_p, n_tiles, w=None, halo_rows=None):
    """Center tile + neighbour views. With halo_rows set, the neighbour
    views are THIN halo-row blocks (halo_rows divides rows) — the DMA
    per grid step drops from 3 full tiles to 1 + 2*halo_rows/rows tiles.
    Boundary clamps read in-image blocks; the kernels' row-validity
    masks zero them."""
    if halo_rows is None:
        def spec(fn):
            return pl.BlockSpec((1, c, tile_p),
                                lambda bi, i: (bi, 0, fn(i)),
                                memory_space=pltpu.VMEM)
        return [
            spec(lambda i: jnp.maximum(i - 1, 0)),
            spec(lambda i: i),
            spec(lambda i: jnp.minimum(i + 1, n_tiles - 1)),
        ]
    rows = tile_p // w
    ratio = rows // halo_rows
    n_halo = n_tiles * ratio
    halo_px = halo_rows * w
    return [
        pl.BlockSpec((1, c, halo_px),
                     lambda bi, i: (bi, 0, jnp.maximum(i * ratio - 1, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c, tile_p), lambda bi, i: (bi, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c, halo_px),
                     lambda bi, i: (bi, 0,
                                    jnp.minimum((i + 1) * ratio,
                                                n_halo - 1)),
                     memory_space=pltpu.VMEM),
    ]


def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda bi, i: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _flatten(x, rows_per_tile):
    """[B, C, H, W] -> ([B, C, Hp*W], Hp) with rows padded to the tile."""
    b, c, h, w = x.shape
    hp = _round_up(h, rows_per_tile)
    if hp != h:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
    return x.reshape(b, c, hp * w), hp


def _pick_divisor_rows(h: int, w: int, target: int, cap: int,
                       floor: int = 2):
    """Shared row-tile search: a divisor of h with a 128-divisible lane
    block (rows*w) % 128 == 0, preferring >= target (ascending to cap),
    falling back to the largest < target down to `floor`. Returns None
    when no divisor qualifies — callers then `_lane_round` (non-divisor,
    forces a pad copy). A divisor is strongly preferred: a non-divisor
    forces _flatten to PAD, and the pad materializes an HBM copy of the
    whole tensor around every kernel (profiled ~0.5 ms per op at
    8x48x256x512; the b0 shape 8x32x512x1024 ran 2x slower with rows=45
    padding 512 -> 540 than with the divisor 32, v5e)."""
    for rows in range(target, cap + 1):
        if h % rows == 0 and (rows * w) % 128 == 0:
            return rows
    for rows in range(target - 1, floor - 1, -1):
        if h % rows == 0 and (rows * w) % 128 == 0:
            return rows
    return None


def _pick_rows(h: int, w: int, dilation: int, k: int) -> int:
    """Rows per tile. Invariants:
      * rows > effective halo (min(dil*(k//2), h-1)), so |dy| <= rows-1
        and with |dx| <= w-1 every halo slice start stays in-bounds;
      * rows*w (the block's LANE dim) must be a multiple of 128 —
        Mosaic requires 128-divisible lane blocks unless the block spans
        the whole array (w=512 CityScapes masked this; CamVid's w=120/
        60/30 taps exposed it). Rounding rows up may exceed h: the
        wrapper then pads to one full-array tile, which is exempt.
    Target ~4k pixels/tile (3 bf16 halo views + f32 accumulator fit
    VMEM with the unrolled taps); SEGTPU_TILE_PX is read ONCE at import
    time (values are baked into jitted programs)."""
    halo = min(dilation * (k // 2), max(h - 1, 0))
    target = max(halo + 1, min(h, max(_TILE_PX // w, 8)))
    cap = min(h, max(target * 4, 16384 // max(w, 1) + 1))
    rows = _pick_divisor_rows(h, w, target, cap, floor=halo + 1)
    return rows if rows is not None else _lane_round(target, w)


def _lane_round(rows: int, w: int) -> int:
    """Round rows up so rows*w is a 128-multiple (Mosaic lane-block
    divisibility). May exceed h — the _flatten pad then yields one
    full-array tile, which Mosaic exempts."""
    step = 128 // math.gcd(w, 128)
    return -(-rows // step) * step


@functools.partial(jax.jit, static_argnames=("k", "dilation", "depthwise",
                                             "relu", "flat_out", "out_4d",
                                             "interpret"))
def conv_chw(x, w_folded, bias, acc=None, vec_acc=None, *, k: int,
             dilation: int = 1,
             depthwise: bool = False, relu: bool = True,
             flat_out: bool = False, out_4d: bool = False,
             interpret: bool = False):
    """x [B, C, H, W]; w_folded HWIO (BN pre-folded) -> [B, Cout, H, W].
    acc: optional [B, Cout, H, W] summed into the activated result
    in-kernel (fused branch add). vec_acc: optional [B, Cout] per-
    (batch, channel) vector summed in-kernel instead — a GAP cell-branch
    partner rides in without its broadcast tensor ever existing (the
    broadcast+add pass traced 0.155 ms/b8 at 8x48x256x512). flat_out:
    return the kernel's NATIVE flat [B, Cout, H*W] (C-sublane, px-lane)
    layout — consumers like kernels.upsample_argmax.upsample_argmax_flat
    read it with no (C,px)->(h,w) retile (0.288 ms/b8-dispatch at
    8x19x256x512 in the round-3 trace). out_4d (k=1 path only): store
    4-D [B, Cout, H, W] directly via an in-kernel lane->sublane retile —
    same bytes as reshape-after, minus the XLA copy (see _pw_kernel)."""
    b, c, h, w = x.shape
    if depthwise:
        wm = jnp.transpose(w_folded, (0, 1, 3, 2)).reshape(k * k, c, 1)
        c_out = c
    else:
        c_out = w_folded.shape[3]
        wm = jnp.transpose(w_folded, (0, 1, 3, 2)).reshape(
            k * k, c_out, w_folded.shape[2]).astype(x.dtype)
    rows = _pick_rows(h, w, dilation, k)
    xf, hp = _flatten(x, rows)
    tile_p = rows * w
    n_tiles = hp * w // tile_p
    acc_ops, acc_specs = (), []
    if acc is not None:
        acc_f, _ = _flatten(acc, rows)
        acc_ops = (acc_f,)
        acc_specs = [pl.BlockSpec((1, c_out, tile_p),
                                  lambda bi, i: (bi, 0, i),
                                  memory_space=pltpu.VMEM)]
    if vec_acc is not None:
        # [B, Cout, 1]: the px block spans the whole (length-1) axis, so
        # the 128-divisibility rule does not apply (full-dim block)
        acc_ops = acc_ops + (vec_acc.reshape(b, c_out, 1),)
        acc_specs = acc_specs + [
            pl.BlockSpec((1, c_out, 1), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM)]
    if k == 1 and not depthwise:
        # pointwise fast path: single view, no halo, no masks.
        # The in-kernel (C, px)->(C, rows, w) retile is a pure shape
        # cast only when w is a lane multiple — Mosaic rejects the
        # vector reshape otherwise ("unsupported shape cast" at w=64,
        # caught on hardware); fall back to reshape-after-store.
        out_4d = out_4d and w % 128 == 0
        if out_4d:
            out_shape = jax.ShapeDtypeStruct((b, c_out, hp, w), x.dtype)
            out_spec = pl.BlockSpec((1, c_out, rows, w),
                                    lambda bi, i: (bi, 0, i, 0),
                                    memory_space=pltpu.VMEM)
        else:
            out_shape = jax.ShapeDtypeStruct((b, c_out, hp * w), x.dtype)
            out_spec = pl.BlockSpec((1, c_out, tile_p),
                                    lambda bi, i: (bi, 0, i),
                                    memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_pw_kernel, relu=relu,
                              has_acc=acc is not None,
                              has_vec=vec_acc is not None,
                              rows_w=(rows, w) if out_4d else None),
            out_shape=out_shape,
            grid=(b, n_tiles),
            in_specs=[_full_spec(wm.shape),
                      _full_spec((c_out, 1)),
                      pl.BlockSpec((1, c, tile_p),
                                   lambda bi, i: (bi, 0, i),
                                   memory_space=pltpu.VMEM),
                      *acc_specs],
            out_specs=out_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(wm, bias.reshape(c_out, 1), xf, *acc_ops)
        if out_4d:
            return out[:, :, :h]
        return (out[:, :, :h * w] if flat_out else
                out.reshape(b, c_out, hp, w)[:, :, :h])
    taps_l = _taps(k, dilation, h, w)
    dmax_dy = max((abs(dy) for _, dy, _ in taps_l), default=0)
    halo_rows = _halo_rows(rows, w, min(dmax_dy + 1, rows))
    # w % 128: dy*w lane shifts then change vreg offsets within a dx
    # group and the sublane concat stops lowering (Mosaic offset rule)
    im2col = (not depthwise and c * len(taps_l) <= _IM2COL_MAX
              and w % 128 == 0)
    if im2col:
        # [k*k, c_out, c] -> [1, c_out, n_taps*c], dx-group-major to
        # match the kernel's per-group stacking order
        order = [j for dx in sorted({t[2] for t in taps_l})
                 for j, _, dxt in taps_l if dxt == dx]
        wm = jnp.transpose(
            jnp.stack([wm[j] for j in order], 0),
            (1, 0, 2)).reshape(1, c_out, len(taps_l) * c)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, k=k, dilation=dilation,
                          depthwise=depthwise, h=h, w=w, tile_p=tile_p,
                          halo_px=halo_rows * w, im2col=im2col,
                          relu=relu, has_acc=acc is not None,
                          has_vec=vec_acc is not None,
                          center_valid=hp == h),
        out_shape=jax.ShapeDtypeStruct((b, c_out, hp * w), x.dtype),
        grid=(b, n_tiles),
        in_specs=[_full_spec(wm.shape),
                  _full_spec((c_out, 1)),
                  *_x_specs(c, tile_p, n_tiles, w, halo_rows),
                  *acc_specs],
        out_specs=pl.BlockSpec((1, c_out, tile_p),
                               lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wm, bias.reshape(c_out, 1), xf, xf, xf, *acc_ops)
    return (out[:, :, :h * w] if flat_out else
            out.reshape(b, c_out, hp, w)[:, :, :h])


@functools.partial(jax.jit, static_argnames=("k", "dilation", "interpret"))
def sep_conv_chw(x, w_dw, b_dw, w_pw, b_pw, acc=None, vec_acc=None, *,
                 k: int, dilation: int = 1, interpret: bool = False):
    """Fused separable conv (dw kxk + BN + ReLU + pw 1x1 + BN + ReLU),
    all BN pre-folded. x [B, C, H, W] -> [B, Cout, H, W]. acc: optional
    fused branch add; vec_acc: optional [B, Cout] per-(batch, channel)
    vector add (GAP branch partner) — see conv_chw."""
    b, c, h, w = x.shape
    wdw = jnp.transpose(w_dw, (0, 1, 3, 2)).reshape(k * k, c, 1)
    c_out = w_pw.shape[3]
    wpw = jnp.transpose(w_pw, (0, 1, 3, 2)).reshape(1, c_out, c).astype(x.dtype)
    rows = _pick_rows(h, w, dilation, k)
    xf, hp = _flatten(x, rows)
    tile_p = rows * w
    n_tiles = hp * w // tile_p
    acc_ops, acc_specs = (), []
    if acc is not None:
        acc_f, _ = _flatten(acc, rows)
        acc_ops = (acc_f,)
        acc_specs = [pl.BlockSpec((1, c_out, tile_p),
                                  lambda bi, i: (bi, 0, i),
                                  memory_space=pltpu.VMEM)]
    if vec_acc is not None:
        acc_ops = acc_ops + (vec_acc.reshape(b, c_out, 1),)
        acc_specs = acc_specs + [
            pl.BlockSpec((1, c_out, 1), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM)]
    dmax_dy = max((abs(dy) for _, dy, _ in _taps(k, dilation, h, w)),
                  default=0)
    halo_rows = _halo_rows(rows, w, min(dmax_dy + 1, rows))
    out = pl.pallas_call(
        functools.partial(_sep_kernel, k=k, dilation=dilation, h=h, w=w,
                          tile_p=tile_p, halo_px=halo_rows * w,
                          has_acc=acc is not None,
                          has_vec=vec_acc is not None,
                          center_valid=hp == h),
        out_shape=jax.ShapeDtypeStruct((b, c_out, hp * w), x.dtype),
        grid=(b, n_tiles),
        in_specs=[_full_spec(wdw.shape),
                  _full_spec((c, 1)),
                  _full_spec(wpw.shape),
                  _full_spec((c_out, 1)),
                  *_x_specs(c, tile_p, n_tiles, w, halo_rows),
                  *acc_specs],
        out_specs=pl.BlockSpec((1, c_out, tile_p),
                               lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wdw, b_dw.reshape(c, 1), wpw, b_pw.reshape(c_out, 1), xf, xf, xf,
      *acc_ops)
    return out.reshape(b, c_out, hp, w)[:, :, :h]


@functools.partial(jax.jit, static_argnames=("op1", "op2", "interpret"))
def pair_op_chw(x1, weights1, x2, weights2, *, op1, op2,
                interpret: bool = False):
    """Fused cell branch pair: ``act(op1(x1)) + act(op2(x2))`` in ONE
    kernel. op = ('conv'|'sep', k, dilation); weights = (w_folded, bias)
    for conv (k=1 covers pointwise) or (w_dw, b_dw, w_pw, b_pw) for sep,
    BN pre-folded, ReLU per branch BEFORE the sum (the cell-node
    semantics of fast_decoder: outs.append(opb(x2, acc=opa(x1)))).

    Why: unfused, opa's kernel writes its activated output to HBM and
    opb's kernel reads it back as the acc operand — a full [B,48,H,W]
    round trip per cell node. Every op inside a cell runs at the SAME
    hw, so one grid covers both; the row tile honours the larger halo.
    Numerics: the branch sum happens in f32 (the unfused path rounds
    opa's output to the activation dtype first) — at bf16 production
    dtype the fused result is the more accurate of the two."""
    b, c1, h, w = x1.shape
    assert x2.shape[0] == b and x2.shape[2:] == (h, w), (x1.shape,
                                                         x2.shape)
    specs = (op1, op2)

    def _prep(op, wts, c_in):
        kind, k, dil = op
        if kind == "sep":
            w_dw, b_dw, w_pw, b_pw = wts
            wdw = jnp.transpose(w_dw, (0, 1, 3, 2)).reshape(k * k, c_in, 1)
            co = w_pw.shape[3]
            wpw = jnp.transpose(w_pw, (0, 1, 3, 2)).reshape(
                1, co, c_in).astype(x1.dtype)
            return [wdw, b_dw.reshape(c_in, 1), wpw,
                    b_pw.reshape(co, 1)], co, False
        w_f, bias = wts
        co = w_f.shape[3]
        taps_l = _taps(k, dil, h, w)
        wm = jnp.transpose(w_f, (0, 1, 3, 2)).reshape(
            k * k, co, c_in).astype(x1.dtype)
        im2 = c_in * len(taps_l) <= _IM2COL_MAX and w % 128 == 0
        if im2:
            order = [j for dx in sorted({t[2] for t in taps_l})
                     for j, _, dxt in taps_l if dxt == dx]
            wm = jnp.transpose(
                jnp.stack([wm[j] for j in order], 0),
                (1, 0, 2)).reshape(1, co, len(taps_l) * c_in)
        return [wm, bias.reshape(co, 1)], co, im2

    ws1, c_out, im2_1 = _prep(op1, weights1, c1)
    ws2, c_out2, im2_2 = _prep(op2, weights2, x2.shape[1])
    assert c_out == c_out2, (c_out, c_out2)

    halo = max(min(dil * (k // 2), max(h - 1, 0))
               for _, k, dil in specs)
    rows = _pick_rows(h, w, max(halo, 1), 3 if halo else 1)
    xf1, hp = _flatten(x1, rows)
    xf2, _ = _flatten(x2, rows)
    tile_p = rows * w
    n_tiles = hp * w // tile_p
    halo_rows, views, specs_in = [], [], []
    for op, xf in zip(specs, (xf1, xf2)):
        _, k, dil = op
        dmax_dy = max((abs(dy) for _, dy, _ in _taps(k, dil, h, w)),
                      default=0)
        hr = _halo_rows(rows, w, min(dmax_dy + 1, rows))
        halo_rows.append(hr)
        views.extend([xf, xf, xf])
        specs_in.append(_x_specs(xf.shape[1], tile_p, n_tiles, w, hr))
    out = pl.pallas_call(
        functools.partial(_pair_kernel, specs=specs,
                          im2cols=(im2_1, im2_2), h=h, w=w, tile_p=tile_p,
                          halo_pxs=tuple(hr * w for hr in halo_rows),
                          center_valid=hp == h),
        out_shape=jax.ShapeDtypeStruct((b, c_out, hp * w), x1.dtype),
        grid=(b, n_tiles),
        in_specs=[*[_full_spec(wa.shape) for wa in ws1],
                  *[_full_spec(wa.shape) for wa in ws2],
                  *specs_in[0], *specs_in[1]],
        out_specs=pl.BlockSpec((1, c_out, tile_p),
                               lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ws1, *ws2, *views)
    return out.reshape(b, c_out, hp, w)[:, :, :h]


# ---------------------------------------------------------------------------
# Fused inverted residual (MobileNet-v2 stride-1 block):
# pw expand + BN + ReLU6 -> dw 3x3 + BN + ReLU6 -> pw project + BN
# [+ residual], ONE kernel = one HBM round-trip instead of three.
# The expand runs on the tile + 1-row halo window so the depthwise taps
# never need HBM halo reads of the (in-kernel-only) expanded tensor.
# ---------------------------------------------------------------------------


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _invres_kernel(wexp_ref, bexp_ref, wdw_ref, bdw_ref, wproj_ref,
                   bproj_ref, xm_ref, x0_ref, xp_ref, *out_refs,
                   h: int, w: int, tile_p: int, halo_px: int, expand: bool,
                   residual: bool, row_split=False):
    out_ref = out_refs[0]
    ti = pl.program_id(1)
    row0 = ti * (tile_p // w)
    # window = center tile + one halo row + 1px each side (the corner
    # taps (±1, ±1) reach w+1 pixels out); xm/xp are thin halo-row views
    # of halo_px lanes (full neighbour tiles until round 3 — 3x the DMA)
    wpad = w + 1
    # native-dtype window: the expand dot takes bf16 operands with f32
    # accumulation (f32 operands quarter the MXU rate — and the expand
    # dominates these blocks' MXU time at K = Cin as low as 16)
    win = jnp.concatenate(
        [jax.lax.slice_in_dim(xm_ref[0], halo_px - wpad, halo_px, axis=1),
         x0_ref[0],
         jax.lax.slice_in_dim(xp_ref[0], 0, wpad, axis=1)],
        axis=1)                                      # [C, tile_p + 2wpad]
    if expand:
        mid = jax.lax.dot_general(
            wexp_ref[0], win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mid = _relu6(mid + bexp_ref[:].astype(jnp.float32))
        if _DW_NATIVE:   # round the mid like the XLA path does between ops
            mid = mid.astype(x0_ref.dtype)
    else:
        mid = win.astype(_dw_dtype(win.dtype))
    # zero rows outside the image AFTER the expand (SAME padding zeroes
    # the dw input, which is the expand output, not the raw input)
    p = jax.lax.broadcasted_iota(jnp.int32, (1, tile_p + 2 * wpad), 1)
    row = row0 + (p - wpad) // w
    mid = jnp.where((row >= 0) & (row < h), mid, 0.0)

    # dx-major dw loop (same trick as _dw_tap_sum): shift once per
    # distinct dx — lane-misaligned relayouts go 9 -> 3 — let each tap
    # take a lane-aligned dy*w sub-slice of the window, and mask the
    # dy-summed PARTIAL (column validity never depends on dy) so the
    # unmasked window slices stay fusable.
    taps = _taps(3, 1, h, w)
    width = tile_p + 2 * w
    pp = jax.lax.broadcasted_iota(jnp.int32, (1, tile_p), 1)
    acc = None
    for dx in sorted({t[2] for t in taps}):
        start = wpad + dx - w
        win = jax.lax.slice_in_dim(mid, start, start + width, axis=1)
        part = None
        for j, dy, dx_t in taps:
            if dx_t != dx:
                continue
            base = w + dy * w
            xs = jax.lax.slice_in_dim(win, base, base + tile_p, axis=1)
            term = wdw_ref[j].astype(xs.dtype) * xs
            part = term if part is None else part + term
        if dx != 0:
            colv = ((pp % w) + dx >= 0) & ((pp % w) + dx < w)
            part = part * colv.astype(part.dtype)
        acc = part if acc is None else acc + part
    acc = _relu6(acc + bdw_ref[:].astype(jnp.float32))
    y = jax.lax.dot_general(
        wproj_ref[0], acc.astype(wproj_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + bproj_ref[:].astype(jnp.float32)
    if residual:
        y = y + x0_ref[0].astype(jnp.float32)
    if row_split:
        # emit row-parity planes straight from registers: plane ry gets
        # the tile's rows 2i+ry (static lane slices + concat — free data
        # movement vs the 4-D strided sublane gather XLA does for the
        # stride-2 quadrant split, profiled ~2.4 ms/b8-dispatch total).
        # The pair is PLANE-MAJOR [2, B, C, px]: the consumer slices
        # planes on the leading dim, so its per-plane einsum operands
        # are layout-free views (the [B, 2, ...] form made XLA reorder
        # plane past batch — two ~0.4 ms full-tensor copies per b8
        # dispatch at 512x1024x16).
        # "dual" additionally writes the plain output (for blocks whose
        # output is BOTH a decoder tap and a stride-2 input: one extra
        # sequential write instead of a read + strided gather).
        if row_split == "dual":
            pe_ref, po_ref, plain_ref = out_refs
            plain_ref[0] = y.astype(plain_ref.dtype)
        else:
            pe_ref, po_ref = out_refs
        y = y.astype(pe_ref.dtype)
        rows = tile_p // w
        for ry, ref in ((0, pe_ref), (1, po_ref)):
            ref[0] = jnp.concatenate(
                [jax.lax.slice_in_dim(y, (2 * i + ry) * w,
                                      (2 * i + ry + 1) * w, axis=1)
                 for i in range(rows // 2)], axis=1)
    else:
        out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("residual", "row_split",
                                             "interpret"))
def inv_res_chw(x, w_exp, b_exp, w_dw, b_dw, w_proj, b_proj, *,
                residual: bool = False, row_split: bool = False,
                interpret: bool = False):
    """Fused stride-1 inverted residual. x [B, C, H, W] -> [B, Cout, H, W].
    All weights HWIO with BN pre-folded; pass w_exp=None for t=1 blocks.

    row_split: emit row-parity planes as TWO separate FLAT arrays
    (even, odd), each [B, Cout, (H/2)*W] (plane ry = rows 2i+ry), for
    a following stride-2 block (inv_res_s2_chw consumes the tuple via
    pair_hw=(H/2, W)) — the row half of the quadrant split happens in
    the kernel's output write instead of a strided XLA gather, and
    separate output buffers leave the consumer nothing to slice (each
    is already a layout-free einsum operand; the stacked [2,...] form
    made XLA materialize both leading-dim slices, ~0.40 ms/b8 at
    512x1024x16; the older 5-D form paid ~0.9 ms of relayouts on top).
    Requires H even and an even divisor row-tile; falls back to the
    plain output + an XLA gather otherwise.
    """
    b, c, h, w = x.shape
    expand = w_exp is not None
    cmid = w_dw.shape[3]
    c_out = w_proj.shape[3]
    # tile sized so the f32 expanded window fits VMEM comfortably;
    # divisor-preferred row search shared with _pick_rows
    budget_px = max(1024, int(_INVRES_BUDGET / (4 * cmid)))
    target = max(2, min(h, max(budget_px // w, 2)))
    rows = _pick_divisor_rows(h, w, target, min(h, target * 4))
    if rows is None:
        rows = _lane_round(target, w)
    if row_split and (h % 2 or rows % 2 or h % rows):
        assert h % 2 == 0, "row_split requires even H"
        y = inv_res_chw(x, w_exp, b_exp, w_dw, b_dw, w_proj, b_proj,
                        residual=residual, interpret=interpret)
        yr = y.reshape(b, c_out, h // 2, 2, w)
        pair = tuple(yr[:, :, :, ry].reshape(b, c_out, (h // 2) * w)
                     for ry in (0, 1))
        return (pair, y) if row_split == "dual" else pair
    xf, hp = _flatten(x, rows)
    tile_p = rows * w
    n_tiles = hp * w // tile_p
    if expand:
        wexp = jnp.transpose(w_exp, (0, 1, 3, 2)).reshape(1, cmid, c).astype(x.dtype)
        bexp = b_exp.reshape(cmid, 1)
    else:  # placeholders keep the arg list static
        wexp = jnp.zeros((1, 1, 1), x.dtype)
        bexp = jnp.zeros((1, 1), x.dtype)
    wdw = jnp.transpose(w_dw, (0, 1, 3, 2)).reshape(9, cmid, 1)
    wproj = jnp.transpose(w_proj, (0, 1, 3, 2)).reshape(1, c_out, cmid).astype(x.dtype)
    plane_shape = jax.ShapeDtypeStruct((b, c_out, (hp // 2) * w), x.dtype)
    plane_spec = pl.BlockSpec((1, c_out, (rows // 2) * w),
                              lambda bi, i: (bi, 0, i),
                              memory_space=pltpu.VMEM)
    plain_shape = jax.ShapeDtypeStruct((b, c_out, hp * w), x.dtype)
    plain_spec = pl.BlockSpec((1, c_out, tile_p),
                              lambda bi, i: (bi, 0, i),
                              memory_space=pltpu.VMEM)
    if row_split == "dual":
        out_shape = (plane_shape, plane_shape, plain_shape)
        out_specs = (plane_spec, plane_spec, plain_spec)
    elif row_split:
        out_shape = (plane_shape, plane_shape)
        out_specs = (plane_spec, plane_spec)
    else:
        out_shape, out_specs = plain_shape, plain_spec
    halo_rows = _halo_rows(rows, w, 2)
    out = pl.pallas_call(
        functools.partial(_invres_kernel, h=h, w=w, tile_p=tile_p,
                          halo_px=halo_rows * w,
                          expand=expand, residual=residual,
                          row_split=row_split),
        out_shape=out_shape,
        grid=(b, n_tiles),
        in_specs=[_full_spec(wexp.shape),
                  _full_spec(bexp.shape),
                  _full_spec(wdw.shape),
                  _full_spec((cmid, 1)),
                  _full_spec(wproj.shape),
                  _full_spec((c_out, 1)),
                  *_x_specs(c, tile_p, n_tiles, w, halo_rows)],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wexp, bexp, wdw, b_dw.reshape(cmid, 1), wproj,
      b_proj.reshape(c_out, 1), xf, xf, xf)
    crop = (h // 2) * w   # no-op: the kernel path requires h % rows == 0
    if row_split == "dual":
        pe, po, plain = out
        return ((pe[..., :crop], po[..., :crop]),
                plain.reshape(b, c_out, hp, w)[:, :, :h])
    if row_split:
        pe, po = out
        return (pe[..., :crop], po[..., :crop])
    return out.reshape(b, c_out, hp, w)[:, :, :h]


# ---------------------------------------------------------------------------
# Fused STRIDE-2 inverted residual. A stride-2 3x3 dw over the full grid
# equals 9 ALIGNED taps over the four half-resolution quadrant planes
# (s2d phases): tap (dy, dx) reads quadrant (dy&1, dx&1) at half-res
# shift (si, sj) in {-1, 0}^2 — no strided loads anywhere. The quadrant
# split happens outside (one cheap XLA copy on the unpadded CHW
# tensor); expand and project fuse in-kernel as in inv_res_chw. Since
# si, sj <= 0, only the PREVIOUS tile's halo is needed.
# ---------------------------------------------------------------------------


def _invres_s2_kernel(wexp_ref, bexp_ref, wdw_ref, bdw_ref, wproj_ref,
                      bproj_ref, xm0, x00, xm1, x01, xm2, x02, xm3, x03,
                      out_ref, *, h2: int, w2: int, tile_p: int,
                      halo_px: int, expand: bool, center_valid: bool,
                      q3d: bool = False, q4d: bool = False,
                      stacked: bool = False, cmid: int = 0,
                      inperm: bool = False):
    ti = pl.program_id(1)
    row0 = ti * (tile_p // w2)
    wpad = w2 + 1
    views = [(xm0, x00), (xm1, x01), (xm2, x02), (xm3, x03)]
    # tap (dy, dx) -> (quadrant ry*2+rx, si, sj, weight index)
    def qmap(d):
        return (0, 0) if d == 0 else (1, -1 if d == -1 else 0)

    if inperm:
        # IN-KERNEL column deinterleave (round 5): the x refs are the
        # two PRE-PERM row planes in [c, kb, 256] blocks (xm2/x02 carry
        # the [256, 128] even/odd 0/1 perm matrices); each plane is
        # permed here with both phases — the same exact-bf16 MXU
        # permutation dot the XLA einsum path runs, minus the four
        # [b, c, kb, 128] HBM intermediates and their op dispatches.
        # reshape (c, kb, 256) -> (c*kb, 256) is the outer->sublane
        # merge the front kernel lowers in-register; (c*kb, 128) ->
        # (c, kb*128) is the standard sublane->lane cast.
        perms = (xm2[:], x02[:])
        qv = []
        for pm, p0 in ((xm0, x00), (xm1, x01)):
            c_ = pm.shape[1]
            hm = pm[0].reshape(c_ * pm.shape[2], 256)
            b0 = p0[0].reshape(c_ * p0.shape[2], 256)
            for mat in perms:
                qv.append(tuple(
                    jax.lax.dot_general(
                        src, mat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    .astype(x00.dtype).reshape(c_, px)
                    for src, px in ((hm, halo_px), (b0, tile_p))))

    def _win(q):
        if inperm:
            xm_v, x0_v = qv[q]
        elif q4d:
            # blocks arrive in the einsum's native [c, kb, 128] layout;
            # the sublane->lane merge to the flat [c, px] working form
            # is the shape-cast direction Mosaic lowers in-register
            xm_v = views[q][0][0].reshape(views[q][0].shape[1], halo_px)
            x0_v = views[q][1][0].reshape(views[q][1].shape[1], tile_p)
        else:
            xm, x0 = views[q]
            xm_v = xm[0] if q3d else xm[0, 0]
            x0_v = x0[0] if q3d else x0[0, 0]
        return jnp.concatenate(
            [jax.lax.slice_in_dim(xm_v, halo_px - wpad, halo_px, axis=1),
             x0_v], axis=1)                          # [C, wpad + tile_p]

    def _mask_rows(mid):
        # SAME padding zeroes the dw INPUT (the expand output): mask the
        # head halo (only the first tile can read above the image) and,
        # with non-divisor tiles, the padded center rows. Lane-only
        # predicates — identical for every quadrant/channel row.
        e = jax.lax.broadcasted_iota(jnp.int32, (1, wpad), 1)
        headv = (row0 * w2 - wpad + e) >= 0
        head = jnp.where(headv, mid[:, :wpad], 0.0)
        body = mid[:, wpad:]
        if not center_valid:
            pc = jax.lax.broadcasted_iota(jnp.int32, (1, tile_p), 1)
            body = jnp.where(row0 + pc // w2 < h2, body, 0.0)
        return jnp.concatenate([head, body], axis=1)

    def _q_taps(q):
        ry, rx = q // 2, q % 2
        return [((dy + 1) * 3 + dx + 1, qmap(dy)[1], qmap(dx)[1])
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                if qmap(dy)[0] == ry and qmap(dx)[0] == rx]

    part_m = None   # sj == -1 taps (col-masked once at the end)
    part_0 = None   # sj == 0 taps
    mid_all = None
    if stacked:
        # All four quadrant expands as ONE block-diagonal dot: the
        # per-quadrant expand contracts K = Cin as low as 16 — 12.5% of
        # the MXU's 128-deep systolic array. Quadrants share the weight,
        # so sublane-stacking their windows ([4C, wpad+tile]) against a
        # block-diag [4Cmid, 4C] raises K to 4C at 4x M: unit-matmul
        # count drops 4->3 at C=16 (b1-s2), 8->5 at C=24 (b2-s2),
        # 8->6 at C=32 (b3-s2). Gated on 4C <= 128 (above that K is
        # already >= half the array and 4x M costs more than K saves).
        win = jnp.concatenate([_win(q) for q in range(4)], axis=0)
        mid_all = jax.lax.dot_general(
            wexp_ref[0], win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mid_all = jnp.clip(mid_all + bexp_ref[:].astype(jnp.float32),
                           0.0, 6.0)
        if _DW_NATIVE:
            mid_all = mid_all.astype(x00.dtype)
        mid_all = _mask_rows(mid_all)                # [4*Cmid, wpad+tile]
    for q in range(4):
        q_taps = _q_taps(q)
        if not q_taps:
            continue
        if stacked:
            mid = jax.lax.slice_in_dim(mid_all, q * cmid, (q + 1) * cmid,
                                       axis=0)
        else:
            win = _win(q)
            if expand:
                # native-dtype operands: full-rate MXU (_invres_kernel)
                mid = jax.lax.dot_general(
                    wexp_ref[0], win, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                mid = jnp.clip(mid + bexp_ref[:].astype(jnp.float32),
                               0.0, 6.0)
                if _DW_NATIVE:
                    mid = mid.astype(x00.dtype)
            else:
                mid = win.astype(_dw_dtype(win.dtype))
            mid = _mask_rows(mid)
        for j, si, sj in q_taps:
            start = wpad + si * w2 + sj
            xs = jax.lax.slice_in_dim(mid, start, start + tile_p, axis=1)
            term = wdw_ref[j].astype(xs.dtype) * xs
            if sj == -1:
                part_m = term if part_m is None else part_m + term
            else:
                part_0 = term if part_0 is None else part_0 + term
    p = jax.lax.broadcasted_iota(jnp.int32, (1, tile_p), 1)
    acc = part_0 + part_m * ((p % w2) >= 1).astype(part_m.dtype)
    acc = jnp.clip(acc + bdw_ref[:].astype(jnp.float32), 0.0, 6.0)
    y = jax.lax.dot_general(
        wproj_ref[0], acc.astype(wproj_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + bproj_ref[:].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pair_hw", "interpret"))
def inv_res_s2_chw(x, w_exp, b_exp, w_dw, b_dw, w_proj, b_proj, *,
                   pair_hw=None, interpret: bool = False):
    """Fused stride-2 inverted residual (torch pad=1 semantics).
    x [B, C, H, W] (H, W even) -> [B, Cout, H/2, W/2]. All weights HWIO
    with BN pre-folded; w_exp=None for t=1 blocks.

    x may also be the PRE-ROW-SPLIT plane TUPLE (even, odd), each FLAT
    [B, C, (H/2)*W] (plane ry = full-res rows 2i+ry, the
    inv_res_chw(row_split=True) output), flagged by pair_hw=(H/2, W):
    the row half of the quadrant split — the expensive strided gather —
    is then already done, and only the column deinterleave (cheap MXU
    permutation matmuls) happens here. Two SEPARATE arrays mean each
    plane is ALREADY in the kernels' (C-sublane, px-lane) layout and
    there is nothing to slice — the w%256 path reshapes each straight
    into the [B, C, px/256, 256] einsum operand with no data movement
    at all (the stacked [2,B,C,px] form still made XLA materialize
    both leading-dim slices, ~0.40 ms/b8-dispatch at 512x1024x16; the
    older 5-D [2,B,C,H/2,W] form paid ~0.9 ms of relayouts on top)."""
    pair_flat = None
    row_planes = None
    q4d = False
    inperm_mode = False
    if pair_hw is not None:
        assert isinstance(x, (tuple, list)) and len(x) == 2, \
            "pair_hw expects the (even, odd) flat plane tuple"
        h2, w = int(pair_hw[0]), int(pair_hw[1])
        b, c, _ = x[0].shape
        h = 2 * h2
        pair_flat = tuple(x)                   # each [B, C, (H/2)*W]
        dtype = x[0].dtype
    else:
        b, c, h, w = x.shape
        assert h % 2 == 0
        h2 = h // 2
        dtype = x.dtype
    assert w % 2 == 0
    w2 = w // 2
    expand = w_exp is not None
    cmid = w_dw.shape[3]
    c_out = w_proj.shape[3]
    q_flat = None   # 4 FLAT [B, C, H2*W2] quadrant arrays (3-D specs)
    if w % 256 == 0:
        # Quadrant split as row-phase block slices (lane-block aligned,
        # cheap) + column deinterleave as EXACT 0/1 permutation matmuls
        # (the MXU permutation trick) — A/B'd on v5e at 8x16x512x1024
        # vs 6.3 ms (reshape+transpose) and 13 ms (strided slices).
        # bf16 matmul of 0/1 matrices is exact. MINIMAL-K form: 256-lane
        # input chunks -> 128-lane output chunks (out px [128k, 128k+128)
        # of a quadrant row = evens/odds of input px [256k, 256k+256)),
        # so each output element contracts K=256 — 4x fewer MXU FLOPs
        # than the former chunk=w einsum — and the [b,c,K,128] output is
        # in exact row-major quadrant order: its flat [b,c,h2*w2] view
        # feeds the kernel directly (no [b,1,c,px] operand reshape
        # copies, ~0.44 ms/b8-dispatch at 512x1024x16 in the round-3
        # trace).
        ev = np.zeros((256, 128), np.float32)
        od = np.zeros((256, 128), np.float32)
        for j in range(128):
            ev[2 * j, j] = 1.0
            od[2 * j + 1, j] = 1.0
        ev = jnp.asarray(ev, dtype)
        od = jnp.asarray(od, dtype)
        if pair_flat is not None:
            planes = pair_flat                 # already flat [B, C, px]
        else:
            xr = x.reshape(b, c, h2, 2, w)
            planes = (xr[:, :, :, 0].reshape(b, c, h2 * w),
                      xr[:, :, :, 1].reshape(b, c, h2 * w))
        if _S2_INKERNEL_PERM:
            # round 5: do the perm dots INSIDE the kernel (see
            # _invres_s2_kernel inperm) — the four [b, c, kb, 128]
            # einsum intermediates and their op dispatches disappear
            # (they traced at 0.38 ms/b8 across b1/b2/b5-s2). Falls
            # back to the einsum path below if the tile alignment
            # check later fails (q4d and inperm share it).
            q_flat, q4d = list(planes), True
            inperm_mode = True   # provisional; finalized below
        else:
            # keep the einsum's NATIVE [b, c, K, 128] output (K = px/128,
            # K-sublane / 128-lane): flattening it to [b, c, px] here is a
            # genuine retile (c-sublane/px-lane) that XLA materializes as a
            # copy it cannot fuse into the pallas call (4 x 0.083 ms/b8 at
            # 8x16x512x1024 in the round-3 trace). The kernel instead takes
            # 4-D blocks and shape-casts [c, kb, 128] -> [c, kb*128]
            # in-register (the sublane->lane merge direction Mosaic lowers;
            # the front kernel relies on the same cast).
            q_flat = []
            for rp in planes:
                r = rp.reshape(b, c, (h2 * w) // 256, 256)
                for m in (ev, od):
                    q_flat.append(jnp.einsum("bckp,pq->bckq", r, m))
            q4d = True
    elif w % 128 == 0:
        # w == 128 (mod 256): fall back to the full-row-chunk einsum —
        # the minimal-K form's 64-lane output chunks would tile T(8,64)
        chunk = w
        ev = np.zeros((chunk, chunk // 2), np.float32)
        od = np.zeros((chunk, chunk // 2), np.float32)
        for j in range(chunk // 2):
            ev[2 * j, j] = 1.0
            od[2 * j + 1, j] = 1.0
        ev = jnp.asarray(ev, dtype)
        od = jnp.asarray(od, dtype)
        if pair_flat is not None:
            row_planes = tuple(pf.reshape(b, c, h2, w) for pf in pair_flat)
        else:
            xr = x.reshape(b, c, h2, 2, w)
            row_planes = (xr[:, :, :, 0], xr[:, :, :, 1])
        q_flat = []
        for rp in row_planes:
            r = rp.reshape(b, c, h2, w // chunk, chunk)
            for m in (ev, od):
                q = jnp.einsum("bchkp,pq->bchkq", r, m)
                q_flat.append(q.reshape(b, c, h2 * w2))
    elif pair_flat is not None:
        row_planes = tuple(pf.reshape(b, c, h2, w) for pf in pair_flat)
        qs = []
        for rp in row_planes:
            r = rp.reshape(b, c, h2, w2, 2)
            for rx in (0, 1):
                qs.append(r[..., rx].reshape(b, 1, c, h2 * w2))
        xq = jnp.concatenate(qs, axis=1)
        q_arrays = [(xq, q) for q in range(4)]
    else:
        xq = x.reshape(b, c, h2, 2, w2, 2)
        xq = jnp.transpose(xq, (0, 3, 5, 1, 2, 4)).reshape(b, 4, c,
                                                           h2 * w2)
        q_arrays = [(xq, q) for q in range(4)]

    # block-diag quadrant-stacked expand (see _invres_s2_kernel): raises
    # the expand dot's K from C to 4C — only pays while 4C <= 128
    stacked = expand and 4 * c <= 128
    # VMEM sizing: the plain kernel keeps ~one quadrant's f32 mid plus two
    # partials (~3*cmid rows) live; in stacked mode mid_all holds 4*cmid
    # f32 rows through the whole tap loop plus the partials and the 4C-row
    # stacked window — roughly double — so halve the pixel budget there.
    budget_px = max(1024, int(_INVRES_BUDGET / ((8 if stacked else 4) * cmid)))
    target = max(2, min(h2, max(budget_px // w2, 2)))
    rows = _pick_divisor_rows(h2, w2, target, min(h2, target * 4))
    if rows is None:
        rows = _lane_round(target, w2)
    hp2 = _round_up(h2, rows)
    if hp2 != h2:
        if inperm_mode:
            q_flat = [jnp.concatenate(
                [a, jnp.zeros(a.shape[:2] + ((hp2 - h2) * w,), a.dtype)],
                axis=2) for a in q_flat]
        elif q4d:
            q_flat = [jnp.concatenate(
                [a, jnp.zeros(a.shape[:2]
                              + (((hp2 - h2) * w2) // 128, 128), a.dtype)],
                axis=2) for a in q_flat]
        elif q_flat is not None:
            q_flat = [jnp.concatenate(
                [a, jnp.zeros(a.shape[:2] + ((hp2 - h2) * w2,), a.dtype)],
                axis=2) for a in q_flat]
        else:
            pad = {}
            q_arrays = [
                (pad.setdefault(id(a), jnp.concatenate(
                    [a, jnp.zeros(a.shape[:3] + ((hp2 - h2) * w2,),
                                  a.dtype)], axis=3)), pi)
                for a, pi in q_arrays]
    tile_p = rows * w2
    n_tiles = hp2 * w2 // tile_p
    if expand:
        we = jnp.transpose(w_exp, (0, 1, 3, 2)).reshape(cmid, c)
        if stacked:
            z = jnp.zeros((cmid, c), we.dtype)
            wexp = jnp.concatenate(
                [jnp.concatenate([we if i == q else z for i in range(4)],
                                 axis=1) for q in range(4)],
                axis=0).reshape(1, 4 * cmid, 4 * c).astype(dtype)
            bexp = jnp.tile(b_exp.reshape(cmid, 1), (4, 1))
        else:
            wexp = we.reshape(1, cmid, c).astype(dtype)
            bexp = b_exp.reshape(cmid, 1)
    else:
        wexp = jnp.zeros((1, 1, 1), dtype)
        bexp = jnp.zeros((1, 1), dtype)
    wdw = jnp.transpose(w_dw, (0, 1, 3, 2)).reshape(9, cmid, 1)
    wproj = jnp.transpose(w_proj, (0, 1, 3, 2)).reshape(1, c_out, cmid).astype(dtype)

    halo_rows = _halo_rows(rows, w2, 2)
    if q4d and tile_p % 1024 == 0 and (halo_rows * w2) % 1024:
        # prefer a (slightly thicker) 1024-px-aligned halo divisor so
        # the 4-D q blocks keep their 8-divisible sublane (k) dim —
        # cheaper than falling back to the per-quadrant retile copies
        for d in range(halo_rows + 1, rows + 1):
            if rows % d == 0 and (d * w2) % 1024 == 0:
                halo_rows = d
                break
    ratio = rows // halo_rows

    if q4d and ((halo_rows * w2) % 1024 or tile_p % 1024):
        # Pallas 4-D blocks need the sublane (k) dim divisible by 8 —
        # i.e. 1024-px-aligned views. Misaligned small shapes take the
        # old flat path (one XLA retile copy per quadrant); the
        # in-kernel perm shares the alignment need, so it first
        # materializes its deferred einsums the classic way.
        if inperm_mode:
            q_flat = [jnp.einsum("bckp,pq->bckq",
                                 rp.reshape(b, c, (hp2 * w) // 256, 256), m)
                      for rp in q_flat for m in (ev, od)]
            inperm_mode = False
        q_flat = [a.reshape(b, c, hp2 * w2) for a in q_flat]
        q4d = False

    x_specs, x_ops = [], []
    if inperm_mode:
        def pspec(blk, fn):
            # pre-perm [c, kb, 256] blocks: same K indices as qspec4
            # (K_pre = hp2*w/256 == hp2*w2/128 == K_post)
            return pl.BlockSpec((1, c, blk // 128, 256),
                                lambda bi, i, fn=fn: (bi, 0, fn(i), 0),
                                memory_space=pltpu.VMEM)
        planes4 = [a.reshape(b, c, (hp2 * w) // 256, 256) for a in q_flat]
        for arr in planes4:
            x_specs.append(pspec(halo_rows * w2,
                                 lambda i: jnp.maximum(i * ratio - 1, 0)))
            x_specs.append(pspec(tile_p, lambda i: i))
            x_ops.extend([arr, arr])
        for m in (ev, od, ev, od):   # xm2/x02 = perm mats; xm3/x03 pad
            x_specs.append(_full_spec(m.shape))
            x_ops.append(m)
    elif q4d:
        def qspec4(blk, fn):
            return pl.BlockSpec((1, c, blk // 128, 128),
                                lambda bi, i, fn=fn: (bi, 0, fn(i), 0),
                                memory_space=pltpu.VMEM)
        for arr in q_flat:
            x_specs.append(qspec4(halo_rows * w2,
                                  lambda i: jnp.maximum(i * ratio - 1, 0)))
            x_specs.append(qspec4(tile_p, lambda i: i))
            x_ops.extend([arr, arr])
    elif q_flat is not None:
        def qspec3(blk, fn):
            return pl.BlockSpec((1, c, blk),
                                lambda bi, i, fn=fn: (bi, 0, fn(i)),
                                memory_space=pltpu.VMEM)
        for arr in q_flat:
            # thin halo view: the only non-center taps are si=-1/sj=-1,
            # so halo_rows rows of the previous tile suffice (clamped +
            # masked at the top boundary)
            x_specs.append(qspec3(halo_rows * w2,
                                  lambda i: jnp.maximum(i * ratio - 1, 0)))
            x_specs.append(qspec3(tile_p, lambda i: i))
            x_ops.extend([arr, arr])
    else:
        def qspec(pi, blk, fn):
            return pl.BlockSpec((1, 1, c, blk),
                                lambda bi, i, pi=pi, fn=fn:
                                (bi, pi, 0, fn(i)),
                                memory_space=pltpu.VMEM)
        for arr, pi in q_arrays:
            x_specs.append(qspec(pi, halo_rows * w2,
                                 lambda i: jnp.maximum(i * ratio - 1, 0)))
            x_specs.append(qspec(pi, tile_p, lambda i: i))
            x_ops.extend([arr, arr])
    out = pl.pallas_call(
        functools.partial(_invres_s2_kernel, h2=h2, w2=w2, tile_p=tile_p,
                          halo_px=halo_rows * w2,
                          expand=expand, center_valid=hp2 == h2,
                          q3d=q_flat is not None and not q4d
                              and not inperm_mode,
                          q4d=q4d and not inperm_mode,
                          stacked=stacked, cmid=cmid,
                          inperm=inperm_mode),
        out_shape=jax.ShapeDtypeStruct((b, c_out, hp2 * w2), dtype),
        grid=(b, n_tiles),
        in_specs=[_full_spec(wexp.shape),
                  _full_spec(bexp.shape),
                  _full_spec(wdw.shape),
                  _full_spec((cmid, 1)),
                  _full_spec(wproj.shape),
                  _full_spec((c_out, 1)),
                  *x_specs],
        out_specs=pl.BlockSpec((1, c_out, tile_p),
                               lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wexp, bexp, wdw, b_dw.reshape(cmid, 1), wproj,
      b_proj.reshape(c_out, 1), *x_ops)
    return out.reshape(b, c_out, hp2, w2)[:, :, :h2]


# ---------------------------------------------------------------------------
# Whole-cell fusion (VERDICT r3 next#1): every node of a NAS cell in ONE
# kernel. The pair kernel (pair_op_chw) fused the two branches of one
# node; between NODES each intermediate still made a full HBM round trip
# ([8,48,256,512] bf16 = 100 MB write + read per handoff at the arch0
# headline shape — ~0.25 ms each at 819 GB/s, x4-6 handoffs per cell).
# Here the node DAG computes per row-tile entirely in VMEM: each
# intermediate is produced on an extended window (tile + its consumers'
# cumulative halo rows, overlap-recompute), rounded to the output dtype
# (bit-parity with the HBM round trip it replaces), row-masked (the
# zeros SAME padding would supply), and consumed in-register.
#
# GAP branches are per-(batch, channel) VECTORS: they enter as
# precomputed [B, C, 1] operands (fast_decoder computes them in XLA from
# MATERIALIZED entries — a GAP over an in-kernel intermediate would need
# the full plane before any tile could proceed, so nodes feeding GAPs
# stay unfused; see fast_decoder._fused_cell).
# ---------------------------------------------------------------------------


def _cell_kernel(*refs, plan, h: int, w: int, tile_p: int,
                 center_valid: bool):
    """plan = (src_exts_px, nodes, collect, n_wrefs, n_vecs); nodes =
    ((ext_px, branches), ...); branch = (entry, kind, k, dil, im2col,
    wstart, vec_idx). Entry indexing: 0..n_srcs-1 = HBM sources,
    n_srcs+i = fused node i. ref layout: [weight refs] + [vec refs] +
    [xm, x0, xp per source] + [out]."""
    src_exts, nodes, collect, n_w, n_vec = plan
    out_ref = refs[-1]
    ti = pl.program_id(1)
    row0 = ti * (tile_p // w)
    vec_refs = refs[n_w:n_w + n_vec]
    view_refs = refs[n_w + n_vec:-1]

    entries = []  # (window value, ext_px); srcs native dtype, nodes bf16
    for si, ext_px in enumerate(src_exts):
        xm, x0, xp = view_refs[3 * si:3 * si + 3]
        win = _masked_stack(xm, x0, xp, row0, tile_p, w, h, ext_px,
                            center_valid, dtype=x0.dtype)
        entries.append((win, ext_px))

    def branch_val(br, out_ext):
        entry, kind, k, dil, im2, wstart, vec_idx = br
        if kind == "none":
            return None
        if kind == "vec":
            return vec_refs[vec_idx][0].astype(jnp.float32)     # [C, 1]
        src, src_ext = entries[entry]
        tp = tile_p + 2 * out_ext
        if kind == "skip":
            xs = jax.lax.slice_in_dim(src, src_ext - out_ext,
                                      src_ext - out_ext + tp, axis=1)
            return xs.astype(jnp.float32)
        # +1 row beyond the tap reach covers the corner taps' dx lanes
        # (same invariant as conv_chw's halo_rows = dmax_dy + 1)
        halo_px = ((dil * (k // 2) + 1) * w) if k > 1 else 0
        off = src_ext - out_ext - halo_px
        xs = jax.lax.slice_in_dim(src, off, off + tp + 2 * halo_px,
                                  axis=1)
        taps = _taps(k, dil, h, w)
        if kind == "sep":
            wd, bd, wp, bp = refs[wstart:wstart + 4]
            return _sep_body(wd, bd, wp, bp, xs.astype(_dw_dtype(xs.dtype)),
                             taps=taps, w=w, tile_p=tp, halo_px=halo_px)
        wm, bb = refs[wstart:wstart + 2]
        return _conv_body(wm, bb, xs, taps=taps, depthwise=False, w=w,
                          tile_p=tp, halo_px=halo_px, relu=True,
                          im2col=im2)

    c_out = out_ref.shape[1]
    for ext_px, branches in nodes:
        total, vec = None, None
        for br in branches:
            v = branch_val(br, ext_px)
            if br[1] == "vec":
                vec = v
            elif v is not None:
                total = v if total is None else total + v
        if total is None:
            total = jnp.zeros((c_out, tile_p + 2 * ext_px), jnp.float32)
        if vec is not None:
            total = total + vec
        # round to the inter-op dtype (bit-parity with the HBM handoff
        # this fusion removes), then zero out-of-image rows ONCE — the
        # consumers' taps then read exactly SAME padding's zeros
        val = total.astype(out_ref.dtype)
        if ext_px or not center_valid:
            p = jax.lax.broadcasted_iota(
                jnp.int32, (1, tile_p + 2 * ext_px), 1)
            r = row0 - ext_px // w + p // w
            val = jnp.where((r >= 0) & (r < h), val, jnp.zeros_like(val))
        entries.append((val, ext_px))

    acc = None
    for e in collect:
        v, ext = entries[e]
        xs = jax.lax.slice_in_dim(v, ext, ext + tile_p, axis=1)
        xs = xs.astype(out_ref.dtype)
        acc = xs if acc is None else acc + xs   # same-order bf16 adds as
    out_ref[0] = acc                            # the unfused XLA epilogue


def cell_entry_ext(nodes_desc, n_srcs: int):
    """Per-entry halo reach (rows) of a fused cell DAG: ext[e] = the
    rows of entry ``e`` beyond an output row that computing that row
    transitively reads (backward propagation: max over consumers of
    consumer_ext + branch tap reach). Entries 0..n_srcs-1 are the
    materialized sources; the sharded decoder uses their ext to size
    ONE ppermute halo exchange per fused cell
    (models.fast_decoder._fused_cell_sp)."""
    n_entries = n_srcs + len(nodes_desc)

    def _halo_rows_of(br):
        if br["kind"] in ("conv", "sep"):
            return br["dil"] * (br["k"] // 2) + 1 if br["k"] > 1 else 0
        return 0

    ext = [0] * n_entries
    for i in range(len(nodes_desc) - 1, -1, -1):
        e_i = ext[n_srcs + i]
        for br in nodes_desc[i]:
            if br["kind"] in ("conv", "sep", "skip"):
                need = e_i + _halo_rows_of(br)
                ext[br["entry"]] = max(ext[br["entry"]], need)
    return ext


def cell_op_chw(srcs, nodes_desc, collect, *, interpret: bool = False):
    """Fused cell suffix: nodes (each a list of branch descriptors) over
    ``srcs`` (materialized [B, C, H, W] entries), returning the bf16
    collect sum [B, C, H, W]. Branch descriptor dicts:

      {kind: 'conv', entry, k, dil, w_folded, bias}
      {kind: 'sep',  entry, k, dil, wdw, bdw, wpw, bpw}   (one rep)
      {kind: 'skip', entry} | {kind: 'none'}
      {kind: 'vec',  vec: [B, C] f32}                      (GAP branch)

    ``entry`` indexes srcs then fused nodes (srcs + node order).
    Returns None when the shape/plan is ineligible (caller falls back to
    the per-node kernels): w % 128 != 0, no divisor row tile, or a
    source halo exceeding one neighbour tile."""
    b, c, h, w = srcs[0].shape
    if w % 128 != 0:
        return None
    n_srcs = len(srcs)
    ext = cell_entry_ext(nodes_desc, n_srcs)
    max_ext = max(ext) if ext else 0
    target = max(_TILE_PX // w, max_ext + 1, 2)
    rows = _pick_divisor_rows(h, w, target, min(h, target * 4),
                              floor=max(max_ext + 1, 2))
    if rows is None or rows <= max_ext:
        return None
    tile_p = rows * w
    n_tiles = h // rows

    # assemble weight operands + static plan
    wrefs, wspecs, plan_nodes, vecs = [], [], [], []
    for i, branches in enumerate(nodes_desc):
        pbrs = []
        for br in branches:
            kind = br["kind"]
            if kind == "conv":
                taps_l = _taps(br["k"], br["dil"], h, w)
                wm = jnp.transpose(br["w_folded"], (0, 1, 3, 2)).reshape(
                    br["k"] ** 2, br["w_folded"].shape[3],
                    br["w_folded"].shape[2]).astype(srcs[0].dtype)
                # im2col slice-windows only for REF-sourced stacks: a
                # dx-group's sublane concat needs every piece at the
                # same vreg lane offset, which Mosaic's layout inference
                # delivers for slices of a ref-loaded stack but NOT for
                # slices of a fused-node VALUE chain (hardware:
                # "result/input offset mismatch on non-concat
                # dimension", in_layouts {125,0,125} on the dil-3 conv
                # reading node1's output in the arch0 cell; a VMEM
                # scratch spill+reload did not re-anchor the offsets,
                # and pltpu.roll has no bf16 lowering). Node-sourced
                # convs use the shift-the-dot-OUTPUT im2col form
                # instead (see _conv_body), falling back to the
                # per-tap dense dot loop when disabled.
                fits = (br["w_folded"].shape[2] * len(taps_l)
                        <= _IM2COL_MAX)
                im2 = fits and br["entry"] < n_srcs
                if (fits and br["entry"] >= n_srcs
                        and _CELL_ROLL_IM2COL):
                    im2 = "shift_out"
                if im2 == "shift_out":
                    # [C_out·n_dx, C·n_dy] single-dot packing (see
                    # _conv_body): row block dxi = the dx-shifted
                    # output's weights, column block dyi = the dy
                    # piece's channels; edge-dropped taps stay zero
                    dys = sorted({t[1] for t in taps_l})
                    dxs = sorted({t[2] for t in taps_l})
                    co, ci = wm.shape[1], wm.shape[2]
                    w2 = jnp.zeros((len(dxs) * co, len(dys) * ci),
                                   wm.dtype)
                    for j, dy, dxt in taps_l:
                        xi, yi = dxs.index(dxt), dys.index(dy)
                        w2 = w2.at[xi * co:(xi + 1) * co,
                                   yi * ci:(yi + 1) * ci].set(wm[j])
                    wm = w2.reshape(1, len(dxs) * co, len(dys) * ci)
                elif im2:
                    order = [j for dx in sorted({t[2] for t in taps_l})
                             for j, _, dxt in taps_l if dxt == dx]
                    wm = jnp.transpose(
                        jnp.stack([wm[j] for j in order], 0),
                        (1, 0, 2)).reshape(1, wm.shape[1],
                                           len(taps_l) * wm.shape[2])
                wstart = len(wrefs)
                wrefs += [wm, br["bias"].reshape(-1, 1)]
                pbrs.append((br["entry"], "conv", br["k"], br["dil"],
                             im2, wstart, None))
            elif kind == "sep":
                cin = br["wdw"].shape[3]   # dw HWIO is (k, k, 1, C)
                wdw = jnp.transpose(br["wdw"], (0, 1, 3, 2)).reshape(
                    br["k"] ** 2, cin, 1)
                co = br["wpw"].shape[3]
                wpw = jnp.transpose(br["wpw"], (0, 1, 3, 2)).reshape(
                    1, co, cin).astype(srcs[0].dtype)
                wstart = len(wrefs)
                wrefs += [wdw, br["bdw"].reshape(cin, 1), wpw,
                          br["bpw"].reshape(co, 1)]
                pbrs.append((br["entry"], "sep", br["k"], br["dil"],
                             False, wstart, None))
            elif kind == "skip":
                pbrs.append((br["entry"], "skip", 1, 1, False, 0, None))
            elif kind == "vec":
                vecs.append(br["vec"].reshape(b, c, 1).astype(jnp.float32))
                pbrs.append((0, "vec", 1, 1, False, 0, len(vecs) - 1))
            else:
                pbrs.append((0, "none", 1, 1, False, 0, None))
        plan_nodes.append((ext[n_srcs + i] * w, tuple(pbrs)))
    wspecs = [_full_spec(wa.shape) for wa in wrefs]
    vspecs = [pl.BlockSpec((1, c, 1), lambda bi, i: (bi, 0, 0),
                           memory_space=pltpu.VMEM) for _ in vecs]

    views, vsp, src_exts = [], [], []
    for s, e in zip(srcs, ext[:n_srcs]):
        xf, hp = _flatten(s, rows)
        assert hp == h
        hr = _halo_rows(rows, w, max(min(e, rows), 1))
        src_exts.append(hr * w)
        views += [xf, xf, xf]
        vsp += _x_specs(s.shape[1], tile_p, n_tiles, w, hr)

    plan = (tuple(src_exts), tuple(plan_nodes), tuple(collect),
            len(wrefs), len(vecs))
    out = pl.pallas_call(
        functools.partial(_cell_kernel, plan=plan, h=h, w=w,
                          tile_p=tile_p, center_valid=True),
        out_shape=jax.ShapeDtypeStruct((b, c, h * w), srcs[0].dtype),
        grid=(b, n_tiles),
        in_specs=[*wspecs, *vspecs, *vsp],
        out_specs=pl.BlockSpec((1, c, tile_p), lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*wrefs, *vecs, *views)
    return out.reshape(b, c, h, w)
