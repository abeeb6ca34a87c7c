"""Pallas TPU kernel: fused bilinear-upsample + argmax mask decode.

The reference inference tail (src/engine/inference.py: F.interpolate the
[h/4, w/4, K] logits to full resolution, then argmax) materializes a
full-resolution float logit tensor — at CityScapes 2048×1024×19 that is
160 MB of HBM written and re-read per frame, dwarfing the useful output
(a 2 MB uint8 mask). XLA cannot fully fuse the two einsum interpolation
matmuls with the channel argmax.

This kernel tiles the output rows and streams classes through the grid:
for each (batch, row-tile, class) step it upsamples one class plane with
two BANDED matmuls and folds it into a running (best_value, best_index)
pair held in VMEM scratch — the full-res logits never exist in HBM.

A bilinear interp matrix has ≤2 nonzeros per row, so a 128-wide output
tile only reads a ~"tile/scale + 2" band of input rows/cols. The round-1
kernel used dense [TILE_H, h] × [h, w] × [w, W] matmuls and measured at
~90% of the f32 matmul ceiling — i.e. compute-bound on ~8× redundant
FLOPs. Banding both contractions (rows via a scalar-prefetched per-tile
start, cols via static per-subtile windows) cuts the FLOPs ~8× for the
4× decoder upsample.

Layout notes (pallas_guide.md):
  * logits enter pre-transposed to [B, K, h, w] so the lane dim is w
    (512 for CityScapes) instead of K=19 — a [.., .., 19]-last layout
    would pad lanes 19 -> 128 and blow VMEM 6.7x;
  * interpolation bands are XLA constants (static shapes) sliced per
    grid step via BlockSpec index maps;
  * ties break toward the lower class index, matching jnp.argmax.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segtpu.core.resize import _interp_matrix


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _banded(a: np.ndarray, n_tiles: int, tile: int, band: int,
            align: int = 1):
    """Dense interp [OUT, IN] -> per-tile bands [n_tiles, tile, band] +
    int32 window starts [n_tiles]. Asserts no nonzero falls outside its
    tile's band (build-time check of the banding invariant). ``align``:
    starts are rounded down to this multiple — Mosaic requires dynamic
    sublane slice offsets to be provably tile-aligned (16 for bf16)."""
    out_dim, in_dim = a.shape
    bands = np.zeros((n_tiles, tile, band), np.float32)
    starts = np.zeros((n_tiles,), np.int32)
    for t in range(n_tiles):
        rows = a[t * tile:(t + 1) * tile]
        nz = np.nonzero(rows)[1]
        s = 0 if nz.size == 0 else int(nz.min())
        s = min(s, max(in_dim - band, 0))
        s = (s // align) * align
        assert nz.size == 0 or int(nz.max()) < s + band, \
            f"interp band {band} too narrow for tile {t}"
        starts[t] = s
        bands[t] = rows[:, s:s + band]
    return bands, starts


def _kernel(starts_ref, ah_ref, awt_ref, *refs, num_classes: int,
            n_w: int, band_w: int, wc_starts, bf16_ops: bool):
    """Grid step = (batch b, output row-tile i, class k).

    starts_ref: [n_h] int32 row-window starts (scalar prefetch)
    ah_ref    : [1, TILE_H, band_h] H-interp band for tile i (f32)
    awt_ref   : [n_w, band_w, wchunk] W-interp bands, transposed (f32)
    refs      : band_h/16 input-row views, each a [1, 1, 16, w] block at
                16-row index starts[i]//16 + j (the round-2 kernel read
                the FULL class plane per (tile, class) step — n_h-fold
                redundant DMA, ~316 MB per batch-8 1024x2048 dispatch;
                banding the BlockSpec cuts it to the needed window),
                then out_ref
    val/idx   : VMEM scratch [TILE_H, W] carrying the running argmax
                across the (sequential, innermost) class dimension
    """
    out_ref, val_ref, idx_ref = refs[-3], refs[-2], refs[-1]
    views = refs[:-3]
    i = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        val_ref[:] = jnp.full_like(val_ref, -jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # views are 16-row blocks starting at starts[i] (16-aligned by
    # _banded(align=16)); sublane-concat re-assembles the band window.
    # bf16_ops (the bf16-logit engine path): native-dtype dot operands
    # with f32 accumulation — f32 operands quarter the MXU rate and the
    # tail was MXU-bound at ~1.0 ms/b8-dispatch (interp weights round to
    # bf16, <= ~0.4% of a weight; the running argmax compare stays f32).
    # The H band must be cast IN-KERNEL too: a mixed f32xbf16 dot
    # promotes to f32 operands (quarter rate) — found in the round-4
    # trace, tail 0.77 ms/b8 with only the W band cast.
    xk = jnp.concatenate([v[0, 0] for v in views], axis=0)
    xk = xk if bf16_ops else xk.astype(jnp.float32)
    ah = ah_ref[0].astype(jnp.bfloat16) if bf16_ops else ah_ref[0]
    t1 = jnp.dot(ah, xk, preferred_element_type=jnp.float32)
    t1c = t1.astype(jnp.bfloat16) if bf16_ops else t1
    cols = []
    for wj in range(n_w):                                  # static unroll
        c0 = wc_starts[wj]
        cols.append(jnp.dot(t1c[:, c0:c0 + band_w], awt_ref[wj],
                            preferred_element_type=jnp.float32))
    t2 = jnp.concatenate(cols, axis=1)                     # [TILE_H, W]
    upd = t2 > val_ref[:]
    val_ref[:] = jnp.where(upd, t2, val_ref[:])
    idx_ref[:] = jnp.where(upd, k, idx_ref[:])

    @pl.when(k == num_classes - 1)
    def _emit():
        out_ref[0] = idx_ref[:].astype(jnp.uint8)


def _h_bands(h, h16, grid_h, align_corners, row0: int, rows_out: int,
             tile_h: int, band_h: int):
    """Banded H-interp rows [row0, row0+rows_out) of the full
    [grid_h, h] interpolation matrix, padded to the row tile."""
    h_pad = _round_up(rows_out, tile_h)
    ah_full = np.zeros((h_pad, h16), np.float32)
    ah_full[:rows_out, :h] = _interp_matrix(
        h, grid_h, align_corners)[row0:row0 + rows_out]
    return _banded(ah_full, h_pad // tile_h, tile_h, band_h, align=16)


def _ua_core(x, ah, h_starts, awt, w_starts, *, k: int, tile_h: int,
             band_h: int, band_w: int, h_pad: int, w_pad: int,
             wchunk: int, interpret: bool):
    """The banded upsample+argmax pallas_call. ``ah`` ([n_h, tile_h,
    band_h]) and ``h_starts`` ([n_h] i32, 16-aligned) may be TRACED
    arrays — the sharded wrapper selects a per-shard block of stacked
    constants with ``jax.lax.axis_index`` (shard-static banding would
    need one program per shard otherwise)."""
    b, _, _, w = x.shape
    n_h, n_w = h_pad // tile_h, w_pad // wchunk
    n_views = band_h // 16

    def x_view(j):
        return pl.BlockSpec(
            (1, 1, 16, w),
            lambda bi, i, kk, s, j=j: (bi, kk, s[i] // 16 + j, 0),
            memory_space=pltpu.VMEM)

    bf16_ops = x.dtype == jnp.bfloat16
    grid = (b, n_h, k)
    return pl.pallas_call(
        functools.partial(_kernel, num_classes=k, n_w=n_w, band_w=band_w,
                          wc_starts=tuple(int(s) for s in w_starts),
                          bf16_ops=bf16_ops),
        out_shape=jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.uint8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile_h, band_h),
                             lambda bi, i, kk, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_w, band_w, wchunk),
                             lambda bi, i, kk, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                *[x_view(j) for j in range(n_views)],
            ],
            out_specs=pl.BlockSpec((1, tile_h, w_pad),
                                   lambda bi, i, kk, s: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((tile_h, w_pad), jnp.float32),
                            pltpu.VMEM((tile_h, w_pad), jnp.int32)],
        ),
        interpret=interpret,
    )(h_starts, ah, awt, *[x] * n_views)


import os

#: W-interp chunk width override for A/Bs (0 = auto; see _wchunk)
_TAIL_WCHUNK = int(os.environ.get("SEGTPU_TAIL_WCHUNK", "0"))


def _wchunk(w_pad: int) -> int:
    """Lane width of one W-interp output chunk. 128 (the round-3 value)
    leaves the W dot MXU-depth-starved at 4x upsample: K = band_w ~= 40
    of the MXU's 128, ~31% util. v5e A/B at 1024x2048 b8: 512-wide
    chunks (K=136, which crosses the 128 K-tile boundary -> 2 MXU
    passes) REGRESSED the tail 0.77 -> 1.15 ms; 256-wide (K=72, one
    pass) is selected per the same sweep. Bit-exact either way:
    widening a band only adds 0.0-weight terms."""
    cands = ((_TAIL_WCHUNK,) if _TAIL_WCHUNK else (256, 128))
    for c in cands:
        if w_pad % c == 0:
            return c
    return 128


def _band_sizes(h, h16, w, grid_h, grid_w, tile_h, wchunk: int = 128):
    # band = input span of one output tile (+2 guard), sublane-rounded.
    # The H band's dynamic start must be 16-aligned (Mosaic sublane
    # alignment for bf16 loads): widen the band by 16 for the worst-case
    # round-down loss and pad the input rows to a 16-multiple so the
    # end-of-array clamp (in_dim - band) is itself 16-aligned.
    band_h = min(h16, _round_up(-(-tile_h * h) // grid_h + 2 + 16, 16))
    band_w = min(w, _round_up(-(-wchunk * w) // grid_w + 2, 8))
    return band_h, band_w


@functools.partial(jax.jit, static_argnames=("out_hw", "crop_hw",
                                             "align_corners", "tile_h",
                                             "channel_first", "interpret"))
def upsample_argmax(logits, out_hw, *, crop_hw=None,
                    align_corners: bool = True,
                    tile_h: int = 128, channel_first: bool = False,
                    interpret: bool = False):
    """[B, h, w, K] (or [h, w, K]) logits -> [B, H, W] (or [H, W]) uint8.

    Equivalent to
    ``argmax(resize_bilinear(logits, out_hw, align_corners)[:crop], -1)``
    with f32 interpolation arithmetic. ``crop_hw`` (<= out_hw) drops the
    pad-to-stride margin by slicing the interpolation matrices — exactly
    equal to upsampling to the padded grid and cropping after.

    channel_first: logits are already [B, K, h, w] (the fast-decoder
    output layout) — skips the internal transpose.
    """
    squeeze = logits.ndim == 3
    if squeeze:
        logits = logits[None]
    if channel_first:
        b, k, h, w = logits.shape
    else:
        b, h, w, k = logits.shape
    grid_h, grid_w = int(out_hw[0]), int(out_hw[1])
    h_out, w_out = (int(crop_hw[0]), int(crop_hw[1])) if crop_hw else \
        (grid_h, grid_w)

    # pad the output rows to the tile and the output width to a lane
    # multiple (Mosaic requires 128-divisible lane blocks); crop after
    h_pad = _round_up(h_out, tile_h)
    w_pad = _round_up(w_out, 128)
    wchunk = _wchunk(w_pad)
    n_w = w_pad // wchunk
    h16 = _round_up(h, 16)
    band_h, band_w = _band_sizes(h, h16, w, grid_h, grid_w, tile_h,
                                 wchunk)

    ah, h_starts = _h_bands(h, h16, grid_h, align_corners, 0, h_out,
                            tile_h, band_h)
    aw_full = np.zeros((w_pad, w), np.float32)
    aw_full[:w_out] = _interp_matrix(w, grid_w, align_corners)[:w_out]
    awb, w_starts = _banded(aw_full, n_w, wchunk, band_w)
    awt = np.transpose(awb, (0, 2, 1))             # [n_w, band_w, wchunk]

    x = logits if channel_first else jnp.transpose(logits, (0, 3, 1, 2))
    if h16 != h:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, h16 - h), (0, 0)))

    out = _ua_core(x, jnp.asarray(ah), jnp.asarray(h_starts),
                   jnp.asarray(awt), w_starts, k=k, tile_h=tile_h,
                   band_h=band_h, band_w=band_w, h_pad=h_pad, w_pad=w_pad,
                   wchunk=wchunk, interpret=interpret)
    out = out[:, :h_out, :w_out]
    return out[0] if squeeze else out


def upsample_argmax_sharded(logits_local, out_hw, *, axis_name: str,
                            n_shards: int, align_corners: bool = True,
                            tile_h: int = 128, interpret: bool = False):
    """H-sharded tail (SURVEY §5.7 / VERDICT r3 next#3): each shard
    computes ONLY its own ``H/n`` output rows — the round-3 engine
    replicated the whole tail grid on every shard.

    logits_local: [B, K, h/n, w] H-sharded channel-first stride-4
    logits (the sharded fast-decoder output). The full stride-4 logits
    are small (5 MB bf16 at 1024x2048x19), so they are all-gathered and
    each shard runs the SAME banded kernel as the unsharded tail over
    its own row block of the interpolation matrix: per-shard banded
    constants are stacked [n_shards, ...] and selected with
    ``jax.lax.axis_index`` (one program for all shards; the bands and
    starts arrive as traced operands). Bit-exact per row vs the
    unsharded kernel — identical banded dots.

    Returns the LOCAL [B, H/n, W] uint8 mask rows.
    """
    x = jax.lax.all_gather(logits_local, axis_name, axis=2, tiled=True)
    b, k, h, w = x.shape
    grid_h, grid_w = int(out_hw[0]), int(out_hw[1])
    assert grid_h % n_shards == 0, (grid_h, n_shards)
    olr = grid_h // n_shards
    tile_h = min(tile_h, olr)
    while olr % tile_h:
        tile_h -= 1
    w_pad = _round_up(grid_w, 128)
    wchunk = _wchunk(w_pad)
    n_w = w_pad // wchunk
    h16 = _round_up(h, 16)
    band_h, band_w = _band_sizes(h, h16, w, grid_h, grid_w, tile_h,
                                 wchunk)

    bands, starts = [], []
    for s in range(n_shards):
        ah_s, st_s = _h_bands(h, h16, grid_h, align_corners, s * olr, olr,
                              tile_h, band_h)
        bands.append(ah_s)
        starts.append(st_s)
    idx = jax.lax.axis_index(axis_name)
    ah = jnp.asarray(np.stack(bands))[idx]       # [n_h_l, tile_h, band_h]
    h_starts = jnp.asarray(np.stack(starts))[idx]
    aw_full = _interp_matrix(w, grid_w, align_corners)
    if w_pad != grid_w:
        aw_full = np.concatenate(
            [aw_full, np.zeros((w_pad - grid_w, w), np.float32)], 0)
    awb, w_starts = _banded(aw_full, n_w, wchunk, band_w)
    awt = np.transpose(awb, (0, 2, 1))

    if h16 != h:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, h16 - h), (0, 0)))
    out = _ua_core(x, ah, h_starts, jnp.asarray(awt), w_starts, k=k,
                   tile_h=tile_h, band_h=band_h, band_w=band_w,
                   h_pad=olr, w_pad=w_pad, wchunk=wchunk,
                   interpret=interpret)
    return out[:, :, :grid_w]


# ---------------------------------------------------------------------------
# Flat-layout tail: consumes the (C-sublane, px-lane) FLAT logits the
# chw_ops kernels exchange, so the classifier conv feeds it with NO
# (C,px)->(h,w) relayout (a 0.288 ms/b8-dispatch copy at 8x19x256x512
# in the round-3 trace). W-FIRST decomposition: the W-interp runs at
# INPUT rows (scale_h x fewer rows than the output) as banded MXU dots
# over row groups stacked along sublanes; each OUT row is then a 2-tap
# H-interp FMA reading its two widened rows with ONE aligned dynamic
# load from VMEM scratch, followed by the class argmax (min-index-of-
# max, ties toward the lower class like jnp.argmax).
# ---------------------------------------------------------------------------


def _kernel_flat(sb_ref, jidx_ref, wgt_ref, awt_ref, *refs, R: int,
                 n_views: int, vrows: int, w: int, owp: int, kc: int,
                 kp: int, wc_starts, band_w: int, bf16_ops: bool):
    """Grid step (b, t): out rows [t*R, (t+1)*R).

    sb_ref   : [n_tiles] i32 view-block starts (scalar prefetch)
    jidx_ref : [n_tiles, R] i32 per-out-row LOW-tap row group (scalar
               prefetch), relative to the tile's view window
    wgt_ref  : [1, Rp, 128] f32 — lanes 0/1 = the 2 H-interp tap weights
    awt_ref  : [n_w, band_w, 128] W-interp bands, transposed
    refs     : n_views input-row-block views (1, kc, vrows*w), then
               out_ref (1, R, owp) u8 and z scratch [Scap*kp, owp] f32
    """
    t = pl.program_id(1)
    out_ref, z_ref = refs[n_views], refs[n_views + 1]

    # stage 1: W-widen every view row once, row groups stacked along
    # sublanes (classes padded kc -> kp so groups stay 8-aligned)
    rows = []
    for j in range(n_views):
        vb = refs[j][0]                                  # [kc, vrows*w]
        for i in range(vrows):
            xr = jax.lax.slice_in_dim(vb, i * w, (i + 1) * w, axis=1)
            if kp > kc:
                xr = jnp.concatenate(
                    [xr, jnp.zeros((kp - kc, w), xr.dtype)], axis=0)
            rows.append(xr)
    y = jnp.concatenate(rows, axis=0)                    # [Scap*kp, w]
    y = y if bf16_ops else y.astype(jnp.float32)
    cols = []
    for wj, c0 in enumerate(wc_starts):                  # static unroll
        cols.append(jax.lax.dot_general(
            y[:, c0:c0 + band_w], awt_ref[wj], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    z_ref[:] = jnp.concatenate(cols, axis=1)             # [Scap*kp, owp]

    # stage 2: 2-tap H-interp + class argmax per out row
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (kp, owp), 0)
    outs = []
    for r in range(R):
        j = jidx_ref[t, r]
        a = z_ref[pl.ds(pl.multiple_of(j * kp, 8), 2 * kp), :]  # [2*kp, owp]
        yr = (a[:kp] * wgt_ref[0, r, 0] + a[kp:] * wgt_ref[0, r, 1])
        yrm = jnp.where(iota_c < kc, yr, -jnp.inf)
        m = jnp.max(yrm, axis=0, keepdims=True)
        outs.append(jnp.min(jnp.where(yrm >= m, iota_c, kp + 255),
                            axis=0, keepdims=True))
    out_ref[0] = jnp.concatenate(outs, axis=0).astype(jnp.uint8)


def flat_tail_profitable(dec_w: int) -> bool:
    """Measured engagement gate for the flat W-first tail
    (scripts/ab_tail.py on v5e): needs dec_w % 128 == 0 (flat lane
    blocks), and only WINS at narrow decoder widths. At dec_w=128
    (512-wide output, b16) flat 1.47 vs 4-D-incl-retile 1.51 ms; at
    dec_w=512 (2048-wide output, b8) flat 2.62 vs 1.93 — the per-out-row
    2-tap H-FMA reads of the f32 W-interp scratch scale with the
    UPSAMPLED row width and swamp the saved 0.29 ms (C,px)->(h,w)
    retile. Callers fall back to the 4-D banded kernel when False."""
    return dec_w % 128 == 0 and dec_w <= 128


@functools.partial(jax.jit, static_argnames=("in_hw", "out_hw", "crop_hw",
                                             "align_corners", "tile_r",
                                             "interpret"))
def upsample_argmax_flat(logits_flat, in_hw, out_hw, *, crop_hw=None,
                         align_corners: bool = True, tile_r: int = 64,
                         interpret: bool = False):
    """[B, K, h*w] flat channel-first logits -> [B, H, W] uint8.

    Bit-equal to ``upsample_argmax(logits.reshape(B,K,h,w), out_hw,
    crop_hw, channel_first=True)`` up to f32-associativity of the
    2-tap H sum (same interp matrices, f32 accumulation). Requires
    w % 128 == 0 (flat lane blocks); callers fall back to the 4-D
    kernel otherwise. tile_r: out rows per grid step."""
    b, kc, hw = logits_flat.shape
    h, w = int(in_hw[0]), int(in_hw[1])
    assert h * w == hw and w % 128 == 0, (in_hw, hw)
    grid_h, grid_w = int(out_hw[0]), int(out_hw[1])
    assert grid_h >= h and grid_w >= w
    h_out, w_out = (int(crop_hw[0]), int(crop_hw[1])) if crop_hw else \
        (grid_h, grid_w)

    owp = _round_up(w_out, 128)
    n_w = owp // 128
    band_w = min(w, _round_up(-(-128 * w) // grid_w + 2, 8))
    aw_full = np.zeros((owp, w), np.float32)
    aw_full[:w_out] = _interp_matrix(w, grid_w, align_corners)[:w_out]
    awb, w_starts = _banded(aw_full, n_w, 128, band_w)
    awt = np.transpose(awb, (0, 2, 1))                 # [n_w, band_w, 128]

    R = min(tile_r, _round_up(h_out, 8))
    ohp = _round_up(h_out, R)
    n_t = ohp // R
    kp = _round_up(kc, 8)
    vrows = 128 // math.gcd(w, 128)
    vrows *= max(1, (4096 // w) // vrows) if w <= 4096 else 1

    ah = _interp_matrix(h, grid_h, align_corners)      # [grid_h, h] 2nnz
    lo = np.zeros((ohp,), np.int64)
    w01 = np.zeros((ohp, 2), np.float32)
    for r in range(h_out):
        nz = np.nonzero(ah[r])[0]
        lo[r] = int(nz[0])
        w01[r, 0] = ah[r, lo[r]]
        if lo[r] + 1 < h:
            w01[r, 1] = ah[r, lo[r] + 1]
    starts = np.zeros((n_t,), np.int32)
    span = 0
    for t in range(n_t):
        s = (int(lo[t * R:(t + 1) * R].min()) // vrows) * vrows
        starts[t] = s // vrows                          # block index
        span = max(span, int(lo[t * R:(t + 1) * R].max()) - s + 2)
    n_views = -(-span // vrows)
    scap = n_views * vrows
    jidx = np.zeros((n_t, R), np.int32)
    for t in range(n_t):
        # pad rows (r >= h_out) carry lo=0, which can fall below the
        # tile's window — clamp into the scratch (their weights are 0,
        # the loaded values never contribute)
        jidx[t] = np.clip(lo[t * R:(t + 1) * R] - starts[t] * vrows,
                          0, scap - 2)
    rp = _round_up(R, 8)
    wgt = np.zeros((n_t, rp, 128), np.float32)
    wgt[:, :R, 0:2] = w01.reshape(n_t, R, 2)

    xf = logits_flat
    hp_in = _round_up(h, vrows)
    if hp_in != h:
        xf = jnp.concatenate(
            [xf, jnp.zeros((b, kc, (hp_in - h) * w), xf.dtype)], axis=2)
    max_blk = hp_in // vrows - 1

    def view_spec(j):
        return pl.BlockSpec(
            (1, kc, vrows * w),
            lambda bi, t, sb, ji, j=j: (bi, 0,
                                        jnp.minimum(sb[t] + j, max_blk)),
            memory_space=pltpu.VMEM)

    bf16_ops = xf.dtype == jnp.bfloat16
    out = pl.pallas_call(
        functools.partial(_kernel_flat, R=R, n_views=n_views, vrows=vrows,
                          w=w, owp=owp, kc=kc, kp=kp,
                          wc_starts=tuple(int(s) for s in w_starts),
                          band_w=band_w, bf16_ops=bf16_ops),
        out_shape=jax.ShapeDtypeStruct((b, ohp, owp), jnp.uint8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, n_t),
            in_specs=[
                pl.BlockSpec((1, rp, 128), lambda bi, t, sb, ji: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_w, band_w, 128),
                             lambda bi, t, sb, ji: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                *[view_spec(j) for j in range(n_views)],
            ],
            out_specs=pl.BlockSpec((1, R, owp),
                                   lambda bi, t, sb, ji: (bi, t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((scap * kp, owp), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(starts), jnp.asarray(jidx), jnp.asarray(wgt),
      jnp.asarray(awt, dtype=jnp.bfloat16 if bf16_ops else jnp.float32),
      *[xf] * n_views)
    return out[:, :h_out, :w_out]
