"""Pallas TPU kernel: bilinear upsample on the flat-pixel CHW layout.

The decoder's resizes (fast_decoder._resize_chw) were the last ops in
the inference fast path consuming 4-D [B, C, H, W]: every einsum resize
forced XLA to materialize a (h-sublane, w-lane) relayout of the flat
[C, H*W] tensors the chw_ops kernels exchange — profiled at ~1.4 ms of
pure layout copies per batch-8 1024x2048 dispatch (reference chain:
src/nn/micro_decoders.py upsamples inside AggregateCell / the collect
concat; SURVEY.md §3.5).

This kernel stays in the flat layout end to end:

  * H-interp: an output row is a 2-tap combination of input rows; input
    rows are LANE-ALIGNED w-wide chunks of row-block views selected by a
    prefetched per-tile window start, so each output row is a static
    per-view scalar FMA — the per-(tile,row,view) weights are a
    precomputed band of the interp matrix (zero where the view misses);
  * W-interp: one [C, w] x [w, OW] MXU matmul per output row (f32
    accumulation; the dense [OW, w] matrix is the same one the einsum
    path uses), written to a static lane slice of the output tile;
  * optional ``acc`` fused into the output write (the AggregateCell's
    resize(a) + resize(b) pair add costs no extra HBM pass).

Block geometry: views are row-blocks of ``block_rows = 128/gcd(w, 128)``
input rows so every block's lane count is 128-divisible for any w; the
window start is rounded down to a block multiple (slack absorbed into
the weight band). Upsampling only — callers fall back to the einsum
path for identity/downsizing.
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


def _kernel(starts_ref, wrow_ref, awt_ref, *refs, R: int, V: int,
            block_rows: int, w: int, ow: int, c: int, has_acc: bool,
            n_stage: int = 0):
    """Grid step (b, t): out rows [t*R, (t+1)*R).

    starts_ref: [n_tiles] int32 input-row-block window starts (prefetch)
    wrow_ref  : [1, R, 128] f32 — weight of view-row j for out row r
    awt_ref   : [w, OW] f32 W-interp matrix (transposed interp matrix)
    refs      : Vb view refs (1, c, block_rows*w) + optional acc
                (1, c_acc, R*ow) [+ n_stage (wm, bias) pairs applied to
                acc as a bit-exact pointwise chain — see
                chw_ops._pw_chain_kernel] + out_ref (1, c, R*ow)
    """
    n_views = -(-V // block_rows)
    views = refs[:n_views]
    acc_ref = refs[n_views] if has_acc else None
    stage_refs = refs[n_views + 1:n_views + 1 + 2 * n_stage]
    out_ref = refs[-1]

    # view rows j = 0..V-1 live at view j // block_rows, static lane
    # offset (j % block_rows) * w
    rows = []
    for r in range(R):
        yr = None
        for j in range(V):
            vb = views[j // block_rows]
            xs = jax.lax.slice_in_dim(vb[0], (j % block_rows) * w,
                                      (j % block_rows + 1) * w, axis=1)
            term = wrow_ref[0, r, j] * xs.astype(jnp.float32)
            yr = term if yr is None else yr + term
        zr = jax.lax.dot_general(yr, awt_ref[:, :],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        rows.append(zr)
    out = jnp.concatenate(rows, axis=1)          # [c, R*ow]
    if has_acc:
        a = acc_ref[0]
        for i in range(n_stage):
            z = jax.lax.dot_general(
                stage_refs[2 * i][0], a,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            z = jnp.maximum(
                z + stage_refs[2 * i + 1][:].astype(jnp.float32), 0.0)
            a = z.astype(out_ref.dtype)   # HBM-storage rounding
        out = out + a.astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_hw", "align_corners",
                                             "interpret"))
def resize_chw_pallas(x, out_hw, acc=None, acc_stages=None, *,
                      align_corners: bool = True,
                      interpret: bool = False):
    """x [B, C, h, w] -> [B, C, OH, OW] bilinear upsample (torch
    F.interpolate semantics for both align_corners settings), computed
    in f32, returned in x.dtype. acc: optional [B, C, OH, OW] added into
    the result in-kernel. Upsampling only (OH >= h, OW >= w).

    acc_stages: optional [(w_folded HWIO, bias), ...] — acc is then a
    RAW [B, C_acc, OH, OW] tensor run through the bit-exact pointwise
    chain (chw_ops.pw_chain_chw semantics) in-kernel before the add:
    the AggregateCell identity branch's adapt->agg 1x1 pair never
    touches HBM (fast_decoder's lazy-tap fusion, floor-table row
    `dec-adapts`)."""
    b, c, h, w = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    assert oh >= h and ow >= w and ow % 128 == 0, (h, w, oh, ow)

    # out rows per tile: ~4k-lane output tiles, divisor of OH
    target = max(1, min(oh, 4096 // ow))
    R = 1
    for r in range(target, 0, -1):
        if oh % r == 0:
            R = r
            break
    n_tiles = oh // R

    block_rows = 128 // math.gcd(w, 128)
    ah = _interp_matrix(h, oh, align_corners)          # [OH, h], 2 nnz/row
    starts = np.zeros((n_tiles,), np.int32)
    spans = []
    for t in range(n_tiles):
        nz = np.nonzero(ah[t * R:(t + 1) * R])[1]
        s = (int(nz.min()) // block_rows) * block_rows
        starts[t] = s
        spans.append(int(nz.max()) + 1 - s)
    V = max(spans)
    n_views = -(-V // block_rows)
    # per-(tile, out-row, view-row) H weights; rows padded to a sublane
    # multiple, lanes to 128 (Mosaic block divisibility)
    Rp = _round_up(R, 8)
    wrow = np.zeros((n_tiles, Rp, 128), np.float32)
    for t in range(n_tiles):
        lo = starts[t]
        hi = min(lo + V, h)
        wrow[t, :R, :hi - lo] = ah[t * R:(t + 1) * R, lo:hi]
    assert V <= 128

    awt = np.ascontiguousarray(_interp_matrix(w, ow, align_corners).T)

    xf = x.reshape(b, c, h * w)
    # clamp so every view block stays in bounds (weights are zero there)
    max_blk = h // block_rows - 1 if h % block_rows == 0 else h // block_rows
    hp = _round_up(h, block_rows)
    if hp != h:
        xf = jnp.concatenate(
            [xf, jnp.zeros((b, c, (hp - h) * w), xf.dtype)], axis=2)
        max_blk = hp // block_rows - 1

    def view_spec(j):
        return pl.BlockSpec(
            (1, c, block_rows * w),
            lambda bi, t, s, j=j: (bi, 0,
                                   jnp.minimum(s[t] // block_rows + j,
                                               max_blk)),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, Rp, 128), lambda bi, t, s: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((w, ow), lambda bi, t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        *[view_spec(j) for j in range(n_views)],
    ]
    operands = [jnp.asarray(wrow), jnp.asarray(awt)] + [xf] * n_views
    has_acc = acc is not None
    n_stage = 0
    if has_acc:
        c_acc = acc.shape[1]
        in_specs.append(pl.BlockSpec((1, c_acc, R * ow),
                                     lambda bi, t, s: (bi, 0, t),
                                     memory_space=pltpu.VMEM))
        operands.append(acc.reshape(b, c_acc, oh * ow))
        if acc_stages:
            n_stage = len(acc_stages)
            assert acc_stages[-1][0].shape[3] == c
            for wf, bias in acc_stages:
                wm = jnp.transpose(wf, (0, 1, 3, 2)).reshape(
                    1, wf.shape[3], wf.shape[2]).astype(x.dtype)
                bb = bias.reshape(bias.shape[0], 1)
                in_specs.append(pl.BlockSpec(
                    wm.shape, lambda bi, t, s: (0, 0, 0),
                    memory_space=pltpu.VMEM))
                in_specs.append(pl.BlockSpec(
                    bb.shape, lambda bi, t, s: (0, 0),
                    memory_space=pltpu.VMEM))
                operands.extend([wm, bb])
        else:
            assert c_acc == c

    out = pl.pallas_call(
        functools.partial(_kernel, R=R, V=V, block_rows=block_rows, w=w,
                          ow=ow, c=c, has_acc=has_acc, n_stage=n_stage),
        out_shape=jax.ShapeDtypeStruct((b, c, oh * ow), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_tiles),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, c, R * ow),
                                   lambda bi, t, s: (bi, 0, t),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(starts), *operands)
    return out.reshape(b, c, oh, ow)
