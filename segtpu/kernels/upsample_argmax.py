"""Pallas TPU kernel: fused bilinear-upsample + argmax mask decode.

The reference inference tail (src/engine/inference.py: F.interpolate the
[h/4, w/4, K] logits to full resolution, then argmax) materializes a
full-resolution float logit tensor — at CityScapes 2048×1024×19 that is
160 MB of HBM written and re-read per frame, dwarfing the useful output
(a 2 MB uint8 mask). XLA cannot fully fuse the two einsum interpolation
matmuls with the channel argmax.

This kernel streams over classes instead: for each output row-tile it
computes the H-interp and W-interp as two small MXU matmuls per class
and folds the class into a running (best_value, best_index) pair held in
VMEM — the full-res logits never exist. Per frame HBM traffic drops from
~165 MB to ~7 MB (quarter-res logits in + uint8 mask out).

Layout notes (pallas_guide.md):
  * logits enter pre-transposed to [B, K, h, w] so the lane dim is w
    (512 for CityScapes) instead of K=19 — a [.., .., 19]-last layout
    would pad lanes 19 -> 128 and blow VMEM 6.7x;
  * interpolation matrices are XLA constants (static shapes), sliced
    per grid step via BlockSpec index maps;
  * ties break toward the lower class index, matching jnp.argmax.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segtpu.core.resize import _interp_matrix


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(ah_ref, awt_ref, x_ref, out_ref, *, num_classes: int):
    """Grid step = (batch b, output row-tile i).

    ah_ref : [TILE_H, h]  H-interp rows for this tile (f32)
    awt_ref: [w, W]       W-interp, transposed (f32)
    x_ref  : [1, K, h, w] quarter-res logits for batch b
    out_ref: [1, TILE_H, W] uint8 mask tile
    """
    ah = ah_ref[:]
    awt = awt_ref[:]
    tile_h, _ = ah.shape
    w_out = awt.shape[1]
    best_val = jnp.full((tile_h, w_out), -jnp.inf, jnp.float32)
    best_idx = jnp.zeros((tile_h, w_out), jnp.int32)
    for k in range(num_classes):  # static unroll over classes
        xk = x_ref[0, k].astype(jnp.float32)           # [h, w]
        t1 = jnp.dot(ah, xk, preferred_element_type=jnp.float32)
        t2 = jnp.dot(t1, awt, preferred_element_type=jnp.float32)
        upd = t2 > best_val
        best_val = jnp.where(upd, t2, best_val)
        best_idx = jnp.where(upd, k, best_idx)
    out_ref[0] = best_idx.astype(jnp.uint8)


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
    ah = np.zeros((h_pad, h), np.float32)
    ah[:h_out] = _interp_matrix(h, grid_h, align_corners)[:h_out]
    awt = np.zeros((w, w_pad), np.float32)
    awt[:, :w_out] = _interp_matrix(w, grid_w, align_corners).T[:, :w_out]

    x = logits if channel_first else jnp.transpose(logits, (0, 3, 1, 2))

    grid = (b, h_pad // tile_h)
    out = pl.pallas_call(
        functools.partial(_kernel, num_classes=k),
        out_shape=jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_h, h), lambda bi, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w_pad), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, h, w), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w_pad), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(ah), jnp.asarray(awt), x)
    out = out[:, :h_out, :w_out]
    return out[0] if squeeze else out
