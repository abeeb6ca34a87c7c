"""Experiment: tail (upsample+argmax) consuming FLAT logits, clf folded.

The production tail (kernels.upsample_argmax) takes 4-D [B, K, h, w]
logits; the classifier conv's flat (C-sublane, px-lane) output must be
relayed out to (h-sublane, w-lane) first — reshape.1356, 0.29 ms/b8 at
1024x2048 — and the 1x1 classifier itself is a separate kernel
(0.25 ms). A tail that reads the 48-channel decoder feature map FLAT
[B, 48, h*w], applies the [K, 48] classifier dot in-kernel, and
retiles each class band [1, band_h*w] -> [band_h, w] in VMEM would
remove both.

The open question measured here on hardware: Mosaic's in-VMEM
lane->sublane retile cost for [1, band*w] -> [band, w], 19 classes per
row-tile, plus the once-per-tile [19,48]x[48,band*w] clf dot — vs the
XLA chain (clf conv kernel + reshape copy + 4-D tail).

Run on TPU: python scripts/exp_tail_flat.py [h w K] (default 256 512
19 -> the 1024x2048 stride-4 grid; output 4x upsample)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segtpu.kernels.upsample_argmax import _banded, _round_up
from segtpu.core.resize import _interp_matrix


def _kernel(starts_ref, ah_ref, awt_ref, wclf_ref, bclf_ref, *refs,
            num_classes: int, n_w: int, band_w: int, band_h: int, w: int,
            wc_starts):
    """Grid step = (batch, output row-tile). One feat-band read, one
    clf dot, then per class: lane->sublane retile + banded H/W interp
    + running argmax — all classes inside the step (no VMEM carry
    across grid steps needed)."""
    out_ref = refs[-1]
    views = refs[:-1]
    # feat band: [48, band_h * w] flat (C-sublane, px-lane)
    feat = jnp.concatenate([v[0] for v in views], axis=1)
    logits = jax.lax.dot_general(
        wclf_ref[:], feat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [K, band_h*w]
    logits = (logits + bclf_ref[:]).astype(jnp.bfloat16)
    val = None
    idx = None
    for k in range(num_classes):
        # THE measured retile: [1, band_h*w] -> [band_h, w]
        xk = jax.lax.slice_in_dim(logits, k, k + 1,
                                  axis=0).reshape(band_h, w)
        t1 = jnp.dot(ah_ref[0], xk, preferred_element_type=jnp.float32)
        t1c = t1.astype(jnp.bfloat16)
        cols = []
        for wj in range(n_w):
            c0 = wc_starts[wj]
            cols.append(jnp.dot(t1c[:, c0:c0 + band_w], awt_ref[wj],
                                preferred_element_type=jnp.float32))
        t2 = jnp.concatenate(cols, axis=1)
        if val is None:
            val, idx = t2, jnp.zeros_like(t2, dtype=jnp.int32)
        else:
            upd = t2 > val
            val = jnp.where(upd, t2, val)
            idx = jnp.where(upd, k, idx)
    out_ref[0] = idx.astype(jnp.uint8)


def build_flat_tail(b, h, w, k, cin, grid_hw, tile_h=512):
    grid_h, grid_w = grid_hw
    h_pad = _round_up(grid_h, tile_h)
    w_pad = _round_up(grid_w, 128)
    n_h, n_w = h_pad // tile_h, w_pad // 128
    h16 = _round_up(h, 16)
    band_h = min(h16, _round_up(-(-tile_h * h) // grid_h + 2 + 16, 16))
    band_w = min(w, _round_up(-(-128 * w) // grid_w + 2, 8))
    ah_full = np.zeros((h_pad, h16), np.float32)
    ah_full[:grid_h, :h] = _interp_matrix(h, grid_h, True)
    aw_full = np.zeros((w_pad, w), np.float32)
    aw_full[:grid_w] = _interp_matrix(w, grid_w, True)
    ah, h_starts = _banded(ah_full, n_h, tile_h, band_h, align=16)
    awb, w_starts = _banded(aw_full, n_w, 128, band_w)
    awt = np.transpose(awb, (0, 2, 1))
    n_views = band_h // 16

    def x_view(j):
        return pl.BlockSpec(
            (1, cin, 16 * w),
            lambda bi, i, s, j=j: (bi, 0, s[i] // 16 + j),
            memory_space=pltpu.VMEM)

    rng = np.random.RandomState(5)
    wclf = jnp.asarray(rng.randn(k, cin) * 0.3, jnp.bfloat16)
    bclf = jnp.asarray(rng.randn(k, 1) * 0.1, jnp.float32)

    @jax.jit
    def tail(feat_flat):   # [B, cin, h16*w] bf16
        return pl.pallas_call(
            functools.partial(_kernel, num_classes=k, n_w=n_w,
                              band_w=band_w, band_h=band_h, w=w,
                              wc_starts=tuple(int(s) for s in w_starts)),
            out_shape=jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.uint8),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, n_h),
                in_specs=[
                    pl.BlockSpec((1, tile_h, band_h),
                                 lambda bi, i, s: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_w, band_w, 128),
                                 lambda bi, i, s: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(wclf.shape, lambda bi, i, s: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(bclf.shape, lambda bi, i, s: (0, 0),
                                 memory_space=pltpu.VMEM),
                    *[x_view(j) for j in range(n_views)],
                ],
                out_specs=pl.BlockSpec((1, tile_h, w_pad),
                                       lambda bi, i, s: (bi, i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(jnp.asarray(h_starts), jnp.asarray(ah, jnp.bfloat16),
          jnp.asarray(awt, jnp.bfloat16), wclf, bclf,
          *[feat_flat] * n_views)

    return tail, (wclf, bclf)


def main():
    h, w, k = ((int(v) for v in sys.argv[1:4]) if len(sys.argv) > 3
               else (256, 512, 19))
    b, cin = 8, 48
    grid_hw = (4 * h, 4 * w)
    h16 = _round_up(h, 16)
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(b, cin, h16 * w) * 0.5, jnp.bfloat16)

    tail, (wclf, bclf) = build_flat_tail(b, h, w, k, cin, grid_hw)

    # XLA reference chain: clf dot + reshape + 4-D Pallas tail
    from segtpu.kernels.upsample_argmax import upsample_argmax

    @jax.jit
    def ref(feat_flat):
        lg = (jnp.einsum("kc,bcp->bkp", wclf, feat_flat)
              + bclf.reshape(1, k, 1)).astype(jnp.bfloat16)
        lg4 = lg.reshape(b, k, h16, w)[:, :, :h]
        return upsample_argmax(lg4, grid_hw, align_corners=True,
                               channel_first=True, tile_h=512)

    t0 = time.time()
    got = np.asarray(tail(feat))
    print(f"compile+run fused: {time.time() - t0:.1f}s")
    want = np.asarray(ref(feat))
    agree = (got[:, :want.shape[1], :want.shape[2]] == want).mean()
    print("mask agreement vs XLA chain:", agree)

    for name, fn in (("xla-chain", ref), ("fused-flat", tail)):
        fn(feat).block_until_ready()
        reps = 20
        t0 = time.time()
        for _ in range(reps):
            out = fn(feat)
        out.block_until_ready()
        dt = (time.time() - t0) / reps * 1000
        print(f"{name}: {dt:.3f} ms/dispatch (b{b} {h}x{w}->{grid_hw})")


if __name__ == "__main__":
    main()
