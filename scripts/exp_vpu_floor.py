"""Measure the v5e VPU's achievable f32 rate two ways (VERDICT r3
next#1 "done" criterion: per-kernel floor proofs need a measured VPU
peak — the analytic roofline in utils/roofline.py models MXU+HBM only,
so VPU-bound depthwise tap loops have had no falsifiable floor):

  1. peak: independent-accumulator FMA chains on a VMEM-resident
     [C, TILE] f32 block — the best the VPU can do on f32 FMAs.
  2. taploop: the EXACT _dw_tap_sum pattern the production kernels run
     (dx-major windows over a halo stack, per-dx column masks) at the
     shapes the trace shows: (C=48, k=5 dil=1), (C=48, k=3 dil=3),
     (C=144, k=3), (C=32, k=3).

Timing: carry-perturbed lax.scan (see bench.py — plain loops measure
enqueue through the relay).

Usage: python scripts/exp_vpu_floor.py
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

from segtpu.kernels.chw_ops import _dw_tap_sum, _taps

SCAN = 32
REPS = 3


def _time(fn, *args):
    """ms per scan iteration, checksum-synced."""
    @jax.jit
    def step(*a):
        def body(chk, _):
            out = fn(*((a[0] + (chk % 2).astype(a[0].dtype),) + a[1:]))
            return chk + out.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, jnp.float32(0), None, length=SCAN)[0]

    _ = float(step(*args))  # compile
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        _ = float(step(*args))
        best = min(best, (time.time() - t0) / SCAN)
    return best * 1e3


def _fma_kernel(x_ref, o_ref, *, n_fma: int, n_acc: int):
    x = x_ref[...]
    accs = [x * (1.0 + 0.125 * i) for i in range(n_acc)]
    coef = [1.0 + 0.0625 * i for i in range(n_acc)]
    for j in range(n_fma // n_acc):
        for i in range(n_acc):
            accs[i] = accs[i] * coef[i] + x
    o_ref[...] = sum(accs)


def bench_peak(c=48, tile=8192, grid=64, n_fma=256, n_acc=4):
    x = jnp.ones((grid, c, tile), jnp.float32)
    f = pl.pallas_call(
        functools.partial(_fma_kernel, n_fma=(n_fma // n_acc) * n_acc,
                          n_acc=n_acc),
        out_shape=jax.ShapeDtypeStruct((grid, c, tile), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, c, tile), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, tile), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    ms = _time(f, x)
    flops = 2.0 * ((n_fma // n_acc) * n_acc) * grid * c * tile
    print(f"peak fma: C={c} tile={tile} grid={grid} n_fma={n_fma}: "
          f"{ms:.3f} ms -> {flops / ms / 1e9:.2f} TF/s f32")
    return flops / ms / 1e9


def _tap_kernel(w_ref, x_ref, o_ref, *, k, dil, w, tile_p, halo_px):
    taps = _taps(k, dil, 10**6, w)
    stack = x_ref[0].astype(jnp.float32)
    acc = _dw_tap_sum(stack, taps,
                      lambda j, xs: w_ref[j].astype(xs.dtype) * xs,
                      tile_p, w, halo_px)
    o_ref[0] = acc


def bench_taploop(c, k, dil, w=512, tile_rows=64, grid=16):
    tile_p = tile_rows * w
    halo_px = (dil * (k // 2) + 1) * w
    taps = _taps(k, dil, 10**6, w)
    x = jnp.ones((grid, c, tile_p + 2 * halo_px), jnp.bfloat16)
    wt = jnp.ones((k * k, c, 1), jnp.float32)
    f = pl.pallas_call(
        functools.partial(_tap_kernel, k=k, dil=dil, w=w, tile_p=tile_p,
                          halo_px=halo_px),
        out_shape=jax.ShapeDtypeStruct((grid, c, tile_p), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((k * k, c, 1), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, c, tile_p + 2 * halo_px),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, tile_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    ms = _time(f, wt, x)
    flops = 2.0 * len(taps) * grid * c * tile_p
    px_rate = len(taps) * grid * c * tile_p / ms / 1e9  # Gtap-px/s
    print(f"taploop: C={c} k={k} dil={dil} taps={len(taps)} "
          f"tile={tile_rows}x{w} grid={grid}: {ms:.3f} ms -> "
          f"{flops / ms / 1e9:.2f} TF/s f32 ({px_rate:.1f} Gtap-ch-px/s)")
    return flops / ms / 1e9


def _tap_kernel_roll(w_ref, x_ref, o_ref, *, k, dil, w, tile_p, halo_px):
    """dx shift via pltpu.roll on the halo stack (one rotate per dx)
    instead of a lane-misaligned slice per dx window — tests whether
    the fixed per-window cost is the misaligned-slice relayout."""
    taps = _taps(k, dil, 10**6, w)
    stack = x_ref[0].astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (1, tile_p), 1)
    acc = None
    for dx in sorted({t[2] for t in taps}):
        rolled = pltpu.roll(stack, -dx, 1) if dx else stack
        part = None
        for j, dy, dx_t in taps:
            if dx_t != dx:
                continue
            xs = jax.lax.slice_in_dim(rolled, halo_px + dy * w,
                                      halo_px + dy * w + tile_p, axis=1)
            term = w_ref[j].astype(xs.dtype) * xs
            part = term if part is None else part + term
        if dx != 0:
            colv = ((p % w) + dx >= 0) & ((p % w) + dx < w)
            part = part * colv.astype(part.dtype)
        acc = part if acc is None else acc + part
    o_ref[0] = acc


def bench_taploop_roll(c, k, dil, w=512, tile_rows=64, grid=16):
    tile_p = tile_rows * w
    halo_px = (dil * (k // 2) + 1) * w
    taps = _taps(k, dil, 10**6, w)
    x = jnp.ones((grid, c, tile_p + 2 * halo_px), jnp.bfloat16)
    wt = jnp.ones((k * k, c, 1), jnp.float32)
    f = pl.pallas_call(
        functools.partial(_tap_kernel_roll, k=k, dil=dil, w=w,
                          tile_p=tile_p, halo_px=halo_px),
        out_shape=jax.ShapeDtypeStruct((grid, c, tile_p), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((k * k, c, 1), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, c, tile_p + 2 * halo_px),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, tile_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    ms = _time(f, wt, x)
    flops = 2.0 * len(taps) * grid * c * tile_p
    print(f"taploop-ROLL: C={c} k={k} dil={dil} taps={len(taps)} "
          f"tile={tile_rows}x{w} grid={grid}: {ms:.3f} ms -> "
          f"{flops / ms / 1e9:.2f} TF/s f32")
    return flops / ms / 1e9


def main():
    print(f"# backend={jax.default_backend()} dev={jax.devices()}")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "peak"):
        bench_peak(n_fma=256, n_acc=8)
        bench_peak(n_fma=256, n_acc=4)
        bench_peak(n_fma=64, n_acc=4)
    if which in ("all", "tap"):
        # window-count scaling: k=3/5/7 at dil=1 (3/5/7 dx windows)
        bench_taploop(48, 3, 1)
        bench_taploop(48, 5, 1)
        bench_taploop(48, 7, 1)
        # decoder cell shapes (48ch @ 256x512-class tiles)
        bench_taploop(48, 3, 3)
        bench_taploop(48, 5, 6)
        # encoder mid shapes (tile rows capped: C=144 f32 windows OOM
        # the 100 MB VMEM scope at 64 rows)
        bench_taploop(144, 3, 1, tile_rows=32)
        bench_taploop(96, 3, 1, tile_rows=32)
        bench_taploop(32, 3, 1, w=1024, tile_rows=32)
    if which in ("all", "roll"):
        bench_taploop_roll(48, 3, 1)
        bench_taploop_roll(48, 5, 1)
        bench_taploop_roll(48, 3, 3)
        bench_taploop_roll(48, 5, 6)
        bench_taploop_roll(144, 3, 1)
        bench_taploop_roll(32, 3, 1, w=1024, tile_rows=32)


if __name__ == "__main__":
    main()
