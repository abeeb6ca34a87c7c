"""Pallas TPU kernel: fused normalize + space-to-depth front.

The XLA front (engine.inference._normalize_s2d_chw, w % 256 == 0) runs
12 per-channel [768,128] permutation einsums and a jnp.stack; the
stack's fused relayout — (k,128) einsum tiles -> flat (12-sublane,
px-lane) CHW — measured 0.72 ms/b8-dispatch at 1024x2048 and the einsum
intermediates make an extra HBM round trip. This kernel reads the
PAIR-BLOCKED uint8 input (engine.inference._stage_u8's production form)
once, runs the 12 permutation dots on the MXU, retiles in VMEM, and
writes the flat [N, 12, (H/2)*(W/2)] planes once. A/B on v5e b8
1024x2048 (scripts/exp_front_kernel.py): 2.41 vs 2.70 ms isolated.

Numerics: the bf16 path (production) matches the XLA front BIT-FOR-BIT
by reproducing its rounding order exactly — scale folded into the bf16
permutation matrix, dot accumulated f32 and rounded to bf16 (one RNE
round, the same single round the XLA einsum applies), then the bf16
bias added in bf16 arithmetic. The f32 path (unscaled 0/1 bf16 dot —
exact on uint8 values — then f32 scale/mean/std on the VPU) agrees
only to ~1 f32 ulp: XLA's algebraic simplifier rewrites the
divide-by-std differently inside vs outside the kernel, so the engine
gates this kernel to compute_dtype=bf16 and keeps the XLA front for
the exact-f32 parity paths.
Mosaic has no direct u8->float casts: values widen u8 -> i32 -> bf16
(exact for 0..255).

Reference: the chain this fuses is src/engine/inference.py::prepare_img
+ the encoder stem's input prep (SURVEY.md §3.3).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _front_kernel(pe_ref, po_ref, x_ref, out_ref, *, rows: int,
                  fold_bf16: bool, bias, scale_mean_std):
    """Grid step = (batch, row-pair tile). x_ref block: uint8
    [1, R, k2, 768] pair-blocked rows (k2 = (W*6)//768; even-row bytes
    are sub-block [:, :k2//2], odd the rest). Writes the 12 normalized
    s2d planes flat [1, 12, R*(W/2)] — the (R*k,128) -> (1, R*k*128)
    sublane->lane retile happens in VMEM."""
    x = x_ref[0]
    k2 = x.shape[1]
    k = k2 // 2
    xe = (x[:, :k].astype(jnp.int32).astype(jnp.bfloat16)
          .reshape(rows * k, 768))
    xo = (x[:, k:].astype(jnp.int32).astype(jnp.bfloat16)
          .reshape(rows * k, 768))
    planes = []
    for c in range(12):
        src = xe if c < 6 else xo
        pm = pe_ref if c < 6 else po_ref
        # (the permutation matrix is block-diagonal, but splitting into
        # two K=384 dots with 64-lane outputs REGRESSED 3.4x on v5e —
        # the sub-128-lane concat lowers to per-vreg shuffles; keep the
        # single K=768 dot)
        yc = jax.lax.dot_general(
            src, pm[c % 6], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if fold_bf16:
            # round the dot ONCE (as the XLA bf16 einsum does), then
            # add the bf16 bias in bf16
            yc = yc.astype(jnp.bfloat16) + jnp.bfloat16(bias[c])
        else:
            s, m, d = scale_mean_std
            # the XLA f32 path's exact op order: exact-int bf16 dot ->
            # f32 -> *scale -> -mean -> /std
            yc = (yc * np.float32(s) - np.float32(m[c])) / np.float32(d[c])
        planes.append(yc.astype(out_ref.dtype).reshape(1, rows * k * 128))
    out_ref[0] = jnp.concatenate(planes, axis=0)


@functools.partial(jax.jit, static_argnames=("hw", "out_dtype", "interpret"))
def normalize_s2d_front(blocked_u8, *, hw, out_dtype=jnp.bfloat16,
                        interpret: bool = False):
    """uint8 pair-blocked [N, H/2, (W*6)//768, 768] (_stage_u8's
    production staging; W % 256 == 0) -> normalized CHW s2d planes,
    FLAT [N, 12, (H/2)*(W/2)] in the (C-sublane, px-lane) layout every
    downstream CHW kernel consumes. Bit-identical to
    engine.inference._normalize_s2d_chw for both compute dtypes."""
    from segtpu.engine.inference import _s2d_perm_mats
    from segtpu.kernels.chw_ops import _pick_divisor_rows
    from segtpu.utils.helpers import IMG_MEAN, IMG_SCALE, IMG_STD

    n, h2, k2, _ = blocked_u8.shape
    h, w = int(hw[0]), int(hw[1])
    assert w % 256 == 0 and h2 == h // 2 and k2 == (w * 6) // 768
    w2 = w // 2
    fold_bf16 = out_dtype == jnp.bfloat16

    mean12 = np.tile(np.asarray(IMG_MEAN, np.float32), 4)
    std12 = np.tile(np.asarray(IMG_STD, np.float32), 4)
    scale = IMG_SCALE / std12
    p0, p1 = _s2d_perm_mats()
    pe = np.zeros((6, 768, 128), np.float32)
    po = np.zeros((6, 768, 128), np.float32)
    for c in range(12):
        pc = (p0 if c < 6 else p1)[:, np.arange(64) * 12 + c]   # [384, 64]
        p2 = np.zeros((768, 128), np.float32)
        p2[:384, :64] = pc
        p2[384:, 64:] = pc
        (pe if c < 6 else po)[c % 6] = p2 * scale[c] if fold_bf16 else p2
    bias = tuple(float(np.asarray(-mean12[c] / std12[c], np.float32))
                 for c in range(12))

    rows = _pick_divisor_rows(h2, w2, 16, min(h2, 64)) or 1
    n_tiles = h2 // rows
    out = pl.pallas_call(
        functools.partial(_front_kernel, rows=rows, fold_bf16=fold_bf16,
                          bias=bias,
                          scale_mean_std=(float(IMG_SCALE), tuple(mean12),
                                          tuple(std12))),
        out_shape=jax.ShapeDtypeStruct((n, 12, h2 * w2), out_dtype),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((6, 768, 128), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 768, 128), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, k2, 768), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 12, rows * w2),
                               lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(pe, jnp.bfloat16), jnp.asarray(po, jnp.bfloat16),
      blocked_u8)
    return out
