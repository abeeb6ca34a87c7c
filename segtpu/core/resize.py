"""Exact bilinear resize, MXU-formulated.

Per-pixel parity with PyTorch ``F.interpolate(mode='bilinear')`` is the
single biggest parity risk for this model family (SURVEY.md §7.3 item 1):
``jax.image.resize`` only implements half-pixel (align_corners=False)
semantics and uses a different kernel composition for downscaling. We
instead build the two separable 1-D interpolation matrices explicitly
(each row has exactly two non-zeros, identical to torch's 2-tap bilinear)
and apply them as dense matmuls:

    out[o, p, c] = sum_i sum_j  A_h[o, i] * x[i, j, c] * A_w[p, j]

Two dense matmuls is the TPU-first formulation: both land on the MXU,
XLA fuses surrounding elementwise work into them, and the gather-free
form avoids the scalar/dynamic-slice path that would fall onto the VPU.
Interpolation matrices depend only on static shapes, so they become XLA
constants inside ``jit``.

Reference behavior reproduced: src/nn/micro_decoders.py (cell/decoder
upsampling) and src/engine/inference.py (final logit upsample), both of
which use torch bilinear interpolation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """[n_out, n_in] row-stochastic 2-tap bilinear interpolation matrix.

    align_corners=True :  src = o * (n_in-1)/(n_out-1)      (torch AC=True)
    align_corners=False:  src = (o+0.5) * n_in/n_out - 0.5  (torch AC=False,
                          clamped to the valid range — torch clamps too)
    """
    if n_in == n_out:
        return np.eye(n_out, dtype=np.float32)
    out = np.arange(n_out, dtype=np.float64)
    if align_corners:
        src = out * (n_in - 1) / max(n_out - 1, 1)
    else:
        src = np.clip((out + 0.5) * n_in / n_out - 0.5, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.minimum(lo, n_in - 1)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = (src - lo).astype(np.float64)
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    mat[np.arange(n_out), lo] += 1.0 - w_hi
    mat[np.arange(n_out), hi] += w_hi
    return mat.astype(np.float32)


def resize_bilinear(x, out_hw, *, align_corners: bool = True,
                    compute_dtype=jnp.float32):
    """Bilinear-resize the two spatial dims of a [..., H, W, C] array.

    Matches torch ``F.interpolate(x, size=out_hw, mode='bilinear',
    align_corners=align_corners)`` bit-for-bit up to float associativity.
    Accepts [H, W, C] or [N, H, W, C].
    """
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x
    in_dtype = x.dtype
    ah = jnp.asarray(_interp_matrix(h_in, h_out, align_corners))
    aw = jnp.asarray(_interp_matrix(w_in, w_out, align_corners))
    y = x.astype(compute_dtype)
    # [..., Hi, Wi, C] -> [..., Ho, Wi, C] -> [..., Ho, Wo, C]
    y = jnp.einsum("oi,...iwc->...owc", ah.astype(compute_dtype), y)
    y = jnp.einsum("pj,...ojc->...opc", aw.astype(compute_dtype), y)
    return y.astype(in_dtype)
