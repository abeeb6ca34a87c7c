"""MobileNet-v2 encoder with multi-scale taps.

Reference: src/nn/encoders.py::MobileNetV2 / InvertedResidual /
create_encoder (SURVEY.md §2#2). The reference exposes four feature taps
at output strides 4/8/16/32 that the NAS micro-decoder connects to; the
final 1x1→1280 classification conv is dropped (segmentation never uses
it). ImageNet weights come in via ``segtpu.convert`` from the released
PyTorch checkpoint (tonylins/pytorch-mobilenet-v2 lineage).

TPU-first notes:
  * NHWC + HWIO; the expand/project 1×1 convs are channel matmuls that
    land on the MXU; depthwise 3×3 is VPU work fused with BN+ReLU6.
  * The whole encoder is a pure function of (params, stats, x) — it jits
    into one XLA program with every BN folded in eval mode.
  * Standard MobileNet-v2 config: t (expansion), c (channels), n
    (repeats), s (stride) per stage; width multiplier fixed at 1.0 as in
    the reference.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from segtpu.core.layers import conv_bn_init, conv_bn_apply

# (expansion t, out channels c, repeats n, first-stride s)
_MBV2_CFG = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),   # tap 0: stride 4,  24ch  (after stage idx 1)
    (6, 32, 3, 2),   # tap 1: stride 8,  32ch
    (6, 64, 4, 2),
    (6, 96, 3, 1),   # tap 2: stride 16, 96ch
    (6, 160, 3, 2),
    (6, 320, 1, 1),  # tap 3: stride 32, 320ch
)

# Stage indices (into _MBV2_CFG) after which a tap is taken. SURVEY.md
# §2#2: strides 4/8/16/32. Channel widths of the four decoder inputs:
_TAP_STAGES = (1, 2, 4, 6)
MBV2_TAP_CHANNELS = (24, 32, 96, 320)


def _inv_res_init(key, cin: int, cout: int, t: int, dtype):
    """Inverted residual: [expand 1x1] -> dw 3x3 -> project 1x1."""
    keys = jax.random.split(key, 3)
    mid = cin * t
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    if t != 1:
        p["expand"], s["expand"] = conv_bn_init(keys[0], 1, 1, cin, mid, dtype=dtype)
    p["dw"], s["dw"] = conv_bn_init(keys[1], 3, 3, mid, mid, groups=mid, dtype=dtype)
    p["project"], s["project"] = conv_bn_init(keys[2], 1, 1, mid, cout, dtype=dtype)
    return p, s


def _inv_res_apply(p, s, x, *, stride: int, t: int, residual: bool, train: bool):
    ns: Dict[str, Any] = {}
    y = x
    if t != 1:
        y, ns["expand"] = conv_bn_apply(p["expand"], s["expand"], y,
                                        act="relu6", train=train)
    y, ns["dw"] = conv_bn_apply(p["dw"], s["dw"], y, stride=stride,
                                groups=y.shape[-1], act="relu6", train=train)
    y, ns["project"] = conv_bn_apply(p["project"], s["project"], y,
                                     act="none", train=train)
    if residual:
        y = y + x
    return y, ns


def mbv2_init(key, *, in_channels: int = 3, dtype=jnp.float32):
    """Returns (params, stats) for the MobileNet-v2 feature extractor."""
    n_blocks = sum(n for _, _, n, _ in _MBV2_CFG)
    keys = jax.random.split(key, n_blocks + 1)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem"], stats["stem"] = conv_bn_init(keys[0], 3, 3, in_channels,
                                                 32, dtype=dtype)
    cin = 32
    ki = 1
    blocks_p: List[Any] = []
    blocks_s: List[Any] = []
    for t, c, n, s in _MBV2_CFG:
        for i in range(n):
            bp, bs = _inv_res_init(keys[ki], cin, c, t, dtype)
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = c
            ki += 1
    params["blocks"] = blocks_p
    stats["blocks"] = blocks_s
    return params, stats


def space_to_depth(x):
    """[N, H, W, C] -> [N, H/2, W/2, 4C] by 2x2 patch flattening.
    Channel order: (dy, dx, c) row-major — must match stem_s2d_kernel."""
    n, h, w, c = x.shape
    y = x.reshape(n, h // 2, 2, w // 2, 2, c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(n, h // 2, w // 2, 4 * c)


def stem_s2d_kernel(w3):
    """Fold the 3x3/stride-2 stem kernel into an equivalent 2x2/stride-1
    kernel over the space-to-depth input — the standard TPU trick for
    C=3 input convs (3 lanes of 128 used -> 12), exact to fp rounding.

    Derivation: output (i,j) of the original conv (SAME, pad 1) reads raw
    rows 2i-1..2i+1 = patch rows {i-1, i} at intra-patch offsets dy with
    2a + dy - 2 = u for patch-tap a in {0,1}; taps with 2a+dy == 0 fall
    on the zero top/left padding.
    """
    kh, kw, cin, cout = w3.shape
    assert (kh, kw) == (3, 3)
    w2 = jnp.zeros((2, 2, 4 * cin, cout), w3.dtype)
    for a in range(2):
        for b in range(2):
            for dy in range(2):
                for dx in range(2):
                    u, v = 2 * a + dy - 2, 2 * b + dx - 2
                    if -1 <= u <= 1 and -1 <= v <= 1:
                        idx = (dy * 2 + dx) * cin
                        w2 = w2.at[a, b, idx:idx + cin].set(w3[u + 1, v + 1])
    return w2


def mbv2_apply(params, stats, x, *, train: bool = False,
               input_format: str = "nhwc3"):
    """Forward pass. x: [N, H, W, 3] -> list of 4 taps (strides 4/8/16/32)
    plus new stats. H and W must be multiples of 32 (pad upstream; the
    inference engine owns the pad-to-stride rule).

    input_format='s2d12': x is the space-to-depth form [N, H/2, W/2, 12]
    and the stem runs as the folded 2x2/stride-1 conv (inference fast
    path; numerically identical to the nhwc3 stem).
    """
    new_stats: Dict[str, Any] = {}
    if input_format == "s2d12":
        from segtpu.core.layers import bn_apply, relu6, conv_apply
        w2 = stem_s2d_kernel(params["stem"]["w"])
        y = jax.lax.conv_general_dilated(
            x, w2.astype(x.dtype), (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y, new_stats["stem"] = bn_apply(params["stem"], stats["stem"], y,
                                        train=train)
        y = relu6(y)
    else:
        y, new_stats["stem"] = conv_bn_apply(params["stem"], stats["stem"],
                                             x, stride=2, act="relu6",
                                             train=train)
    taps = []
    bi = 0
    nb: List[Any] = []
    cin = 32
    for stage, (t, c, n, s) in enumerate(_MBV2_CFG):
        for i in range(n):
            stride = s if i == 0 else 1
            residual = stride == 1 and cin == c
            y, bs = _inv_res_apply(params["blocks"][bi], stats["blocks"][bi],
                                   y, stride=stride, t=t, residual=residual,
                                   train=train)
            nb.append(bs)
            cin = c
            bi += 1
        if stage in _TAP_STAGES:
            taps.append(y)
    new_stats["blocks"] = nb
    return taps, new_stats
