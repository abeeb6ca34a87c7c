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


def mbv2_apply(params, stats, x, *, train: bool = False):
    """Forward pass. x: [N, H, W, 3] -> list of 4 taps (strides 4/8/16/32)
    plus new stats. H and W must be multiples of 32 (pad upstream; the
    inference engine owns the pad-to-stride rule)."""
    new_stats: Dict[str, Any] = {}
    y, new_stats["stem"] = conv_bn_apply(params["stem"], stats["stem"], x,
                                         stride=2, act="relu6", train=train)
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
