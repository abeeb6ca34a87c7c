"""The NAS op vocabulary (reference: src/nn/layer_factory.py::OPS/OP_NAMES).

The CVPR'19 search space (arXiv:1810.10804, Table 1) contains 11
channel-preserving, stride-1 ops. **Op order is parity-critical**
(SURVEY.md §7.3 item 2): genotypes store op *indices*, so a swapped
entry silently builds a different network. The order below follows the
paper's table; it must be re-verified against the reference's
``OP_NAMES`` literal once the mount is populated (SURVEY.md §7.4 item 1).

Every op is a pure ``(init, apply)`` pair:
    op_init(name, key, C)              -> (params, stats)
    op_apply(name, params, stats, x, train) -> (y, new_stats)
with NHWC activations. Separable convs are depthwise (grouped, XLA
``feature_group_count``) + pointwise stacks; the pointwise half is a pure
MXU matmul over channels, the depthwise half is VPU work that XLA fuses
with its BN/ReLU epilogue.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from segtpu.core.layers import conv_bn_init, conv_bn_apply

# Index -> name. CVPR'19 Table 1 order (verify vs reference OP_NAMES).
OP_NAMES = (
    "conv1x1",            # 0
    "conv3x3",            # 1
    "sep_conv_3x3",       # 2
    "sep_conv_5x5",       # 3
    "global_average_pool",  # 4  GAP -> conv1x1 -> broadcast-upsample
    "conv3x3_dil3",       # 5
    "conv3x3_dil12",      # 6
    "sep_conv_3x3_dil3",  # 7
    "sep_conv_5x5_dil6",  # 8
    "skip_connect",       # 9
    "none",               # 10 zero op
)
NUM_OPS = len(OP_NAMES)

# WACV'20 template-decoder aggregation vocabulary
# (reference: src/nn/layer_factory.py::AGG_OPS, conf:M in SURVEY.md §2#1).
AGG_OP_NAMES = ("psum", "cat")

# Decoder-op activation. The reference decoder uses plain ReLU after its
# conv-bn blocks (the encoder uses ReLU6); open parity item SURVEY §7.4.1.
_ACT = "relu"

# (kernel, dilation, separable) table for the conv-flavored ops.
_CONV_SPECS = {
    "conv1x1": (1, 1, False),
    "conv3x3": (3, 1, False),
    "sep_conv_3x3": (3, 1, True),
    "sep_conv_5x5": (5, 1, True),
    "conv3x3_dil3": (3, 3, False),
    "conv3x3_dil12": (3, 12, False),
    "sep_conv_3x3_dil3": (3, 3, True),
    "sep_conv_5x5_dil6": (5, 6, True),
}


def op_is_parametric(name: str) -> bool:
    return name not in ("skip_connect", "none")


def _sep_init(key, k: int, c: int, repeats: int, dtype):
    """repeats × [dw k×k + BN + ReLU, pw 1×1 + BN + ReLU]."""
    params, stats = [], []
    for r in range(repeats):
        kd, kp = jax.random.split(jax.random.fold_in(key, r))
        dp, ds = conv_bn_init(kd, k, k, c, c, groups=c, dtype=dtype)
        pp, ps = conv_bn_init(kp, 1, 1, c, c, dtype=dtype)
        params.append({"dw": dp, "pw": pp})
        stats.append({"dw": ds, "pw": ps})
    return {"reps": params}, {"reps": stats}


def _sep_apply(params, stats, x, *, dilation: int, train: bool):
    new_stats = []
    for p, s in zip(params["reps"], stats["reps"]):
        x, ds = conv_bn_apply(p["dw"], s["dw"], x, dilation=dilation,
                              groups=x.shape[-1], act=_ACT, train=train)
        x, ps = conv_bn_apply(p["pw"], s["pw"], x, act=_ACT, train=train)
        new_stats.append({"dw": ds, "pw": ps})
    return x, {"reps": new_stats}


def op_init(name: str, key, c: int, *, repeats: int = 1,
            dtype=jnp.float32) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Initialize parameters for op ``name`` at channel width ``c``."""
    if name in ("skip_connect", "none"):
        return {}, {}
    if name == "global_average_pool":
        p, s = conv_bn_init(key, 1, 1, c, c, dtype=dtype)
        return {"conv": p}, {"conv": s}
    k, dil, sep = _CONV_SPECS[name]
    if sep:
        return _sep_init(key, k, c, repeats, dtype)
    p, s = conv_bn_init(key, k, k, c, c, dtype=dtype)
    return {"conv": p}, {"conv": s}


def op_apply(name: str, params, stats, x, *, train: bool = False):
    """Apply op ``name``. x: [N, H, W, C] -> [N, H, W, C]."""
    if name == "none":
        return jnp.zeros_like(x), stats
    if name == "skip_connect":
        return x, stats
    if name == "global_average_pool":
        # GAP -> 1x1 conv-bn-relu -> upsample back to H×W. With a 1×1
        # spatial input, bilinear upsample == broadcast, so we broadcast
        # (exactly equal, and free on TPU: it fuses into the consumer).
        pooled = jnp.mean(x.astype(jnp.float32), axis=(-3, -2),
                          keepdims=True).astype(x.dtype)
        y, s = conv_bn_apply(params["conv"], stats["conv"], pooled,
                             act=_ACT, train=train)
        y = jnp.broadcast_to(y, x.shape[:-1] + (y.shape[-1],))
        return y, {"conv": s}
    k, dil, sep = _CONV_SPECS[name]
    if sep:
        return _sep_apply(params, stats, x, dilation=dil, train=train)
    y, s = conv_bn_apply(params["conv"], stats["conv"], x, dilation=dil,
                         act=_ACT, train=train)
    return y, {"conv": s}
