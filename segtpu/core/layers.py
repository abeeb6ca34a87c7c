"""NHWC functional conv/BN/activation primitives.

TPU-first conventions (differ deliberately from the PyTorch reference):
  * activations are NHWC, kernels are HWIO — the native XLA/TPU layout
    (the reference, src/nn/layer_factory.py, is NCHW/OIHW via cuDNN);
  * every layer is a pure ``init``/``apply`` pair over explicit pytrees —
    no module objects, so ``jax.jit``/``grad``/``vmap``/``shard_map``
    compose directly;
  * BatchNorm running stats live in a separate ``stats`` tree so that
    ``params`` alone is the differentiable leaf set. ``apply`` functions
    always return ``(y, new_stats)``; in eval mode ``new_stats is stats``.

BatchNorm numerics match PyTorch defaults exactly (parity-critical for
checkpoint import, SURVEY.md §7.3 item 3): eps=1e-5, momentum=0.1 with
``running = (1 - m) * running + m * batch``, unbiased batch variance for
the running estimate, biased for normalization.
"""

from __future__ import annotations

import math
import os as _os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]
Stats = Dict[str, Any]

BN_EPS = 1e-5
BN_MOMENTUM = 0.1

_DIMSPEC = ("NHWC", "HWIO", "NHWC")

# Depthwise convs with C <= this run as dense convs with a diagonal
# kernel (see conv_apply). ISOLATED A/B on v5e says the k²·C² redundant
# MACs on the MXU beat XLA's depthwise lowering up to C=192 — but IN
# SITU (full fused inference program) the swap measured SLOWER
# (189 -> 141 img/s): XLA fuses/layouts the dw better inside the full
# graph than standalone. Default off; env knob kept for re-measurement.
# Read ONCE at import time — the value is baked into jitted programs,
# so changing the env after first import has no effect.
_DW_DENSE_MAX_CH = int(_os.environ.get("SEGTPU_DW_DENSE_MAX_CH", "0"))


def relu(x):
    return jnp.maximum(x, 0)


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0), 6.0)


def identity(x):
    return x


ACTIVATIONS = {"relu": relu, "relu6": relu6, "none": identity}


# ---------------------------------------------------------------------------
# Convolution
# ---------------------------------------------------------------------------


def conv_init(key, kh: int, kw: int, cin: int, cout: int, *, groups: int = 1,
              dtype=jnp.float32) -> Params:
    """Kaiming-uniform init (PyTorch nn.Conv2d default), HWIO layout.

    For a depthwise conv pass ``groups=cin`` and ``cout=cin*mult``; the
    kernel then has I = cin // groups channels, matching
    ``feature_group_count`` semantics of ``lax.conv_general_dilated``.
    """
    fan_in = (cin // groups) * kh * kw
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    w = jax.random.uniform(key, (kh, kw, cin // groups, cout), dtype,
                           minval=-bound, maxval=bound)
    return {"w": w}


def conv_apply(params: Params, x, *, stride: int = 1, dilation: int = 1,
               groups: int = 1, padding="SAME") -> jnp.ndarray:
    """2-D convolution, NHWC x HWIO -> NHWC.

    ``padding='SAME'`` with odd kernels reproduces the reference's
    ``padding=dilation*(k-1)//2`` torch convention for stride 1; for
    stride 2 the reference pads symmetrically (torch) while SAME pads
    bottom/right-heavy — we use explicit torch-style padding to keep
    per-pixel parity (SURVEY.md §7.3).
    """
    w = params["w"]
    kh, kw = w.shape[0], w.shape[1]
    if padding == "SAME":
        ph = dilation * (kh - 1) // 2
        pw = dilation * (kw - 1) // 2
        padding = ((ph, ph), (pw, pw))
    if (groups > 1 and groups == w.shape[3] and w.shape[2] == 1
            and groups <= _DW_DENSE_MAX_CH):
        # Depthwise-as-dense: express the dw conv as a dense conv whose
        # kernel is diagonal in (I, O). The 9*C^2 redundant MACs ride
        # the MXU instead of XLA's slow TPU depthwise lowering —
        # measured ~2-3x faster per op for C <= 192 on v5e (dw loses
        # its advantage at C >= 384, where the dense FLOPs dominate).
        # Adding exact zeros keeps the result bit-comparable (identical
        # in f32; <= 1 ulp reordering in bf16 accumulation).
        c = groups
        wd = jnp.zeros((kh, kw, c, c), w.dtype)
        wd = wd.at[:, :, jnp.arange(c), jnp.arange(c)].set(w[:, :, 0, :])
        w, groups = wd, 1
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMSPEC,
        feature_group_count=groups,
    )


# ---------------------------------------------------------------------------
# BatchNorm
# ---------------------------------------------------------------------------


def bn_init(c: int, dtype=jnp.float32) -> Tuple[Params, Stats]:
    params = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    stats = {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}
    return params, stats


def bn_apply(params: Params, stats: Stats, x, *, train: bool) -> Tuple[jnp.ndarray, Stats]:
    """BatchNorm over N,H,W. In train mode batch stats are computed with
    ``jnp`` reductions over the full (possibly sharded) array, so under a
    data-parallel mesh XLA lowers them to cross-replica collectives —
    sync-BN for free, the TPU-idiomatic replacement for the reference's
    per-GPU DataParallel BN."""
    xf = x.astype(jnp.float32)
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        # two-pass variance (torch semantics), NOT E[x^2]-E[x]^2: the
        # cancelling form loses most of its bits whenever mean^2 >> var,
        # and the loss through rsqrt then visibly depends on XLA's
        # reduction order — the same population forward differed ~10%
        # between the sharded and unsharded compilations of one program
        # before this fix
        var = jnp.mean(jnp.square(xf - mean), axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - BN_MOMENTUM) * stats["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * stats["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = lax.rsqrt(var + BN_EPS) * params["scale"]
    y = xf * inv + (params["bias"] - mean * inv)
    return y.astype(x.dtype), new_stats


# ---------------------------------------------------------------------------
# Fused conv + BN + activation — the workhorse of the whole model family
# (reference: src/nn/layer_factory.py::conv_bn_relu / convbnrelu).
# ---------------------------------------------------------------------------


def conv_bn_init(key, kh, kw, cin, cout, *, groups: int = 1,
                 dtype=jnp.float32) -> Tuple[Params, Stats]:
    p = conv_init(key, kh, kw, cin, cout, groups=groups, dtype=dtype)
    bp, bs = bn_init(cout, dtype)
    p.update(bp)
    return p, bs


def conv_bn_apply(params: Params, stats: Stats, x, *, stride: int = 1,
                  dilation: int = 1, groups: int = 1, act: str = "relu",
                  train: bool = False) -> Tuple[jnp.ndarray, Stats]:
    """conv -> BN -> activation.

    In eval mode BN folds into a per-channel scale/shift that XLA fuses
    into the convolution epilogue on TPU; no extra HBM round-trip.
    """
    y = conv_apply(params, x, stride=stride, dilation=dilation, groups=groups)
    y, new_stats = bn_apply(params, stats, y, train=train)
    return ACTIVATIONS[act](y), new_stats
