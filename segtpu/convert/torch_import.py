"""PyTorch checkpoint -> segtpu pytree conversion (parity anchor).

Reference: the released arch0/1/2 ``.ckpt`` state_dicts and the
ImageNet-pretrained MobileNet-v2 weights (tonylins/pytorch-mobilenet-v2
lineage) that src/nn/encoders.py loads (SURVEY.md §5.4, §7.3 item 3).

Layout rules (PyTorch -> JAX/TPU):
  * conv weight OIHW -> HWIO: transpose (2, 3, 1, 0). The same transpose
    handles depthwise convs: torch groups-conv [C, 1, kh, kw] becomes
    [kh, kw, 1, C], exactly the I = cin/groups HWIO kernel that
    ``lax.conv_general_dilated(feature_group_count=C)`` expects.
  * BN: weight->scale, bias->bias, running_mean/var->stats (eps/momentum
    already match, segtpu.core.layers).
  * activations NCHW -> NHWC is a runtime concern, not a weight concern.

Encoder naming convention converted here (tonylins/torchvision style,
what the reference uses):
  features.0.{0,1}            stem conv + BN
  features.{1..17}.conv.{i}   inverted residuals; for expand_ratio==1 the
                              Sequential is [dw, BN, ReLU6, pw, BN]
                              (convs at 0, 3), otherwise
                              [pw, BN, ReLU6, dw, BN, ReLU6, pw, BN]
                              (convs at 0, 3, 6)
  features.18.*               final 1x1 -> 1280 (classification head;
                              dropped — the segmenter never uses it)

The decoder mapping for the released arch0/1/2 checkpoints requires the
reference's parameter names (mount empty, SURVEY.md §0); the structural
converter ``match_by_shape_order`` below converts any torch state_dict
whose parameter *order* matches the segtpu tree's traversal order, which
is how the decoder checkpoints will be imported once the artifacts are
available.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from segtpu.models.encoders import _MBV2_CFG  # static config table


def conv_w_to_hwio(w: np.ndarray) -> np.ndarray:
    """OIHW (torch, incl. grouped/depthwise) -> HWIO (lax)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _conv_bn(sd: Dict[str, Any], conv_key: str, bn_key: str):
    params = {
        "w": jnp.asarray(conv_w_to_hwio(_to_np(sd[conv_key + ".weight"]))),
        "scale": jnp.asarray(_to_np(sd[bn_key + ".weight"])),
        "bias": jnp.asarray(_to_np(sd[bn_key + ".bias"])),
    }
    stats = {
        "mean": jnp.asarray(_to_np(sd[bn_key + ".running_mean"])),
        "var": jnp.asarray(_to_np(sd[bn_key + ".running_var"])),
    }
    return params, stats


def load_mbv2_state_dict(sd: Dict[str, Any], *, prefix: str = "features."):
    """torch state_dict (tonylins naming) -> (params, stats) for
    segtpu.models.encoders.mbv2_apply."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem"], stats["stem"] = _conv_bn(sd, f"{prefix}0.0", f"{prefix}0.1")
    blocks_p, blocks_s = [], []
    layer = 1
    for t, c, n, s in _MBV2_CFG:
        for _ in range(n):
            base = f"{prefix}{layer}.conv"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            if t == 1:  # [dw, BN, relu, pw, BN]
                bp["dw"], bs["dw"] = _conv_bn(sd, f"{base}.0", f"{base}.1")
                bp["project"], bs["project"] = _conv_bn(sd, f"{base}.3",
                                                        f"{base}.4")
            else:       # [pw, BN, relu, dw, BN, relu, pw, BN]
                bp["expand"], bs["expand"] = _conv_bn(sd, f"{base}.0",
                                                      f"{base}.1")
                bp["dw"], bs["dw"] = _conv_bn(sd, f"{base}.3", f"{base}.4")
                bp["project"], bs["project"] = _conv_bn(sd, f"{base}.6",
                                                        f"{base}.7")
            blocks_p.append(bp)
            blocks_s.append(bs)
            layer += 1
    params["blocks"] = blocks_p
    stats["blocks"] = blocks_s
    return params, stats


def load_mbv2_checkpoint(path: str):
    """Load a torch-saved MobileNet-v2 checkpoint file."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    return load_mbv2_state_dict(sd)


# ---------------------------------------------------------------------------
# Structural conversion for decoder/segmenter checkpoints
# ---------------------------------------------------------------------------


def match_by_shape_order(sd: Dict[str, Any], template: Tuple[Any, Any]):
    """Convert a torch state_dict to (params, stats) by matching the
    torch parameter ORDER against the segtpu tree traversal order, with
    shape checking (convs transposed OIHW->HWIO).

    This is the decoder-checkpoint import path: both the reference
    decoder builder and segtpu materialize modules in genotype order, so
    once the released ``.ckpt`` files exist the state_dict stream lines
    up with the template traversal. Any shape mismatch (wrong genotype,
    wrong op table) raises loudly instead of silently mis-loading.

    Recognized layer dicts during traversal:
      {w, scale, bias} (+ parallel {mean, var} in stats) — conv+BN:
          consumes torch [conv.weight, bn.weight, bn.bias,
          bn.running_mean, bn.running_var]
      {w, b} — plain conv with bias: consumes [weight, bias]
    """
    torch_items = [(k, _to_np(v)) for k, v in sd.items()
                   if not k.endswith("num_batches_tracked")]
    stream = iter(torch_items)

    def take(expect_shape, kind, transpose=False):
        try:
            k, v = next(stream)
        except StopIteration:
            raise ValueError(f"state_dict exhausted wanting {kind} "
                             f"{tuple(expect_shape)}")
        if transpose:
            v = conv_w_to_hwio(v)
        if tuple(v.shape) != tuple(expect_shape):
            raise ValueError(f"shape mismatch at '{k}': torch {v.shape} "
                             f"vs template {tuple(expect_shape)} ({kind})")
        return jnp.asarray(v)

    t_params, t_stats = template

    def walk(p, s):
        if isinstance(p, dict):
            if set(p) >= {"w", "scale", "bias"}:  # conv + BN
                new_p = dict(p)
                new_p["w"] = take(p["w"].shape, "conv.weight", transpose=True)
                new_p["scale"] = take(p["scale"].shape, "bn.weight")
                new_p["bias"] = take(p["bias"].shape, "bn.bias")
                new_s = {"mean": take(s["mean"].shape, "bn.running_mean"),
                         "var": take(s["var"].shape, "bn.running_var")}
                return new_p, new_s
            if set(p) == {"w", "b"}:  # plain conv with bias
                return ({"w": take(p["w"].shape, "conv.weight", transpose=True),
                         "b": take(p["b"].shape, "conv.bias")}, s)
            new_p, new_s = {}, {}
            for k in p:
                sub_s = s.get(k, {}) if isinstance(s, dict) else {}
                new_p[k], ns = walk(p[k], sub_s)
                if isinstance(s, dict) and k in s:
                    new_s[k] = ns
            return new_p, new_s
        if isinstance(p, (list, tuple)):
            out_p, out_s = [], []
            for i, sub in enumerate(p):
                sub_s = s[i] if isinstance(s, (list, tuple)) and i < len(s) else {}
                np_, ns_ = walk(sub, sub_s)
                out_p.append(np_)
                out_s.append(ns_)
            return type(p)(out_p), (type(s)(out_s)
                                    if isinstance(s, (list, tuple)) else s)
        raise TypeError(f"unexpected template leaf container: {type(p)}")

    new_params, new_stats = walk(t_params, t_stats)
    leftovers = [k for k, _ in stream]
    if leftovers:
        raise ValueError(f"{len(leftovers)} unconsumed torch params, "
                         f"first: {leftovers[0]}")
    return new_params, new_stats


def load_segmenter_checkpoint(path: str, genotype, num_classes: int):
    """Import a released segmenter ``.ckpt``: build the segtpu template
    for ``genotype`` and order-match the torch state_dict onto it.

    NOTE: the released arch0/1/2 artifacts (and their exact genotype
    literals) were absent from the empty reference mount (SURVEY.md §0,
    §7.4 item 2); this path is exercised against synthetic torch models
    in tests and will import the real checkpoints unchanged once the
    artifacts exist.
    """
    import torch
    from segtpu.models.segmenter import segmenter_init
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    template = segmenter_init(jax.random.PRNGKey(0), genotype,
                              num_classes=num_classes)
    return match_by_shape_order(sd, template)
