"""WACV'20 template-based decoder (arXiv:1904.02365).

Reference: src/nn/micro_decoders.py::TemplateDecoder + the WACV
template search (SURVEY.md §2#3/#5, conf:M). The WACV paper searches
extremely small decoders (sub-megabyte models) as a sequence of
*template* blocks over the encoder taps: each block picks two inputs
from a growing pool, an aggregation template, and a post-op.

Genotype schema (encoding literal to re-verify against the mount,
SURVEY.md §7.4):

    template_genotype = [[i, j, agg_idx, op_idx], ...]   # one per block

      i, j     pool indices (pool = adapted encoder taps, then block
               outputs appended)
      agg_idx  index into AGG_OP_NAMES = ('psum', 'cat'):
                 psum — per-branch 1x1 conv-bn to agg_size, upsample the
                        smaller, elementwise sum (cheap)
                 cat  — upsample the smaller, channel-concat, 1x1
                        conv-bn reduce to agg_size (expressive)
      op_idx   post-op from the CVPR op vocabulary (OP_NAMES)

    Unconsumed pool entries are upsampled to the largest resolution,
    concatenated, and classified by a 1x1 conv — same head as the
    micro-decoder.

Implementation is the same pure (init, apply) discipline as
micro_decoders; both decoder families share the op factory, the head,
and the engine/train/search layers unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from segtpu.core.layers import conv_init, conv_bn_init, conv_bn_apply
from segtpu.core.resize import resize_bilinear
from segtpu.models.micro_decoders import GenotypeError, _decoder_collect_inds
from segtpu.ops.layer_factory import (
    AGG_OP_NAMES, NUM_OPS, OP_NAMES, op_init, op_apply)


def validate_template_genotype(genotype, num_inputs: int = 4) -> None:
    if not isinstance(genotype, (list, tuple)) or len(genotype) < 1:
        raise GenotypeError(f"template genotype must be a block list: "
                            f"{genotype!r}")
    for b, block in enumerate(genotype):
        if not (isinstance(block, (list, tuple)) and len(block) == 4):
            raise GenotypeError(f"block {b} must be [i,j,agg,op]: {block!r}")
        i, j, agg, op = block
        pool = num_inputs + b
        for x in (i, j):
            if not isinstance(x, int) or not (0 <= x < pool):
                raise GenotypeError(f"block {b}: index {x!r} out of [0,{pool})")
        if not isinstance(agg, int) or not (0 <= agg < len(AGG_OP_NAMES)):
            raise GenotypeError(f"block {b}: agg {agg!r} out of range")
        if not isinstance(op, int) or not (0 <= op < NUM_OPS):
            raise GenotypeError(f"block {b}: op {op!r} out of range")


def template_conns(genotype) -> List[List[int]]:
    return [[b[0], b[1]] for b in genotype]


def template_decoder_init(key, genotype, inp_sizes: Sequence[int],
                          num_classes: int, *, agg_size: int = 48,
                          repeats: int = 1, aux: bool = False,
                          dtype=jnp.float32):
    validate_template_genotype(genotype, num_inputs=len(inp_sizes))
    keys = jax.random.split(key, len(inp_sizes) + 3 * len(genotype) + 1)
    ki = iter(range(len(keys)))

    params: Dict[str, Any] = {"adapt": [], "blocks": []}
    stats: Dict[str, Any] = {"adapt": [], "blocks": []}
    for c in inp_sizes:
        p, s = conv_bn_init(keys[next(ki)], 1, 1, c, agg_size, dtype=dtype)
        params["adapt"].append(p)
        stats["adapt"].append(s)

    for i, j, agg, op in genotype:
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        ka = keys[next(ki)]
        if AGG_OP_NAMES[agg] == "psum":
            k1, k2 = jax.random.split(ka)
            bp["b1"], bs["b1"] = conv_bn_init(k1, 1, 1, agg_size, agg_size,
                                              dtype=dtype)
            bp["b2"], bs["b2"] = conv_bn_init(k2, 1, 1, agg_size, agg_size,
                                              dtype=dtype)
        else:  # cat -> 1x1 reduce
            bp["reduce"], bs["reduce"] = conv_bn_init(
                ka, 1, 1, 2 * agg_size, agg_size, dtype=dtype)
        bp["op"], bs["op"] = op_init(OP_NAMES[op], keys[next(ki)], agg_size,
                                     repeats=repeats, dtype=dtype)
        if aux:
            kx = keys[next(ki)]
            bp["aux_clf"] = conv_init(kx, 1, 1, agg_size, num_classes,
                                      dtype=dtype)
            bp["aux_clf"]["b"] = jnp.zeros((num_classes,), dtype)
        else:
            next(ki)
        params["blocks"].append(bp)
        stats["blocks"].append(bs)

    collect = _decoder_collect_inds(template_conns(genotype), len(inp_sizes))
    kc = keys[next(ki)]
    params["clf"] = conv_init(kc, 1, 1, len(collect) * agg_size, num_classes,
                              dtype=dtype)
    params["clf"]["b"] = jnp.zeros((num_classes,), dtype)
    return params, stats


def _conv1x1(p, x):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)


def template_decoder_apply(genotype, params, stats, taps, *,
                           align_corners: bool = True, train: bool = False,
                           with_aux: bool = False):
    """taps -> (logits, aux_list, new_stats); same contract as
    micro_decoder_apply, so Segmenter/engine/search reuse it directly."""
    new_stats: Dict[str, Any] = {"adapt": [], "blocks": []}
    pool = []
    for x, p, s in zip(taps, params["adapt"], stats["adapt"]):
        y, ns = conv_bn_apply(p, s, x, act="relu", train=train)
        pool.append(y)
        new_stats["adapt"].append(ns)

    aux_outs = []
    for b, (i, j, agg, op) in enumerate(genotype):
        bp, bs = params["blocks"][b], stats["blocks"][b]
        nbs: Dict[str, Any] = {}
        x1, x2 = pool[i], pool[j]
        h = max(x1.shape[-3], x2.shape[-3])
        w = max(x1.shape[-2], x2.shape[-2])
        if AGG_OP_NAMES[agg] == "psum":
            y1, nbs["b1"] = conv_bn_apply(bp["b1"], bs["b1"], x1, act="relu",
                                          train=train)
            y2, nbs["b2"] = conv_bn_apply(bp["b2"], bs["b2"], x2, act="relu",
                                          train=train)
            y = (resize_bilinear(y1, (h, w), align_corners=align_corners)
                 + resize_bilinear(y2, (h, w), align_corners=align_corners))
        else:
            y = jnp.concatenate(
                [resize_bilinear(x1, (h, w), align_corners=align_corners),
                 resize_bilinear(x2, (h, w), align_corners=align_corners)],
                axis=-1)
            y, nbs["reduce"] = conv_bn_apply(bp["reduce"], bs["reduce"], y,
                                             act="relu", train=train)
        y, nbs["op"] = op_apply(OP_NAMES[op], bp["op"], bs["op"], y,
                                train=train)
        pool.append(y)
        if with_aux and "aux_clf" in bp:
            aux_outs.append(_conv1x1(bp["aux_clf"], y))
        new_stats["blocks"].append(nbs)

    collect = _decoder_collect_inds(template_conns(genotype), len(taps))
    h = max(pool[i].shape[-3] for i in collect)
    w = max(pool[i].shape[-2] for i in collect)
    feats = [resize_bilinear(pool[i], (h, w), align_corners=align_corners)
             for i in collect]
    logits = _conv1x1(params["clf"], jnp.concatenate(feats, axis=-1))
    return logits, aux_outs, new_stats
