"""Inference fast path: the micro-decoder in CHW layout on Pallas ops.

Semantically identical to micro_decoders.micro_decoder_apply in eval
mode (tested against it), but every conv runs as a
segtpu.kernels.chw_ops kernel: channels in sublanes, W in lanes — no
48->128 lane padding — BN folded into weights at build time, sep-convs
fused into single kernels, and the output stays channel-first so it
feeds segtpu.kernels.upsample_argmax without a transpose.

Eval-only by design (BN folding); training uses the NHWC reference path.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from segtpu.core.resize import _interp_matrix
from segtpu.kernels.chw_ops import conv_chw, sep_conv_chw, fold_bn
from segtpu.models.micro_decoders import _cell_collect_inds, \
    _decoder_collect_inds, validate_genotype
from segtpu.ops.layer_factory import OP_NAMES, _CONV_SPECS


# A/B knob for the fused cell-node pair kernel; read ONCE at import
# time (the value is baked into traced programs, like the chw_ops knobs)
_PAIR_FUSE = os.environ.get("SEGTPU_PAIR_FUSE", "1") != "0"


def _fold(p, s):
    return fold_bn(p["w"], p["scale"], p["bias"], s["mean"], s["var"])


def _resize_chw(x, out_hw, align_corners=True, acc=None, interpret=False):
    """Bilinear resize in CHW; routes through the flat-layout Pallas
    kernel (kernels.resize_chw) when eligible — the einsum form forces
    a (h-sublane, w-lane) relayout of the flat tensors the chw_ops
    kernels exchange (~1.4 ms/b8-dispatch of pure copies at 1024x2048).
    acc: optional [B, C, OH, OW] added in-kernel (pair-add fusion)."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x if acc is None else x + acc
    # the kernel pays off when the relayout it avoids is large; small
    # resizes run faster as einsums (traced: a 32x64 -> 64x128 kernel
    # cost 0.58 ms/b8 from tiny f32 dots vs ~0.05 as einsum)
    if (oh * ow >= 65536 and oh >= h and ow >= w and ow % 128 == 0
            and x.shape[1] % 8 == 0):
        from segtpu.kernels.resize_chw import resize_chw_pallas
        return resize_chw_pallas(x, (oh, ow), acc,
                                 align_corners=align_corners,
                                 interpret=interpret)
    ah = jnp.asarray(_interp_matrix(h, oh, align_corners))
    aw = jnp.asarray(_interp_matrix(w, ow, align_corners))
    y = x.astype(jnp.float32)
    y = jnp.einsum("oh,bchw->bcow", ah, y)
    y = jnp.einsum("pw,bcow->bcop", aw, y)
    y = y.astype(x.dtype)
    return y if acc is None else y + acc


class _Op:
    """One materialized cell op: folded weights + a CHW apply."""

    def __init__(self, name: str, params, stats, interpret: bool):
        self.name = name
        self.interpret = interpret
        if name in ("skip_connect", "none"):
            self.kind = name
        elif name == "global_average_pool":
            self.kind = "gap"
            wf, bf = _fold(params["conv"], stats["conv"])
            self.wm = wf[0, 0]          # [Cin, Cout]
            self.b = bf
        else:
            k, dil, sep = _CONV_SPECS[name]
            self.k, self.dil = k, dil
            if sep:
                self.kind = "sep"
                self.reps = []
                for p, s in zip(params["reps"], stats["reps"]):
                    wd, bd = _fold(p["dw"], s["dw"])
                    wp, bp = _fold(p["pw"], s["pw"])
                    self.reps.append((wd, bd, wp, bp))
            else:
                self.kind = "conv"
                self.wf, self.bf = _fold(params["conv"], stats["conv"])

    def vector(self, x):
        """GAP only: the op's per-(batch, channel) [B, C] vector result
        (pool -> 1x1 conv -> ReLU) WITHOUT the spatial broadcast — a
        partner kernel adds it in-register via vec_acc."""
        assert self.kind == "gap"
        pooled = jnp.mean(x.astype(jnp.float32), axis=(2, 3))  # [B, C]
        return jnp.maximum(pooled @ self.wm.astype(jnp.float32)
                           + self.b.astype(jnp.float32), 0.0)

    def __call__(self, x, acc=None, vec_acc=None):
        """acc / vec_acc: optional tensor / [B, C] vector fused into the
        result in-kernel for the conv/sep kinds (cell branch add without
        an extra HBM pass)."""
        if self.kind == "none":
            return jnp.zeros_like(x) if acc is None else acc
        if self.kind == "skip_connect":
            return x if acc is None else x + acc
        if self.kind == "gap":
            y = self.vector(x).astype(x.dtype)
            y = jnp.broadcast_to(y[:, :, None, None],
                                 (x.shape[0], y.shape[1]) + x.shape[2:])
            return y if acc is None else y + acc
        if self.kind == "sep":
            for r, (wd, bd, wp, bp) in enumerate(self.reps):
                last = r == len(self.reps) - 1
                x = sep_conv_chw(x, wd, bd, wp, bp,
                                 acc if last else None,
                                 vec_acc if last else None, k=self.k,
                                 dilation=self.dil, interpret=self.interpret)
            return x
        return conv_chw(x, self.wf, self.bf, acc, vec_acc, k=self.k,
                        dilation=self.dil, interpret=self.interpret)

    def fuse_spec(self):
        """(op descriptor, weights) of this op's FINAL kernel for
        kernels.chw_ops.pair_op_chw, or None if not pair-fusable
        (gap/skip/none)."""
        if self.kind == "conv":
            return ("conv", self.k, self.dil), (self.wf, self.bf)
        if self.kind == "sep":
            return ("sep", self.k, self.dil), self.reps[-1]
        return None

    def prefix(self, x):
        """All kernels of this op EXCEPT the final one (sep repeats>1);
        identity for single-kernel ops."""
        if self.kind == "sep":
            for wd, bd, wp, bp in self.reps[:-1]:
                x = sep_conv_chw(x, wd, bd, wp, bp, k=self.k,
                                 dilation=self.dil,
                                 interpret=self.interpret)
        return x


def _node_pair(opa, xa, opb, xb, interpret: bool):
    """One cell node: opb(xb) + opa(xa). When both branches end in a
    conv/sep kernel, run them FUSED in one kernel (pair_op_chw) — the
    unfused form writes opa's output to HBM and reads it back as opb's
    acc operand, a full [B,48,H,W] round trip per node. Falls back to
    the acc-fused two-kernel form for gap/skip/none branches."""
    fa, fb = opa.fuse_spec(), opb.fuse_spec()
    if _PAIR_FUSE and fa is not None and fb is not None:
        from segtpu.kernels.chw_ops import pair_op_chw
        return pair_op_chw(opb.prefix(xb), fb[1], opa.prefix(xa), fa[1],
                           op1=fb[0], op2=fa[0], interpret=interpret)
    # GAP paired with a conv/sep: the GAP result is a per-(batch,
    # channel) vector — ride it into the partner's kernel as a vec_acc
    # epilogue; its [B,48,H,W] broadcast tensor never exists (the
    # broadcast+add pass traced 0.155 ms/b8 at 8x48x256x512)
    if _PAIR_FUSE and opa.kind == "gap" and fb is not None:
        return opb(xb, vec_acc=opa.vector(xa))
    if _PAIR_FUSE and opb.kind == "gap" and fa is not None:
        return opa(xa, vec_acc=opb.vector(xb))
    return opb(xb, acc=opa(xa))


def build_fast_decoder(genotype, params, stats, *, align_corners: bool = True,
                       taps_channel_first: bool = False,
                       flat_logits: bool = False,
                       interpret: bool = False):
    """-> apply(taps) giving channel-first logits [B, K, h, w].

    Folds all BN at build time; taps enter NHWC (straight from the
    reference encoder, transposed once) or already channel-first from
    models.fast_encoder (taps_channel_first=True, transpose-free).

    flat_logits: apply(taps) returns ``(flat [B, K, h*w], (h, w))``
    instead — the classifier conv's native flat layout, feeding
    kernels.upsample_argmax.upsample_argmax_flat retile-free.
    """
    validate_genotype(genotype, num_inputs=len(params["adapt"]))
    cell_config, conns = genotype

    adapts = [(_fold(p, s)) for p, s in zip(params["adapt"], stats["adapt"])]
    blocks = []
    for bp, bs in zip(params["blocks"], stats["blocks"]):
        blk: Dict[str, Any] = {
            "agg1": _fold(bp["agg"]["branch1"], bs["agg"]["branch1"]),
            "agg2": _fold(bp["agg"]["branch2"], bs["agg"]["branch2"]),
            "node0": _Op(OP_NAMES[cell_config[0]], bp["cell"]["node0"],
                         bs["cell"]["node0"], interpret),
            "nodes": [],
        }
        for k, (p1, p2, o1, o2) in enumerate(cell_config[1:]):
            blk["nodes"].append(
                (_Op(OP_NAMES[o1], bp["cell"]["nodes"][k]["a"],
                     bs["cell"]["nodes"][k]["a"], interpret),
                 _Op(OP_NAMES[o2], bp["cell"]["nodes"][k]["b"],
                     bs["cell"]["nodes"][k]["b"], interpret)))
        blocks.append(blk)
    clf_w, clf_b = params["clf"]["w"], params["clf"]["b"]
    collect = _decoder_collect_inds(conns, len(params["adapt"]))
    cell_collect = _cell_collect_inds(cell_config)

    def pw(x, wf, bf, relu=True):
        return conv_chw(x, wf, bf, k=1, relu=relu, interpret=interpret)

    def apply(taps):
        pool: List[Any] = []
        for t, (wf, bf) in zip(taps, adapts):
            x = t if taps_channel_first else jnp.transpose(t, (0, 3, 1, 2))
            pool.append(pw(x, wf, bf))
        for blk, (i, j) in zip(blocks, conns):
            y1 = pw(pool[i], *blk["agg1"])
            y2 = pw(pool[j], *blk["agg2"])
            hw = (max(y1.shape[2], y2.shape[2]),
                  max(y1.shape[3], y2.shape[3]))
            # pair add fused into a resize kernel's epilogue; resize the
            # branch that NEEDS resizing last so the identity branch
            # rides in as its acc (an explicit XLA add of two
            # differently-laid-out tensors traced at 0.46 ms/b8)
            if y2.shape[2:] == hw and y1.shape[2:] != hw:
                y1, y2 = y2, y1
            y = _resize_chw(
                y2, hw, align_corners,
                acc=_resize_chw(y1, hw, align_corners,
                                interpret=interpret),
                interpret=interpret)
            outs = [y, blk["node0"](y)]
            for (opa, opb), (p1, p2, _, _) in zip(blk["nodes"],
                                                  cell_config[1:]):
                # both branches in ONE kernel when fusable, else the
                # branch add fuses into the second op's kernel epilogue
                outs.append(_node_pair(opa, outs[p1], opb, outs[p2],
                                       interpret))
            acc = None
            for ci in cell_collect:
                acc = outs[ci] if acc is None else acc + outs[ci]
            pool.append(acc)
        hw = (max(pool[i].shape[2] for i in collect),
              max(pool[i].shape[3] for i in collect))
        feats = jnp.concatenate(
            [_resize_chw(pool[i], hw, align_corners, interpret=interpret)
             for i in collect],
            axis=1)
        if flat_logits:
            return conv_chw(feats, clf_w, clf_b, k=1, relu=False,
                            flat_out=True, interpret=interpret), hw
        return pw(feats, clf_w, clf_b, relu=False)

    return apply


def build_fast_template_decoder(genotype, params, stats, *,
                                align_corners: bool = True,
                                taps_channel_first: bool = False,
                                flat_logits: bool = False,
                                interpret: bool = False):
    """WACV template decoder on the CHW Pallas ops (eval fast path);
    mirrors template_decoders.template_decoder_apply."""
    from segtpu.models.template_decoders import (
        validate_template_genotype, template_conns)
    from segtpu.ops.layer_factory import AGG_OP_NAMES
    validate_template_genotype(genotype, num_inputs=len(params["adapt"]))

    adapts = [_fold(p, s) for p, s in zip(params["adapt"], stats["adapt"])]
    blocks = []
    for (i, j, agg, opi), bp, bs in zip(genotype, params["blocks"],
                                        stats["blocks"]):
        blk: Dict[str, Any] = {"agg": AGG_OP_NAMES[agg]}
        if blk["agg"] == "psum":
            blk["b1"] = _fold(bp["b1"], bs["b1"])
            blk["b2"] = _fold(bp["b2"], bs["b2"])
        else:
            blk["reduce"] = _fold(bp["reduce"], bs["reduce"])
        blk["op"] = _Op(OP_NAMES[opi], bp["op"], bs["op"], interpret)
        blocks.append(blk)
    clf_w, clf_b = params["clf"]["w"], params["clf"]["b"]
    collect = _decoder_collect_inds(template_conns(genotype),
                                    len(params["adapt"]))

    def pw(x, wf, bf, relu=True):
        return conv_chw(x, wf, bf, k=1, relu=relu, interpret=interpret)

    def apply(taps):
        pool: List[Any] = []
        for t, (wf, bf) in zip(taps, adapts):
            x = t if taps_channel_first else jnp.transpose(t, (0, 3, 1, 2))
            pool.append(pw(x, wf, bf))
        for blk, (i, j, agg, opi) in zip(blocks, genotype):
            x1, x2 = pool[i], pool[j]
            hw = (max(x1.shape[2], x2.shape[2]),
                  max(x1.shape[3], x2.shape[3]))
            if blk["agg"] == "psum":
                y = _resize_chw(
                    pw(x2, *blk["b2"]), hw, align_corners,
                    acc=_resize_chw(pw(x1, *blk["b1"]), hw, align_corners,
                                    interpret=interpret),
                    interpret=interpret)
            else:
                y = jnp.concatenate(
                    [_resize_chw(x1, hw, align_corners, interpret=interpret),
                     _resize_chw(x2, hw, align_corners, interpret=interpret)],
                    axis=1)
                y = pw(y, *blk["reduce"])
            pool.append(blk["op"](y))
        hw = (max(pool[i].shape[2] for i in collect),
              max(pool[i].shape[3] for i in collect))
        feats = jnp.concatenate(
            [_resize_chw(pool[i], hw, align_corners, interpret=interpret)
             for i in collect],
            axis=1)
        if flat_logits:
            return conv_chw(feats, clf_w, clf_b, k=1, relu=False,
                            flat_out=True, interpret=interpret), hw
        return pw(feats, clf_w, clf_b, relu=False)

    return apply
