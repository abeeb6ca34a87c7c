"""Full-segmenter per-pixel logit parity against a PyTorch twin.

The strongest parity evidence available without the released artifacts
(reference mount empty, SURVEY.md §0): build a torch decoder with the
exact genotype semantics and module-registration order of
segtpu.models.micro_decoders, import its weights through the
order-based converter (segtpu.convert.match_by_shape_order — the same
path the released .ckpt files will take), and require the fused JAX
forward to match the torch forward per-pixel.

This pins down, in one test: conv/BN numerics, bilinear AC=True
upsampling, cell/aggregate wiring, collect-index bookkeeping, the
converter's traversal order, and the classifier head.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax

from segtpu.models.arch_literals import ARCHS
from segtpu.models.micro_decoders import _cell_collect_inds, \
    _decoder_collect_inds
from segtpu.models.encoders import MBV2_TAP_CHANNELS
from segtpu.ops.layer_factory import OP_NAMES, _CONV_SPECS


def up(x, hw):
    if x.shape[-2:] == tuple(hw):
        return x
    return F.interpolate(x, size=hw, mode="bilinear", align_corners=True)


def cbr(cin, cout, k=1, dilation=1, groups=1):
    pad = dilation * (k - 1) // 2
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, padding=pad, dilation=dilation,
                  groups=groups, bias=False),
        nn.BatchNorm2d(cout))


class TorchOp(nn.Module):
    def __init__(self, name, c):
        super().__init__()
        self.name = name
        if name in ("skip_connect", "none"):
            pass
        elif name == "global_average_pool":
            self.conv = cbr(c, c, 1)
        else:
            k, dil, sep = _CONV_SPECS[name]
            if sep:
                self.dw = cbr(c, c, k, dilation=dil, groups=c)
                self.pw = cbr(c, c, 1)
            else:
                self.conv = cbr(c, c, k, dilation=dil)

    def forward(self, x):
        n = self.name
        if n == "none":
            return torch.zeros_like(x)
        if n == "skip_connect":
            return x
        if n == "global_average_pool":
            y = F.relu(self.conv(x.mean((2, 3), keepdim=True)))
            return y.expand(-1, -1, x.shape[2], x.shape[3])
        k, dil, sep = _CONV_SPECS[n]
        if sep:
            return F.relu(self.pw(F.relu(self.dw(x))))
        return F.relu(self.conv(x))


class TorchMicroDecoder(nn.Module):
    """Registration order mirrors micro_decoder_init exactly."""

    def __init__(self, genotype, inp_sizes, num_classes, agg=48):
        super().__init__()
        cell_config, conns = genotype
        self.genotype = genotype
        self.adapt = nn.ModuleList([cbr(c, agg) for c in inp_sizes])
        blocks = []
        for _ in conns:
            b = nn.Module()
            b.agg1 = cbr(agg, agg)
            b.agg2 = cbr(agg, agg)
            b.node0 = TorchOp(OP_NAMES[cell_config[0]], agg)
            b.nodes = nn.ModuleList()
            for p1, p2, o1, o2 in cell_config[1:]:
                pair = nn.Module()
                pair.a = TorchOp(OP_NAMES[o1], agg)
                pair.b = TorchOp(OP_NAMES[o2], agg)
                b.nodes.append(pair)
            blocks.append(b)
        self.blocks = nn.ModuleList(blocks)
        n_collect = len(_decoder_collect_inds(conns, len(inp_sizes)))
        self.clf = nn.Conv2d(n_collect * agg, num_classes, 1, bias=True)

    def forward(self, taps):
        cell_config, conns = self.genotype
        pool = [F.relu(a(t)) for a, t in zip(self.adapt, taps)]
        for b, (i, j) in enumerate(conns):
            blk = self.blocks[b]
            hw = (max(pool[i].shape[2], pool[j].shape[2]),
                  max(pool[i].shape[3], pool[j].shape[3]))
            y = up(F.relu(blk.agg1(pool[i])), hw) + \
                up(F.relu(blk.agg2(pool[j])), hw)
            outs = [y, blk.node0(y)]
            for k, (p1, p2, o1, o2) in enumerate(cell_config[1:]):
                outs.append(blk.nodes[k].a(outs[p1]) +
                            blk.nodes[k].b(outs[p2]))
            cell_out = sum(outs[i] for i in _cell_collect_inds(cell_config))
            pool.append(cell_out)
        collect = _decoder_collect_inds(conns, len(taps))
        hw = (max(pool[i].shape[2] for i in collect),
              max(pool[i].shape[3] for i in collect))
        feats = torch.cat([up(pool[i], hw) for i in collect], dim=1)
        return self.clf(feats)


@pytest.mark.parametrize("arch", ["arch0", "arch1"])
def test_decoder_torch_twin_logit_parity(arch):
    genotype = ARCHS[arch]
    torch.manual_seed(0)
    twin = TorchMicroDecoder(genotype, MBV2_TAP_CHANNELS,
                             num_classes=9).eval()
    # randomize BN stats so parity isn't trivially scale-free
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.2)

    from segtpu.convert.torch_import import match_by_shape_order
    from segtpu.models.micro_decoders import (
        micro_decoder_init, micro_decoder_apply)
    template = micro_decoder_init(jax.random.PRNGKey(0), genotype,
                                  MBV2_TAP_CHANNELS, num_classes=9)
    params, stats = match_by_shape_order(twin.state_dict(), template)

    rng = np.random.RandomState(0)
    taps_np = [rng.randn(1, 16 // s, 24 // s, c).astype(np.float32)
               for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    with torch.no_grad():
        want = twin([torch.from_numpy(np.transpose(t, (0, 3, 1, 2)).copy())
                     for t in taps_np])
    want = np.transpose(want.numpy(), (0, 2, 3, 1))

    got, _, _ = micro_decoder_apply(genotype, params, stats, taps_np)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


class TorchTemplateDecoder(nn.Module):
    """WACV template decoder twin; registration order mirrors
    template_decoder_init."""

    def __init__(self, genotype, inp_sizes, num_classes, agg=48):
        super().__init__()
        from segtpu.ops.layer_factory import AGG_OP_NAMES
        from segtpu.models.template_decoders import template_conns
        self.genotype = genotype
        self.adapt = nn.ModuleList([cbr(c, agg) for c in inp_sizes])
        blocks = []
        for i, j, agg_op, op in genotype:
            b = nn.Module()
            if AGG_OP_NAMES[agg_op] == "psum":
                b.b1 = cbr(agg, agg)
                b.b2 = cbr(agg, agg)
            else:
                b.reduce = cbr(2 * agg, agg)
            b.op = TorchOp(OP_NAMES[op], agg)
            blocks.append(b)
        self.blocks = nn.ModuleList(blocks)
        n_collect = len(_decoder_collect_inds(template_conns(genotype),
                                              len(inp_sizes)))
        self.clf = nn.Conv2d(n_collect * agg, num_classes, 1, bias=True)

    def forward(self, taps):
        from segtpu.ops.layer_factory import AGG_OP_NAMES
        from segtpu.models.template_decoders import template_conns
        pool = [F.relu(a(t)) for a, t in zip(self.adapt, taps)]
        for blk, (i, j, agg_op, op) in zip(self.blocks, self.genotype):
            x1, x2 = pool[i], pool[j]
            hw = (max(x1.shape[2], x2.shape[2]),
                  max(x1.shape[3], x2.shape[3]))
            if AGG_OP_NAMES[agg_op] == "psum":
                y = up(F.relu(blk.b1(x1)), hw) + up(F.relu(blk.b2(x2)), hw)
            else:
                y = torch.cat([up(x1, hw), up(x2, hw)], dim=1)
                y = F.relu(blk.reduce(y))
            pool.append(blk.op(y))
        collect = _decoder_collect_inds(template_conns(self.genotype),
                                        len(taps))
        hw = (max(pool[i].shape[2] for i in collect),
              max(pool[i].shape[3] for i in collect))
        return self.clf(torch.cat([up(pool[i], hw) for i in collect], dim=1))


def test_template_decoder_torch_twin_logit_parity():
    from segtpu.models.template_decoders import (
        template_decoder_init, template_decoder_apply)
    genotype = [[3, 2, 0, 2], [4, 1, 1, 0], [5, 0, 0, 9]]
    torch.manual_seed(1)
    twin = TorchTemplateDecoder(genotype, MBV2_TAP_CHANNELS,
                                num_classes=6).eval()
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    from segtpu.convert.torch_import import match_by_shape_order
    template = template_decoder_init(jax.random.PRNGKey(0), genotype,
                                     MBV2_TAP_CHANNELS, num_classes=6)
    params, stats = match_by_shape_order(twin.state_dict(), template)

    rng = np.random.RandomState(5)
    taps_np = [rng.randn(1, 16 // s, 24 // s, c).astype(np.float32)
               for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    with torch.no_grad():
        want = twin([torch.from_numpy(np.transpose(t, (0, 3, 1, 2)).copy())
                     for t in taps_np])
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    got, _, _ = template_decoder_apply(genotype, params, stats, taps_np)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
