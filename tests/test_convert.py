"""Checkpoint conversion: torch MobileNet-v2 -> segtpu encoder with
per-pixel logit parity (the parity anchor, SURVEY.md §5.4/§7.3 item 3).

Builds a torch MobileNetV2 with the reference's (tonylins) module naming
inside the test, converts its state_dict both by name and by shape/order,
and checks tap-level outputs match the JAX encoder exactly.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax

from segtpu.convert.torch_import import (
    load_mbv2_state_dict, match_by_shape_order, conv_w_to_hwio)
from segtpu.models.encoders import mbv2_init, mbv2_apply


MBV2_TAP_IDX = (3, 6, 13, 17)  # taps after stages 2/3/5/7


def build_torch_mbv2_trunk() -> nn.Sequential:
    """tonylins/pytorch-mobilenet-v2-style MobileNetV2 feature trunk as
    an nn.Sequential (shared with the full-segmenter fidelity drill)."""
    cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]

    def conv_bn(cin, cout, stride):
        return nn.Sequential(nn.Conv2d(cin, cout, 3, stride, 1, bias=False),
                             nn.BatchNorm2d(cout), nn.ReLU6(inplace=True))

    class InvertedResidual(nn.Module):
        def __init__(self, cin, cout, stride, t):
            super().__init__()
            self.use_res = stride == 1 and cin == cout
            mid = cin * t
            layers = []
            if t != 1:
                layers += [nn.Conv2d(cin, mid, 1, bias=False),
                           nn.BatchNorm2d(mid), nn.ReLU6(inplace=True)]
            layers += [nn.Conv2d(mid, mid, 3, stride, 1, groups=mid,
                                 bias=False),
                       nn.BatchNorm2d(mid), nn.ReLU6(inplace=True),
                       nn.Conv2d(mid, cout, 1, bias=False),
                       nn.BatchNorm2d(cout)]
            self.conv = nn.Sequential(*layers)

        def forward(self, x):
            y = self.conv(x)
            return x + y if self.use_res else y

    features = [conv_bn(3, 32, 2)]
    cin = 32
    for t, c, n, s in cfg:
        for i in range(n):
            features.append(InvertedResidual(cin, c, s if i == 0 else 1, t))
            cin = c
    return nn.Sequential(*features)


def _torch_mbv2():
    model = build_torch_mbv2_trunk()
    model.eval()
    tap_idx = MBV2_TAP_IDX

    def forward_taps(x):
        taps = []
        for i, m in enumerate(model):
            x = m(x)
            if i in tap_idx:
                taps.append(x)
        return taps

    sd = {f"features.{k}": v for k, v in model.state_dict().items()}
    return forward_taps, sd


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    return _torch_mbv2()


def test_conv_w_to_hwio_depthwise_shape():
    w = np.zeros((32, 1, 3, 3), np.float32)
    assert conv_w_to_hwio(w).shape == (3, 3, 1, 32)


def test_mbv2_conversion_logit_parity(torch_model):
    forward_taps, sd = torch_model
    params, stats = load_mbv2_state_dict(sd)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        torch_taps = forward_taps(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy()))
    jax_taps, _ = mbv2_apply(params, stats, x)

    assert len(jax_taps) == len(torch_taps) == 4
    for jt, tt in zip(jax_taps, torch_taps):
        want = np.transpose(tt.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(jt), want,
                                   rtol=1e-4, atol=1e-4)


def test_order_based_matches_name_based(torch_model):
    _, sd = torch_model
    by_name = load_mbv2_state_dict(sd)
    template = mbv2_init(jax.random.PRNGKey(0))
    by_order = match_by_shape_order(sd, template)
    for a, b in zip(jax.tree_util.tree_leaves(by_name),
                    jax.tree_util.tree_leaves(by_order)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_order_matcher_rejects_wrong_shapes(torch_model):
    _, sd = torch_model
    template = mbv2_init(jax.random.PRNGKey(0))
    bad = dict(sd)
    k = "features.0.0.weight"
    bad[k] = torch.zeros(64, 3, 3, 3)  # wrong out-channels
    with pytest.raises(ValueError, match="shape mismatch"):
        match_by_shape_order(bad, template)
