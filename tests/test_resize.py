"""Bilinear resize parity vs PyTorch F.interpolate (SURVEY.md §7.3 item 1)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from segtpu.core.resize import resize_bilinear


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)),      # 2x up
    ((16, 12), (64, 48)),    # 4x up
    ((7, 5), (13, 11)),      # odd non-integer ratio up
    ((32, 32), (8, 8)),      # down
    ((9, 6), (9, 6)),        # identity
    ((1, 1), (4, 4)),        # degenerate
])
def test_matches_torch_bilinear(align_corners, in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 5).astype(np.float32)
    got = np.asarray(resize_bilinear(x, out_hw, align_corners=align_corners))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
        mode="bilinear", align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_3d_input():
    x = np.random.RandomState(1).randn(6, 4, 3).astype(np.float32)
    y = resize_bilinear(x, (12, 8))
    assert y.shape == (12, 8, 3)
