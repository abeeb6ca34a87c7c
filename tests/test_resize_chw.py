"""Flat-layout Pallas resize (kernels.resize_chw) vs the einsum
reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segtpu.core.resize import _interp_matrix
from segtpu.kernels.resize_chw import resize_chw_pallas


def _ref(x, oh, ow, align):
    ah = jnp.asarray(_interp_matrix(x.shape[2], oh, align))
    aw = jnp.asarray(_interp_matrix(x.shape[3], ow, align))
    y = x.astype(jnp.float32)
    y = jnp.einsum("oh,bchw->bcow", ah, y)
    y = jnp.einsum("pw,bcow->bcop", aw, y)
    return np.asarray(y)


@pytest.mark.parametrize("h,w,oh,ow", [
    (16, 128, 32, 256),    # 2x, w a lane multiple
    (8, 64, 32, 512),      # 4x/8x, w=64 -> 2-row view blocks
    (5, 96, 20, 384),      # ragged h, w=96 -> 4-row view blocks
    (16, 128, 16, 256),    # W-only resize
])
@pytest.mark.parametrize("align", [True, False])
def test_resize_chw_pallas_matches_einsum(h, w, oh, ow, align):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 48, h, w).astype(np.float32))
    want = _ref(x, oh, ow, align)
    got = np.asarray(resize_chw_pallas(x, (oh, ow), align_corners=align,
                                       interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_chw_pallas_acc_fusion():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 48, 16, 128).astype(np.float32))
    acc = jnp.asarray(rng.randn(1, 48, 32, 256).astype(np.float32))
    want = _ref(x, 32, 256, True) + np.asarray(acc)
    got = np.asarray(resize_chw_pallas(x, (32, 256), acc,
                                       align_corners=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_chw_bf16_dtype():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 48, 8, 128).astype(np.float32),
                    jnp.bfloat16)
    got = resize_chw_pallas(x, (16, 256), interpret=True)
    assert got.dtype == jnp.bfloat16 and got.shape == (1, 48, 16, 256)
    want = _ref(x, 16, 256, True)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=2e-2, atol=2e-2)
