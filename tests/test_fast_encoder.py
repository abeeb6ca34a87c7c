"""Fused inv-res kernel + CHW fast encoder == NHWC reference encoder."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segtpu.core.layers import conv_bn_init
from segtpu.kernels.chw_ops import fold_bn, inv_res_chw
from segtpu.models.encoders import (
    mbv2_init, mbv2_apply, _inv_res_apply, space_to_depth)
from segtpu.models.fast_encoder import fast_mbv2_apply


def _rand_stats(stats, seed=0):
    rng = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.rand(*v.shape).astype(np.float32) + 0.5),
        stats)


@pytest.mark.parametrize("t,cin,cout,residual", [
    (6, 16, 24, False),   # expand, channel change
    (6, 32, 32, True),    # expand + residual
    (1, 32, 16, False),   # no expand (first block)
])
def test_inv_res_kernel_matches_reference(t, cin, cout, residual):
    from segtpu.models.encoders import _inv_res_init
    key = jax.random.PRNGKey(0)
    p, s = _inv_res_init(key, cin, cout, t, jnp.float32)
    s = _rand_stats(s)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 24, 40, cin).astype(np.float32)
    want, _ = _inv_res_apply(p, s, jnp.asarray(x), stride=1, t=t,
                             residual=residual, train=False)
    want = np.asarray(want)

    we, be = (fold_bn(p["expand"]["w"], p["expand"]["scale"],
                      p["expand"]["bias"], s["expand"]["mean"],
                      s["expand"]["var"]) if t != 1 else (None, None))
    wd, bd = fold_bn(p["dw"]["w"], p["dw"]["scale"], p["dw"]["bias"],
                     s["dw"]["mean"], s["dw"]["var"])
    wp, bp = fold_bn(p["project"]["w"], p["project"]["scale"],
                     p["project"]["bias"], s["project"]["mean"],
                     s["project"]["var"])
    x_chw = jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))
    got = inv_res_chw(x_chw, we, be, wd, bd, wp, bp, residual=residual,
                      interpret=True)
    got = np.transpose(np.asarray(got), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fmt", ["nhwc3", "s2d12"])
def test_fast_encoder_matches_reference(fmt):
    params, stats = mbv2_init(jax.random.PRNGKey(0))
    stats = _rand_stats(stats, seed=2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    want, _ = mbv2_apply(params, stats, x, train=False)
    x_in = space_to_depth(x) if fmt == "s2d12" else x
    got = fast_mbv2_apply(params, stats, x_in, input_format=fmt,
                          interpret=True)
    assert len(got) == 4
    for g, wnt in zip(got, want):
        g = np.transpose(np.asarray(g), (0, 2, 3, 1))
        np.testing.assert_allclose(g, np.asarray(wnt), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("t,cin,cout", [
    (6, 16, 24),
    (1, 32, 16),
    (6, 32, 64),   # stacked gate boundary: 4*C == 128 with expand (b3-s2)
])
def test_inv_res_s2_kernel_matches_reference(t, cin, cout):
    from segtpu.kernels.chw_ops import inv_res_s2_chw
    from segtpu.models.encoders import _inv_res_init
    key = jax.random.PRNGKey(4)
    p, s = _inv_res_init(key, cin, cout, t, jnp.float32)
    s = _rand_stats(s, seed=5)
    rng = np.random.RandomState(6)
    x = rng.randn(2, 24, 40, cin).astype(np.float32)
    want, _ = _inv_res_apply(p, s, jnp.asarray(x), stride=2, t=t,
                             residual=False, train=False)
    want = np.asarray(want)

    we, be = (fold_bn(p["expand"]["w"], p["expand"]["scale"],
                      p["expand"]["bias"], s["expand"]["mean"],
                      s["expand"]["var"]) if t != 1 else (None, None))
    wd, bd = fold_bn(p["dw"]["w"], p["dw"]["scale"], p["dw"]["bias"],
                     s["dw"]["mean"], s["dw"]["var"])
    wp, bp = fold_bn(p["project"]["w"], p["project"]["scale"],
                     p["project"]["bias"], s["project"]["mean"],
                     s["project"]["var"])
    x_chw = jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))
    got = inv_res_s2_chw(x_chw, we, be, wd, bd, wp, bp, interpret=True)
    got = np.transpose(np.asarray(got), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_chw_encoder_matches_reference():
    """Full-CHW encoder (every block a Pallas kernel) == NHWC reference."""
    from segtpu.models.fast_encoder import mbv2_chw_apply
    params, stats = mbv2_init(jax.random.PRNGKey(0))
    stats = _rand_stats(stats, seed=2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    want, _ = mbv2_apply(params, stats, x, train=False)
    x12 = jnp.transpose(space_to_depth(x), (0, 3, 1, 2))
    got = mbv2_chw_apply(params, stats, x12, interpret=True)
    assert len(got) == 4
    for g, wnt in zip(got, want):
        g = np.transpose(np.asarray(g), (0, 2, 3, 1))
        np.testing.assert_allclose(g, np.asarray(wnt), rtol=2e-3, atol=2e-4)


def test_normalize_s2d_chw_matches_nhwc():
    from segtpu.engine.inference import _normalize_s2d, _normalize_s2d_chw
    rng = np.random.RandomState(9)
    img = jnp.asarray(rng.randint(0, 256, (2, 8, 128, 3), np.uint8))
    want = np.transpose(
        np.asarray(_normalize_s2d(img, jnp.float32)), (0, 3, 1, 2))
    got = np.asarray(_normalize_s2d_chw(img, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_inv_res_s2_perm_split_path():
    """W % 256 == 0 routes the quadrant split through the exact
    permutation-matmul form — must equal the reference stride-2 block."""
    from segtpu.kernels.chw_ops import inv_res_s2_chw
    from segtpu.models.encoders import _inv_res_init
    key = jax.random.PRNGKey(7)
    p, s = _inv_res_init(key, 8, 16, 6, jnp.float32)
    s = _rand_stats(s, seed=8)
    rng = np.random.RandomState(9)
    x = rng.randn(1, 16, 256, 8).astype(np.float32)
    want, _ = _inv_res_apply(p, s, jnp.asarray(x), stride=2, t=6,
                             residual=False, train=False)
    we, be = fold_bn(p["expand"]["w"], p["expand"]["scale"],
                     p["expand"]["bias"], s["expand"]["mean"],
                     s["expand"]["var"])
    wd, bd = fold_bn(p["dw"]["w"], p["dw"]["scale"], p["dw"]["bias"],
                     s["dw"]["mean"], s["dw"]["var"])
    wp, bp = fold_bn(p["project"]["w"], p["project"]["scale"],
                     p["project"]["bias"], s["project"]["mean"],
                     s["project"]["var"])
    x_chw = jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))
    got = inv_res_s2_chw(x_chw, we, be, wd, bd, wp, bp, interpret=True)
    got = np.transpose(np.asarray(got), (0, 2, 3, 1))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("w,perm", [(40, False), (128, True), (256, True)])
def test_inv_res_row_split_feeds_s2(w, perm):
    """inv_res_chw(row_split=True) -> (even, odd) FLAT [B,C,(H/2)*W]
    row-parity plane TUPLE must (a) interleave back to the plain output
    exactly and (b) feed inv_res_s2_chw's pre-split path (pair_hw) with
    identical results to the 4-D path — for both the generic (w%128!=0)
    and permutation-matmul (w%128==0) column splits."""
    from segtpu.kernels.chw_ops import inv_res_s2_chw
    from segtpu.models.encoders import _inv_res_init
    key = jax.random.PRNGKey(11)
    p1, s1 = _inv_res_init(key, 16, 16, 1, jnp.float32)
    s1 = _rand_stats(s1, seed=12)
    p2, s2 = _inv_res_init(jax.random.PRNGKey(13), 16, 24, 6, jnp.float32)
    s2 = _rand_stats(s2, seed=14)
    rng = np.random.RandomState(15)
    x = jnp.asarray(rng.randn(2, 16, 16, w).astype(np.float32))

    def fold3(p, s):
        we, be = (fold_bn(p["expand"]["w"], p["expand"]["scale"],
                          p["expand"]["bias"], s["expand"]["mean"],
                          s["expand"]["var"]) if "expand" in p
                  else (None, None))
        wd, bd = fold_bn(p["dw"]["w"], p["dw"]["scale"], p["dw"]["bias"],
                         s["dw"]["mean"], s["dw"]["var"])
        wp, bp = fold_bn(p["project"]["w"], p["project"]["scale"],
                         p["project"]["bias"], s["project"]["mean"],
                         s["project"]["var"])
        return we, be, wd, bd, wp, bp

    f1, f2 = fold3(p1, s1), fold3(p2, s2)
    plain = inv_res_chw(x, *f1, residual=True, interpret=True)
    pair = inv_res_chw(x, *f1, residual=True, row_split=True,
                       interpret=True)
    assert isinstance(pair, tuple) and len(pair) == 2
    assert pair[0].shape == (2, 16, 8 * w)  # each [B, C, (H/2)*W]
    # (a) interleave-back parity (pair is (even, odd))
    p5 = [p.reshape(2, 16, 8, w) for p in pair]
    inter = jnp.stack([p5[0], p5[1]], axis=3).reshape(plain.shape)
    np.testing.assert_allclose(np.asarray(inter), np.asarray(plain),
                               rtol=1e-5, atol=1e-6)
    # (b) s2 block: pre-split flat pair == 4-D input
    want = inv_res_s2_chw(plain, *f2, interpret=True)
    got = inv_res_s2_chw(pair, *f2, pair_hw=(8, w), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_inv_res_s2_inkernel_perm_matches_einsum_path(monkeypatch):
    """The round-5 in-kernel column deinterleave (chw_ops
    _S2_INKERNEL_PERM) must be BIT-EXACT vs the XLA einsum path it
    replaces: the perm is a 0/1 matmul with one nonzero per output and
    f32 accumulation, so the permed values are identical and everything
    downstream of them is the same program. Runs the w % 256 == 0
    aligned shape both ways (bf16 like production, and f32)."""
    import segtpu.kernels.chw_ops as co
    from segtpu.kernels.chw_ops import inv_res_s2_chw
    rng = np.random.RandomState(9)
    cin, cmid, cout = 16, 96, 24
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * .1)
    ws = (f(1, 1, cin, cmid), f(cmid), f(3, 3, 1, cmid), f(cmid),
          f(1, 1, cmid, cout), f(cout))
    for dtype in (jnp.bfloat16, jnp.float32):
        x = jnp.asarray(rng.randn(2, cin, 32, 256).astype(np.float32)
                        ).astype(dtype)
        wsd = tuple(w.astype(dtype) if w.ndim == 4 else w for w in ws)
        monkeypatch.setattr(co, "_S2_INKERNEL_PERM", True)
        got = np.asarray(inv_res_s2_chw(x, *wsd, interpret=True))
        monkeypatch.setattr(co, "_S2_INKERNEL_PERM", False)
        want = np.asarray(inv_res_s2_chw(x, *wsd, interpret=True))
        np.testing.assert_array_equal(got, want)
    # the pair-plane (row-split producer) form too — production path
    monkeypatch.setattr(co, "_S2_INKERNEL_PERM", True)
    x = jnp.asarray(rng.randn(2, cin, 32, 256).astype(np.float32))
    xr = x.reshape(2, cin, 16, 2, 256)
    pair = tuple(xr[:, :, :, ry].reshape(2, cin, 16 * 256)
                 for ry in (0, 1))
    got = np.asarray(inv_res_s2_chw(pair, *ws, pair_hw=(16, 256),
                                    interpret=True))
    monkeypatch.setattr(co, "_S2_INKERNEL_PERM", False)
    want = np.asarray(inv_res_s2_chw(pair, *ws, pair_hw=(16, 256),
                                     interpret=True))
    np.testing.assert_array_equal(got, want)
