"""CHW flat-pixel Pallas decoder ops vs the NHWC reference
(interpret mode on CPU; compiled path exercised by bench on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segtpu.core.layers import conv_bn_apply, conv_bn_init
from segtpu.kernels.chw_ops import conv_chw, sep_conv_chw, fold_bn


def _rand_cb(key, k, cin, cout, groups=1):
    p, s = conv_bn_init(key, k, k, cin, cout, groups=groups)
    rng = np.random.RandomState(0)
    p["scale"] = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5)
    p["bias"] = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    s["mean"] = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    s["var"] = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5)
    return p, s


def _nhwc_ref(p, s, x_nhwc, *, k, dilation, groups):
    y, _ = conv_bn_apply(p, s, x_nhwc, dilation=dilation, groups=groups,
                         act="relu", train=False)
    return np.asarray(y)


@pytest.mark.parametrize("k,dil,depthwise", [
    (1, 1, False),
    (3, 1, False),
    (3, 3, False),
    (3, 12, False),
    (3, 1, True),
    (5, 6, True),
])
def test_conv_chw_matches_nhwc(k, dil, depthwise):
    c = 48
    rng = np.random.RandomState(1)
    x = rng.randn(2, 40, 64, c).astype(np.float32)  # H=40: ragged tiles
    groups = c if depthwise else 1
    p, s = _rand_cb(jax.random.PRNGKey(0), k, c, c, groups=groups)
    want = _nhwc_ref(p, s, jnp.asarray(x), k=k, dilation=dil, groups=groups)

    wf, bf = fold_bn(p["w"], p["scale"], p["bias"], s["mean"], s["var"])
    x_chw = jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))
    got = conv_chw(x_chw, wf, bf, k=k, dilation=dil, depthwise=depthwise,
                   interpret=True)
    got = np.transpose(np.asarray(got), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,dil", [(3, 1), (5, 1), (3, 3), (5, 6)])
def test_sep_conv_chw_matches_nhwc(k, dil):
    c = 48
    rng = np.random.RandomState(2)
    x = rng.randn(1, 32, 48, c).astype(np.float32)
    pd, sd = _rand_cb(jax.random.PRNGKey(1), k, c, c, groups=c)
    pp, sp = _rand_cb(jax.random.PRNGKey(2), 1, c, c)

    y, _ = conv_bn_apply(pd, sd, jnp.asarray(x), dilation=dil, groups=c,
                         act="relu", train=False)
    want, _ = conv_bn_apply(pp, sp, y, act="relu", train=False)
    want = np.asarray(want)

    wd, bd = fold_bn(pd["w"], pd["scale"], pd["bias"], sd["mean"], sd["var"])
    wp, bp = fold_bn(pp["w"], pp["scale"], pp["bias"], sp["mean"], sp["var"])
    x_chw = jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))
    got = sep_conv_chw(x_chw, wd, bd, wp, bp, k=k, dilation=dil,
                       interpret=True)
    got = np.transpose(np.asarray(got), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv_chw_rectangular_cout():
    """Cin != Cout (adapt convs: 320 -> 48)."""
    rng = np.random.RandomState(3)
    x = rng.randn(1, 16, 32, 24).astype(np.float32)
    p, s = _rand_cb(jax.random.PRNGKey(3), 1, 24, 48)
    want = _nhwc_ref(p, s, jnp.asarray(x), k=1, dilation=1, groups=1)
    wf, bf = fold_bn(p["w"], p["scale"], p["bias"], s["mean"], s["var"])
    got = conv_chw(jnp.transpose(jnp.asarray(x), (0, 3, 1, 2)), wf, bf,
                   k=1, interpret=True)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 2, 3, 1)),
                               want, rtol=1e-4, atol=1e-4)


def test_conv_chw_im2col_branch_matches_nhwc():
    """Small-C dense conv at w%128==0 routes through the dx-grouped
    im2col single-dot path — must match the NHWC reference exactly."""
    rng = np.random.RandomState(5)
    x = rng.randn(2, 12, 128, 3).astype(np.float32).transpose(0, 3, 2, 1)
    x = np.ascontiguousarray(rng.randn(2, 24, 128, 12).astype(np.float32))
    p, s = _rand_cb(jax.random.PRNGKey(21), 3, 12, 32)
    want = _nhwc_ref(p, s, jnp.asarray(x), k=3, dilation=1, groups=1)
    from segtpu.kernels.chw_ops import fold_bn
    wf, bf = fold_bn(p["w"], p["scale"], p["bias"], s["mean"], s["var"])
    x_chw = jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))
    got = conv_chw(x_chw, wf, bf, k=3, dilation=1, interpret=True)
    got = np.transpose(np.asarray(got), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("op1,op2", [
    (("conv", 3, 3), ("sep", 3, 1)),    # arch0 node2: dil3 conv + sep3x3
    (("sep", 5, 6), ("conv", 1, 1)),    # arch0 node3: sep5x5dil6 + pw
    (("conv", 3, 1), ("conv", 3, 12)),
    (("sep", 3, 3), ("sep", 5, 1)),
])
def test_pair_op_chw_matches_unfused(op1, op2):
    """The fused cell-node pair kernel (one kernel, two branches, summed
    in f32) must match the unfused composition act(op1(x1)) + act(op2(x2))
    built from conv_chw/sep_conv_chw."""
    from segtpu.kernels.chw_ops import pair_op_chw
    c = 48
    rng = np.random.RandomState(7)
    x1 = jnp.asarray(rng.randn(2, c, 24, 64).astype(np.float32))
    x2 = jnp.asarray(rng.randn(2, c, 24, 64).astype(np.float32))

    def mk(op, key):
        kind, k, dil = op
        if kind == "sep":
            pd, sd = _rand_cb(jax.random.fold_in(key, 0), k, c, c, groups=c)
            pp, sp = _rand_cb(jax.random.fold_in(key, 1), 1, c, c)
            wd, bd = fold_bn(pd["w"], pd["scale"], pd["bias"],
                             sd["mean"], sd["var"])
            wp, bp = fold_bn(pp["w"], pp["scale"], pp["bias"],
                             sp["mean"], sp["var"])
            return (wd, bd, wp, bp)
        p, s = _rand_cb(key, k, c, c)
        return fold_bn(p["w"], p["scale"], p["bias"], s["mean"], s["var"])

    w1 = mk(op1, jax.random.PRNGKey(11))
    w2 = mk(op2, jax.random.PRNGKey(12))

    def one(op, wts, x):
        kind, k, dil = op
        if kind == "sep":
            return sep_conv_chw(x, *wts, k=k, dilation=dil, interpret=True)
        return conv_chw(x, *wts, k=k, dilation=dil, interpret=True)

    want = np.asarray(one(op1, w1, x1)) + np.asarray(one(op2, w2, x2))
    got = np.asarray(pair_op_chw(x1, w1, x2, w2, op1=op1, op2=op2,
                                 interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kind", ["conv", "sep", "pw"])
def test_vec_acc_matches_broadcast_add(kind):
    """vec_acc (the GAP-branch partner epilogue: a per-(batch, channel)
    vector added in-kernel) must equal the unfused op + broadcast add."""
    c = 48
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, c, 24, 64).astype(np.float32))
    vec = jnp.asarray(rng.randn(2, c).astype(np.float32))
    if kind == "sep":
        pd, sd = _rand_cb(jax.random.PRNGKey(3), 3, c, c, groups=c)
        pp, sp = _rand_cb(jax.random.PRNGKey(4), 1, c, c)
        wd, bd = fold_bn(pd["w"], pd["scale"], pd["bias"],
                         sd["mean"], sd["var"])
        wp, bp = fold_bn(pp["w"], pp["scale"], pp["bias"],
                         sp["mean"], sp["var"])
        base = sep_conv_chw(x, wd, bd, wp, bp, k=3, dilation=3,
                            interpret=True)
        got = sep_conv_chw(x, wd, bd, wp, bp, None, vec, k=3, dilation=3,
                           interpret=True)
    else:
        k = 1 if kind == "pw" else 3
        p, s = _rand_cb(jax.random.PRNGKey(5), k, c, c)
        wf, bf = fold_bn(p["w"], p["scale"], p["bias"], s["mean"], s["var"])
        base = conv_chw(x, wf, bf, k=k, interpret=True)
        got = conv_chw(x, wf, bf, None, vec, k=k, interpret=True)
    want = np.asarray(base) + np.asarray(vec)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_pw_multi_matches_concat_conv():
    """pw_multi_chw (the concat-free decoder head) == conv_chw over the
    channel-concatenated input with the channel-split weights, up to the
    f32 partial-sum split (exact here: f32 inputs, two K=48 partials
    accumulate in f32 either way at this size — assert allclose tight)."""
    import numpy as np
    import jax.numpy as jnp
    from segtpu.kernels.chw_ops import conv_chw, pw_multi_chw
    rng = np.random.RandomState(0)
    b, c1, c2, co, h, w = 2, 48, 48, 19, 8, 128
    x1 = jnp.asarray(rng.randn(b, c1, h, w).astype(np.float32))
    x2 = jnp.asarray(rng.randn(b, c2, h, w).astype(np.float32))
    wf = jnp.asarray(rng.randn(1, 1, c1 + c2, co).astype(np.float32)) * .1
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    want = np.asarray(conv_chw(jnp.concatenate([x1, x2], axis=1), wf,
                               bias, k=1, relu=False, out_4d=True,
                               interpret=True))
    got = np.asarray(pw_multi_chw([x1, x2],
                                  [wf[:, :, :c1], wf[:, :, c1:]], bias,
                                  out_4d=True, interpret=True))
    assert got.shape == want.shape == (b, co, h, w)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # flat output form
    got_f = np.asarray(pw_multi_chw([x1, x2],
                                    [wf[:, :, :c1], wf[:, :, c1:]],
                                    bias, flat_out=True, interpret=True))
    np.testing.assert_allclose(got_f.reshape(b, co, h, w), want,
                               rtol=1e-5, atol=1e-5)
    # single-source degenerates to the plain conv
    got_1 = np.asarray(pw_multi_chw([x1], [wf[:, :, :c1]], bias,
                                    out_4d=True, interpret=True))
    want_1 = np.asarray(conv_chw(x1, wf[:, :, :c1], bias, k=1,
                                 relu=False, out_4d=True, interpret=True))
    np.testing.assert_array_equal(got_1, want_1)


def test_pw_chain_matches_stacked_convs():
    """pw_chain_chw == two sequential conv_chw(k=1) calls BIT-EXACTLY:
    the chain casts each stage to the output dtype before the next dot,
    which is exactly the HBM storage rounding of the unfused pair (the
    property fast_decoder relies on to fuse the adapt->agg pair in the
    production path while the NHWC reference path stays unfused)."""
    import numpy as np
    import jax.numpy as jnp
    from segtpu.kernels.chw_ops import conv_chw, pw_chain_chw
    rng = np.random.RandomState(1)
    b, c0, c1, c2, h, w = 2, 24, 48, 48, 8, 128
    for dtype in (np.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randn(b, c0, h, w).astype(np.float32)
                        ).astype(dtype)
        w1 = jnp.asarray(rng.randn(1, 1, c0, c1).astype(np.float32) * .2
                         ).astype(dtype)
        b1 = jnp.asarray(rng.randn(c1).astype(np.float32))
        w2 = jnp.asarray(rng.randn(1, 1, c1, c2).astype(np.float32) * .2
                         ).astype(dtype)
        b2 = jnp.asarray(rng.randn(c2).astype(np.float32))
        mid = conv_chw(x, w1, b1, k=1, relu=True, interpret=True)
        want = np.asarray(conv_chw(mid, w2, b2, k=1, relu=True,
                                   interpret=True))
        got = np.asarray(pw_chain_chw(x, [(w1, b1), (w2, b2)],
                                      interpret=True))
        np.testing.assert_array_equal(got, want)
    # 4-D output form + single-stage degenerate + mixed relu flags
    x = jnp.asarray(rng.randn(b, c0, h, w).astype(np.float32))
    w1 = jnp.asarray(rng.randn(1, 1, c0, c1).astype(np.float32) * .2)
    b1 = jnp.asarray(rng.randn(c1).astype(np.float32))
    got1 = np.asarray(pw_chain_chw(x, [(w1, b1)], relu=[False],
                                   out_4d=True, interpret=True))
    want1 = np.asarray(conv_chw(x, w1, b1, k=1, relu=False, out_4d=True,
                                interpret=True))
    np.testing.assert_array_equal(got1, want1)
