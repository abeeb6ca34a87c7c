"""Conv/BN primitives: shape semantics + exact parity vs torch (SURVEY.md §4.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from segtpu.core.layers import (
    conv_init, conv_apply, bn_init, bn_apply, conv_bn_init, conv_bn_apply)


def _torch_conv(x_nhwc, w_hwio, stride=1, dilation=1, groups=1):
    # np.copy: the inputs may be non-writable views of jax arrays, which
    # torch.from_numpy warns about.
    x = torch.from_numpy(np.copy(np.transpose(x_nhwc, (0, 3, 1, 2))))
    # HWIO -> OIHW
    w = torch.from_numpy(np.copy(np.transpose(w_hwio, (3, 2, 0, 1))))
    k = w_hwio.shape[0]
    pad = dilation * (k - 1) // 2
    y = torch.nn.functional.conv2d(x, w, stride=stride, padding=pad,
                                   dilation=dilation, groups=groups)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def test_conv_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 8).astype(np.float32)
    for k, stride, dil, groups in [(1, 1, 1, 1), (3, 1, 1, 1), (3, 2, 1, 1),
                                   (3, 1, 3, 1), (5, 1, 6, 1), (3, 1, 1, 8)]:
        p = conv_init(jax.random.PRNGKey(0), k, k, 8, 8, groups=groups)
        got = np.asarray(conv_apply(p, x, stride=stride, dilation=dil,
                                    groups=groups))
        want = _torch_conv(x, np.asarray(p["w"]), stride, dil, groups)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4), (k, stride)


def test_bn_eval_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    p, s = bn_init(4)
    p["scale"] = jnp.asarray(rng.rand(4).astype(np.float32) + 0.5)
    p["bias"] = jnp.asarray(rng.randn(4).astype(np.float32))
    s["mean"] = jnp.asarray(rng.randn(4).astype(np.float32))
    s["var"] = jnp.asarray(rng.rand(4).astype(np.float32) + 0.5)
    got, s2 = bn_apply(p, s, x, train=False)
    assert s2 is s
    bn = torch.nn.BatchNorm2d(4, eps=1e-5).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.copy(p["scale"])))
        bn.bias.copy_(torch.from_numpy(np.copy(p["bias"])))
        bn.running_mean.copy_(torch.from_numpy(np.copy(s["mean"])))
        bn.running_var.copy_(torch.from_numpy(np.copy(s["var"])))
        want = bn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(want.numpy(), (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-5)


def test_bn_train_updates_running_stats_like_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 6, 6, 3).astype(np.float32) * 2 + 1
    p, s = bn_init(3)
    got, s2 = bn_apply(p, s, x, train=True)
    bn = torch.nn.BatchNorm2d(3).train()
    want = bn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(want.detach().numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2["mean"]),
                               bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2["var"]),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_conv_bn_apply_shapes_and_jit():
    p, s = conv_bn_init(jax.random.PRNGKey(0), 3, 3, 4, 8)
    x = jnp.ones((1, 16, 16, 4))
    fn = jax.jit(lambda p, s, x: conv_bn_apply(p, s, x, stride=2, act="relu6"))
    y, s2 = fn(p, s, x)
    assert y.shape == (1, 8, 8, 8)
    assert float(jnp.max(y)) <= 6.0
