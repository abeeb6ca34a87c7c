"""Pallas kernels vs their XLA reference implementations (interpret mode
on the CPU test mesh; compiled path exercised on TPU by bench/verify)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segtpu.core.resize import resize_bilinear
from segtpu.kernels.upsample_argmax import upsample_argmax


def _ref(logits, out_hw, align_corners):
    # f32 end-to-end (the kernel never rounds the interpolated logits
    # back to bf16 — that matches the torch-f32 reference chain)
    up = resize_bilinear(logits.astype(jnp.float32), out_hw,
                         align_corners=align_corners,
                         compute_dtype=jnp.float32)
    return jnp.argmax(up, axis=-1).astype(jnp.uint8)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("shape,out_hw", [
    ((2, 32, 64, 19), (128, 256)),   # 4x, CityScapes-like class count
    ((1, 16, 16, 5), (64, 64)),      # small
    ((1, 16, 24, 7), (70, 96)),      # H not divisible by tile
])
def test_upsample_argmax_matches_xla(align_corners, shape, out_hw):
    rng = np.random.RandomState(0)
    logits_f32 = jnp.asarray(rng.randn(*shape).astype(np.float32))
    # f32 logits -> f32 interp operands on both paths: identical away
    # from exact ties (vanishing tie-disagreement fraction)
    got = upsample_argmax(logits_f32, out_hw, align_corners=align_corners,
                          tile_h=32, interpret=True)
    want = _ref(logits_f32, out_hw, align_corners)
    got, want = np.asarray(got), np.asarray(want)
    assert got.shape == want.shape == (shape[0], *out_hw)
    frac = (got != want).mean()
    assert frac < 1e-3, f"f32 mismatch fraction {frac}"
    # bf16 logits (the production engine path): the kernel uses NATIVE
    # bf16 dot operands with f32 accumulation (f32 operands quarter the
    # MXU rate; the tail was MXU-bound) — interp weights round to bf16
    # (<= ~0.4%), flipping only near-tie argmaxes of these random
    # logits; real boundary ties are class-ambiguous pixels
    logits_bf = logits_f32.astype(jnp.bfloat16)
    got_bf = np.asarray(upsample_argmax(logits_bf, out_hw,
                                        align_corners=align_corners,
                                        tile_h=32, interpret=True))
    frac_bf = (got_bf != np.asarray(_ref(logits_bf, out_hw,
                                         align_corners))).mean()
    assert frac_bf < 8e-3, f"bf16 mismatch fraction {frac_bf}"


def test_upsample_argmax_3d_input():
    logits = jnp.asarray(np.random.RandomState(1).randn(8, 8, 4),
                         jnp.float32)
    got = upsample_argmax(logits, (32, 32), tile_h=32, interpret=True)
    assert got.shape == (32, 32) and got.dtype == jnp.uint8
    want = _ref(logits[None], (32, 32), True)[0]
    assert (np.asarray(got) == np.asarray(want)).mean() > 0.999


def test_upsample_argmax_crop_matches_up_then_crop():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(1, 12, 15, 6).astype(np.float32))
    # padded grid 96x128, crop to 70x100
    got = upsample_argmax(logits, (96, 120), crop_hw=(70, 100),
                          tile_h=32, interpret=True)
    want = _ref(logits, (96, 120), True)[:, :70, :100]
    assert got.shape == (1, 70, 100)
    assert (np.asarray(got) == np.asarray(want)).mean() > 0.999


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("shape,out_hw,crop_hw", [
    ((2, 19, 32, 128), (128, 512), None),    # 4x, CityScapes-like
    ((1, 5, 16, 256), (64, 1024), None),     # small class count
    ((1, 7, 24, 128), (96, 512), (70, 300)), # crop + odd rows
])
def test_upsample_argmax_flat_matches_4d(align_corners, shape, out_hw,
                                         crop_hw):
    """The flat-layout W-first tail must agree with the 4-D kernel and
    the XLA reference (same interp matrices, f32 accumulation; bf16
    checked at the production operand dtype)."""
    from segtpu.kernels.upsample_argmax import upsample_argmax_flat
    b, kc, h, w = shape
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b, kc, h, w).astype(np.float32))
    flat = logits.reshape(b, kc, h * w)
    got = np.asarray(upsample_argmax_flat(
        flat, (h, w), out_hw, crop_hw=crop_hw,
        align_corners=align_corners, tile_r=8, interpret=True))
    want = np.asarray(upsample_argmax(
        logits, out_hw, crop_hw=crop_hw, align_corners=align_corners,
        channel_first=True, tile_h=32, interpret=True))
    assert got.shape == want.shape
    frac = (got != want).mean()
    assert frac < 1e-3, f"f32 flat-vs-4d mismatch fraction {frac}"
    ref = _ref(jnp.transpose(logits, (0, 2, 3, 1)), out_hw, align_corners)
    ref = np.asarray(ref)[:, :got.shape[1], :got.shape[2]]
    frac_ref = (got != ref).mean()
    assert frac_ref < 1e-3, f"f32 flat-vs-xla mismatch fraction {frac_ref}"

    got_bf = np.asarray(upsample_argmax_flat(
        flat.astype(jnp.bfloat16), (h, w), out_hw, crop_hw=crop_hw,
        align_corners=align_corners, tile_r=8, interpret=True))
    want_bf = np.asarray(upsample_argmax(
        logits.astype(jnp.bfloat16), out_hw, crop_hw=crop_hw,
        align_corners=align_corners, channel_first=True, tile_h=32,
        interpret=True))
    frac_bf = (got_bf != want_bf).mean()
    assert frac_bf < 8e-3, f"bf16 flat-vs-4d mismatch fraction {frac_bf}"
