"""CHW fast decoder == NHWC reference decoder (eval), per-pixel."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segtpu.models.arch_literals import ARCHS
from segtpu.models.encoders import MBV2_TAP_CHANNELS
from segtpu.models.fast_decoder import build_fast_decoder
from segtpu.models.micro_decoders import micro_decoder_init, \
    micro_decoder_apply


@pytest.mark.parametrize("arch", list(ARCHS))
def test_fast_decoder_matches_reference(arch):
    genotype = ARCHS[arch]
    params, stats = micro_decoder_init(jax.random.PRNGKey(0), genotype,
                                       MBV2_TAP_CHANNELS, num_classes=9)
    # non-trivial BN stats so folding is actually exercised
    rng = np.random.RandomState(0)
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.rand(*v.shape).astype(np.float32) + 0.5),
        stats)

    taps = [jnp.asarray(rng.randn(2, 32 // s, 48 // s, c).astype(np.float32))
            for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    want, _, _ = micro_decoder_apply(genotype, params, stats, taps)
    want = np.asarray(want)

    fast = build_fast_decoder(genotype, params, stats, interpret=True)
    got = np.asarray(fast(taps))                    # [B, K, h, w]
    got = np.transpose(got, (0, 2, 3, 1))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_fast_template_decoder_matches_reference():
    from segtpu.models.fast_decoder import build_fast_template_decoder
    from segtpu.models.template_decoders import (
        template_decoder_init, template_decoder_apply)
    genotype = [[3, 2, 0, 2], [4, 1, 1, 4], [5, 0, 0, 9]]
    params, stats = template_decoder_init(jax.random.PRNGKey(2), genotype,
                                          MBV2_TAP_CHANNELS, num_classes=7)
    rng = np.random.RandomState(4)
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.rand(*v.shape).astype(np.float32) + 0.5),
        stats)
    taps = [jnp.asarray(rng.randn(1, 32 // s, 48 // s, c).astype(np.float32))
            for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    want, _, _ = template_decoder_apply(genotype, params, stats, taps)
    fast = build_fast_template_decoder(genotype, params, stats,
                                       interpret=True)
    got = np.transpose(np.asarray(fast(taps)), (0, 2, 3, 1))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-3, atol=1e-4)


def test_fast_decoder_cell_fusion_parity():
    """Whole-cell fusion (kernels.chw_ops.cell_op_chw) engages only at
    lane-aligned grids (w%128==0) — the small-tap parity tests above
    never reach it. Force an eligible grid and assert BOTH that the
    fused kernel actually ran and that it is per-pixel-equal to the
    NHWC reference. (The sep-branch weight-layout bug that reached
    hardware in round 4 lived exactly in this untested gap.)"""
    import segtpu.kernels.chw_ops as chw
    genotype = ARCHS["arch0"]
    params, stats = micro_decoder_init(jax.random.PRNGKey(1), genotype,
                                       MBV2_TAP_CHANNELS, num_classes=5)
    rng = np.random.RandomState(2)
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.rand(*v.shape).astype(np.float32) + 0.5),
        stats)
    # taps at a 64x128 base grid -> cell w = 128 (eligible)
    taps = [jnp.asarray(rng.randn(1, 64 // s, 128 // s, c)
                        .astype(np.float32))
            for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    want, _, _ = micro_decoder_apply(genotype, params, stats, taps)

    calls = []
    orig = chw.cell_op_chw

    def counting(*a, **k):
        out = orig(*a, **k)
        calls.append(out is not None)
        return out

    chw.cell_op_chw = counting
    try:
        fast = build_fast_decoder(genotype, params, stats, interpret=True)
        got = np.asarray(fast(taps))
    finally:
        chw.cell_op_chw = orig
    assert calls and any(calls), "cell fusion never engaged"
    got = np.transpose(got, (0, 2, 3, 1))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-3, atol=1e-4)


def test_fast_decoder_cell_fusion_parity_shift_out_im2col():
    """Same parity check with the shift-the-dot-output im2col A/B path
    forced on (SEGTPU_CELL_ROLL_IM2COL; default off — a measured
    regression on v5e, see chw_ops._CELL_ROLL_IM2COL) so the only
    Mosaic-lowerable im2col form for fused value chains stays tested."""
    import segtpu.kernels.chw_ops as chw
    genotype = ARCHS["arch0"]
    params, stats = micro_decoder_init(jax.random.PRNGKey(1), genotype,
                                       MBV2_TAP_CHANNELS, num_classes=5)
    rng = np.random.RandomState(2)
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.rand(*v.shape).astype(np.float32) + 0.5),
        stats)
    taps = [jnp.asarray(rng.randn(1, 64 // s, 128 // s, c)
                        .astype(np.float32))
            for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    want, _, _ = micro_decoder_apply(genotype, params, stats, taps)
    old = chw._CELL_ROLL_IM2COL
    chw._CELL_ROLL_IM2COL = True
    try:
        fast = build_fast_decoder(genotype, params, stats, interpret=True)
        got = np.asarray(fast(taps))
    finally:
        chw._CELL_ROLL_IM2COL = old
    got = np.transpose(got, (0, 2, 3, 1))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-3, atol=1e-4)
