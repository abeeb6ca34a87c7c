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
