"""Encoder, op factory, decoder, segmenter: shapes + genotype handling."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segtpu.ops.layer_factory import OP_NAMES, op_init, op_apply
from segtpu.models.encoders import mbv2_init, mbv2_apply, MBV2_TAP_CHANNELS
from segtpu.models.micro_decoders import (
    micro_decoder_init, micro_decoder_apply, validate_genotype,
    GenotypeError, prettify)
from segtpu.models.segmenter import segmenter_init, segmenter_apply, count_params
from segtpu.models.arch_literals import ARCHS


@pytest.mark.parametrize("name", OP_NAMES)
def test_ops_preserve_shape(name):
    c = 8
    p, s = op_init(name, jax.random.PRNGKey(0), c)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 12, 12, c), jnp.float32)
    y, _ = op_apply(name, p, s, x)
    assert y.shape == x.shape
    if name == "none":
        assert float(jnp.abs(y).max()) == 0.0
    if name == "skip_connect":
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_encoder_tap_shapes():
    p, s = mbv2_init(jax.random.PRNGKey(0))
    x = jnp.ones((1, 64, 96, 3))
    taps, _ = mbv2_apply(p, s, x)
    assert len(taps) == 4
    for tap, stride, c in zip(taps, (4, 8, 16, 32), MBV2_TAP_CHANNELS):
        assert tap.shape == (1, 64 // stride, 96 // stride, c)


@pytest.mark.parametrize("arch", list(ARCHS))
def test_decoder_builds_and_runs(arch):
    genotype = ARCHS[arch]
    validate_genotype(genotype)
    assert prettify(genotype)
    p, s = micro_decoder_init(jax.random.PRNGKey(1), genotype,
                              MBV2_TAP_CHANNELS, num_classes=21)
    taps = [jnp.ones((1, 16 // st, 16 // st, c)) for st, c in
            zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    logits, aux, _ = micro_decoder_apply(genotype, p, s, taps)
    assert logits.shape[:1] == (1,)
    assert logits.shape[-1] == 21
    assert logits.shape[1] == 16  # largest collected map = stride-4 tap
    assert aux == []


def test_decoder_aux_heads():
    genotype = ARCHS["arch0"]
    p, s = micro_decoder_init(jax.random.PRNGKey(1), genotype,
                              MBV2_TAP_CHANNELS, num_classes=5, aux=True,
                              aux_cell=True)
    taps = [jnp.ones((2, 16 // st, 16 // st, c)) for st, c in
            zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    logits, aux, _ = micro_decoder_apply(genotype, p, s, taps, with_aux=True,
                                         train=True)
    assert len(aux) == len(genotype[1])
    for a in aux:
        assert a.shape[-1] == 5


@pytest.mark.parametrize("bad", [
    "nonsense",
    [[99], [[0, 1]]],                              # op out of range
    [[0, [0, 5, 1, 1]], [[0, 1]]],                 # cell position too big
    [[0, [0, 1, 1, 1]], [[0, 9]]],                 # conn index too big
    [[0, [0, 1, 1]], [[0, 1]]],                    # wrong node arity
    [[0], []],                                     # no blocks
])
def test_invalid_genotypes_rejected(bad):
    with pytest.raises(GenotypeError):
        validate_genotype(bad)


def test_segmenter_end_to_end():
    genotype = ARCHS["arch0"]
    params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                   num_classes=21)
    x = jnp.ones((1, 64, 64, 3))
    fn = jax.jit(lambda p, s, x: segmenter_apply(genotype, p, s, x))
    logits, aux, _ = fn(params, stats, x)
    assert logits.shape == (1, 16, 16, 21)
    n = count_params(params)
    assert 1e5 < n < 1e7  # compact-segmentation regime


@pytest.mark.slow
def test_segmenter_freeze_encoder_blocks_grads():
    genotype = ARCHS["arch1"]
    params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                   num_classes=3)
    x = jnp.ones((1, 32, 32, 3))

    def loss(p):
        logits, _, _ = segmenter_apply(genotype, p, stats, x, train=True,
                                       freeze_encoder=True)
        return jnp.sum(logits ** 2)

    g = jax.grad(loss)(params)
    enc_norm = sum(float(jnp.abs(v).sum())
                   for v in jax.tree_util.tree_leaves(g["encoder"]))
    dec_norm = sum(float(jnp.abs(v).sum())
                   for v in jax.tree_util.tree_leaves(g["decoder"]))
    assert enc_norm == 0.0
    assert dec_norm > 0.0


def test_space_to_depth_stem_exact():
    """Folded 2x2 s2d stem == original 3x3/s2 stem (encoders.stem_s2d_kernel)."""
    from segtpu.models.encoders import space_to_depth, mbv2_apply as enc_apply
    p, s = mbv2_init(jax.random.PRNGKey(3))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 64, 3), jnp.float32)
    taps_a, _ = enc_apply(p, s, x)
    taps_b, _ = enc_apply(p, s, space_to_depth(x), input_format="s2d12")
    for a, b in zip(taps_a, taps_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
