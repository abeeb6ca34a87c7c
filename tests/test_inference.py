"""Fused inference engine: shape buckets, padding, argmax decode, streaming."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segtpu.engine.inference import (
    Segmenter, build_infer_fn, pad_to_stride)
from segtpu.models import ARCHS
from segtpu.models.segmenter import segmenter_init
from segtpu.utils.helpers import prepare_img, IMG_MEAN


def test_pad_to_stride():
    assert pad_to_stride((512, 512)) == (512, 512)
    assert pad_to_stride((360, 480)) == (384, 480)
    assert pad_to_stride((33, 1)) == (64, 32)


@pytest.fixture(scope="module")
def arch1_model():
    genotype = ARCHS["arch1"]
    params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                   num_classes=7)
    return genotype, params, stats


def test_infer_fn_single_and_batch(arch1_model):
    genotype, params, stats = arch1_model
    # non-multiple-of-32 size exercises the pad path
    fn = jax.jit(build_infer_fn(genotype, num_classes=7, input_hw=(40, 72),
                                compute_dtype=jnp.float32))
    img = (np.random.RandomState(0).rand(40, 72, 3) * 255).astype(np.uint8)
    mask = fn(params, stats, jnp.asarray(img))
    assert mask.shape == (40, 72) and mask.dtype == jnp.uint8
    assert int(jnp.max(mask)) < 7

    batch = np.stack([img, img[::-1]])
    masks = fn(params, stats, jnp.asarray(batch))
    assert masks.shape == (2, 40, 72)
    np.testing.assert_array_equal(np.asarray(masks[0]), np.asarray(mask))


def test_infer_matches_unfused_reference_path(arch1_model):
    """Fused on-device pipeline == host prepare_img + forward + upsample
    + argmax (the reference's unfused chain, SURVEY.md §3.3)."""
    from segtpu.core.resize import resize_bilinear
    from segtpu.models.segmenter import segmenter_apply
    genotype, params, stats = arch1_model
    img = (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)

    fn = build_infer_fn(genotype, num_classes=7, input_hw=(64, 64),
                        compute_dtype=jnp.float32, return_logits=True)
    fused = np.asarray(fn(params, stats, jnp.asarray(img)))

    x = jnp.asarray(prepare_img(img))[None]
    logits, _, _ = segmenter_apply(genotype, params, stats, x)
    ref = np.asarray(resize_bilinear(logits, (64, 64))[0])
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-4)


def test_segmenter_api_and_stream(arch1_model):
    genotype, params, stats = arch1_model
    seg = Segmenter(genotype, params, stats, num_classes=7,
                    compute_dtype=jnp.float32)
    img = (np.random.RandomState(2).rand(48, 64, 3) * 255).astype(np.uint8)
    m1 = seg.predict(img)
    assert m1.shape == (48, 64) and m1.dtype == np.uint8
    frames = [img, img, img]
    out = list(seg.predict_stream(frames))
    assert len(out) == 3
    for m in out:
        np.testing.assert_array_equal(m, m1)
    # shape-bucket cache: two shapes -> two compiled entries
    seg.predict((np.random.rand(32, 32, 3) * 255).astype(np.uint8))
    assert len(seg._cache) == 2


def test_s2d_fused_path_matches_classic(arch1_model):
    """Engine s2d fast path == classic normalize+pad path, incl. the
    pad-to-stride margin (40x72 -> padded 64x96)."""
    genotype, params, stats = arch1_model
    img = (np.random.RandomState(3).rand(40, 72, 3) * 255).astype(np.uint8)
    fn_s2d = build_infer_fn(genotype, num_classes=7, input_hw=(40, 72),
                            compute_dtype=jnp.float32, use_pallas=False)
    # reference chain: host prepare_img -> zero-pad -> forward -> resize
    from segtpu.core.resize import resize_bilinear
    from segtpu.models.segmenter import segmenter_apply
    from segtpu.utils.helpers import prepare_img
    x = jnp.asarray(prepare_img(img))[None]
    x = jnp.pad(x, ((0, 0), (0, 24), (0, 24), (0, 0)))
    logits, _, _ = segmenter_apply(genotype, params, stats, x)
    ref = resize_bilinear(logits.astype(jnp.float32), (64, 96),
                          compute_dtype=jnp.float32)[:, :40, :72]
    want = np.asarray(jnp.argmax(ref, -1))[0].astype(np.uint8)

    got = np.asarray(fn_s2d(params, stats, jnp.asarray(img)))
    assert (got == want).mean() > 0.999  # identical up to fp ties


@pytest.mark.parametrize("genotype_key", ["arch1"])
def test_engine_fast_path_matches_xla_path(arch1_model, genotype_key):
    """The production TPU composition (XLA encoder + Pallas CHW decoder +
    fused upsample/argmax, s2d stem, pad+crop) vs the XLA reference path,
    end-to-end at the mask level (interpret mode on CPU)."""
    genotype, params, stats = arch1_model
    img = (np.random.RandomState(7).rand(2, 40, 72, 3) * 255).astype(np.uint8)
    ref_fn = build_infer_fn(genotype, num_classes=7, input_hw=(40, 72),
                            compute_dtype=jnp.float32, use_pallas=False)
    fast_fn = build_infer_fn(genotype, num_classes=7, input_hw=(40, 72),
                             compute_dtype=jnp.float32, use_pallas=True,
                             pallas_interpret=True)
    want = np.asarray(ref_fn(params, stats, jnp.asarray(img)))
    got = np.asarray(fast_fn(params, stats, jnp.asarray(img)))
    assert got.shape == want.shape == (2, 40, 72)
    assert (got == want).mean() > 0.999  # identical up to fp ties


def test_normalize_s2d_perm_matmul_branch_matches_reference():
    """The W % 128 == 0 permutation-matmul branch of _normalize_s2d must
    equal the space_to_depth -> normalize reference composition EXACTLY
    in f32 (every output has ONE nonzero bf16-exact term; ADVICE r2: the
    e2e tests only exercised the w=72 fallback branch, so a lane-mapping
    regression in the perm path would have been silent)."""
    from segtpu.engine.inference import _normalize_s2d, _normalize_s2d_chw
    from segtpu.models.encoders import space_to_depth
    from segtpu.utils.helpers import IMG_SCALE, IMG_STD

    img = (np.random.RandomState(11).rand(2, 16, 256, 3) * 255).astype(
        np.uint8)
    ref = space_to_depth(jnp.asarray(img)).astype(jnp.float32) * IMG_SCALE
    mean12 = np.tile(np.asarray(IMG_MEAN, np.float32), 4)
    std12 = np.tile(np.asarray(IMG_STD, np.float32), 4)
    ref = np.asarray((ref - mean12) / std12)

    got = np.asarray(_normalize_s2d(jnp.asarray(img), jnp.float32))
    assert got.shape == (2, 8, 128, 12)
    np.testing.assert_array_equal(got, ref)

    # CHW variant: same arithmetic, planes-first layout
    got_chw = np.asarray(_normalize_s2d_chw(jnp.asarray(img), jnp.float32))
    np.testing.assert_allclose(got_chw, np.transpose(ref, (0, 3, 1, 2)),
                               rtol=0, atol=1e-6)

    # row-flat [N,H,W*3] input (the production form) == 4-D input, both
    # dtypes bit-for-bit
    flat = jnp.asarray(img.reshape(2, 16, 256 * 3))
    got_flat = np.asarray(_normalize_s2d_chw(flat, jnp.float32,
                                             hw=(16, 256)))
    np.testing.assert_array_equal(got_flat, got_chw)
    g4 = np.asarray(_normalize_s2d_chw(jnp.asarray(img), jnp.bfloat16)
                    .astype(jnp.float32))
    gf = np.asarray(_normalize_s2d_chw(flat, jnp.bfloat16, hw=(16, 256))
                    .astype(jnp.float32))
    np.testing.assert_array_equal(gf, g4)

    # pair-blocked [N,H/2,(W*6)//768,768] staged input (the production
    # form, _stage_u8) == 4-D input, both dtypes bit-for-bit
    from segtpu.engine.inference import _stage_u8
    blocked, squeeze = _stage_u8(img)
    assert not squeeze and blocked.shape == (2, 8, 2, 768)
    gb = np.asarray(_normalize_s2d_chw(jnp.asarray(blocked), jnp.float32,
                                       hw=(16, 256)))
    np.testing.assert_array_equal(gb, got_chw)
    gbb = np.asarray(_normalize_s2d_chw(jnp.asarray(blocked), jnp.bfloat16,
                                        hw=(16, 256)).astype(jnp.float32))
    np.testing.assert_array_equal(gbb, g4)


def test_fused_front_kernel_matches_xla_front():
    """kernels.front.normalize_s2d_front (the fused Pallas front on the
    pair-blocked staged input) must be BIT-identical to the XLA front
    _normalize_s2d_chw in bf16 — the production dtype the engine gates
    it to (it reproduces the exact rounding order, see front.py) — and
    within 1 f32 ulp in f32 (XLA rewrites the divide-by-std differently
    inside vs outside the kernel)."""
    from segtpu.engine.inference import _normalize_s2d_chw, _stage_u8
    from segtpu.kernels.front import normalize_s2d_front
    img = (np.random.RandomState(3).rand(2, 32, 256, 3) * 255).astype(
        np.uint8)
    blocked = jnp.asarray(_stage_u8(img)[0])
    for dt, exact in ((jnp.float32, False), (jnp.bfloat16, True)):
        want = np.asarray(_normalize_s2d_chw(jnp.asarray(img), dt,
                                             hw=(32, 256))
                          .astype(jnp.float32))
        got = np.asarray(normalize_s2d_front(blocked, hw=(32, 256),
                                             out_dtype=dt, interpret=True)
                         .astype(jnp.float32)).reshape(want.shape)
        if exact:
            np.testing.assert_array_equal(got, want)
        else:
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_row_flat_input_form_matches_4d(arch1_model):
    """build_infer_fn accepts the production ROW-FLAT [N,H,W*3] uint8
    form (what Segmenter.predict ships to avoid the 4-D parameter's
    device-side relayout) — masks identical to the [N,H,W,3] form, for
    batch and single-image inputs, through the full Pallas fast path."""
    genotype, params, stats = arch1_model
    img = (np.random.RandomState(7).rand(1, 64, 256, 3) * 255).astype(
        np.uint8)
    fn = build_infer_fn(genotype, num_classes=7, input_hw=(64, 256),
                        compute_dtype=jnp.float32, use_pallas=True,
                        pallas_interpret=True)
    want = np.asarray(fn(params, stats, jnp.asarray(img)))
    got = np.asarray(fn(params, stats,
                        jnp.asarray(img.reshape(1, 64, 256 * 3))))
    np.testing.assert_array_equal(got, want)
    got1 = np.asarray(fn(params, stats,
                         jnp.asarray(img[0].reshape(64, 256 * 3))))
    np.testing.assert_array_equal(got1, want[0])
    # pair-blocked staged form (what _stage_u8 ships for w%256==0)
    from segtpu.engine.inference import _stage_u8
    staged, squeeze = _stage_u8(img)
    assert not squeeze
    gotb = np.asarray(fn(params, stats, jnp.asarray(staged)))
    np.testing.assert_array_equal(gotb, want)
    staged1, squeeze1 = _stage_u8(img[0])
    assert squeeze1
    gotb1 = np.asarray(fn(params, stats, jnp.asarray(staged1)))
    np.testing.assert_array_equal(gotb1[0], want[0])


@pytest.mark.slow
def test_engine_flat_tail_matches_xla_path(arch1_model):
    """512-wide input -> decoder width 128 % 128 == 0, so the engine
    takes the FLAT-tail path (conv_chw flat_out -> upsample_argmax_flat,
    no (C,px)->(h,w) retile). Mask-level parity vs the XLA path."""
    genotype, params, stats = arch1_model
    img = (np.random.RandomState(11).rand(1, 64, 512, 3) * 255).astype(
        np.uint8)
    ref_fn = build_infer_fn(genotype, num_classes=7, input_hw=(64, 512),
                            compute_dtype=jnp.float32, use_pallas=False)
    fast_fn = build_infer_fn(genotype, num_classes=7, input_hw=(64, 512),
                             compute_dtype=jnp.float32, use_pallas=True,
                             pallas_interpret=True)
    want = np.asarray(ref_fn(params, stats, jnp.asarray(img)))
    got = np.asarray(fast_fn(params, stats, jnp.asarray(img)))
    assert got.shape == want.shape == (1, 64, 512)
    assert (got == want).mean() > 0.999  # identical up to fp ties


def test_engine_template_family_engages_fast_template_decoder(monkeypatch):
    """VERDICT r4 next#4: the WACV template family must engage
    build_fast_template_decoder on the production Pallas path (not fall
    back to the micro builder or the XLA path). Asserted by wrapping the
    builder symbol build_infer_fn resolves at trace time and checking it
    fired, and that the produced masks match the XLA reference path."""
    from segtpu.models import segmenter_init
    from segtpu.models.arch_literals import TEMPLATE_ARCHS
    import segtpu.models.fast_decoder as fd
    genotype = TEMPLATE_ARCHS["template0"]
    params, stats = segmenter_init(jax.random.PRNGKey(3), genotype,
                                   num_classes=7)
    calls = []
    orig = fd.build_fast_template_decoder

    def spy(*a, **k):
        calls.append(True)
        return orig(*a, **k)

    monkeypatch.setattr(fd, "build_fast_template_decoder", spy)
    img = (np.random.RandomState(5).rand(1, 40, 72, 3) * 255).astype(
        np.uint8)
    fast_fn = build_infer_fn(genotype, num_classes=7, input_hw=(40, 72),
                             compute_dtype=jnp.float32, use_pallas=True,
                             pallas_interpret=True)
    got = np.asarray(fast_fn(params, stats, jnp.asarray(img)))
    assert calls, "template genotype did not engage the fast template builder"
    ref_fn = build_infer_fn(genotype, num_classes=7, input_hw=(40, 72),
                            compute_dtype=jnp.float32, use_pallas=False)
    want = np.asarray(ref_fn(params, stats, jnp.asarray(img)))
    assert got.shape == want.shape == (1, 40, 72)
    assert (got == want).mean() > 0.999  # identical up to fp ties
