"""Multi-device dp+sp sharding on the virtual 8-device CPU mesh
(SURVEY.md §4 item 4): the sharded train step must compile, run, and
agree numerically with the single-device step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segtpu.engine.trainer import (
    make_train_step, make_eval_step, init_train_state)
from segtpu.models import ARCHS
from segtpu.models.segmenter import segmenter_init
from segtpu.parallel.mesh import (
    make_mesh, make_sharded_train_step, make_sharded_eval_step)
from segtpu.utils.solvers import create_optimisers


def _batch(n=4, hw=(64, 64), k=5, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(rng.randn(n, *hw, 3).astype(np.float32)),
        "label": jnp.asarray(rng.randint(0, k, size=(n, *hw)).astype(np.int32)),
    }


@pytest.fixture(scope="module")
def setup():
    genotype = ARCHS["arch2"]
    params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                   num_classes=5, aux=True)
    opt = create_optimisers()
    state = init_train_state(params, stats, opt)
    step = make_train_step(genotype, opt, num_classes=5)
    return genotype, state, step


def test_mesh_construction():
    assert jax.device_count() == 8
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "space": 2}
    with pytest.raises(ValueError):
        make_mesh(16, 1)


@pytest.mark.slow
def test_sharded_train_step_matches_single_device(setup):
    genotype, state, step = setup
    batch = _batch()
    mesh = make_mesh(4, 2)
    sharded = make_sharded_train_step(step, mesh)
    s1, loss1 = step(state, batch)
    s2, loss2 = sharded(state, batch)
    assert np.isfinite(float(loss1))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
    # parameters after one update agree (grad psum == full-batch grad)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_sharded_eval_step(setup):
    genotype, state, _ = setup
    batch = _batch(seed=1)
    mesh = make_mesh(2, 4)
    ev = make_eval_step(genotype, num_classes=5)
    sharded = make_sharded_eval_step(ev, mesh)
    cm1 = np.asarray(ev(state.params, state.stats, batch))
    cm2 = np.asarray(sharded(state.params, state.stats, batch))
    np.testing.assert_array_equal(cm1, cm2)
    assert cm1.sum() == batch["label"].size


@pytest.mark.slow
def test_data_sharded_inference_matches_single_device(setup):
    """VERDICT r1 next#2: the fused uint8->uint8 inference program,
    batch fanned out over all 8 devices via shard_map, produces masks
    bit-equal to the single-device program."""
    from segtpu.engine.inference import build_infer_fn
    from segtpu.parallel.mesh import make_sharded_infer_fn
    genotype, state, _ = setup
    infer = build_infer_fn(genotype, num_classes=5, input_hw=(64, 64))
    mesh = make_mesh(4, 2)
    sharded = make_sharded_infer_fn(infer, mesh, mode="data")
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randint(0, 256, (8, 64, 64, 3), dtype=np.uint8))
    want = np.asarray(jax.jit(infer)(state.params, state.stats, imgs))
    got = np.asarray(sharded(state.params, state.stats, imgs))
    assert got.shape == (8, 64, 64) and got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_space_sharded_inference_matches_single_device(setup):
    """One full image's activations split along H over the 'space' axis
    (XLA inserts the encoder-conv halo exchanges); masks must equal the
    single-device result. use_pallas=False: custom calls are opaque to
    the SPMD partitioner (see make_sharded_infer_fn)."""
    from segtpu.engine.inference import build_infer_fn
    from segtpu.parallel.mesh import make_sharded_infer_fn
    genotype, state, _ = setup
    # logits (not masks): sharded contractions change float reduction
    # order by ~1 ulp, which flips argmax on the near-ties random-init
    # weights produce everywhere. Logit agreement at tight tolerance is
    # the meaningful halo-exchange correctness check; mask agreement is
    # asserted as a floor.
    infer_l = build_infer_fn(genotype, num_classes=5, input_hw=(128, 64),
                             use_pallas=False, return_logits=True,
                             compute_dtype=jnp.float32)
    infer_m = build_infer_fn(genotype, num_classes=5, input_hw=(128, 64),
                             use_pallas=False, compute_dtype=jnp.float32)
    mesh = make_mesh(1, 8)
    rng = np.random.RandomState(4)
    imgs = jnp.asarray(rng.randint(0, 256, (1, 128, 64, 3), dtype=np.uint8))

    want_l = np.asarray(jax.jit(infer_l)(state.params, state.stats, imgs))
    got_l = np.asarray(make_sharded_infer_fn(infer_l, mesh, mode="space")(
        state.params, state.stats, imgs))
    np.testing.assert_allclose(got_l, want_l, rtol=1e-4, atol=1e-5)

    want_m = np.asarray(jax.jit(infer_m)(state.params, state.stats, imgs))
    got_m = np.asarray(make_sharded_infer_fn(infer_m, mesh, mode="space")(
        state.params, state.stats, imgs))
    assert got_m.shape == (1, 128, 64) and got_m.dtype == np.uint8
    assert (got_m == want_m).mean() > 0.999


@pytest.mark.slow
def test_space_sharded_inference_pallas_path(setup):
    """VERDICT r2 next#3: the PRODUCTION Pallas CHW engine space-sharded
    (H over 'space') via manual-SPMD shard_map — per-block ppermute halo
    exchange in the encoder (overlap-discard), taps all-gathered for the
    (possibly global — GAP cells) decoder, per-shard tail slices. Masks
    must be bit-equal to the single-device Pallas program: the halo rows
    are the exact neighbour values the unsharded conv reads, and mesh-end
    ppermute zeros are exactly its SAME-padding zeros."""
    from segtpu.engine.inference import build_infer_fn
    from segtpu.parallel.mesh import make_sharded_pallas_infer_fn
    genotype, state, _ = setup
    infer = build_infer_fn(genotype, num_classes=5, input_hw=(64, 64),
                           use_pallas=True, pallas_interpret=True)
    mesh = make_mesh(1, 2)
    sharded = make_sharded_pallas_infer_fn(
        genotype, mesh, num_classes=5, input_hw=(64, 64),
        pallas_interpret=True)
    rng = np.random.RandomState(6)
    imgs = jnp.asarray(rng.randint(0, 256, (1, 64, 64, 3), dtype=np.uint8))
    want = np.asarray(jax.jit(infer)(state.params, state.stats, imgs))
    got = np.asarray(sharded(state.params, state.stats, imgs))
    assert got.shape == (1, 64, 64) and got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_data_sharded_inference_pallas_path(setup):
    """VERDICT r2 next#3: the PRODUCTION (Pallas CHW) inference program
    sharded over the mesh in data mode. shard_map is manual SPMD — each
    device runs the whole fused program (custom calls included) on its
    batch slice, so the path that meets the perf bar and the path that
    scales past one chip are the SAME program. Masks must be bit-equal
    to the single-device Pallas program (interpret mode on the virtual
    CPU mesh; real Mosaic kernels on TPU hardware)."""
    from segtpu.engine.inference import build_infer_fn
    from segtpu.parallel.mesh import make_sharded_infer_fn
    genotype, state, _ = setup
    infer = build_infer_fn(genotype, num_classes=5, input_hw=(64, 64),
                           use_pallas=True, pallas_interpret=True)
    mesh = make_mesh(4, 2)
    sharded = make_sharded_infer_fn(infer, mesh, mode="data")
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.randint(0, 256, (8, 64, 64, 3), dtype=np.uint8))
    want = np.asarray(jax.jit(infer)(state.params, state.stats, imgs))
    got = np.asarray(sharded(state.params, state.stats, imgs))
    assert got.shape == (8, 64, 64) and got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)
