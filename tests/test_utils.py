"""Profiling utils, KD loss/search wiring, saver round-trips, helpers."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segtpu.engine.trainer import kd_loss, segmentation_loss
from segtpu.utils.helpers import prepare_img, AverageMeter, compute_params
from segtpu.utils.profiling import StepTimer, debug_mode, hard_sync
from segtpu.utils.saver import save_pytree, load_pytree_like


def test_prepare_img_range():
    img = np.full((4, 4, 3), 128, np.uint8)
    out = prepare_img(img)
    assert out.dtype == np.float32
    # (128/255 - mean)/std
    want = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / \
        np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0], want, rtol=1e-5)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    assert m.avg == pytest.approx(2.0)
    assert m.val == 4.0


def test_kd_loss_zero_for_identical_and_positive_otherwise():
    rng = np.random.RandomState(0)
    s = jnp.asarray(rng.randn(1, 8, 8, 5).astype(np.float32))
    # KL(p||p) == 0 up to entropy term: kd = CE(t, s) which equals H(t)
    # when s == t, so compare against a perturbed student instead
    base = float(kd_loss(s, s))
    worse = float(kd_loss(s + jnp.asarray(rng.randn(1, 8, 8, 5), jnp.float32),
                          s))
    assert worse > base


def test_segmentation_loss_with_teacher():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, size=(1, 16, 16)).astype(np.int32))
    teacher = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    plain = float(segmentation_loss(logits, [], labels, num_classes=4))
    with_kd = float(segmentation_loss(logits, [], labels, num_classes=4,
                                      teacher_logits=teacher, kd_coeff=1.0))
    assert with_kd > plain


@pytest.mark.slow
def test_kd_search_smoke(tmp_path):
    """One search iteration with a KD teacher attached end-to-end."""
    from segtpu.config import SearchConfig
    from segtpu.search import run_search
    from segtpu.models import ARCHS
    from segtpu.models.segmenter import segmenter_init
    tg = ARCHS["arch2"]
    tp, ts = segmenter_init(jax.random.PRNGKey(9), tg, num_classes=4)
    cfg = SearchConfig(synthetic=True, num_classes=4, crop_size=(32, 32),
                       batch_size=(4, 4), num_epochs=(1, 1), num_iters=1,
                       do_kd=True, kd_coeff=0.5, aux_cell=False,
                       ctrl_algo="reinforce", do_polyak=False,
                       snapshot_dir=str(tmp_path / "kd"))
    saver = run_search(cfg, teacher=(tg, tp, ts))
    assert saver.history[0]["status"] == "ok"


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t.step(n_items=4):
            time.sleep(0.01)
    assert t.sec_per_step == pytest.approx(0.01, rel=0.9)
    assert t.items_per_sec > 0


def test_debug_mode_catches_nan():
    with debug_mode():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()


def test_hard_sync_and_saver_roundtrip(tmp_path):
    tree = {"a": jnp.ones((3,)), "b": [jnp.zeros((2, 2)),
                                       {"c": jnp.full((1,), 7.0)}]}
    assert hard_sync(tree) == pytest.approx(3.0 + 0.0 + 7.0)
    path = str(tmp_path / "t.npz")
    save_pytree(path, tree)
    loaded = load_pytree_like(path, jax.tree_util.tree_map(jnp.zeros_like,
                                                           tree))
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert compute_params(tree) == 3 + 4 + 1


def test_polyak_warmup_is_running_mean():
    from segtpu.utils.solvers import polyak_update
    avg = {"w": jnp.zeros(())}
    # steps 0,1,2 with values 1,2,3 -> running means 1, 1.5, 2
    vals = [1.0, 2.0, 3.0]
    for i, v in enumerate(vals):
        avg = polyak_update(avg, {"w": jnp.asarray(v)}, decay=0.99, step=i)
    assert float(avg["w"]) == pytest.approx(2.0)
