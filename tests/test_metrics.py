"""Jitted confusion-matrix mIoU vs a plain numpy reference."""

import numpy as np
import jax.numpy as jnp

from segtpu.utils.metrics import confusion_matrix, compute_iu, mean_iou


def _np_cm(pred, gt, k):
    cm = np.zeros((k, k), np.int64)
    valid = gt < k
    for g, p in zip(gt[valid].ravel(), pred[valid].ravel()):
        cm[g, p] += 1
    return cm


def test_confusion_matrix_matches_numpy():
    rng = np.random.RandomState(0)
    k = 5
    gt = rng.randint(0, k, size=(2, 17, 13)).astype(np.int32)
    gt[0, :3] = 255  # ignore region
    pred = rng.randint(0, k, size=gt.shape).astype(np.int32)
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), k))
    np.testing.assert_array_equal(cm, _np_cm(pred, gt, k))


def test_miou_perfect_and_disjoint():
    k = 3
    gt = np.tile(np.arange(k, dtype=np.int32), 10)
    cm = confusion_matrix(jnp.asarray(gt), jnp.asarray(gt), k)
    assert mean_iou(cm) == 1.0
    pred = (gt + 1) % k
    cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), k)
    assert mean_iou(cm) == 0.0


def test_absent_class_is_nan_not_zero():
    k = 4
    gt = np.zeros(10, np.int32)
    cm = confusion_matrix(jnp.asarray(gt), jnp.asarray(gt), k)
    iu = compute_iu(cm)
    assert iu[0] == 1.0 and np.isnan(iu[1:]).all()
    assert mean_iou(cm) == 1.0


def test_confusion_matrices_are_additive():
    rng = np.random.RandomState(1)
    k = 6
    gt = rng.randint(0, k, size=(4, 8, 8)).astype(np.int32)
    pred = rng.randint(0, k, size=gt.shape).astype(np.int32)
    whole = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), k))
    parts = sum(np.asarray(confusion_matrix(jnp.asarray(pred[i]),
                                            jnp.asarray(gt[i]), k))
                for i in range(4))
    np.testing.assert_array_equal(whole, parts)
