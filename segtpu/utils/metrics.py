"""Segmentation metrics: jitted confusion-matrix mIoU.

Reference: src/utils/helpers.py ``fast_cm`` / ``compute_iu`` (SURVEY.md
§2#11) — numpy confusion-matrix accumulation. TPU-first rebuild: the
confusion matrix is a single ``jnp.bincount`` over ``gt * K + pred``
(one fused scatter-add in XLA, static length K*K), so evaluation can
run entirely on device and, under a data-parallel mesh, per-shard
matrices reduce with one ``psum`` (SURVEY.md §5.8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IGNORE_LABEL = 255


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(pred, gt, num_classes: int):
    """[..., H, W] int predictions/labels -> [K, K] int32 confusion matrix.

    Rows = ground truth, cols = prediction. Pixels with gt==IGNORE_LABEL
    (255) are excluded (reference semantics: masks store 255 = ignore).
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    gt = gt.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_classes)
    idx = jnp.where(valid, gt * num_classes + pred, num_classes * num_classes)
    cm = jnp.bincount(idx, length=num_classes * num_classes + 1)
    return cm[:-1].reshape(num_classes, num_classes).astype(jnp.int32)


def compute_iu(cm) -> np.ndarray:
    """Per-class IoU from a confusion matrix (reference: compute_iu)."""
    cm = np.asarray(cm, np.float64)
    tp = np.diag(cm)
    denom = cm.sum(0) + cm.sum(1) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iu = np.where(denom > 0, tp / denom, np.nan)
    return iu


def mean_iou(cm) -> float:
    iu = compute_iu(cm)
    return float(np.nanmean(iu))


def spearman(a, b) -> float:
    """Spearman rank correlation (average ranks for ties). Used to
    quantify supernet-proxy fidelity vs the per-genotype path
    (supernet.measure_proxy_fidelity)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)

    def ranks(x):
        order = np.argsort(x, kind="mergesort")
        r = np.empty_like(x)
        r[order] = np.arange(len(x), dtype=np.float64)
        # average tied ranks
        for v in np.unique(x):
            m = x == v
            r[m] = r[m].mean()
        return r

    ra, rb = ranks(a), ranks(b)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / denom) if denom > 0 else 0.0
