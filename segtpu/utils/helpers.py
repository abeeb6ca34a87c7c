"""Shared helpers (reference: src/utils/helpers.py, SURVEY.md §2#11)."""

from __future__ import annotations

import numpy as np
import jax

# prepare_img constants — ImageNet stats with 1/255 scaling, the DrSleep
# convention (reference: src/utils/helpers.py::prepare_img; open parity
# item SURVEY.md §7.4.3 — re-verify the exact literals from the mount).
IMG_SCALE = 1.0 / 255.0
IMG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMG_STD = np.array([0.229, 0.224, 0.225], np.float32)


def prepare_img(img):
    """uint8 RGB HWC -> normalized float32 (host-side, numpy).

    The fused inference engine performs the identical arithmetic
    on-device; this host version exists for API parity and for the data
    pipeline."""
    return ((img.astype(np.float32) * IMG_SCALE) - IMG_MEAN) / IMG_STD


class AverageMeter:
    """Running average (reference: utils/helpers.py::AverageMeter)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


def compute_params(params) -> int:
    """Total trainable parameter count (reference: compute_params)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
