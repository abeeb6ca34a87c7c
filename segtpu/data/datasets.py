"""Datasets + loaders (reference: src/data/datasets.py, SURVEY.md §2#7).

The reference Dataset reads ``.lst`` manifest files of
"img_path mask_path" pairs (PASCAL VOC+SBD for the CVPR'19 search,
CityScapes/CamVid for WACV'20), masks being uint8 class-index PNGs with
255 = ignore. ``create_loaders`` splits the train list into meta-train /
meta-val by ``--meta-train-prct``.

TPU-first loader design: fixed static batch shapes (pad+crop on host),
a background-thread prefetcher that overlaps host decode/augment with
device steps, and uint8 transport to the device (normalization happens
inside the fused jitted step). Image decode uses PIL (cv2-free; this
environment has no OpenCV) with a pure-numpy fallback for .npy pairs.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from segtpu.data.transforms import (
    Compose, Pad, RandomCrop, RandomMirror, ResizeShorterScale, Normalise)
from segtpu.utils.metrics import IGNORE_LABEL


def _read_image(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    from segtpu.data import native_io
    if native_io.available():  # C++ GIL-free decode (native/segtpu_io.cc)
        return native_io.decode_image(path)
    from PIL import Image
    img = Image.open(path)
    img = img.convert("RGB") if img.mode != "L" else img
    return np.asarray(img)


def _read_mask(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    from segtpu.data import native_io
    if native_io.available():
        return native_io.decode_image(path)  # palette idx = class id
    from PIL import Image
    return np.asarray(Image.open(path))  # palette/uint8 PNG -> class ids


class SegmentationDataset:
    """.lst manifest dataset (reference Dataset subclass).

    label_map: None (masks already train-id encoded, the reference's
    convention) or a dataset name from data.label_maps ('cityscapes'
    remaps raw labelIds -> 19 trainIds, etc.).
    """

    def __init__(self, data_root: str, list_path: str,
                 transform: Optional[Callable] = None,
                 label_map: Optional[str] = None):
        from segtpu.data.label_maps import LABEL_MAPS
        self.data_root = data_root
        self.transform = transform
        self.label_map = LABEL_MAPS[label_map]
        self.pairs: List[Tuple[str, str]] = []
        with open(list_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    self.pairs.append((parts[0], parts[1]))

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i):
        img_p, msk_p = self.pairs[i]
        mask = _read_mask(os.path.join(self.data_root, msk_p)).astype(np.uint8)
        sample = {
            "image": _read_image(os.path.join(self.data_root, img_p)),
            "mask": self.label_map(mask),
        }
        return sample


class SyntheticDataset:
    """Random image/mask pairs — the test/integration stand-in
    (SURVEY.md §4 item 5)."""

    def __init__(self, n: int = 16, hw: Tuple[int, int] = (64, 64),
                 num_classes: int = 5, seed: int = 0):
        rng = np.random.RandomState(seed)
        self.images = rng.randint(0, 256, size=(n, *hw, 3), dtype=np.uint8)
        self.masks = rng.randint(0, num_classes, size=(n, *hw)).astype(np.uint8)
        self.transform = None

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return {"image": self.images[i], "mask": self.masks[i]}


class BatchLoader:
    """Static-shape batching + background prefetch.

    Yields {'image': f32 [N,H,W,3] (normalized) or uint8, 'label':
    int32 [N,H,W]} numpy batches ready for device_put. Thread-based
    prefetch replaces the reference's fork-worker DataLoader
    (SURVEY.md §3.2): decode/augment overlaps the device step.
    """

    def __init__(self, dataset, *, batch_size: int, crop: Tuple[int, int],
                 train: bool, shorter_side: Optional[int] = None,
                 normalise_on_host: bool = True, seed: int = 0,
                 prefetch: int = 2, indices: Optional[Sequence[int]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.crop = crop
        self.train = train
        self.seed = seed
        self.prefetch = prefetch
        self.indices = list(indices if indices is not None
                            else range(len(dataset)))
        ts = []
        if train:
            if shorter_side:
                ts.append(ResizeShorterScale(shorter_side))
            ts += [Pad(crop), RandomCrop(crop), RandomMirror()]
        else:
            ts.append(Pad(crop))
        if normalise_on_host:
            ts.append(Normalise())
        self.transform = Compose(ts)
        self._epoch = 0

    def __len__(self):
        return len(self.indices) // self.batch_size if self.train else \
            -(-len(self.indices) // self.batch_size)

    def _make_batches(self, rng: np.random.Generator):
        order = np.array(self.indices)
        if self.train:
            rng.shuffle(order)
        bs = self.batch_size
        n_batches = len(self)
        for b in range(n_batches):
            idx = order[b * bs:(b + 1) * bs]
            n_valid = len(idx)
            if n_valid < bs:  # eval tail: repeat last sample to keep shape
                idx = np.concatenate(
                    [idx, np.repeat(idx[-1], bs - n_valid)])
            imgs, msks = [], []
            for k, i in enumerate(idx):
                s = self.transform(self.dataset[int(i)], rng)
                img, msk = s["image"], s["mask"]
                ch, cw = self.crop
                imgs.append(np.ascontiguousarray(img[:ch, :cw]))
                msk = np.ascontiguousarray(msk[:ch, :cw])
                if k >= n_valid:
                    # padded duplicate: all-ignore mask so it contributes
                    # neither to the confusion matrix nor to the loss
                    # (the reference evaluates each image exactly once)
                    msk = np.full_like(msk, IGNORE_LABEL)
                msks.append(msk)
            yield {"image": np.stack(imgs),
                   "label": np.stack(msks).astype(np.int32)}

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self._epoch)
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for batch in self._make_batches(rng):
                    q.put(batch)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def create_loaders(dataset, *, batch_size: int, crop: Tuple[int, int],
                   meta_train_prct: float = 0.9, shorter_side=None,
                   seed: int = 0, normalise_on_host: bool = True):
    """Meta-train / meta-val split loaders for the NAS proxy task
    (reference: create_loaders with --meta-train-prct)."""
    n = len(dataset)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_train = max(int(n * meta_train_prct), 1)
    train = BatchLoader(dataset, batch_size=batch_size, crop=crop,
                        train=True, shorter_side=shorter_side, seed=seed,
                        normalise_on_host=normalise_on_host,
                        indices=perm[:n_train])
    val = BatchLoader(dataset, batch_size=batch_size, crop=crop,
                      train=False, seed=seed,
                      normalise_on_host=normalise_on_host,
                      indices=perm[n_train:] if n_train < n else perm[:1])
    return train, val
