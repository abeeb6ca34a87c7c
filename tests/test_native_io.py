"""Native C++ decode/prefetch library vs PIL (builds the .so if needed)."""

import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


@pytest.fixture(scope="module")
def native():
    if not os.path.exists(os.path.join(NATIVE_DIR, "libsegtpu_io.so")):
        r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"native build unavailable: {r.stderr.decode()[:200]}")
    from segtpu.data import native_io
    if not native_io.available():
        pytest.skip("libsegtpu_io.so not loadable")
    return native_io


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths, arrays = [], []
    for i, hw in enumerate([(37, 53), (64, 64), (21, 96)]):
        arr = rng.randint(0, 256, size=(*hw, 3), dtype=np.uint8)
        p = str(d / f"rgb{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
        arrays.append(arr)
    # palette mask PNG (class-index convention)
    mask = rng.randint(0, 19, size=(40, 40), dtype=np.uint8)
    mp = str(d / "mask.png")
    pimg = Image.fromarray(mask, mode="P")
    pimg.putpalette([v for i in range(256) for v in (i, i, i)])
    pimg.save(mp)
    return paths, arrays, mp, mask


def test_decode_rgb_matches_pil(native, pngs):
    paths, arrays, _, _ = pngs
    for p, want in zip(paths, arrays):
        got = native.decode_image(p)
        np.testing.assert_array_equal(got, want)


def test_decode_palette_mask_returns_class_ids(native, pngs):
    _, _, mp, mask = pngs
    got = native.decode_image(mp)
    assert got.ndim == 2
    np.testing.assert_array_equal(got, mask)


def test_decode_jpeg_roundtrip(native, tmp_path):
    from PIL import Image
    arr = np.full((32, 48, 3), 128, np.uint8)
    arr[8:24, 12:36] = (200, 50, 25)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(arr).save(p, quality=95)
    got = native.decode_image(p)
    assert got.shape == (32, 48, 3)
    # lossy: just require it's close to the source
    assert np.abs(got.astype(int) - arr.astype(int)).mean() < 8


def test_prefetcher_ordered_and_complete(native, pngs):
    paths, arrays, _, _ = pngs
    seq = paths * 3  # 9 items, exercises reuse + ordering
    pf = native.Prefetcher(seq, threads=3, lookahead=4)
    out = list(pf)
    assert len(out) == len(seq)
    for got, p in zip(out, seq):
        want = arrays[paths.index(p)]
        np.testing.assert_array_equal(got, want)
    pf.close()


def test_datasets_use_native_reader(native, pngs, tmp_path):
    from segtpu.data.datasets import SegmentationDataset
    paths, arrays, mp, mask = pngs
    lst = tmp_path / "list.lst"
    lst.write_text(f"{paths[0]} {mp}\n")
    ds = SegmentationDataset("", str(lst), label_map="cityscapes")
    s = ds[0]
    np.testing.assert_array_equal(s["image"], arrays[0])
    # cityscapes label_map remaps raw ids; id 7 -> 0, unknown -> 255
    assert s["mask"].shape == mask.shape
