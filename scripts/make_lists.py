"""Generate .lst manifests from standard dataset layouts.

The reference consumes "img_path mask_path" manifest files (SURVEY.md
§2#7) but ships none; this utility builds them from the public release
layouts:

  cityscapes: leftImg8bit/{split}/{city}/*_leftImg8bit.png paired with
              gtFine/{split}/{city}/*_gtFine_labelIds.png
              (use --label-map cityscapes at load time to get trainIds)
  camvid:     {split}/*.png paired with {split}annot/*.png
  voc:        JPEGImages/*.jpg paired with SegmentationClass/*.png,
              filtered by ImageSets/Segmentation/{split}.txt

Usage:
    python scripts/make_lists.py cityscapes /data/cityscapes train > train.lst
"""

import argparse
import os
import sys


def cityscapes(root: str, split: str):
    img_root = os.path.join(root, "leftImg8bit", split)
    for city in sorted(os.listdir(img_root)):
        cdir = os.path.join(img_root, city)
        for f in sorted(os.listdir(cdir)):
            if not f.endswith("_leftImg8bit.png"):
                continue
            base = f[:-len("_leftImg8bit.png")]
            img = os.path.join("leftImg8bit", split, city, f)
            msk = os.path.join("gtFine", split, city,
                               base + "_gtFine_labelIds.png")
            if os.path.exists(os.path.join(root, msk)):
                yield img, msk


def camvid(root: str, split: str):
    img_dir = os.path.join(root, split)
    for f in sorted(os.listdir(img_dir)):
        if f.endswith(".png"):
            msk = os.path.join(split + "annot", f)
            if os.path.exists(os.path.join(root, msk)):
                yield os.path.join(split, f), msk


def voc(root: str, split: str):
    lst = os.path.join(root, "ImageSets", "Segmentation", split + ".txt")
    with open(lst) as f:
        for name in f.read().split():
            img = os.path.join("JPEGImages", name + ".jpg")
            msk = os.path.join("SegmentationClass", name + ".png")
            if os.path.exists(os.path.join(root, msk)):
                yield img, msk


LAYOUTS = {"cityscapes": cityscapes, "camvid": camvid, "voc": voc}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=sorted(LAYOUTS))
    ap.add_argument("root")
    ap.add_argument("split")
    args = ap.parse_args()
    n = 0
    for img, msk in LAYOUTS[args.dataset](args.root, args.split):
        print(f"{img} {msk}")
        n += 1
    print(f"# {n} pairs", file=sys.stderr)


if __name__ == "__main__":
    main()
