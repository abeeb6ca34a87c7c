"""Released-model inference walkthrough.

Reference: the examples/ Jupyter notebook (SURVEY.md §2#13) — loads the
hard-coded arch0/1/2 genotypes + released checkpoints, segments sample
images, and renders color masks. This script is the same walkthrough for
segtpu: genotypes come from segtpu.models.arch_literals (provisional
until the reference mount provides the released literals, SURVEY.md §0),
weights from --ckpt via segtpu.convert (or random for a smoke run), and
the whole preprocess->forward->argmax chain runs as ONE fused XLA
program on TPU via segtpu.engine.Segmenter.

Usage:
    python examples/inference_example.py --image path.png [--arch arch0]
        [--ckpt released.ckpt] [--num-classes 19] [--out mask.png]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")  # run from the repo root


# PASCAL VOC / CityScapes-style color map (reference: the notebook's cmap)
def make_cmap(n: int = 256) -> np.ndarray:
    """The standard VOC bit-shuffle color map."""
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--arch", default="arch0",
                    choices=["arch0", "arch1", "arch2"])
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--num-classes", type=int, default=19)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    from segtpu.models import ARCHS
    from segtpu.models.micro_decoders import prettify
    from segtpu.models.segmenter import segmenter_init, count_params
    from segtpu.engine.inference import Segmenter
    from segtpu.data.datasets import _read_image

    genotype = ARCHS[args.arch]
    print(f"{args.arch}:\n{prettify(genotype)}")
    if args.ckpt:
        from segtpu.convert.torch_import import load_segmenter_checkpoint
        params, stats = load_segmenter_checkpoint(args.ckpt, genotype,
                                                  args.num_classes)
    else:
        print("no --ckpt given: using random weights (smoke run)")
        params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                       num_classes=args.num_classes)
    print(f"params: {count_params(params)/1e6:.2f}M")

    seg = Segmenter(genotype, params, stats, num_classes=args.num_classes)
    img = _read_image(args.image)
    mask = seg.predict(img)  # uint8 [H, W] — one fused XLA program
    print(f"mask {mask.shape}, classes present: "
          f"{sorted(np.unique(mask).tolist())}")

    color = make_cmap()[mask]
    out = args.out or args.image.rsplit(".", 1)[0] + "_mask.png"
    try:
        from PIL import Image
        Image.fromarray(color).save(out)
        print(f"wrote {out}")
    except ImportError:
        np.save(out + ".npy", color)
        print(f"PIL unavailable; wrote {out}.npy")


if __name__ == "__main__":
    main()
