"""End-to-end streaming segmentation demo: disk -> C++ prefetcher ->
fused TPU engine -> masks.

Ties the whole serving path together (the reference's engine/inference
loop, rebuilt): PNG frames are decoded ahead-of-time by the native
thread pool (segtpu/data/native_io, GIL-free) while the TPU runs the
single fused XLA program per frame; masks stream back as uint8.

Usage:
    python examples/stream_demo.py --glob 'frames/*.png' [--arch arch0]
    python examples/stream_demo.py --synthetic 8   # generate + run
"""

import argparse
import glob as globlib
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--glob", default="")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic frames instead")
    ap.add_argument("--hw", default="360x480")
    ap.add_argument("--arch", default="arch0")
    ap.add_argument("--num-classes", type=int, default=19)
    ap.add_argument("--ckpt", default="")
    args = ap.parse_args()

    import jax
    from segtpu.data import native_io
    from segtpu.models import ARCHS
    from segtpu.models.segmenter import segmenter_init
    from segtpu.engine.inference import Segmenter
    from segtpu.utils.profiling import StepTimer

    if args.synthetic:
        h, w = (int(v) for v in args.hw.split("x"))
        from PIL import Image
        d = tempfile.mkdtemp(prefix="segtpu_demo_")
        rng = np.random.RandomState(0)
        for i in range(args.synthetic):
            Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8)).save(
                os.path.join(d, f"frame{i:04d}.png"))
        paths = sorted(globlib.glob(os.path.join(d, "*.png")))
    else:
        paths = sorted(globlib.glob(args.glob))
    assert paths, "no frames"
    print(f"{len(paths)} frames; native decoder: {native_io.available()}")

    genotype = ARCHS[args.arch]
    if args.ckpt:
        from segtpu.convert.torch_import import load_segmenter_checkpoint
        params, stats = load_segmenter_checkpoint(args.ckpt, genotype,
                                                  args.num_classes)
    else:
        params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                       num_classes=args.num_classes)
    seg = Segmenter(genotype, params, stats, num_classes=args.num_classes)

    def load(p):
        from PIL import Image
        return np.asarray(Image.open(p).convert("RGB"))

    # warm the shape bucket so the timed stream measures steady state
    seg.predict(native_io.decode_image(paths[0])
                if native_io.available() else load(paths[0]))

    frames = (native_io.Prefetcher(paths, threads=4, lookahead=8)
              if native_io.available()
              else (load(p) for p in paths))
    timer = StepTimer(warmup=1)
    t0 = time.time()
    n = 0
    for mask in seg.predict_stream(frames):
        with timer.step():
            pass  # mask already materialized by the stream
        n += 1
        if n <= 2 or n == len(paths):
            print(f"frame {n}: mask {mask.shape} classes "
                  f"{len(np.unique(mask))}")
    dt = time.time() - t0
    print(f"{n} frames in {dt:.2f}s = {n / dt:.2f} fps end-to-end "
          f"(disk decode + H2D + TPU + D2H)")


if __name__ == "__main__":
    main()
