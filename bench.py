"""Headline benchmark: arch0 CityScapes 2048×1024 streaming inference,
images/sec on one TPU chip (BASELINE.json north star).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

vs_baseline: BASELINE.json has "published": {} and the reference mount
was empty (SURVEY.md §0/§6), so no measured reference-GPU number exists
in-environment. We normalize against REF_GPU_IPS = 100.0 images/sec —
a deliberately generous stand-in for the reference PyTorch models'
2048×1024 single-GPU throughput (WACV'20-era compact archs on a
1080Ti-class card; SURVEY.md §6). The north-star target is
vs_baseline >= 10.0 under that assumption. Replace with the measured
number the moment the mount is populated.

Env overrides: BENCH_HW=HxW, BENCH_FRAMES=n, BENCH_ARCH=arch0.
"""

import json
import os
import sys
import time

import numpy as np


REF_GPU_IPS = 100.0


def main():
    import jax
    import jax.numpy as jnp
    from segtpu.models import ARCHS
    from segtpu.models.segmenter import segmenter_init
    from segtpu.engine.inference import Segmenter

    hw = os.environ.get("BENCH_HW", "1024x2048")  # rows x cols (H x W)
    h, w = (int(v) for v in hw.split("x"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "32"))
    arch = os.environ.get("BENCH_ARCH", "arch0")
    num_classes = 19  # CityScapes

    genotype = ARCHS[arch]
    params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                   num_classes=num_classes)
    seg = Segmenter(genotype, params, stats, num_classes=num_classes,
                    compute_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
              for _ in range(min(n_frames, 8))]

    # warm-up: compile + first run
    t0 = time.time()
    _ = seg.predict(frames[0])
    compile_s = time.time() - t0

    # steady-state streaming throughput
    stream = (frames[i % len(frames)] for i in range(n_frames))
    t0 = time.time()
    n_out = 0
    for mask in seg.predict_stream(stream):
        n_out += 1
    dt = time.time() - t0
    ips = n_out / dt

    print(f"# compile={compile_s:.1f}s frames={n_out} time={dt:.2f}s "
          f"shape={h}x{w} arch={arch} backend={jax.default_backend()}",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"cityscapes_{h}x{w}_{arch}_inference_throughput_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / REF_GPU_IPS, 3),
    }))


if __name__ == "__main__":
    main()
