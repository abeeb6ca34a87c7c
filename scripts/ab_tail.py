"""A/B the two tail (upsample+argmax) forms on hardware.

A: upsample_argmax_flat consuming the classifier's native flat
   (C-sublane, px-lane) layout (tile_r swept);
B: the 4-D banded kernel, including the (C,px)->(h,w) retile copy the
   4-D interface forces on a flat producer (reshape inside the jit).

Timing uses the carry-perturbed lax.scan (relay dispatch floors are
~24 ms; see docs/DESIGN.md negative results).

Run: python scripts/ab_tail.py [HxW] [batch] [scan]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, x, scan, reps=4):
    @jax.jit
    def step(x):
        def body(chk, _):
            y = fn(x + (chk % 2).astype(x.dtype))
            return chk + jnp.sum(y.astype(jnp.int32)), None
        chk, _ = jax.lax.scan(body, jnp.int32(0), None, length=scan)
        return chk

    _ = float(step(x))                     # compile + warm
    t0 = time.time()
    for _ in range(reps):
        _ = float(step(x))
    return (time.time() - t0) / (reps * scan) * 1e3


def main():
    from segtpu.kernels.upsample_argmax import (upsample_argmax,
                                                upsample_argmax_flat)
    hw = sys.argv[1] if len(sys.argv) > 1 else "1024x2048"
    H, W = (int(v) for v in hw.split("x"))
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    scan = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    k, h, w = 19, H // 4, W // 4
    rng = np.random.RandomState(0)
    flat = jnp.asarray(rng.randn(b, k, h * w).astype(np.float32),
                       dtype=jnp.bfloat16)
    flat = jax.device_put(flat, jax.devices()[0])

    for tr in (32, 64, 128, 256):
        ms = timed(lambda x, tr=tr: upsample_argmax_flat(
            x, (h, w), (H, W), tile_r=tr), flat, scan)
        print(f"flat tile_r={tr:4d}: {ms:7.3f} ms/b{b}")

    for th in (256, 512):
        ms = timed(lambda x, th=th: upsample_argmax(
            x.reshape(b, k, h, w), (H, W), channel_first=True,
            tile_h=th), flat, scan)
        print(f"4-D  tile_h={th:4d} (incl. retile): {ms:7.3f} ms/b{b}")


if __name__ == "__main__":
    main()
