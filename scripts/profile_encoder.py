"""Per-stage encoder timing: run prefixes of the MBV2 block sequence.

Usage: python scripts/profile_encoder.py [HxW] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3, scan=4, label=""):
    @jax.jit
    def step(*a):
        def body(chk, _):
            perturbed = [a[0] + (chk % 2).astype(a[0].dtype)] + list(a[1:])
            out = fn(*perturbed)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return chk + jnp.sum(leaf.astype(jnp.float32)), None
        chk, _ = jax.lax.scan(body, jnp.float32(0), None, length=scan)
        return chk

    _ = float(step(*args))
    t0 = time.time()
    for _ in range(reps):
        _ = float(step(*args))
    dt = (time.time() - t0) / (reps * scan)
    print(f"{label:44s} {dt*1e3:9.2f} ms/dispatch")
    return dt


def main():
    from segtpu.models.segmenter import segmenter_init
    from segtpu.models.encoders import (_MBV2_CFG, _inv_res_apply,
                                        stem_s2d_kernel)
    from segtpu.models import ARCHS
    from segtpu.core.layers import bn_apply, relu6
    from segtpu.engine.inference import _normalize_s2d, pad_to_stride

    hw = sys.argv[1] if len(sys.argv) > 1 else "1024x2048"
    h, w = (int(v) for v in hw.split("x"))
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hp, wp = pad_to_stride((h, w))
    params, stats = segmenter_init(jax.random.PRNGKey(0), ARCHS["arch0"],
                                   num_classes=19)
    ep, es = params["encoder"], stats["encoder"]
    dev = jax.devices()[0]
    ep, es = jax.device_put((ep, es), dev)
    rng = np.random.RandomState(0)
    frames = jax.device_put(
        rng.randint(0, 256, (batch, h, w, 3), np.uint8), dev)

    def prefix_fn(n_stages):
        def fn(f):
            x = _normalize_s2d(f, jnp.bfloat16)
            x = jnp.pad(x, ((0, 0), (0, (hp - h) // 2),
                            (0, (wp - w) // 2), (0, 0)))
            w2 = stem_s2d_kernel(ep["stem"]["w"])
            y = jax.lax.conv_general_dilated(
                x, w2.astype(x.dtype), (1, 1), ((1, 0), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y, _ = bn_apply(ep["stem"], es["stem"], y, train=False)
            y = relu6(y)
            bi = 0
            cin = 32
            for stage, (t, c, n, s) in enumerate(_MBV2_CFG):
                if stage >= n_stages:
                    break
                for i in range(n):
                    stride = s if i == 0 else 1
                    residual = stride == 1 and cin == c
                    y, _ = _inv_res_apply(ep["blocks"][bi], es["blocks"][bi],
                                          y, stride=stride, t=t,
                                          residual=residual, train=False)
                    cin = c
                    bi += 1
            return y
        return fn

    prev = timed(prefix_fn(0), frames, label="normalize+s2d+stem")
    for ns in range(1, len(_MBV2_CFG) + 1):
        t = timed(prefix_fn(ns), frames,
                  label=f"  + stage{ns-1} {_MBV2_CFG[ns-1]}")
        print(f"      stage{ns-1} delta: {1e3*(t-prev):7.2f} ms")
        prev = t


if __name__ == "__main__":
    main()
