"""Per-segment inference profile at the bench shape (real TPU).

Times, via the scalar-checksum sync (see bench.py methodology):
  * the fused end-to-end program,
  * encoder alone (normalize+s2d+pad+mbv2 taps),
  * decoder alone (Pallas CHW fast path, pre-staged taps),
  * upsample+argmax tail alone (pre-staged logits),
and within the decoder, one timing per distinct (op kind, shape).

Usage: python scripts/profile_infer.py [HxW] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=4, scan=4, label=""):
    """Scan the op `scan` times per dispatch with a carry perturbation
    (prevents loop-invariant hoisting), checksum as hard sync."""
    @jax.jit
    def step(*a):
        def body(chk, _):
            perturbed = [a[0] + (chk % 2).astype(a[0].dtype)] + list(a[1:])
            out = fn(*perturbed)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return chk + jnp.sum(leaf.astype(jnp.float32)), None
        chk, _ = jax.lax.scan(body, jnp.float32(0), None, length=scan)
        return chk

    t0 = time.time()
    _ = float(step(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        _ = float(step(*args))
    dt = (time.time() - t0) / (reps * scan)
    print(f"{label:55s} {dt*1e3:9.2f} ms/dispatch  (compile {compile_s:.0f}s)")
    return dt


def main():
    from segtpu.models import ARCHS
    from segtpu.models.segmenter import segmenter_init
    from segtpu.models.encoders import mbv2_apply
    from segtpu.models.fast_decoder import build_fast_decoder
    from segtpu.engine.inference import (build_infer_fn, _normalize_s2d,
                                         pad_to_stride)
    from segtpu.kernels.upsample_argmax import upsample_argmax

    hw = sys.argv[1] if len(sys.argv) > 1 else "1024x2048"
    h, w = (int(v) for v in hw.split("x"))
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    num_classes = 19
    genotype = ARCHS["arch0"]
    params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                   num_classes=num_classes)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    stats = jax.device_put(stats, dev)
    hp, wp = pad_to_stride((h, w))

    rng = np.random.RandomState(0)
    frames = jax.device_put(
        rng.randint(0, 256, (batch, h, w, 3), np.uint8), dev)

    print(f"== shape {h}x{w} batch {batch} arch0 ==")

    # 1. fused end-to-end
    infer = build_infer_fn(genotype, num_classes=num_classes,
                           input_hw=(h, w), compute_dtype=jnp.bfloat16)
    t_e2e = timed(lambda f: infer(params, stats, f), frames,
                  label="end-to-end fused")

    # 2. encoder alone (with the same normalize+s2d front)
    def enc_fn(f):
        x = _normalize_s2d(f, jnp.bfloat16)
        x = jnp.pad(x, ((0, 0), (0, (hp - h) // 2),
                        (0, (wp - w) // 2), (0, 0)))
        taps, _ = mbv2_apply(params["encoder"], stats["encoder"], x,
                             train=False, input_format="s2d12")
        return taps
    t_enc = timed(enc_fn, frames, label="normalize+encoder (XLA NHWC)")

    # materialize taps for the decoder timing
    taps = jax.jit(enc_fn)(frames)
    taps = jax.device_put(jax.tree_util.tree_map(np.asarray, taps), dev)
    for i, t in enumerate(taps):
        print(f"   tap{i}: {t.shape} {t.dtype}")

    # 3. decoder alone
    dec = build_fast_decoder(genotype, params["decoder"], stats["decoder"])
    t_dec = timed(lambda t0, *rest: dec([t0, *rest]), *taps,
                  label="decoder (Pallas CHW)")

    # 4. tail alone
    logits_cf = jax.jit(lambda ts: dec(ts))(list(taps))
    logits_cf = jax.device_put(np.asarray(logits_cf), dev)
    print(f"   logits: {logits_cf.shape} {logits_cf.dtype}")
    t_tail = timed(
        lambda lg: upsample_argmax(lg, (hp, wp), crop_hw=(h, w),
                                   channel_first=True),
        logits_cf, label="upsample+argmax tail (Pallas)")

    print(f"\nsum of parts {1e3*(t_enc+t_dec+t_tail):.2f} ms "
          f"vs fused {1e3*t_e2e:.2f} ms; "
          f"per-frame fused {1e3*t_e2e/batch:.3f} ms -> "
          f"{batch/t_e2e:.1f} img/s")


if __name__ == "__main__":
    main()
