"""Experiment: fused Pallas front kernel vs the XLA einsum+stack front.

The production front (_normalize_s2d_chw, w%256==0) does 12 per-channel
[768,128] permutation einsums and a jnp.stack — the stack's fused
relayout ((k,128) einsum tiles -> (c, px-lane) flat CHW) measures
0.748 ms/b8-dispatch at 1024x2048 and the einsum intermediates make
another HBM round trip. A single Pallas kernel could read the
PAIR-BLOCKED u8 input once, run the 12 dots on the MXU, retile
in-VMEM, and write the flat [N,12,H2*W2] output once.

The open question this script answers on hardware: what does Mosaic's
in-kernel sublane->lane retile ([R*8,128] -> [R,1024], then stacking 12
planes to [12, R*1024]) cost? If ~free, the fused front wins ~1.4 ms;
if it lowers to slow per-element shuffles, keep the XLA stack.

Run on TPU: python scripts/exp_front_kernel.py [h w] (default 1024 2048)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _perm_mats():
    from segtpu.engine.inference import _s2d_perm_mats
    return _s2d_perm_mats()


def _front_kernel(pe_ref, po_ref, x_ref, out_ref, *, rows: int,
                  w: int, bias):
    """x_ref block: u8 [1, R, k2, 768] pair-blocked rows (k2 =
    (w*6)//768; even-row bytes are sub-blocks [:, :k2//2], odd the
    rest). Computes the 12 normalized s2d planes and writes them flat
    [1, 12, R*(w//2)] — the sublane->lane retile happens in VMEM."""
    x = x_ref[0]
    k2 = x.shape[1]
    k = k2 // 2
    # Mosaic has no direct u8->float casts; widen u8->i32 first (VPU)
    xe = (x[:, :k].astype(jnp.int32).astype(jnp.bfloat16)
          .reshape(rows * k, 768))
    xo = (x[:, k:].astype(jnp.int32).astype(jnp.bfloat16)
          .reshape(rows * k, 768))
    planes = []
    for c in range(12):
        src = xe if c < 6 else xo
        pm = pe_ref if c < 6 else po_ref
        yc = jax.lax.dot_general(
            src, pm[c % 6], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        yc = yc + np.float32(bias[c])
        # retile [R*k, 128] -> [1, R*k*128] (sublane->lane flatten):
        # THE measured question
        planes.append(yc.astype(out_ref.dtype).reshape(1, rows * k * 128))
    out_ref[0] = jnp.concatenate(planes, axis=0)


def build_fused_front(h, w, n, rows=16):
    from segtpu.utils.helpers import IMG_MEAN, IMG_SCALE, IMG_STD
    p0, p1 = _perm_mats()
    mean12 = np.tile(np.asarray(IMG_MEAN, np.float32), 4)
    std12 = np.tile(np.asarray(IMG_STD, np.float32), 4)
    scale = IMG_SCALE / std12
    pe = np.zeros((6, 768, 128), np.float32)
    po = np.zeros((6, 768, 128), np.float32)
    for c in range(12):
        pc = (p0 if c < 6 else p1)[:, np.arange(64) * 12 + c]  # [384,64]
        p2 = np.zeros((768, 128), np.float32)
        p2[:384, :64] = pc
        p2[384:, 64:] = pc
        (pe if c < 6 else po)[c % 6] = p2 * scale[c]
    bias = (-mean12 / std12).astype(np.float32)
    h2, w2 = h // 2, w // 2
    k2 = (w * 6) // 768
    n_tiles = h2 // rows

    pe_j = jnp.asarray(pe, jnp.bfloat16)
    po_j = jnp.asarray(po, jnp.bfloat16)

    @jax.jit
    def front(xb):   # [n, h2, k2, 768] u8
        return pl.pallas_call(
            functools.partial(_front_kernel, rows=rows, w=w,
                              bias=tuple(float(v) for v in bias)),
            out_shape=jax.ShapeDtypeStruct((n, 12, h2 * w2), jnp.bfloat16),
            grid=(n, n_tiles),
            in_specs=[
                pl.BlockSpec((6, 768, 128), lambda bi, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, 768, 128), lambda bi, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, k2, 768),
                             lambda bi, i: (bi, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 12, rows * (k2 // 2) * 128),
                                   lambda bi, i: (bi, 0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(pe_j, po_j, xb)

    return front


def main():
    h, w = (int(v) for v in sys.argv[1:3]) if len(sys.argv) > 2 else (1024,
                                                                      2048)
    n = 8
    from segtpu.engine.inference import _normalize_s2d_chw, _stage_u8
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (n, h, w, 3), np.uint8)
    xb = jnp.asarray(_stage_u8(img)[0])

    # reference: XLA front
    ref_fn = jax.jit(lambda x: _normalize_s2d_chw(
        x, jnp.bfloat16, hw=(h, w)).reshape(n, 12, (h // 2) * (w // 2)))
    front = build_fused_front(h, w, n)

    ref = np.asarray(ref_fn(xb).astype(jnp.float32))
    t0 = time.time()
    got = np.asarray(front(xb).astype(jnp.float32))
    print(f"compile+run fused: {time.time() - t0:.1f}s")
    err = np.abs(got - ref).max()
    print("max |err| vs XLA front:", err)

    for name, fn in (("xla", ref_fn), ("fused", front)):
        fn(xb)[0].block_until_ready()
        reps = 20
        t0 = time.time()
        for _ in range(reps):
            out = fn(xb)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps * 1000
        print(f"{name}: {dt:.3f} ms/dispatch (b{n} {h}x{w}, includes sync)")


if __name__ == "__main__":
    main()
