"""A/B the normalize+s2d front: current vs optimization-barrier (force
the s2d transpose in uint8) vs a fused Pallas kernel.

Usage: python scripts/ab_normalize.py
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


def timed(fn, *args, reps=3, scan=8, label=""):
    @jax.jit
    def step(*a):
        def body(chk, _):
            f = a[0] + (chk % 2).astype(a[0].dtype)
            out = fn(f, *a[1:])
            return chk + jnp.sum(out.astype(jnp.float32)[0, 0, :8]), None
        chk, _ = jax.lax.scan(body, jnp.float32(0), None, length=scan)
        return chk

    _ = float(step(*args))
    t0 = time.time()
    for _ in range(reps):
        _ = float(step(*args))
    dt = (time.time() - t0) / (reps * scan)
    print(f"{label:46s} {dt*1e3:9.2f} ms/dispatch")
    return dt


IMG_MEAN = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
IMG_STD = np.array([0.229, 0.224, 0.225], np.float32) * 255.0


def v_current(img):
    from segtpu.engine.inference import _normalize_s2d
    return _normalize_s2d(img, jnp.bfloat16)


def v_barrier(img):
    from segtpu.models.encoders import space_to_depth
    y = space_to_depth(img)
    y = jax.lax.optimization_barrier(y)
    mean12 = jnp.tile(jnp.asarray(IMG_MEAN), 4)
    std12 = jnp.tile(jnp.asarray(IMG_STD), 4)
    return ((y.astype(jnp.float32) - mean12) / std12).astype(jnp.bfloat16)


def _s2d_kernel(x_ref, out_ref, *, w: int, rows: int):
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # u8 -> i32 -> f32
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, w * 3), 1)
    c = lane % 3
    m0, m1, m2 = (float(v) for v in IMG_MEAN)
    i0, i1, i2 = (float(1.0 / v) for v in IMG_STD)
    mean = jnp.where(c == 0, m0, jnp.where(c == 1, m1, m2))
    inv = jnp.where(c == 0, i0, jnp.where(c == 1, i1, i2))
    xn = (x - mean) * inv
    # [rows, W, 3] -> s2d (dy, dx, c): out[i, j, dy*6+dx*3+c]
    y = xn.reshape(rows // 2, 2, w // 2, 2, 3)
    y = jnp.transpose(y, (0, 2, 1, 3, 4)).reshape(rows // 2, w // 2 * 12)
    out_ref[0] = y.astype(out_ref.dtype)


def v_pallas(img):
    b, h, w, _ = img.shape
    rows = 32
    xf = img.reshape(b, h, w * 3)
    grid = (b, h // rows)
    out = pl.pallas_call(
        functools.partial(_s2d_kernel, w=w, rows=rows),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2 * 12),
                                       jnp.bfloat16),
        grid=grid,
        in_specs=[pl.BlockSpec((1, rows, w * 3), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows // 2, w // 2 * 12),
                               lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
    )(xf)
    return out.reshape(b, h // 2, w // 2, 12)


def _perm_mats():
    # in lane 6j+q (j pixel-in-block, q=dx*3+c) -> out lane 12j + dy*6 + q
    p0 = np.zeros((384, 768), np.float32)
    p1 = np.zeros((384, 768), np.float32)
    for j in range(64):
        for q in range(6):
            p0[6 * j + q, 12 * j + q] = 1.0
            p1[6 * j + q, 12 * j + 6 + q] = 1.0
    return p0, p1


def v_perm(img):
    b, h, w, _ = img.shape
    x = img.reshape(b, h, (w * 3) // 384, 384)
    xe = x[:, 0::2].astype(jnp.bfloat16)
    xo = x[:, 1::2].astype(jnp.bfloat16)
    p0, p1 = _perm_mats()
    y = (jnp.einsum("bhkp,pq->bhkq", xe, jnp.asarray(p0, jnp.bfloat16))
         + jnp.einsum("bhkp,pq->bhkq", xo, jnp.asarray(p1, jnp.bfloat16)))
    y = y.reshape(b, h // 2, w // 2, 12)
    mean12 = jnp.tile(jnp.asarray(IMG_MEAN), 4)
    std12 = jnp.tile(jnp.asarray(IMG_STD), 4)
    return ((y.astype(jnp.float32) - mean12) / std12).astype(jnp.bfloat16)


def v_perm2(img):
    b, h, w, _ = img.shape
    k = (w * 3) // 384
    x = img.reshape(b, h // 2, 2, k, 384).astype(jnp.bfloat16)
    p0, p1 = _perm_mats()
    p = jnp.asarray(np.stack([p0, p1]), jnp.bfloat16)  # [2, 384, 768]
    y = jnp.einsum("bhpkc,pcr->bhkr", x, p)
    y = y.reshape(b, h // 2, w // 2, 12)
    mean12 = jnp.tile(jnp.asarray(IMG_MEAN), 4)
    std12 = jnp.tile(jnp.asarray(IMG_STD), 4)
    return ((y.astype(jnp.float32) - mean12) / std12).astype(jnp.bfloat16)


def main():
    rng = np.random.RandomState(0)
    img = jax.device_put(
        rng.randint(0, 256, (8, 1024, 2048, 3), np.uint8),
        jax.devices()[0])
    a = np.asarray(jax.jit(v_current)(img))
    for name, fn in [("current", v_current), ("barrier", v_barrier),
                     ("perm-matmul", v_perm), ("perm2", v_perm2)]:
        try:
            b = np.asarray(jax.jit(fn)(img))
            ok = np.allclose(a, b, atol=2e-2)
            timed(fn, img, label=f"{name} (match={ok})")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
