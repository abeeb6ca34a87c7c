"""Batched multi-architecture throughput sweep (BASELINE.json config 4):
arch0/1/2 CityScapes-shape inference with fused on-TPU preprocess.

Prints one JSON line per (arch, shape) plus a summary. Methodology as
bench.py (device-resident batched streaming, scalar-checksum sync).

Usage: python scripts/bench_sweep.py [--batch 16] [--reps 6]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--hw", default="1024x2048")
    # the dev relay has a ~24 ms per-dispatch sync floor (see bench.py);
    # scan>=24 amortizes it so sub-ms kernels resolve
    ap.add_argument("--scan", type=int, default=24)
    ap.add_argument("--archs", default=None,
                    help="comma-separated subset (default: all)")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))

    import jax
    import jax.numpy as jnp
    from segtpu.models import ARCHS
    from segtpu.models.arch_literals import TEMPLATE_ARCHS
    from segtpu.models.segmenter import segmenter_init, count_params
    from segtpu.engine.inference import build_infer_fn

    dev = jax.devices()[0]
    rng = np.random.RandomState(0)
    frames = jax.device_put(
        rng.randint(0, 256, size=(args.batch, h, w, 3), dtype=np.uint8), dev)

    # arch0/1/2 = CVPR micro family; template0 = the WACV'20 template
    # family's sub-MB representative (VERDICT r3 next#5: the template
    # path needs hardware numbers, not just parity)
    all_archs = {**ARCHS, **TEMPLATE_ARCHS}
    names = (args.archs.split(",") if args.archs
             else ("arch0", "arch1", "arch2", *TEMPLATE_ARCHS))
    results = []
    for arch in names:
        genotype = all_archs[arch]
        params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                       num_classes=19)
        params = jax.device_put(params, dev)
        stats = jax.device_put(stats, dev)
        infer = build_infer_fn(genotype, num_classes=19, input_hw=(h, w),
                               compute_dtype=jnp.bfloat16)

        @jax.jit
        def step(params, stats, x):
            # carry-perturbed scan: see bench.py (defeats XLA LICM)
            def body(chk, _):
                m = infer(params, stats, x + (chk % 2).astype(jnp.uint8))
                return chk + jnp.sum(m.astype(jnp.int32)), None
            return jax.lax.scan(body, jnp.int32(0), None, length=args.scan)[0]

        t0 = time.time()
        _ = float(step(params, stats, frames))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.reps):
            _ = float(step(params, stats, frames))
        ips = args.batch * args.scan * args.reps / (time.time() - t0)
        rec = {"arch": arch, "params_m": round(count_params(params) / 1e6, 3),
               "dec_params_m": round(
                   count_params(params["decoder"]) / 1e6, 3),
               "shape": f"{h}x{w}", "images_per_sec_per_chip": round(ips, 2),
               "compile_s": round(compile_s, 1)}
        results.append(rec)
        print(json.dumps(rec))
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
