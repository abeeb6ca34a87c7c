"""Headline benchmark: arch0 CityScapes 2048×1024 inference throughput,
images/sec on one TPU chip (BASELINE.json north star).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

Methodology
-----------
The development TPU is reached through a network relay whose host<->TPU
bandwidth (~23 MB/s measured) and per-dispatch latency (~24 ms) are
artifacts of the tunnel, not of TPU hardware (production PCIe/DMA moves
GB/s). We therefore measure what is chip-bound and reproducible:
device-resident batched streaming — frames pre-staged in HBM, one
dispatch segmenting a batch, a scalar fetch as the hard sync (plain
``block_until_ready`` does not reliably block through the relay).
The end-to-end-through-relay number is printed to stderr alongside.

vs_baseline: BASELINE.json has "published": {} and the reference mount
was empty (SURVEY.md §0/§6), so no measured reference-GPU number exists
in-environment. We normalize against REF_GPU_IPS = 100.0 images/sec — a
deliberately generous stand-in for the reference PyTorch compact archs'
2048×1024 single-GPU throughput (1080Ti-class era; SURVEY.md §6). The
north-star target is vs_baseline >= 10.0 under that assumption. Replace
with the measured number the moment the mount is populated.

Env overrides: BENCH_HW=HxW, BENCH_BATCH=n, BENCH_REPS=n, BENCH_ARCH=a.
"""

import json
import os
import sys
import time

import numpy as np


REF_GPU_IPS = 100.0


def main():
    from segtpu.utils.cache import enable_compilation_cache
    cache_dir = enable_compilation_cache()  # before first trace/compile

    import jax
    import jax.numpy as jnp
    from segtpu.models import ARCHS
    from segtpu.models.segmenter import segmenter_init
    from segtpu.engine.inference import build_infer_fn, Segmenter

    hw = os.environ.get("BENCH_HW", "1024x2048")  # H x W
    h, w = (int(v) for v in hw.split("x"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    reps = int(os.environ.get("BENCH_REPS", "4"))
    # batches per dispatch: amortizes the relay's ~24 ms per-dispatch
    # sync. Round-5 sweep at b8 1024x2048: scan 48 -> 586.0, 64 ->
    # 595.9 img/s; 96 exceeds HBM (staged u8 frames are scan x 50 MB).
    # Larger batch instead is a measured NEGATIVE (b16/scan24: 563.6).
    scan = int(os.environ.get("BENCH_SCAN", "64"))
    arch = os.environ.get("BENCH_ARCH", "arch0")
    num_classes = 19  # CityScapes

    genotype = ARCHS[arch]
    params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                   num_classes=num_classes)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    stats = jax.device_put(stats, dev)

    # BENCH_PALLAS=0 measures the plain-XLA program — the variant the
    # 'space' sharding mode runs (custom calls are opaque to the SPMD
    # partitioner), so the multi-chip spatial story has a cost number
    use_pallas = os.environ.get("BENCH_PALLAS", "1") != "0"
    infer = build_infer_fn(genotype, num_classes=num_classes,
                           input_hw=(h, w), compute_dtype=jnp.bfloat16,
                           use_pallas=use_pallas)

    # batched step, `scan` batches per dispatch (amortizes the relay's
    # ~24 ms dispatch+sync overhead). The frames are perturbed by the
    # carry each iteration — a genuine data dependency, otherwise XLA's
    # loop-invariant code motion computes the inference ONCE and the
    # scan degenerates to re-summing (observed: exactly scan x the true
    # throughput). The checksum fetch is the hard sync.
    @jax.jit
    def step(params, stats, frames_all):
        # scan over `scan` DISTINCT device-resident batches (xs): no
        # loop-invariant code motion is possible (each iteration reads
        # its own slice), and unlike the round-2 carry-perturbed form
        # (frames + chk%2) there is no artificial 2x96 MB uint8
        # read+write per iteration — the harness now moves exactly the
        # bytes a real streaming workload moves. The checksum fetch
        # stays the hard sync (and keeps the masks live).
        def body(chk, f):
            masks = infer(params, stats, f)
            return chk + jnp.sum(masks.astype(jnp.int32)), None
        chk, _ = jax.lax.scan(body, jnp.int32(0), frames_all)
        return chk

    rng = np.random.RandomState(0)
    frames_host = rng.randint(0, 256, size=(batch, h, w, 3), dtype=np.uint8)
    # production staging (pair-blocked [N,H/2,*,768] when w%256==0,
    # else row-flat [N,H,W*3]): free host views; the 4-D uint8 parameter
    # costs a device-side relayout (see _stage_u8 / build_infer_fn)
    from segtpu.engine.inference import _stage_u8
    staged_shape = _stage_u8(frames_host)[0].shape
    # `scan` distinct batches generated ON DEVICE (uint8 through the
    # dev relay moves at ~23 MB/s; scan*batch full-res frames would
    # take minutes to ship). 4.6 GB at b8/scan48 1024x2048 — resident.
    with jax.default_device(dev):
        frames = jax.block_until_ready(jax.random.randint(
            jax.random.PRNGKey(0), (scan,) + tuple(staged_shape),
            0, 256, jnp.uint8))

    # warm-start split (VERDICT r3 next#6): Python trace+lower (or an
    # AOT-store deserialize on a warm machine — segtpu.utils.aot) vs XLA
    # compile (a persistent-cache HIT when warm) vs first execution.
    # `compile_s` = their sum (first dispatch wall).
    from segtpu.utils.aot import aot_jit
    t0 = time.time()
    prog = aot_jit(
        lambda p, s, f: step(p, s, f),
        # "bench-v2": the xs-scan harness (distinct device batches) —
        # bench.py is outside the segtpu source digest, so the harness
        # change must bump the key itself or a warm store would serve
        # the old carry-perturbed program
        repr(("bench-v2", arch, (h, w), num_classes, batch, scan,
              use_pallas)),
        params, stats, frames)
    lowered = prog.lower(params, stats, frames)
    trace_s = time.time() - t0
    aot_hit = bool(getattr(prog, "aot_hit", False))
    t0 = time.time()
    compiled = lowered.compile()
    xla_compile_s = time.time() - t0
    t0 = time.time()
    _ = float(compiled(params, stats, frames))
    first_exec_s = time.time() - t0
    compile_s = trace_s + xla_compile_s + first_exec_s

    # XLA's own FLOP count for the compiled program (per frame) — a
    # LOWER bound only: it cannot see inside Pallas custom calls (the
    # entire encoder/decoder/tail fast path), so it reads ~70x low.
    # The self-describing utilization figure is pct_of_roofline below,
    # computed from the analytic roofline walk (VERDICT r2 weak #4).
    flops_per_frame = None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        flops_per_frame = float(cost["flops"]) / (batch * scan)
    except Exception as e:  # relay/backend may not expose cost analysis
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    # analytic roofline for this shape/arch (includes Pallas work)
    roof = None
    try:
        from segtpu.utils.roofline import compute_roofline
        roof = compute_roofline(h, w, arch, num_classes=num_classes)
    except Exception as e:
        print(f"# roofline unavailable: {e}", file=sys.stderr)

    # steady state: `reps` dispatches over device-resident batches,
    # hard-synced via the scalar checksum. Uses the AOT-compiled
    # executable directly — calling the jit wrapper again would RE-trace
    # (jit.lower() does not populate the wrapper's call cache).
    t0 = time.time()
    for _ in range(reps):
        _ = float(compiled(params, stats, frames))
    dt = time.time() - t0
    ips = batch * scan * reps / dt

    # secondary: true end-to-end through the relay (H2D + D2H per frame)
    seg = Segmenter(genotype, params, stats, num_classes=num_classes)
    e2e_frames = [frames_host[i % batch] for i in range(4)]
    list(seg.predict_stream(e2e_frames[:1]))  # warm that shape
    t0 = time.time()
    n_out = sum(1 for _ in seg.predict_stream(e2e_frames))
    e2e_ips = n_out / (time.time() - t0)

    print(f"# compile={compile_s:.1f}s (trace={trace_s:.1f} "
          f"xla={xla_compile_s:.1f} exec1={first_exec_s:.1f}) "
          f"cache_dir={cache_dir} batch={batch} "
          f"scan={scan} reps={reps} shape={h}x{w} arch={arch} "
          f"backend={jax.default_backend()} device_ips={ips:.1f} "
          f"e2e_through_relay_ips={e2e_ips:.2f}", file=sys.stderr)
    record = {
        "metric": f"cityscapes_{h}x{w}_{arch}_inference_throughput_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / REF_GPU_IPS, 3),
        # vs_baseline normalizes against an ASSUMED stand-in (see module
        # docstring), carried explicitly so it can't read as a measurement:
        "assumed_baseline_ips": REF_GPU_IPS,
        # first-dispatch wall time in THIS process; with the persistent
        # compilation cache (segtpu.utils.cache) a warm machine reloads
        # the program instead of recompiling — compare across runs
        "compile_s": round(compile_s, 1),
        # the split: trace_s = Python tracing + StableHLO lowering (an
        # AOT-store deserialize when aot_hit — segtpu.utils.aot);
        # xla_compile_s = XLA compile (persistent-cache hit when warm);
        # first_exec_s = first dispatch (data staging + run)
        "trace_s": round(trace_s, 1),
        "xla_compile_s": round(xla_compile_s, 1),
        "first_exec_s": round(first_exec_s, 1),
        "aot_hit": aot_hit,
        "compile_cache": bool(cache_dir),
    }
    if roof is not None:
        # analytic (roofline-walk) FLOPs/frame — includes the Pallas
        # custom-call work XLA's cost analysis cannot see
        record["flops_per_frame_g_analytic"] = round(roof["gflop_total"], 2)
        record["roofline_ips"] = round(roof["roofline_ips"], 1)
        record["pct_of_roofline"] = round(100 * ips / roof["roofline_ips"],
                                          1)
        # attainable = roofline + v5e hardware terms the optimistic
        # model ignores (dw taps on the VPU, MXU K/128 depth efficiency,
        # banded tail) — see segtpu/utils/roofline.py docstring
        record["attainable_ips"] = round(roof["attainable_ips"], 1)
        record["pct_of_attainable"] = round(
            100 * ips / roof["attainable_ips"], 1)
        # continuity vs the round-4 attainable model (per-unit SUM
        # combiner -> 796.4 ips at this shape): the round-5 model's
        # units-overlap max() raised the ceiling to ~1048, so
        # pct_of_attainable READS lower on a faster program; this field
        # keeps the cross-round series comparable (r4 recorded 71.0).
        if (h, w) == (1024, 2048) and arch == "arch0":
            record["pct_of_attainable_r4_model"] = round(
                100 * ips / 796.4, 1)
    if flops_per_frame is not None:
        # lower bound: XLA's count excludes custom-call (Pallas) kernels
        record["flops_per_frame_g_xla_lower_bound"] = round(
            flops_per_frame / 1e9, 2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
