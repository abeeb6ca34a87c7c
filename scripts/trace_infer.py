"""Capture a jax.profiler trace of the fused inference program and print
the top ops by self time (parsed from the xplane proto via
tensorflow's profiler if available, else raw trace.json.gz events).

Usage: python scripts/trace_infer.py [HxW] [batch]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from segtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()  # before first trace/compile
    from segtpu.models import ARCHS
    from segtpu.models.segmenter import segmenter_init
    from segtpu.engine.inference import build_infer_fn

    hw = sys.argv[1] if len(sys.argv) > 1 else "1024x2048"
    h, w = (int(v) for v in hw.split("x"))
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    genotype = ARCHS["arch0"]
    params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                   num_classes=19)
    dev = jax.devices()[0]
    params, stats = jax.device_put((params, stats), dev)
    rng = np.random.RandomState(0)
    from segtpu.engine.inference import _stage_u8
    frames = jax.device_put(
        _stage_u8(rng.randint(0, 256, (batch, h, w, 3), np.uint8))[0],
        dev)

    infer = jax.jit(build_infer_fn(genotype, num_classes=19,
                                   input_hw=(h, w),
                                   compute_dtype=jnp.bfloat16))
    # HLO of the same compiled program: map trace op names -> source
    import re
    hlo = {}
    compiled = infer.lower(params, stats, frames).compile()
    for line in compiled.as_text().splitlines():
        m = re.match(r"\s*%?([\w.\-]+) = (\S+)", line.strip())
        if m:
            src = ""
            sm = re.search(r'op_name="([^"]*)"', line)
            if sm:
                src = sm.group(1)
            fm = re.search(r'source_file="([^"]*)".*?source_line=(\d+)',
                           line)
            if fm:
                src += f" @{fm.group(1).split('/')[-1]}:{fm.group(2)}"
            hlo[m.group(1)] = (m.group(2)[:60], src[:110])
    # warm
    np.asarray(infer(params, stats, frames))

    tdir = "/tmp/segtpu_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            out = infer(params, stats, frames)
        np.asarray(out)

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, file=sys.stderr)
    if not files:
        print("no trace.json.gz found; files:",
              glob.glob(f"{tdir}/**/*", recursive=True), file=sys.stderr)
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    # find TPU device pids (trace event format)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # group by (pid, tid) name to find device lanes
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if dev_pids and e["pid"] not in dev_pids:
            continue
        name = e.get("name", "?")
        agg[name] += e["dur"]
        cnt[name] += 1
        total += e["dur"]
    print(f"pids: {pid_names}", file=sys.stderr)
    print(f"total device-op time {total/1e3:.2f} ms over 3 dispatches")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
        shape, src = hlo.get(name, ("?", ""))
        print(f"{dur/3e3:9.3f} ms/dispatch x{cnt[name]//3:3d}  {name[:40]:40s}"
              f" {shape:45s} {src}")


if __name__ == "__main__":
    main()
