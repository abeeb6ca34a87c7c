"""Dump compiled HLO of the fused inference program and print the
instructions matching given name prefixes (to map trace op names to
shapes/sources).

Usage: python scripts/dump_hlo.py copy.173 fusion.37 ...
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from segtpu.models import ARCHS
    from segtpu.models.segmenter import segmenter_init
    from segtpu.engine.inference import build_infer_fn

    names = sys.argv[1:] or ["copy.17", "fusion.37", "fusion.596",
                             "fusion.10", "fusion.51", "reshape.2",
                             "copy.27", "copy.28", "fusion.474"]
    h, w, batch = 1024, 2048, 8
    genotype = ARCHS["arch0"]
    params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                   num_classes=19)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (batch, h, w, 3), np.uint8)
    infer = jax.jit(build_infer_fn(genotype, num_classes=19,
                                   input_hw=(h, w),
                                   compute_dtype=jnp.bfloat16))
    txt = infer.lower(params, stats, frames).compile().as_text()
    with open("/tmp/infer_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped to /tmp/infer_hlo.txt ({len(txt.splitlines())} lines)")
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"%?([\w.\-]+) =", ls)
        if not m:
            continue
        nm = m.group(1)
        if any(nm == n or nm.startswith(n) for n in names):
            print(ls[:300])


if __name__ == "__main__":
    main()
