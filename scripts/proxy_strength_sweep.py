"""Raise (don't just measure) the proxy's noise ceiling — VERDICT r3
next#4 / SURVEY §7.3 item 4.

Round 3 showed the search's cross-fidelity (0.44-0.48) is bounded by
the DISCRETE proxy's own self-consistency across weight inits (0.47 at
8 epochs / 64px): the reward the controller learns from is ~half noise.
This sweep measures that self-consistency (Spearman of the same K
genotypes' proxy rewards under two init seeds) across proxy strengths
epochs x crop, so the search can run at the cheapest config whose
ranking signal is real. Cross-fidelity is then re-measured at the
chosen config (scripts/supernet_fidelity.py --tpu) — the supernet can
only be as faithful as the proxy it is compared against.

Runs on CPU (per-genotype discrete decoder training on cached taps is
small); each (config, seed) is independent. Writes
artifacts/fidelity/proxy_strength.json.

Usage: python scripts/proxy_strength_sweep.py [K] [--configs 8x64,16x64,...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# CPU pin (axon sitecustomize force-registers the TPU; env vars don't
# stick — see tests/conftest.py): this job must not contend with the
# TPU bench/trace work running alongside it
jax.config.update("jax_platforms", "cpu")

K_DEFAULT = 16
CONFIGS = [(8, 64), (16, 64), (32, 64), (8, 96), (16, 96)]


def main():
    from segtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from segtpu.config import SearchConfig
    from segtpu.supernet import measure_proxy_fidelity
    from segtpu.utils.metrics import spearman
    from run_search_demo import write_dataset

    k = int(sys.argv[1]) if len(sys.argv) > 1 else K_DEFAULT
    configs = CONFIGS
    if "--configs" in sys.argv:
        i = sys.argv.index("--configs")
        configs = [tuple(int(v) for v in c.split("x"))
                   for c in sys.argv[i + 1].split(",")]

    root = write_dataset("/tmp/segtpu_fidelity_data")
    data_kw = dict(data_root=root,
                   train_list=os.path.join(root, "train.lst"),
                   val_list=os.path.join(root, "val.lst"))

    # the search-demo conditions: task-pretrained encoder (random
    # encoders collapse rewards into a noise band)
    pre = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "search_demo",
        "pretrain", "best_params.npz")
    enc_kw = {}
    if os.path.exists(pre):
        from segtpu.models import ARCHS
        from segtpu.models.segmenter import segmenter_init
        from segtpu.utils.saver import load_pytree_like
        tp, ts = segmenter_init(jax.random.PRNGKey(0), ARCHS["arch0"],
                                num_classes=5, aux=True)
        blob = load_pytree_like(pre, {"params": tp, "stats": ts})
        enc_kw = dict(enc_params=blob["params"]["encoder"],
                      enc_stats=blob["stats"]["encoder"])
        print(f"# pre-trained encoder: {pre}", file=sys.stderr)

    rows = []
    genos = None   # ONE genotype sample shared across every config/seed
    for epochs, crop in configs:
        cfg = SearchConfig(num_classes=5, crop_size=(crop, crop),
                           batch_size=(8, 8), num_epochs=(epochs, 0),
                           seed=0, **data_kw)
        t0 = time.time()
        rewards = {}
        for seed in (0, 1):
            _, r_pg, _, genos = measure_proxy_fidelity(
                cfg, k=k, seed=seed, genotypes=genos,
                discrete_only=True, **enc_kw)
            rewards[seed] = r_pg
        row = {"epochs": epochs, "crop": crop, "k": k,
               "self_rho": round(spearman(rewards[0], rewards[1]), 4),
               "wall_s": round(time.time() - t0, 1),
               "rewards_s0": [round(r, 4) for r in rewards[0]],
               "rewards_s1": [round(r, 4) for r in rewards[1]]}
        rows.append(row)
        print(json.dumps({kk: row[kk] for kk in
                          ("epochs", "crop", "self_rho", "wall_s")}),
              flush=True)

    out = {
        "description": "Discrete-proxy self-consistency (Spearman of the "
        "same K genotypes' stage-1 proxy rewards under two weight-init "
        "seeds) vs proxy strength. The search reward's noise ceiling: "
        "cross supernet fidelity cannot exceed it (VERDICT r3 next#4).",
        "command": "python scripts/proxy_strength_sweep.py",
        "k": k, "data": "color",
        "pretrained_encoder": bool(enc_kw),
        "rows": [{kk: r[kk] for kk in
                  ("epochs", "crop", "k", "self_rho", "wall_s")}
                 for r in rows],
        "raw": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "fidelity",
        "proxy_strength.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
