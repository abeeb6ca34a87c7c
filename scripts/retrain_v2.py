"""Retrain comparison v2 — statistical teeth (VERDICT r4 next#2).

The round-4 comparison (3 randoms x 2 seeds) could not separate the
searched architecture from seed noise: the margin over the best random
(0.0064) was smaller than that random's own seed spread (0.0165). v2:

  * >= 6 random controller samples (untrained controller = uniform over
    the masked-valid space, the "search learned nothing" null), x 3
    seeds each, plus the all-none floor and arch0_provisional context;
  * searched_best from artifacts/search_v2 (the 16-epoch strong-proxy
    search — self-rho 0.90 vs the recorded search's 0.48);
  * artifact hygiene (VERDICT r4 next#9): results.json stores metrics +
    genotypes + sha256 weight hashes; checkpoints are deleted after
    hashing unless SEGTPU_KEEP_CKPTS=1 (v1 checked in 94 MB of npz).

The headline statistics recorded for the guard test
(tests/test_retrain_v2_artifact.py):

  * pooled_seed_sigma — sqrt(mean within-candidate seed variance): the
    noise floor any claimed margin must clear;
  * margin_vs_random_mean = searched mean - mean of random means;
  * margin_vs_best_random = searched mean - best random's mean.

Runs on CPU (pinned in-process: the TPU is the search/bench resource);
resumable by (name, seed).

Usage: python scripts/retrain_v2.py [epochs] [n_seeds] [n_random] [outdir]
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEARCH_DIR = "artifacts/search_v2"
NUM_CLASSES = 5


def candidates(n_random: int):
    """-> [(name, genotype)]; searched_best is included only once the
    search_v2 summary exists (the random/floor/context runs can start
    while the search is still on the TPU — the run is resumable)."""
    import jax
    from segtpu.rl.agent import create_agent, sample_genotype
    from segtpu.rl.controller import MicroControllerSpec
    from segtpu.models import ARCHS

    cands = []
    summary = os.path.join(SEARCH_DIR, "summary.json")
    conns = None
    if os.path.exists(summary):
        with open(summary) as f:
            best = json.load(f)["best"]
        cands.append(("searched_best", best["genotype"]))
        conns = best["genotype"][1]

    # untrained controller seeds 100.. match retrain v1's random_0..2
    spec = MicroControllerSpec(num_blocks=3, num_cell_nodes=3)
    agent = create_agent(jax.random.PRNGKey(1234), spec=spec)
    for s in range(n_random):
        g, _, _, _ = sample_genotype(agent, jax.random.PRNGKey(100 + s))
        cands.append((f"random_{s}", g))
        if conns is None:
            conns = g[1]

    cands.append(("all_none", [[10, [0, 0, 10, 10], [1, 1, 10, 10],
                                [2, 2, 10, 10]], conns]))
    cands.append(("arch0_provisional", ARCHS["arch0"]))
    return cands


def to_py(g):
    if isinstance(g, (list, tuple)):
        return [to_py(x) for x in g]
    return int(g)


def _hash_and_drop(snapshot_dir: str) -> str:
    """sha256 of the best checkpoint bytes; delete unless kept."""
    p = os.path.join(snapshot_dir, "best_params.npz")
    if not os.path.exists(p):
        return ""
    with open(p, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    if os.environ.get("SEGTPU_KEEP_CKPTS", "") != "1":
        os.remove(p)
        try:
            os.rmdir(snapshot_dir)
        except OSError:
            pass
    return digest


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from segtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import logging
    logging.basicConfig(level=logging.WARNING)

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_random = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    outdir = sys.argv[4] if len(sys.argv) > 4 else "artifacts/retrain_v2"
    os.makedirs(outdir, exist_ok=True)
    res_path = os.path.join(outdir, "results.json")

    # the search_v2 task is byte-identical to search_demo's (same
    # write_dataset params/seed); generate under the v2 dir if absent
    data_root = os.path.join(SEARCH_DIR, "data")
    if not os.path.exists(os.path.join(data_root, "train.lst")):
        from run_search_demo import write_dataset
        write_dataset(data_root)

    from segtpu.data.datasets import SegmentationDataset, BatchLoader
    from segtpu.train import TrainConfig, run_training
    ds = SegmentationDataset(data_root, os.path.join(data_root, "train.lst"))
    val_ds = SegmentationDataset(data_root, os.path.join(data_root, "val.lst"))

    results = {"epochs": epochs, "protocol": "e2e 64x64 5-class on-disk; "
               "TrainConfig(enc_lr=.01, dec_lr=.03, batch=8), best val "
               "mIoU over training; weights stored as sha256 only "
               "(VERDICT r4 next#9)", "runs": []}
    if os.path.exists(res_path):
        with open(res_path) as f:
            results = json.load(f)
    done = {(r["name"], r["seed"]) for r in results["runs"]}

    for name, geno in candidates(n_random):
        geno = to_py(geno)
        for seed in range(n_seeds):
            if (name, seed) in done:
                continue
            tl = BatchLoader(ds, batch_size=8, crop=(64, 64), train=True,
                             seed=seed)
            vl = BatchLoader(val_ds, batch_size=8, crop=(64, 64),
                             train=False)
            snap = os.path.join(outdir, f"{name}_s{seed}")
            cfg = TrainConfig(
                num_classes=NUM_CLASSES, crop_size=(64, 64), batch_size=8,
                num_epochs=epochs, val_every=max(epochs // 10, 1),
                enc_lr=0.01, dec_lr=0.03, seed=seed, snapshot_dir=snap)
            t0 = time.time()
            best_miou, _ = run_training(geno, tl, vl, cfg)
            rec = {"name": name, "seed": seed,
                   "best_val_miou": round(float(best_miou), 4),
                   "wall_s": round(time.time() - t0, 1),
                   "ckpt_sha256": _hash_and_drop(snap),
                   "genotype": geno}
            results["runs"].append(rec)
            with open(res_path, "w") as f:
                json.dump(results, f, indent=1)
            print(f"{name} seed {seed}: mIoU {best_miou:.4f} "
                  f"({rec['wall_s']:.0f}s)", flush=True)

    by = {}
    for r in results["runs"]:
        by.setdefault(r["name"], []).append(r["best_val_miou"])
    table = {k: {"mean": round(float(np.mean(v)), 4),
                 "std": round(float(np.std(v, ddof=1)), 4)
                 if len(v) > 1 else None,
                 "per_seed": v} for k, v in sorted(by.items())}
    results["table"] = table
    rand = {k: float(np.mean(v)) for k, v in by.items()
            if k.startswith("random")}
    # pooled within-candidate seed sigma over every non-floor candidate
    cand_vars = [np.var(v, ddof=1) for k, v in by.items()
                 if k != "all_none" and len(v) > 1]
    if cand_vars:
        results["pooled_seed_sigma"] = round(
            float(np.sqrt(np.mean(cand_vars))), 4)
    if "searched_best" in by and rand:
        sm = float(np.mean(by["searched_best"]))
        results["margin_vs_random_mean"] = round(
            sm - float(np.mean(list(rand.values()))), 4)
        results["margin_vs_best_random"] = round(
            sm - max(rand.values()), 4)
    with open(res_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items()
                      if k not in ("runs",)}, indent=1))


if __name__ == "__main__":
    main()
