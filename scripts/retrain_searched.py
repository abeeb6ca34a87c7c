"""Close the search loop: discretely retrain the searched-best genotype
against random and degenerate baselines (VERDICT r3 next#2).

The reference's reason to exist is the DISCOVERED architecture
(BASELINE.json configs[4]); a climbing reward curve plus a noisy proxy
does not establish that the search output is good. This script converts
"the curve climbs" into a falsifiable claim: take the best genotype
from artifacts/search_demo/, train it discretely to convergence on the
same on-disk 5-class task (tests/test_e2e_dataplane.py protocol, the
run_search_demo pretrain recipe), and compare its final val mIoU
against (a) genotypes sampled from an UNTRAINED controller (uniform
over the valid space — what the search would return with zero
learning), and (b) the degenerate all-none cell (a floor: the decoder
contributes nothing beyond its aggregation convs).

Each candidate is trained end-to-end from the same per-seed init
(multiple seeds; the comparison statistic is the per-seed mean of the
best val mIoU). Results stream into artifacts/search_retrain/
results.json — the run is resumable (completed (name, seed) pairs are
skipped) so it can be re-entered across sessions.

Usage: python scripts/retrain_searched.py [epochs] [n_seeds] [outdir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEARCH_DIR = "artifacts/search_demo"
NUM_CLASSES = 5


def candidates():
    """-> [(name, genotype)] for the comparison table."""
    import jax
    from segtpu.rl.agent import create_agent, sample_genotype
    from segtpu.rl.controller import MicroControllerSpec
    from segtpu.models import ARCHS

    with open(os.path.join(SEARCH_DIR, "summary.json")) as f:
        best = json.load(f)["best"]
    cands = [("searched_best", best["genotype"])]

    # untrained controller = uniform over the masked-valid space: the
    # null hypothesis "the search learned nothing"
    spec = MicroControllerSpec(num_blocks=3, num_cell_nodes=3)
    agent = create_agent(jax.random.PRNGKey(1234), spec=spec)
    for s in range(3):
        g, _, _, _ = sample_genotype(agent, jax.random.PRNGKey(100 + s))
        cands.append((f"random_{s}", g))

    # degenerate floor: every cell op is `none` (index 10) — the cell
    # reduces to its aggregation/adapt convs
    cands.append(("all_none", [[10, [0, 0, 10, 10], [1, 1, 10, 10],
                                [2, 2, 10, 10]],
                               best["genotype"][1]]))
    # provisional released-style arch for context
    cands.append(("arch0_provisional", ARCHS["arch0"]))
    return cands


def to_py(g):
    """jax/np ints -> plain python ints (json + genotype validation)."""
    if isinstance(g, (list, tuple)):
        return [to_py(x) for x in g]
    return int(g)


def main():
    # pin CPU in-process: the axon sitecustomize force-registers the TPU
    # plugin and env-var overrides don't stick (see tests/conftest.py) —
    # this job must not contend with TPU bench/trace work
    import jax
    jax.config.update("jax_platforms", "cpu")
    from segtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import logging
    logging.basicConfig(level=logging.WARNING)

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    outdir = sys.argv[3] if len(sys.argv) > 3 else "artifacts/search_retrain"
    os.makedirs(outdir, exist_ok=True)
    res_path = os.path.join(outdir, "results.json")

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
               "mIoU over training", "runs": []}
    if os.path.exists(res_path):
        with open(res_path) as f:
            results = json.load(f)
    done = {(r["name"], r["seed"]) for r in results["runs"]}

    for name, geno in candidates():
        geno = to_py(geno)
        for seed in range(n_seeds):
            if (name, seed) in done:
                continue
            tl = BatchLoader(ds, batch_size=8, crop=(64, 64), train=True,
                             seed=seed)
            vl = BatchLoader(val_ds, batch_size=8, crop=(64, 64),
                             train=False)
            cfg = TrainConfig(
                num_classes=NUM_CLASSES, crop_size=(64, 64), batch_size=8,
                num_epochs=epochs, val_every=max(epochs // 10, 1),
                enc_lr=0.01, dec_lr=0.03, seed=seed,
                snapshot_dir=os.path.join(outdir, f"{name}_s{seed}"))
            t0 = time.time()
            best_miou, _ = run_training(geno, tl, vl, cfg)
            rec = {"name": name, "seed": seed,
                   "best_val_miou": round(float(best_miou), 4),
                   "wall_s": round(time.time() - t0, 1),
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
                 "per_seed": v} for k, v in sorted(by.items())}
    results["table"] = table
    rnd_means = [np.mean(v) for k, v in by.items() if k.startswith("random")]
    if "searched_best" in by and rnd_means:
        results["searched_minus_random_mean"] = round(
            float(np.mean(by["searched_best"]) - np.mean(rnd_means)), 4)
    with open(res_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(table, indent=1))
    if "searched_minus_random_mean" in results:
        print(f"searched_best - mean(random): "
              f"{results['searched_minus_random_mean']:+.4f}")


if __name__ == "__main__":
    main()
