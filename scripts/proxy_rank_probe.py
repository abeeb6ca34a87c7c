"""Does the 16-epoch proxy itself rank the retrain-v2 candidates the
way 120-epoch retraining does? (round 5; follows VERDICT r4 next#2)

The retrain-v2 comparison found ONE random sample (random_4) whose
retrained mIoU beats the searched arch. Two different failure stories
are consistent with that: (a) the PROXY also scores random_4 higher —
then the search under-explored/under-exploited (controller problem);
(b) the proxy scores random_4 lower — then the proxy misranks the top
of the distribution (fidelity problem) and no controller could have
found it with this reward. This probe measures the discrete 16-epoch
stage-1 reward for every retrain-v2 candidate genotype (2 init seeds,
task-pretrained encoder — the search's exact conditions) and records
which story is true, plus the proxy->retrain Spearman over the
candidate set.

Usage: python scripts/proxy_rank_probe.py [out_json]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from segtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from run_search_demo import write_dataset
    from segtpu.search import SearchConfig
    from segtpu.supernet import measure_proxy_fidelity
    from segtpu.models import ARCHS
    from segtpu.models.segmenter import segmenter_init
    from segtpu.utils.saver import load_pytree_like
    from segtpu.utils.metrics import spearman

    out = sys.argv[1] if len(sys.argv) > 1 else \
        "artifacts/retrain_v2/proxy_rank.json"
    with open("artifacts/retrain_v2/results.json") as f:
        res = json.load(f)
    cands = {}
    for r in res["runs"]:
        cands.setdefault(r["name"], r["genotype"])
    names = sorted(cands)
    retrain_mean = {k: res["table"][k]["mean"] for k in names}

    root = write_dataset("/tmp/segtpu_fidelity_data")
    cfg = SearchConfig(num_classes=5, crop_size=(64, 64),
                       batch_size=(8, 8), num_epochs=(16, 0), seed=0,
                       data_root=root,
                       train_list=os.path.join(root, "train.lst"),
                       val_list=os.path.join(root, "val.lst"))
    tp, ts = segmenter_init(jax.random.PRNGKey(0), ARCHS["arch0"],
                            num_classes=5, aux=True)
    blob = load_pytree_like("artifacts/search_demo/pretrain/best_params.npz",
                            {"params": tp, "stats": ts})
    rewards = {}
    for seed in (0, 1):
        _, r_pg, _, _ = measure_proxy_fidelity(
            cfg, k=len(names), seed=seed,
            enc_params=blob["params"]["encoder"],
            enc_stats=blob["stats"]["encoder"],
            genotypes=[cands[n] for n in names], discrete_only=True)
        rewards[seed] = {n: round(float(v), 4)
                         for n, v in zip(names, r_pg)}
        print(f"# seed {seed}: {rewards[seed]}", flush=True)

    mean_r = {n: float(np.mean([rewards[s][n] for s in rewards]))
              for n in names}
    rho = spearman(np.array([mean_r[n] for n in names]),
                   np.array([retrain_mean[n] for n in names]))
    rec = {
        "proxy": {"num_epochs": [16, 0], "crop": [64, 64], "seeds": [0, 1]},
        "per_seed_rewards": rewards,
        "mean_rewards": mean_r,
        "retrain_means": retrain_mean,
        "spearman_proxy_vs_retrain": round(float(rho), 4),
        "proxy_prefers_random_4_over_searched":
            bool(mean_r["random_4"] > mean_r["searched_best"]),
    }
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v for k, v in rec.items()
                      if k != "per_seed_rewards"}, indent=1))


if __name__ == "__main__":
    main()
