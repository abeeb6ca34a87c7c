"""Guard for the recorded retrain-v2 comparison (VERDICT r4 next#2/#9).

scripts/retrain_v2.py retrained the search-v2 best genotype against 6
untrained-controller random samples (the "search learned nothing"
null), x3 seeds each at 120 epochs, plus the all-none floor and the
provisional arch0 literal — metrics + genotypes + sha256 weight hashes
only (no npz; r4 weak#9). This pins the statistical claims DESIGN.md
makes, exactly as recorded:

 * the searched arch beats the RANDOM-MEAN by more than the pooled
   within-candidate seed sigma (the r4 verdict's bar: margin > noise);
 * it beats 5 of 6 random samples (rank 2 of 7) — and the one random
   that beats it is recorded, NOT hidden: margin_vs_best_random is
   negative and DESIGN.md says so (the search improves reliably over
   the controller prior; it did not find the optimum of the space);
 * it has the LOWEST seed variance of every non-floor candidate
   (exploiting a noisy reward selects reproducible architectures);
 * the degenerate all-none cell collapses (the task separates archs).
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "artifacts", "retrain_v2", "results.json")


@pytest.fixture(scope="module")
def results():
    if not os.path.exists(ART):
        pytest.skip("retrain_v2 artifact not generated yet")
    with open(ART) as f:
        return json.load(f)


def test_protocol_and_hygiene(results):
    assert results["epochs"] >= 120
    names = {r["name"] for r in results["runs"]}
    assert sum(1 for n in names if n.startswith("random")) >= 6
    assert "searched_best" in names and "all_none" in names
    by_seed = {}
    for r in results["runs"]:
        by_seed.setdefault(r["name"], set()).add(r["seed"])
        # hygiene: weights are recorded as hashes, never checked in
        assert len(r["ckpt_sha256"]) == 64
    assert all(len(s) >= 3 for s in by_seed.values()), by_seed


def test_margin_exceeds_pooled_seed_sigma(results):
    t = results["table"]
    assert results["margin_vs_random_mean"] > results["pooled_seed_sigma"]
    # recomputable from the table (the artifact is self-consistent)
    rand = [v["mean"] for k, v in t.items() if k.startswith("random")]
    got = t["searched_best"]["mean"] - float(np.mean(rand))
    assert abs(got - results["margin_vs_random_mean"]) < 2e-4


def test_rank_and_variance_structure(results):
    t = results["table"]
    s = t["searched_best"]
    rand_means = {k: v["mean"] for k, v in t.items()
                  if k.startswith("random")}
    beats = sum(1 for m in rand_means.values() if s["mean"] > m)
    assert beats >= 5, rand_means
    # the honest negative is recorded, not asserted away: exactly the
    # stronger random(s) the margin_vs_best_random field exposes
    assert results["margin_vs_best_random"] == round(
        s["mean"] - max(rand_means.values()), 4)
    # lowest seed-variance of all non-floor candidates
    stds = [v["std"] for k, v in t.items()
            if k != "all_none" and v["std"] is not None]
    assert s["std"] == min(stds), (s["std"], stds)
    # the floor collapses
    assert t["all_none"]["mean"] < 0.4


def test_seed1_search_reproduces_quality_and_proxy_saturates(results):
    """The seed-1 search (different trajectory, different genotype,
    supernet reward 0.733 vs 0.550) retrains statistically identical to
    seed-0's pick — search OUTPUT quality is reproducible — and the
    probe's discrete rewards for the top-3 candidates order opposite to
    their retrain truths: the proxy saturates past ~0.45 (DESIGN.md
    'where the proxy saturates')."""
    t = results["table"]
    if "searched_seed1" not in t:
        pytest.skip("seed-1 retrain rows not recorded")
    s0, s1 = t["searched_best"], t["searched_seed1"]
    # reproducible output quality: means within the pooled seed noise
    assert abs(s0["mean"] - s1["mean"]) < results["pooled_seed_sigma"]
    pr_path = os.path.join(os.path.dirname(ART), "proxy_rank.json")
    if not os.path.exists(pr_path):
        pytest.skip("proxy_rank probe not recorded")
    with open(pr_path) as f:
        mr = json.load(f)["mean_rewards"]
    if "searched_seed1" not in mr:
        pytest.skip("probe predates the seed-1 candidate")
    # top-region inversion as recorded: proxy order seed1 > seed0 >
    # random_4, truth order random_4 > {seed1 ~= seed0}
    assert mr["searched_seed1"] > mr["searched_best"] > mr["random_4"]
    assert t["random_4"]["mean"] > max(s0["mean"], s1["mean"])
