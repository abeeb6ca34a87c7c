"""The recorded discrete-retrain comparison (VERDICT r3 next #2).

scripts/retrain_searched.py took the best genotype from the recorded
search (artifacts/search_demo), 3 random controller samples, the
degenerate all-none cell, and the provisional arch0 literal, trained
each discretely to convergence (2 seeds, the tests/test_e2e_dataplane
protocol at 120 epochs) and checked in
artifacts/search_retrain/results.json. This guards the claim the search
loop exists to produce: the SEARCHED architecture, retrained from
scratch, must beat the mean random architecture and crush the
degenerate one. (The runs themselves take ~6 min each on CPU — the
artifact is the evidence; this guards its internal consistency.)
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "artifacts", "search_retrain", "results.json")


@pytest.mark.skipif(not os.path.exists(ART),
                    reason="retrain artifact not generated yet")
def test_searched_beats_random_and_degenerate():
    with open(ART) as f:
        r = json.load(f)
    table = r["table"]
    assert len(table["searched_best"]["per_seed"]) >= 2  # multi-seed
    searched = table["searched_best"]["mean"]
    randoms = [v["mean"] for k, v in table.items()
               if k.startswith("random_")]
    assert len(randoms) >= 3
    # the decisive check: searched > the random-sample mean (the margin
    # is recorded in the artifact and discussed in docs/DESIGN.md)
    assert searched > float(np.mean(randoms)), (searched, randoms)
    assert abs(r["searched_minus_random_mean"]     # recorded rounded
               - (searched - float(np.mean(randoms)))) < 1e-3
    # and the degenerate all-none cell must collapse (sanity: the task
    # actually separates architectures)
    assert table["all_none"]["mean"] < 0.3 < searched
    # every run reached a usable segmentation quality except all_none
    for k, v in table.items():
        if k != "all_none":
            assert v["mean"] > 0.8, (k, v)
    # provenance: the retrained searched genotype is recorded verbatim
    runs = {(x["name"], x["seed"]): x for x in r["runs"]}
    assert runs[("searched_best", 0)]["genotype"] == \
        runs[("searched_best", 1)]["genotype"]
