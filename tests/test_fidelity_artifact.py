"""The recorded supernet-fidelity measurement (VERDICT r2 next #4).

scripts/supernet_fidelity.py ran on the real TPU (K=32, 8 epochs,
on-disk color task, task-pretrained encoder) with the --self
noise-ceiling mode and checked in artifacts/fidelity/measurement.json.
This guards the recorded numbers and the relationship that justifies
the supernet search mode: the supernet's cross fidelity must sit at
the discrete proxy's own self-consistency ceiling — i.e. the masked
supernet loses no ranking signal beyond what the proxy itself lacks.
(The run needs the TPU: the K-vmapped population step takes hours to
compile on CPU.)
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "artifacts", "fidelity", "measurement.json")


@pytest.mark.skipif(not os.path.exists(ART),
                    reason="fidelity measurement artifact not generated yet")
def test_recorded_fidelity_is_proxy_noise_bounded():
    with open(ART) as f:
        m = json.load(f)
    assert m["k"] >= 32 and m["epochs"] >= 8
    nc = m["noise_ceiling_run"]
    cross = np.mean(nc["cross"])
    # floor at the measured level (VERDICT r2 #4 "done" criterion)
    assert cross >= 0.4, cross
    # the supernet tracks the discrete proxy as well as the discrete
    # proxy tracks itself across inits (within Spearman sampling noise
    # at K=32, se ~ 1/sqrt(29) ~ 0.19)
    assert abs(cross - nc["self_discrete"]) <= 0.2, nc


ART_V3 = os.path.join(os.path.dirname(ART), "measurement_v3.json")


@pytest.mark.skipif(not os.path.exists(ART_V3),
                    reason="fidelity v3 artifact not generated yet")
def test_recorded_fidelity_v3_validates_supernet_at_strong_proxy():
    """VERDICT r4 next#5: re-measure supernet cross-fidelity at the
    16-epoch proxy (self-rho 0.90). The recorded answer: cross rose
    0.48/0.44 -> 0.866/0.809, i.e. to the discrete proxy's own
    self-consistency — the supernet resolution deviation is NOT the
    binding limit, so supernet mode is validated for real searches."""
    with open(ART_V3) as f:
        m = json.load(f)
    assert m["k"] >= 32 and m["epochs"] >= 16
    cross = np.mean(m["cross"])
    # the VERDICT's decision threshold: >= 0.7 validates supernet mode
    assert cross >= 0.7, cross
    # and the v2->v3 lift itself (the prediction under test): the
    # strong proxy more than doubles the weak-proxy cross (0.46 mean)
    assert cross >= 0.46 + 0.2, cross
    # cross tracks the discrete self-ceiling (Spearman noise at K=32)
    assert abs(cross - m["self_discrete"]) <= 0.2, m
