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
