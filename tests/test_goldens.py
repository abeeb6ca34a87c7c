"""Golden regression tests (SURVEY.md §4 item 1, adapted).

The reference's goldens (released checkpoints + logits) are unavailable
(mount empty), so these goldens are SELF-recorded: fixed-seed segmenter
logits captured once on the CPU backend and checked into
tests/goldens/*.npz. They pin the numerical semantics of the whole
stack — any refactor that changes op wiring, BN numerics, resize
weights, init streams, or the collect-index bookkeeping fails loudly.

Regenerate (only after an INTENTIONAL semantic change):
    SEGTPU_REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segtpu.models.arch_literals import ARCHS
from segtpu.models.segmenter import segmenter_init, segmenter_apply

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _compute(arch):
    genotype = ARCHS[arch]
    params, stats = segmenter_init(jax.random.PRNGKey(42), genotype,
                                   num_classes=7)
    x = jnp.asarray(
        np.random.RandomState(7).randn(1, 64, 96, 3).astype(np.float32))
    logits, _, _ = segmenter_apply(genotype, params, stats, x)
    return np.asarray(logits, np.float32)


@pytest.mark.parametrize("arch", list(ARCHS))
def test_segmenter_logits_golden(arch):
    path = os.path.join(GOLDEN_DIR, f"{arch}_logits.npz")
    got = _compute(arch)
    if os.environ.get("SEGTPU_REGEN_GOLDENS") or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, logits=got)
        pytest.skip(f"golden recorded: {path}")
    want = np.load(path)["logits"]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
