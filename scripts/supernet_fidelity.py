"""Measure supernet-proxy fidelity: Spearman rank correlation between
per-genotype stage-1 proxy rewards and supernet-mode rewards on the same
synthetic data (VERDICT r1 next#3). Prints one JSON line; the measured
number is recorded in docs/DESIGN.md.

Usage: python scripts/supernet_fidelity.py [K] [epochs]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The session env pins JAX_PLATFORMS=axon (real TPU) and the axon
# sitecustomize re-pins it at interpreter start; env overrides do NOT
# work — force CPU the way tests/conftest.py does. Pass --tpu to stay
# on the device: the K-sample vmapped population step takes hours to
# COMPILE on CPU XLA (a K=16 run timed out at 7000 s round 2) but
# minutes on the TPU.
import jax  # noqa: E402

if "--tpu" in sys.argv:
    sys.argv.remove("--tpu")
else:
    jax.config.update("jax_platforms", "cpu")


def main():
    from segtpu.config import SearchConfig
    from segtpu.supernet import measure_proxy_fidelity

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cfg = SearchConfig(synthetic=True, num_classes=5, crop_size=(64, 64),
                       batch_size=(8, 8), num_epochs=(epochs, 0), seed=0)
    rho, r_pg, r_sn, genos = measure_proxy_fidelity(cfg, k=k, seed=0)
    for g, a, b in zip(genos, r_pg, r_sn):
        print(f"# discrete={a:.4f} supernet={b:.4f}  {g}", file=sys.stderr)
    print(json.dumps({"metric": "supernet_proxy_spearman", "value": round(rho, 4),
                      "k": len(genos), "epochs": epochs}))


if __name__ == "__main__":
    main()
