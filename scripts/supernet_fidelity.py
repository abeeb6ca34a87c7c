"""Measure supernet-proxy fidelity: Spearman rank correlation between
per-genotype stage-1 proxy rewards and supernet-mode rewards on the same
data (VERDICT r1 next#3; re-measured round 3 per VERDICT r2 next#4 on
the on-disk color dataset — real reward spread — with K=32 and multiple
seeds). Prints one JSON line per seed; the measured numbers are
recorded in docs/DESIGN.md.

Usage: python scripts/supernet_fidelity.py [K] [epochs] [--tpu]
           [--pretrain best_params.npz]
           [--color] [--seeds 0,1] [--self]

--self: noise-ceiling mode. Runs the SAME K genotypes under two
measurement seeds (different weight inits, same data) and reports the
discrete-vs-discrete and supernet-vs-supernet self-Spearmans alongside
the cross fidelity. If the discrete proxy cannot rank-agree with
ITSELF across inits, the cross number is bounded by proxy noise, not
by the supernet's resolution deviation — the diagnostic VERDICT r2
next#4 needs before reaching for per-block native resolutions.
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
    from segtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from segtpu.config import SearchConfig
    from segtpu.supernet import measure_proxy_fidelity

    seeds = [0]
    if "--seeds" in sys.argv:
        i = sys.argv.index("--seeds")
        seeds = [int(s) for s in sys.argv[i + 1].split(",")]
        del sys.argv[i:i + 2]
    use_color = "--color" in sys.argv
    if use_color:
        sys.argv.remove("--color")
    self_mode = "--self" in sys.argv
    if self_mode:
        sys.argv.remove("--self")
    pretrain = None
    if "--pretrain" in sys.argv:
        # measure under the conditions the recorded search actually ran
        # in (scripts/run_search_demo.py stage 0): a task-pre-trained
        # encoder — with a random encoder the cached taps are random
        # projections and rewards collapse into a noise band
        i = sys.argv.index("--pretrain")
        pretrain = sys.argv[i + 1]
        del sys.argv[i:i + 2]
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    dataset = None
    data_kw = dict(synthetic=True)
    if use_color:
        # on-disk color->class task (wider reward spread than the
        # synthetic band; see scripts/run_search_demo.py)
        from run_search_demo import write_dataset, NUM_CLASSES
        root = write_dataset("/tmp/segtpu_fidelity_data")
        data_kw = dict(data_root=root,
                       train_list=os.path.join(root, "train.lst"),
                       val_list=os.path.join(root, "val.lst"))
    cfg = SearchConfig(num_classes=5, crop_size=(64, 64),
                       batch_size=(8, 8), num_epochs=(epochs, 0), seed=0,
                       **data_kw)
    enc_kw = {}
    if pretrain is not None:
        import jax
        from segtpu.models import ARCHS
        from segtpu.models.segmenter import segmenter_init
        from segtpu.utils.saver import load_pytree_like
        tp, ts = segmenter_init(jax.random.PRNGKey(0), ARCHS["arch0"],
                                num_classes=cfg.num_classes, aux=True)
        blob = load_pytree_like(pretrain, {"params": tp, "stats": ts})
        enc_kw = dict(enc_params=blob["params"]["encoder"],
                      enc_stats=blob["stats"]["encoder"])
        print(f"# pre-trained encoder: {pretrain}", file=sys.stderr)
    if self_mode:
        from segtpu.utils.metrics import spearman
        res = {}
        genos = None
        for seed in seeds[:2]:
            rho, r_pg, r_sn, genos = measure_proxy_fidelity(
                cfg, k=k, seed=seed, genotypes=genos, **enc_kw)
            res[seed] = (rho, r_pg, r_sn)
            print(f"# seed {seed}: cross rho={rho:.4f}", file=sys.stderr)
        (s0, s1) = seeds[:2]
        print(json.dumps({
            "metric": "proxy_fidelity_with_noise_ceiling",
            "k": k, "epochs": epochs,
            "data": "color" if use_color else "synthetic",
            "cross": [round(res[s][0], 4) for s in (s0, s1)],
            "self_discrete": round(
                spearman(res[s0][1], res[s1][1]), 4),
            "self_supernet": round(
                spearman(res[s0][2], res[s1][2]), 4)}), flush=True)
        return
    for seed in seeds:
        rho, r_pg, r_sn, genos = measure_proxy_fidelity(cfg, k=k, seed=seed,
                                                        **enc_kw)
        for g, a, b in zip(genos, r_pg, r_sn):
            print(f"# discrete={a:.4f} supernet={b:.4f}  {g}",
                  file=sys.stderr)
        print(json.dumps({"metric": "supernet_proxy_spearman",
                          "value": round(rho, 4), "k": len(genos),
                          "epochs": epochs, "seed": seed,
                          "data": "color" if use_color else "synthetic"}),
              flush=True)


if __name__ == "__main__":
    main()
