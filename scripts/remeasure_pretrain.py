"""Re-measure the recorded search demo's stage-0 pre-train mIoU.

The round-3 search artifact recorded `pretrain_miou: -1.0` because the
encoder checkpoint was reused without re-evaluating it
(VERDICT r3 next#8). run_search_demo.py now re-measures on reuse; this
script back-fills the already-recorded artifact from its own checkpoint
(`artifacts/search_demo/pretrain/best_params.npz`) without re-running
the 100-round search, and stamps the summary with how the number was
obtained.

Usage: python scripts/remeasure_pretrain.py [outdir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_search_demo import write_dataset, NUM_CLASSES  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/search_demo"
    data_root = write_dataset(os.path.join(outdir, "data"))

    from segtpu.models import ARCHS
    from segtpu.train import measure_checkpoint_miou

    # shared helper (ADVICE r4 #3): the same loader config + validate
    # call the search script's reuse path uses — the two cannot drift
    pre_ckpt = os.path.join(outdir, "pretrain", "best_params.npz")
    miou = measure_checkpoint_miou(
        pre_ckpt, ARCHS["arch0"], data_root=data_root,
        val_list=os.path.join(data_root, "val.lst"),
        num_classes=NUM_CLASSES)
    print(f"pretrain ckpt val mIoU: {miou:.4f}")

    summary_path = os.path.join(outdir, "summary.json")
    with open(summary_path) as f:
        summary = json.load(f)
    summary["pretrain_miou"] = round(miou, 4)
    summary["pretrain_miou_note"] = (
        "re-measured post-hoc from pretrain/best_params.npz on the "
        "regenerated val split (the original run recorded a -1.0 sentinel "
        "on checkpoint reuse)")
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"patched {summary_path}")


if __name__ == "__main__":
    main()
