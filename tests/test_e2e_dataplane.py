"""End-to-end mIoU through the REAL data plane (VERDICT r1 next#5).

Every accuracy signal so far came from in-memory synthetic arrays; this
exercises the full chain the reference's users run: on-disk PNGs ->
.lst manifests (scripts/make_lists.py conventions) -> decode (native
C++ when built, PIL otherwise) -> transforms -> `segtpu train` ->
`segtpu eval --ckpt best_params.npz`, asserting the learned mIoU beats
a floor on a color->class task.
"""

import os

import numpy as np
import pytest


COLORS = np.array([[200, 40, 40], [40, 200, 40], [40, 40, 200]], np.uint8)
NUM_CLASSES = 3


def _write_dataset(root, n_train=12, n_val=4, hw=(64, 64), seed=0):
    """Color-block PNGs: pixel class k has color COLORS[k] + noise; the
    mask carries a 255-ignore border (exercises the ignore path)."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    os.makedirs(os.path.join(root, "masks"), exist_ok=True)
    lists = {"train": [], "val": []}
    for split, n in (("train", n_train), ("val", n_val)):
        for i in range(n):
            blocks = rng.randint(0, NUM_CLASSES, (4, 4))
            mask = np.kron(blocks, np.ones((hw[0] // 4, hw[1] // 4),
                                           np.uint8)).astype(np.uint8)
            noise = rng.randint(-20, 21, (*hw, 3))
            img = np.clip(COLORS[mask].astype(np.int32) + noise,
                          0, 255).astype(np.uint8)
            mask_out = mask.copy()
            mask_out[:2] = mask_out[-2:] = 255
            mask_out[:, :2] = mask_out[:, -2:] = 255
            ip = f"imgs/{split}_{i}.png"
            mp = f"masks/{split}_{i}.png"
            Image.fromarray(img).save(os.path.join(root, ip))
            Image.fromarray(mask_out, mode="L").save(os.path.join(root, mp))
            lists[split].append(f"{ip} {mp}")
    for split in lists:
        with open(os.path.join(root, f"{split}.lst"), "w") as f:
            f.write("\n".join(lists[split]) + "\n")
    return root


@pytest.mark.slow
def test_train_eval_cli_on_disk_dataset(tmp_path, capsys):
    from segtpu.main_search import main

    root = _write_dataset(str(tmp_path / "data"))
    snap = str(tmp_path / "snap")
    arch = "arch2"  # smallest released-style arch: fastest CPU compile

    main(["train", "--arch", arch,
          "--data-root", root, "--train-list", os.path.join(root, "train.lst"),
          "--val-list", os.path.join(root, "val.lst"),
          "--num-classes", str(NUM_CLASSES),
          "--crop-size", "64", "64", "--shorter-side", "64",
          "--batch-size", "4", "--num-epochs", "16", "--val-every", "4",
          "--enc-lr", "0.01", "--dec-lr", "0.03",
          "--snapshot-dir", snap])
    out = capsys.readouterr().out
    assert "best val mIoU" in out
    best = float(out.rsplit("best val mIoU:", 1)[1].split()[0])

    ckpt = os.path.join(snap, "best_params.npz")
    assert os.path.exists(ckpt)

    main(["eval", "--arch", arch, "--data-root", root,
          "--val-list", os.path.join(root, "val.lst"),
          "--num-classes", str(NUM_CLASSES), "--batch-size", "4",
          "--crop-size", "64", "64", "--ckpt", ckpt])
    out = capsys.readouterr().out
    miou = float(out.rsplit("mIoU:", 1)[1].split()[0])

    # the color->class task is trivially learnable; random-init mIoU on
    # 3 classes is ~0.15
    assert miou > 0.5, f"end-to-end mIoU {miou} (train-best {best})"
    assert abs(miou - best) < 0.2  # eval reloads the trained checkpoint
