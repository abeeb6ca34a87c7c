"""Full-training loop: learns a tiny synthetic task + checkpoint I/O."""

import jax
import numpy as np

from segtpu.data.datasets import SyntheticDataset, BatchLoader
from segtpu.models import ARCHS
from segtpu.train import TrainConfig, run_training, load_trained


def test_run_training_improves_and_checkpoints(tmp_path):
    genotype = ARCHS["arch2"]
    # learnable task: mask = quadrant index, constant per dataset image
    ds = SyntheticDataset(n=8, hw=(32, 32), num_classes=4, seed=1)
    ds.masks[:] = 0
    ds.masks[:, 16:, :16] = 1
    ds.masks[:, :16, 16:] = 2
    ds.masks[:, 16:, 16:] = 3
    train_loader = BatchLoader(ds, batch_size=4, crop=(32, 32), train=True)
    val_loader = BatchLoader(ds, batch_size=4, crop=(32, 32), train=False)
    cfg = TrainConfig(num_classes=4, crop_size=(32, 32), batch_size=4,
                      num_epochs=30, val_every=10, do_polyak=True,
                      dec_lr=0.05, enc_lr=0.01,
                      snapshot_dir=str(tmp_path / "snap"))
    best, state = run_training(genotype, train_loader, val_loader, cfg)
    # the task is positional -> should be mostly solved in 60 steps
    assert best > 0.4, f"best mIoU {best}"

    params, stats = load_trained(str(tmp_path / "snap" / "best_params.npz"),
                                 genotype, num_classes=4)
    got = jax.tree_util.tree_leaves(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in got)
