"""Full training of a fixed architecture (post-search).

The reference trains its released checkpoints with the same trainer
machinery the search uses (src/engine/trainer.py), driven to many more
epochs. This module is that loop as a library function + the `train`
CLI subcommand target: jitted train steps, periodic mIoU validation,
best-checkpoint keeping, Polyak averaging, optional KD teacher, and
optional multi-device dp(+sp) execution over a mesh.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from segtpu.engine.trainer import (
    init_train_state, make_train_step, make_eval_step, eval_params_stats)
from segtpu.utils.profiling import StepTimer
from segtpu.utils.metrics import mean_iou
from segtpu.utils.saver import save_pytree, load_pytree_like
from segtpu.utils.solvers import create_optimisers

log = logging.getLogger("segtpu.train")


@dataclasses.dataclass
class TrainConfig:
    num_classes: int = 21
    crop_size: Tuple[int, int] = (512, 512)
    shorter_side: Optional[int] = 512
    batch_size: int = 16
    num_epochs: int = 100
    enc_lr: float = 1e-3
    dec_lr: float = 3e-3
    enc_wd: float = 1e-5
    dec_wd: float = 0.0
    enc_grad_clip: float = 3.0
    dec_grad_clip: float = 3.0
    aux_weight: float = 0.15
    do_polyak: bool = True
    do_kd: bool = False
    kd_coeff: float = 0.3
    val_every: int = 5
    seed: int = 42
    snapshot_dir: str = "snapshots/train"
    data_parallel: bool = False  # shard the batch over all devices


def run_training(genotype, train_loader, val_loader, cfg: TrainConfig, *,
                 params=None, stats=None, teacher=None):
    """Train `genotype` to convergence. Returns (best_miou, state)."""
    from segtpu.models.segmenter import segmenter_init, segmenter_apply

    if params is None:
        params, stats = segmenter_init(
            jax.random.PRNGKey(cfg.seed), genotype,
            num_classes=cfg.num_classes, aux=True)
    opt = create_optimisers(
        enc_lr=cfg.enc_lr, dec_lr=cfg.dec_lr, enc_wd=cfg.enc_wd,
        dec_wd=cfg.dec_wd, enc_grad_clip=cfg.enc_grad_clip,
        dec_grad_clip=cfg.dec_grad_clip)
    state = init_train_state(params, stats, opt, do_polyak=cfg.do_polyak)
    step = make_train_step(genotype, opt, num_classes=cfg.num_classes,
                           aux_weight=cfg.aux_weight,
                           kd_coeff=cfg.kd_coeff if cfg.do_kd else 0.0,
                           do_polyak=cfg.do_polyak)
    if cfg.data_parallel and jax.device_count() > 1:
        from segtpu.parallel.mesh import make_mesh, make_sharded_train_step
        mesh = make_mesh(jax.device_count(), 1)
        step = make_sharded_train_step(step, mesh)
        log.info("data-parallel over %d devices", jax.device_count())

    teacher_fn = None
    if cfg.do_kd and teacher is not None:
        tg, tp, ts = teacher

        @jax.jit
        def teacher_fn(img):
            logits, _, _ = segmenter_apply(tg, tp, ts, img, train=False)
            return jax.lax.stop_gradient(logits)

    eval_step = make_eval_step(genotype, num_classes=cfg.num_classes)
    os.makedirs(cfg.snapshot_dir, exist_ok=True)
    best = -1.0
    timer = StepTimer(warmup=2)
    for epoch in range(cfg.num_epochs):
        t0 = time.time()
        losses = []
        for batch in train_loader:
            b = {"image": jnp.asarray(batch["image"], jnp.float32),
                 "label": jnp.asarray(batch["label"])}
            if teacher_fn is not None:
                b["teacher"] = teacher_fn(b["image"])
            with timer.step(n_items=b["label"].shape[0]):
                state, loss = step(state, b)
            losses.append(loss)
        log.info("epoch %d: loss %.4f (%.1fs, %.1f img/s)", epoch,
                 float(jnp.mean(jnp.stack(losses))), time.time() - t0,
                 timer.items_per_sec or 0.0)
        if (epoch + 1) % cfg.val_every == 0 or epoch == cfg.num_epochs - 1:
            eval_params, eval_stats = eval_params_stats(state)
            cm = np.zeros((cfg.num_classes, cfg.num_classes), np.int64)
            for batch in val_loader:
                cm += np.asarray(eval_step(
                    eval_params, eval_stats,
                    {"image": jnp.asarray(batch["image"], jnp.float32),
                     "label": jnp.asarray(batch["label"])}))
            miou = mean_iou(cm)
            log.info("epoch %d: val mIoU %.4f (best %.4f)", epoch, miou, best)
            if miou > best:
                best = miou
                save_pytree(os.path.join(cfg.snapshot_dir, "best_params.npz"),
                            {"params": eval_params, "stats": state.stats})
    return best, state


def load_trained(path: str, genotype, num_classes: int):
    """Load a run_training best-checkpoint into (params, stats)."""
    from segtpu.models.segmenter import segmenter_init
    params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                   num_classes=num_classes, aux=True)
    tree = load_pytree_like(path, {"params": params, "stats": stats})
    return tree["params"], tree["stats"]


def measure_checkpoint_miou(ckpt_path: str, genotype, *, data_root: str,
                            val_list: str, num_classes: int,
                            crop=(64, 64), batch_size: int = 8) -> float:
    """Val mIoU of a run_training best-checkpoint on an on-disk split —
    the ONE implementation behind every checkpoint-reuse measurement
    (scripts/run_search_demo.py stage-0 reuse and
    scripts/remeasure_pretrain.py back-fill; ADVICE r4 #3: the two
    copies could silently measure different splits if loader config
    drifted)."""
    from segtpu.data.datasets import SegmentationDataset, BatchLoader
    from segtpu.engine.trainer import make_eval_step, validate

    params, stats = load_trained(ckpt_path, genotype, num_classes)
    val_ds = SegmentationDataset(data_root, val_list)
    vl = BatchLoader(val_ds, batch_size=batch_size, crop=crop, train=False)
    ev = make_eval_step(genotype, num_classes=num_classes)
    return float(validate(
        ev, params, stats,
        ({"image": jnp.asarray(b["image"], jnp.float32),
          "label": jnp.asarray(b["label"])} for b in vl),
        num_classes=num_classes))
