"""The NAS outer loop (reference: src/main_search.py::main, SURVEY.md §3.1).

Per iteration: controller samples a genotype -> materialize decoder
(invalid genotypes get ``invalid_reward`` and the loop continues,
SURVEY.md §5.3) -> stage-1 proxy-train the decoder against a frozen
encoder (from a device-resident encoder-feature cache — the CVPR'19
wall-clock trick) -> validate -> stage-2 short end-to-end fine-tune ->
validate -> reward = geometric mean of the two mIoUs -> policy update.

TPU-first: each stage is one jitted step; the stage-1 program contains
no encoder at all, so the per-genotype compile is small. The encoder
cache is computed ONCE per search (not per genotype) by a single jitted
encoder forward over the fixed meta-train/meta-val crops.
"""

from __future__ import annotations

import logging
import math
import time
from typing import Any, Dict, List

import numpy as np
import jax
import jax.numpy as jnp
import optax

from segtpu.config import SearchConfig
from segtpu.data.datasets import BatchLoader, SyntheticDataset, \
    SegmentationDataset, create_loaders
from segtpu.engine.trainer import (
    TrainState, init_train_state, make_train_step, make_decoder_train_step,
    make_encoder_cache_fn, make_eval_step, eval_params_stats)
from segtpu.core.resize import resize_bilinear
from segtpu.models.encoders import mbv2_init, MBV2_TAP_CHANNELS
from segtpu.models.micro_decoders import (
    GenotypeError, micro_decoder_init, micro_decoder_apply, prettify)
from segtpu.rl.agent import create_agent, sample_genotype, train_agent
from segtpu.rl.controller import MicroControllerSpec
from segtpu.utils.metrics import confusion_matrix, mean_iou
from segtpu.utils.saver import SearchSaver
from segtpu.utils.solvers import create_optimisers

log = logging.getLogger("segtpu.search")


def _make_dataset(cfg: SearchConfig):
    if cfg.synthetic or not cfg.train_list:
        return SyntheticDataset(n=32, hw=cfg.crop_size,
                                num_classes=cfg.num_classes, seed=cfg.seed)
    return SegmentationDataset(cfg.data_root, cfg.train_list)


def _cache_taps(enc_params, enc_stats, loader) -> List[Dict[str, Any]]:
    """Encoder-feature cache: fixed (unaugmented) crops -> device taps."""
    cache_fn = make_encoder_cache_fn()
    cached = []
    for batch in loader:
        taps = cache_fn(enc_params, enc_stats,
                        jnp.asarray(batch["image"], jnp.float32))
        cached.append({"taps": taps,
                       "label": jnp.asarray(batch["label"])})
    return cached


def _make_decoder_eval_step(genotype, num_classes: int, fam):
    @jax.jit
    def step(params, stats, batch):
        logits, _, _ = fam.apply(genotype, params, stats,
                                 batch["taps"], train=False)
        logits = resize_bilinear(logits, batch["label"].shape[1:3],
                                 compute_dtype=jnp.float32)
        pred = jnp.argmax(logits, axis=-1)
        return confusion_matrix(pred, batch["label"], num_classes)

    return step


def proxy_train(genotype, enc_params, enc_stats, cfg: SearchConfig,
                cached_train, cached_val, train_loader, val_loader, *,
                rng_seed: int = 0, teacher_fn=None):
    """Two-stage proxy training of one genotype -> (miou1, miou2).

    cached_train/cached_val: device-resident tap batches (stage 1;
    batches may carry precomputed 'teacher' logits for KD).
    train_loader/val_loader: image loaders (stage 2 end-to-end);
    teacher_fn (jitted image->logits) supplies KD targets per augmented
    batch when cfg.do_kd (reference --do-kd/--kd-coeff, SURVEY.md §2#15).
    """
    from segtpu.models.families import infer_family
    fam = infer_family(genotype)
    key = jax.random.PRNGKey(rng_seed)
    dec_params, dec_stats = fam.init(
        key, genotype, MBV2_TAP_CHANNELS, cfg.num_classes,
        agg_size=cfg.agg_size, repeats=cfg.sep_repeats, aux=True,
        aux_cell=cfg.aux_cell)

    # ---- stage 1: decoder-only over cached taps ----
    opt_dec = optax.chain(optax.clip_by_global_norm(cfg.dec_grad_clip),
                          optax.add_decayed_weights(cfg.dec_wd),
                          optax.sgd(cfg.dec_lr, momentum=0.9))
    state = init_train_state(dec_params, dec_stats, opt_dec,
                             do_polyak=cfg.do_polyak)
    step1 = make_decoder_train_step(genotype, opt_dec,
                                    num_classes=cfg.num_classes,
                                    aux_weight=cfg.dec_aux_weight,
                                    kd_coeff=cfg.kd_coeff if cfg.do_kd else 0.0)
    for _ in range(cfg.num_epochs[0]):
        for batch in cached_train:
            state, loss = step1(state, batch)

    eval_dec = _make_decoder_eval_step(genotype, cfg.num_classes, fam)
    eval_params, eval_stats = eval_params_stats(state)
    cm = np.zeros((cfg.num_classes, cfg.num_classes), np.int64)
    for batch in cached_val:
        cm += np.asarray(eval_dec(eval_params, eval_stats, batch))
    miou1 = mean_iou(cm)

    # ---- stage 2: short end-to-end fine-tune ----
    full_params = {"encoder": enc_params, "decoder": state.params}
    full_stats = {"encoder": enc_stats, "decoder": state.stats}
    opt2 = create_optimisers(enc_lr=cfg.enc_lr, dec_lr=cfg.dec_lr,
                             enc_wd=cfg.enc_wd, dec_wd=cfg.dec_wd,
                             enc_grad_clip=cfg.enc_grad_clip,
                             dec_grad_clip=cfg.dec_grad_clip)
    state2 = init_train_state(full_params, full_stats, opt2,
                              do_polyak=cfg.do_polyak)
    step2 = make_train_step(genotype, opt2, num_classes=cfg.num_classes,
                            aux_weight=cfg.dec_aux_weight,
                            kd_coeff=cfg.kd_coeff if cfg.do_kd else 0.0)
    for _ in range(cfg.num_epochs[1]):
        for batch in train_loader:
            batch = {"image": jnp.asarray(batch["image"], jnp.float32),
                     "label": jnp.asarray(batch["label"])}
            if teacher_fn is not None:
                batch["teacher"] = teacher_fn(batch["image"])
            state2, loss = step2(state2, batch)

    eval_full = make_eval_step(genotype, num_classes=cfg.num_classes)
    eval_params2, eval_stats2 = eval_params_stats(state2)
    cm = np.zeros((cfg.num_classes, cfg.num_classes), np.int64)
    for batch in val_loader:
        cm += np.asarray(eval_full(
            eval_params2, eval_stats2,
            {"image": jnp.asarray(batch["image"], jnp.float32),
             "label": jnp.asarray(batch["label"])}))
    miou2 = mean_iou(cm)
    return miou1, miou2


def compute_reward(miou1: float, miou2: float) -> float:
    """Geometric mean of the two proxy-stage mIoUs (SURVEY.md §3.1,
    conf:M — re-verify the formula against the mount, §7.4.4)."""
    m1 = max(miou1, 0.0) if math.isfinite(miou1) else 0.0
    m2 = max(miou2, 0.0) if math.isfinite(miou2) else 0.0
    return math.sqrt(m1 * m2)


def run_search(cfg: SearchConfig, *, dataset=None,
               enc_params=None, enc_stats=None, teacher=None):
    """The full NAS loop. Returns the SearchSaver (history + best archs).

    teacher: optional (genotype, params, stats) of a trained segmenter;
    with cfg.do_kd its soft targets are distilled into every proxy
    training (the CVPR'19 acceleration, reference --do-kd)."""
    key = jax.random.PRNGKey(cfg.seed)
    k_enc, k_agent, k_loop = jax.random.split(key, 3)

    dataset = dataset if dataset is not None else _make_dataset(cfg)
    train_loader, val_loader = create_loaders(
        dataset, batch_size=cfg.batch_size[1], crop=cfg.crop_size,
        meta_train_prct=cfg.meta_train_prct,
        shorter_side=cfg.shorter_side, seed=cfg.seed)
    # fixed-crop loaders for the encoder cache (stage 1)
    cache_train_loader = BatchLoader(
        dataset, batch_size=cfg.batch_size[0], crop=cfg.crop_size,
        train=False, seed=cfg.seed, indices=train_loader.indices)
    cache_val_loader = BatchLoader(
        dataset, batch_size=cfg.batch_size[0], crop=cfg.crop_size,
        train=False, seed=cfg.seed, indices=val_loader.indices)

    if enc_params is None:
        enc_params, enc_stats = mbv2_init(k_enc)
        if cfg.enc_ckpt:
            from segtpu.convert.torch_import import load_mbv2_checkpoint
            enc_params, enc_stats = load_mbv2_checkpoint(cfg.enc_ckpt)

    log.info("caching encoder features for stage-1 proxy training")
    cached_train = _cache_taps(enc_params, enc_stats, cache_train_loader)
    cached_val = _cache_taps(enc_params, enc_stats, cache_val_loader)

    teacher_fn = None
    if cfg.do_kd and teacher is not None:
        tg, tp, ts = teacher
        from segtpu.models.segmenter import segmenter_apply

        @jax.jit
        def teacher_fn(img):
            logits, _, _ = segmenter_apply(tg, tp, ts, img, train=False)
            return jax.lax.stop_gradient(logits)

        # stage-1 KD targets: teacher logits for the fixed cache crops
        for cached, loader in ((cached_train, cache_train_loader),):
            for batch, host in zip(cached, loader):
                batch["teacher"] = teacher_fn(
                    jnp.asarray(host["image"], jnp.float32))

    if cfg.ctrl_version in ("wacv", "template"):
        from segtpu.rl.controller import TemplateControllerSpec
        spec = TemplateControllerSpec(
            num_blocks=cfg.num_blocks,
            hidden_size=cfg.lstm_hidden_size, emb_size=cfg.op_size)
    else:
        spec = MicroControllerSpec(
            num_blocks=cfg.num_blocks, num_cell_nodes=cfg.num_cell_nodes,
            hidden_size=cfg.lstm_hidden_size, emb_size=cfg.op_size)
    agent = create_agent(k_agent, spec=spec, algo=cfg.ctrl_algo,
                         lr=cfg.ctrl_lr,
                         baseline_decay=cfg.ctrl_baseline_decay,
                         entropy_coef=cfg.ctrl_entropy_coef)

    saver = SearchSaver(cfg.snapshot_dir)
    start = 0
    if cfg.resume:
        restored = saver.load(agent.state.params)
        if restored is not None:
            start, params, baseline = restored
            agent = agent._replace(state=agent.state._replace(
                params=params, baseline=jnp.asarray(baseline)))
            log.info("resumed search at step %d", start)

    for step in range(start, cfg.num_iters):
        t0 = time.time()
        k_step = jax.random.fold_in(k_loop, step)
        genotype, actions, logprobs, _ = sample_genotype(agent, k_step)
        try:
            miou1, miou2 = proxy_train(
                genotype, enc_params, enc_stats, cfg,
                cached_train, cached_val, train_loader, val_loader,
                rng_seed=cfg.seed + step, teacher_fn=teacher_fn)
            reward = compute_reward(miou1, miou2)
            status = "ok"
        except GenotypeError as e:  # invalid arch -> ~zero reward
            miou1 = miou2 = 0.0
            reward = cfg.invalid_reward
            status = f"invalid: {e}"
        agent = train_agent(agent, actions, reward, old_logprobs=logprobs)
        saver.record(step, genotype, reward,
                     {"miou1": miou1, "miou2": miou2, "status": status,
                      "seconds": round(time.time() - t0, 2),
                      "baseline": float(agent.state.baseline)})
        log.info("step %d reward=%.4f (miou1=%.4f miou2=%.4f) %.1fs\n%s",
                 step, reward, miou1, miou2, time.time() - t0,
                 prettify(genotype) if status == "ok" else status)
        if (step + 1) % cfg.val_every == 0:
            saver.save(step + 1, agent.state.params,
                       float(agent.state.baseline))
    saver.save(cfg.num_iters, agent.state.params,
               float(agent.state.baseline))
    return saver
