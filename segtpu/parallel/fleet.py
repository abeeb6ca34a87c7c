"""Fleet search: concurrent proxy-training of a genotype population
across the devices of a TPU slice (BASELINE.json config 5: "REINFORCE
controller + auxiliary-cell proxy training, pmap over TPU slice").

Why not literal pmap: each sampled genotype is a DIFFERENT program, so
SPMD over archs is impossible without a masked supernet. The TPU-native
shape for heterogeneous population training is per-device program
placement: every device gets its own genotype's jitted train/eval
programs (``jax.default_device`` pins placement per worker thread), the
host fans rounds out with a thread pool, and XLA's async dispatch keeps
all chips busy — embarrassingly parallel over ICI-attached devices, no
collectives needed. The controller then takes ONE batched policy update
per round from the K (actions, reward) pairs (rl.agent.train_agent_batch),
which is the variance-reduced form of the reference's sequential
REINFORCE updates.

On the single-chip dev environment this degrades gracefully to K=1;
tests exercise K=8 on the virtual CPU mesh.
"""

from __future__ import annotations

import logging
import time
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import jax
import jax.numpy as jnp

from segtpu.config import SearchConfig
from segtpu.models.micro_decoders import GenotypeError
from segtpu.rl.agent import create_agent, sample_genotype, train_agent_batch
from segtpu.rl.controller import MicroControllerSpec, TemplateControllerSpec
from segtpu.utils.saver import SearchSaver

log = logging.getLogger("segtpu.fleet")


def run_fleet_search(cfg: SearchConfig, *, devices: Optional[List] = None,
                     dataset=None, enc_params=None, enc_stats=None):
    """Round-based fleet search. Each round samples one genotype per
    device, proxy-trains them concurrently, then applies one batched
    controller update. cfg.num_iters counts ROUNDS (K archs per round).
    Returns the SearchSaver."""
    from segtpu import search as S

    devices = list(devices if devices is not None else jax.devices())
    k = len(devices)
    key = jax.random.PRNGKey(cfg.seed)
    k_enc, k_agent, k_loop = jax.random.split(key, 3)

    dataset = dataset if dataset is not None else S._make_dataset(cfg)
    from segtpu.data.datasets import BatchLoader, create_loaders
    train_loader, val_loader = create_loaders(
        dataset, batch_size=cfg.batch_size[1], crop=cfg.crop_size,
        meta_train_prct=cfg.meta_train_prct,
        shorter_side=cfg.shorter_side, seed=cfg.seed)
    cache_train_loader = BatchLoader(
        dataset, batch_size=cfg.batch_size[0], crop=cfg.crop_size,
        train=False, seed=cfg.seed, indices=train_loader.indices)
    cache_val_loader = BatchLoader(
        dataset, batch_size=cfg.batch_size[0], crop=cfg.crop_size,
        train=False, seed=cfg.seed, indices=val_loader.indices)

    if enc_params is None:
        from segtpu.models.encoders import mbv2_init
        enc_params, enc_stats = mbv2_init(k_enc)

    # per-device replicas of the encoder weights and the tap cache
    log.info("staging encoder + feature cache on %d devices", k)
    cached_train = S._cache_taps(enc_params, enc_stats, cache_train_loader)
    cached_val = S._cache_taps(enc_params, enc_stats, cache_val_loader)
    per_dev = []
    for dev in devices:
        per_dev.append({
            "enc_params": jax.device_put(enc_params, dev),
            "enc_stats": jax.device_put(enc_stats, dev),
            "cached_train": jax.device_put(cached_train, dev),
            "cached_val": jax.device_put(cached_val, dev),
        })

    if cfg.ctrl_version in ("wacv", "template"):
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

    def worker(args):
        wi, dev, genotype, seed = args
        with jax.default_device(dev):
            try:
                m1, m2 = S.proxy_train(
                    genotype, per_dev[wi]["enc_params"],
                    per_dev[wi]["enc_stats"], cfg,
                    per_dev[wi]["cached_train"], per_dev[wi]["cached_val"],
                    train_loader, val_loader, rng_seed=seed)
                return S.compute_reward(m1, m2), m1, m2, "ok"
            except GenotypeError as e:
                return cfg.invalid_reward, 0.0, 0.0, f"invalid: {e}"

    pool = ThreadPoolExecutor(max_workers=k)
    for rnd in range(cfg.num_iters):
        t0 = time.time()
        samples = []
        for i in range(k):
            kk = jax.random.fold_in(jax.random.fold_in(k_loop, rnd), i)
            samples.append(sample_genotype(agent, kk))
        results = list(pool.map(worker, [
            (i, devices[i], samples[i][0], cfg.seed + rnd * k + i)
            for i in range(k)]))
        rewards = [r[0] for r in results]
        agent = train_agent_batch(
            agent, jnp.stack([s[1] for s in samples]), rewards,
            old_logprobs_batch=jnp.stack([s[2] for s in samples]))
        for i, (r, m1, m2, status) in enumerate(results):
            saver.record(rnd * k + i, samples[i][0], r,
                         {"miou1": m1, "miou2": m2, "status": status,
                          "round": rnd, "device": i,
                          "baseline": float(agent.state.baseline)})
        log.info("round %d: %d archs in %.1fs, rewards %s", rnd, k,
                 time.time() - t0,
                 [round(float(r), 4) for r in rewards])
        saver.save((rnd + 1) * k, agent.state.params,
                   float(agent.state.baseline))
    pool.shutdown()
    return saver
