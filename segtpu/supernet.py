"""Vectorized masked-supernet proxy training — K sampled architectures
in ONE compiled SPMD program.

The per-genotype search path (segtpu.search / parallel.fleet) compiles a
fresh XLA program for every sampled architecture (SURVEY.md §7.3 item 4:
the fundamental cost of heterogeneous graphs under jit). This module is
the TPU-native alternative called out in BASELINE.json's north star
("pmap-vectorized proxy-training harness"): materialize ONE padded
supergraph containing every op choice, encode each sampled genotype as
one-hot masks, and ``vmap`` the whole train/eval step over a population
axis of (per-sample weights, per-sample masks). One compile at search
start; every round reuses it. Under a device mesh the population axis
shards trivially (pure data parallelism over samples).

Faithfulness notes (documented trade-offs vs the discrete builder):
  * masks are one-hot, so a sample's forward equals the discrete
    network's forward EXCEPT for resolution: the supergraph runs every
    block at the stride-4 resolution (pool entries are upsampled once),
    whereas a discrete block runs at the max resolution of its two
    chosen inputs. Proxy rewards correlate but are not bit-identical;
    use the per-genotype path when exact proxy semantics matter.
    Measured fidelity (measure_proxy_fidelity, synthetic K=16):
    Spearman rank correlation vs the per-genotype stage-1 reward —
    see docs/DESIGN.md "Supernet proxy fidelity" for the current number.
  * the classifier head is concat-EQUIVALENT: each pool slot has its
    own agg_size-wide classifier slice, masked by the collect weights —
    exactly the discrete concat-then-1x1 head up to weight-slot
    permutation (round-1 used a summed head through one shared slice,
    a measured fidelity loss).
  * the population trainer mirrors search.proxy_train stage-1 exactly:
    grad-clip + weight decay + momentum SGD, warmup-corrected Polyak
    averaging for eval when cfg.do_polyak (round 1 trained with plain
    SGD and evaluated raw weights).
  * each sample has its OWN weights (vmapped init) — this is the
    reference's train-each-arch-from-scratch protocol, not ENAS weight
    sharing.
  * BN runs per-sample under vmap (stats of masked-off ops are computed
    but never selected).
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from segtpu.core.layers import conv_init, conv_bn_init, conv_bn_apply
from segtpu.core.resize import resize_bilinear
from segtpu.ops.layer_factory import NUM_OPS, OP_NAMES, op_init, op_apply
from segtpu.rl.controller import MicroControllerSpec
from segtpu.utils.metrics import confusion_matrix


class SupernetSpec(NamedTuple):
    num_inputs: int = 4
    num_blocks: int = 3
    num_cell_nodes: int = 3
    agg_size: int = 48
    num_classes: int = 21

    @property
    def pool_max(self) -> int:
        return self.num_inputs + self.num_blocks


def masks_from_actions(actions, spec: SupernetSpec):
    """Controller actions (MicroControllerSpec order) -> mask dict of
    one-hot float arrays. Pure numpy/jnp, vmap-able over a leading axis.
    """
    a = jnp.asarray(actions, jnp.int32)
    nb, nn_, no = spec.num_blocks, spec.num_cell_nodes, NUM_OPS
    idx = 0
    op0 = jax.nn.one_hot(a[idx], no)
    idx += 1
    node_pos = []   # [nodes, 2, n_pos_max]
    node_ops = []   # [nodes, 2, NUM_OPS]
    n_pos_max = nn_ + 1
    for k in range(1, nn_ + 1):
        p1, p2, o1, o2 = a[idx], a[idx + 1], a[idx + 2], a[idx + 3]
        idx += 4
        node_pos.append(jnp.stack([jax.nn.one_hot(p1, n_pos_max),
                                   jax.nn.one_hot(p2, n_pos_max)]))
        node_ops.append(jnp.stack([jax.nn.one_hot(o1, no),
                                   jax.nn.one_hot(o2, no)]))
    conns = []      # [blocks, 2, pool_max]
    for b in range(nb):
        i, j = a[idx], a[idx + 1]
        idx += 2
        conns.append(jnp.stack([jax.nn.one_hot(i, spec.pool_max),
                                jax.nn.one_hot(j, spec.pool_max)]))
    return {"op0": op0, "node_pos": jnp.stack(node_pos),
            "node_ops": jnp.stack(node_ops), "conns": jnp.stack(conns)}


def _all_ops_init(key, c, dtype=jnp.float32):
    ps, ss = [], []
    for i, name in enumerate(OP_NAMES):
        p, s = op_init(name, jax.random.fold_in(key, i), c, dtype=dtype)
        ps.append(p)
        ss.append(s)
    return ps, ss


def _all_ops_apply(params, stats, x, op_mask, *, train):
    """Σ_op mask[op] · op(x) — with one-hot masks this IS the chosen op."""
    out = None
    new_stats = []
    for i, name in enumerate(OP_NAMES):
        y, ns = op_apply(name, params[i], stats[i], x, train=train)
        new_stats.append(ns)
        y = y * op_mask[i].astype(y.dtype)
        out = y if out is None else out + y
    return out, new_stats


def supernet_init(key, spec: SupernetSpec, inp_sizes, dtype=jnp.float32):
    keys = jax.random.split(key, 64)
    ki = iter(range(64))
    params: Dict[str, Any] = {"adapt": [], "blocks": []}
    stats: Dict[str, Any] = {"adapt": [], "blocks": []}
    for c in inp_sizes:
        p, s = conv_bn_init(keys[next(ki)], 1, 1, c, spec.agg_size,
                            dtype=dtype)
        params["adapt"].append(p)
        stats["adapt"].append(s)
    for b in range(spec.num_blocks):
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        k1, k2 = jax.random.split(keys[next(ki)])
        bp["agg1"], bs["agg1"] = conv_bn_init(k1, 1, 1, spec.agg_size,
                                              spec.agg_size, dtype=dtype)
        bp["agg2"], bs["agg2"] = conv_bn_init(k2, 1, 1, spec.agg_size,
                                              spec.agg_size, dtype=dtype)
        bp["node0"], bs["node0"] = _all_ops_init(keys[next(ki)],
                                                 spec.agg_size, dtype)
        bp["nodes"] = []
        bs["nodes"] = []
        for n in range(spec.num_cell_nodes):
            pa, sa = _all_ops_init(keys[next(ki)], spec.agg_size, dtype)
            pb, sb = _all_ops_init(keys[next(ki)], spec.agg_size, dtype)
            bp["nodes"].append({"a": pa, "b": pb})
            bs["nodes"].append({"a": sa, "b": sb})
        bp["aux_clf"] = conv_init(keys[next(ki)], 1, 1, spec.agg_size,
                                  spec.num_classes, dtype=dtype)
        bp["aux_clf"]["b"] = jnp.zeros((spec.num_classes,), dtype)
        params["blocks"].append(bp)
        stats["blocks"].append(bs)
    # concat-equivalent masked head: one classifier slice PER POOL SLOT
    # (concat order can't be static under masking, but per-slot weights
    # reproduce concat-then-1x1 up to weight-slot permutation). Init
    # bound uses fan_in = 2*agg_size — the discrete head's fan_in is
    # n_collect*agg_size with n_collect typically 2.
    bound = float(np.sqrt(3.0 / (2 * spec.agg_size)))
    params["clf"] = {
        "w": jax.random.uniform(keys[next(ki)],
                                (spec.pool_max, spec.agg_size,
                                 spec.num_classes), dtype, -bound, bound),
        "b": jnp.zeros((spec.num_classes,), dtype)}
    return params, stats


def _conv1x1(p, x):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)


def supernet_apply(spec: SupernetSpec, params, stats, masks, taps, *,
                   train: bool = False, with_aux: bool = False):
    """One sample's forward. taps: 4 NHWC encoder features. All pool
    entries live at the stride-4 resolution (see module docstring).
    Returns (logits, aux list, new_stats)."""
    hw = taps[0].shape[1:3]
    new_stats: Dict[str, Any] = {"adapt": [], "blocks": []}
    pool: List[Any] = []
    for t, p, s in zip(taps, params["adapt"], stats["adapt"]):
        y, ns = conv_bn_apply(p, s, t, act="relu", train=train)
        pool.append(resize_bilinear(y, hw))
        new_stats["adapt"].append(ns)

    used = jnp.zeros((spec.pool_max,), jnp.float32)
    aux = []
    for b in range(spec.num_blocks):
        bp, bs = params["blocks"][b], stats["blocks"][b]
        nbs: Dict[str, Any] = {}
        pool_arr = jnp.stack(pool + [jnp.zeros_like(pool[0])] *
                             (spec.pool_max - len(pool)))
        cm = masks["conns"][b]  # [2, pool_max]
        x1 = jnp.einsum("p,p...->...", cm[0].astype(pool_arr.dtype), pool_arr)
        x2 = jnp.einsum("p,p...->...", cm[1].astype(pool_arr.dtype), pool_arr)
        used = used + cm[0] + cm[1]
        y1, nbs["agg1"] = conv_bn_apply(bp["agg1"], bs["agg1"], x1,
                                        act="relu", train=train)
        y2, nbs["agg2"] = conv_bn_apply(bp["agg2"], bs["agg2"], x2,
                                        act="relu", train=train)
        y = y1 + y2
        # contextual cell under masks
        outs = [y]
        y0, nbs["node0"] = _all_ops_apply(bp["node0"], bs["node0"], y,
                                          masks["op0"], train=train)
        outs.append(y0)
        nbs["nodes"] = []
        # outs grows to x + node0 + num_cell_nodes entries; selectable
        # positions (the controller's vocab) are the first
        # num_cell_nodes + 1 of them
        n_outs = spec.num_cell_nodes + 2
        # position 0 (the cell input x) is always consumed by node 0 —
        # mirrors _cell_collect_inds seeding used={0} in the discrete
        # builder (reference ContextualCell initializes _collect_inds=[0]
        # and removes 0 when node 0 consumes x); without this, x leaked
        # into every cell output whenever no node re-selected it.
        cell_used = jnp.zeros((n_outs,), jnp.float32).at[0].set(1.0)
        for n in range(spec.num_cell_nodes):
            outs_arr = jnp.stack(
                outs + [jnp.zeros_like(outs[0])] * (n_outs - len(outs)))
            pm = masks["node_pos"][n]  # [2, n_pos_max]
            pm0 = jnp.pad(pm[0], (0, n_outs - pm.shape[1]))
            pm1 = jnp.pad(pm[1], (0, n_outs - pm.shape[1]))
            xa = jnp.einsum("p,p...->...", pm0.astype(outs_arr.dtype),
                            outs_arr)
            xb = jnp.einsum("p,p...->...", pm1.astype(outs_arr.dtype),
                            outs_arr)
            cell_used = cell_used + pm0 + pm1
            ya, nsa = _all_ops_apply(bp["nodes"][n]["a"], bs["nodes"][n]["a"],
                                     xa, masks["node_ops"][n][0], train=train)
            yb, nsb = _all_ops_apply(bp["nodes"][n]["b"], bs["nodes"][n]["b"],
                                     xb, masks["node_ops"][n][1], train=train)
            outs.append(ya + yb)
            nbs["nodes"].append({"a": nsa, "b": nsb})
        collect_w = jnp.clip(1.0 - cell_used, 0.0, 1.0)
        cell_out = sum(outs[i] * collect_w[i].astype(outs[0].dtype)
                       for i in range(len(outs)))
        pool.append(cell_out)
        if with_aux:
            aux.append(_conv1x1(bp["aux_clf"], cell_out))
        new_stats["blocks"].append(nbs)

    logits = _masked_concat_head(params["clf"], pool, used)
    return logits, aux, new_stats


def _masked_concat_head(clf, pool, used):
    """Concat-equivalent classifier: logits = Σ_p collect[p]·(x_p @ W_p).
    Identical to concatenating the collected entries and convolving with
    the concatenation of their weight slices (the discrete head)."""
    collect_w = jnp.clip(1.0 - used, 0.0, 1.0)
    pool_arr = jnp.stack(pool)                      # [P, B, H, W, C]
    wsel = clf["w"] * collect_w[:, None, None]      # [P, C, K]
    return (jnp.einsum("pbhwc,pck->bhwk", pool_arr,
                       wsel.astype(pool_arr.dtype))
            + clf["b"].astype(pool_arr.dtype))


# ---------------------------------------------------------------------------
# Population training: vmap over (weights, masks), shared data batch
# ---------------------------------------------------------------------------


def _apply_for(family: str):
    return supernet_apply if family == "micro" else template_supernet_apply


class PopState(NamedTuple):
    """Population training state; every leaf carries a leading K axis
    except ``step`` (shared scalar). Field order keeps the round-1
    ``(params, stats, opt_state)`` tuple indices valid."""
    params: Any
    stats: Any
    opt_state: Any
    polyak: Any = None      # None when do_polyak=False
    step: Any = 0

    def eval_params(self):
        """Weights to evaluate with — Polyak average when tracked,
        paired with live BN stats (trainer.eval_params_stats contract)."""
        return self.polyak if self.polyak is not None else self.params


def make_population_train_step(spec: SupernetSpec, optimizer, *,
                               aux_weight: float = 0.15,
                               family: str = "micro"):
    """-> jitted step(pop_state: PopState, masks, batch): trains K
    decoders at once; batch = {'taps': 4 arrays, 'label': [N,H,W]}
    (shared). family: 'micro' (CVPR cell masks) or 'template' (WACV
    masks). Mirrors search.proxy_train stage-1 semantics per sample,
    including warmup-corrected Polyak when the pop carries one."""
    from segtpu.engine.trainer import segmentation_loss
    from segtpu.utils.solvers import polyak_update
    apply_fn = _apply_for(family)

    def one_loss(params, stats, masks, batch):
        logits, aux, new_stats = apply_fn(
            spec, params, stats, masks, batch["taps"], train=True,
            with_aux=True)
        loss = segmentation_loss(logits, aux, batch["label"],
                                 num_classes=spec.num_classes,
                                 aux_weight=aux_weight)
        return loss, new_stats

    def one_step(params, stats, opt_state, masks, batch):
        (loss, new_stats), grads = jax.value_and_grad(
            one_loss, has_aux=True)(params, stats, masks, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    @jax.jit
    def step(pop, masks, batch):
        params, stats, opt_state, losses = jax.vmap(
            one_step, in_axes=(0, 0, 0, 0, None))(pop.params, pop.stats,
                                                  pop.opt_state, masks,
                                                  batch)
        n = pop.step + 1
        polyak = (polyak_update(pop.polyak, params, step=n)
                  if pop.polyak is not None else None)
        return PopState(params, stats, opt_state, polyak, n), losses

    return step


def make_population_eval_step(spec: SupernetSpec, *,
                              family: str = "micro"):
    apply_fn = _apply_for(family)

    @jax.jit
    def step(params, stats, masks, batch):
        def one(params, stats, masks):
            logits, _, _ = apply_fn(spec, params, stats, masks,
                                    batch["taps"], train=False)
            logits = resize_bilinear(logits, batch["label"].shape[1:3],
                                     compute_dtype=jnp.float32)
            pred = jnp.argmax(logits, axis=-1)
            return confusion_matrix(pred, batch["label"], spec.num_classes)
        return jax.vmap(one)(params, stats, masks)

    return step


def population_init(key, spec: SupernetSpec, inp_sizes, optimizer, k: int,
                    *, family: str = "micro",
                    do_polyak: bool = False) -> PopState:
    """K independent supernet weight sets (vmapped init)."""
    init_fn = supernet_init if family == "micro" else template_supernet_init
    keys = jax.random.split(key, k)
    params, stats = jax.vmap(
        lambda kk: init_fn(kk, spec, inp_sizes))(keys)
    opt_state = jax.vmap(optimizer.init)(params)
    polyak = (jax.tree_util.tree_map(jnp.copy, params)
              if do_polyak else None)
    return PopState(params, stats, opt_state, polyak,
                    jnp.asarray(0, jnp.int32))


# ---------------------------------------------------------------------------
# Search loop: one compiled program, K archs per round
# ---------------------------------------------------------------------------


def run_supernet_search(cfg, *, population: int = 8, dataset=None,
                        enc_params=None, enc_stats=None, mesh=None):
    """NAS search with the vectorized population trainer. One compile at
    the first round; every later round reuses it (no per-genotype XLA
    compiles — the answer to SURVEY.md §7.3 item 4). Reward = stage-1
    proxy mIoU on cached encoder features (no stage-2 in this mode).

    ``mesh``: optional jax.sharding.Mesh — the population's K axis is
    sharded over its 'data' axis (parallel.mesh.shard_population), so a
    pod slice trains K/data samples per chip with zero step collectives.
    Returns the SearchSaver."""
    import logging
    import time
    from segtpu import search as S
    from segtpu.data.datasets import BatchLoader, create_loaders
    from segtpu.models.encoders import mbv2_init, MBV2_TAP_CHANNELS
    from segtpu.rl.agent import create_agent, sample_genotype, \
        train_agent_batch
    from segtpu.utils.metrics import mean_iou
    from segtpu.utils.saver import SearchSaver

    log = logging.getLogger("segtpu.supernet")
    key = jax.random.PRNGKey(cfg.seed)
    k_enc, k_agent, k_loop, k_pop = jax.random.split(key, 4)

    dataset = dataset if dataset is not None else S._make_dataset(cfg)
    train_loader, val_loader = create_loaders(
        dataset, batch_size=cfg.batch_size[0], crop=cfg.crop_size,
        meta_train_prct=cfg.meta_train_prct, seed=cfg.seed)
    cache_train = BatchLoader(dataset, batch_size=cfg.batch_size[0],
                              crop=cfg.crop_size, train=False, seed=cfg.seed,
                              indices=train_loader.indices)
    cache_val = BatchLoader(dataset, batch_size=cfg.batch_size[0],
                            crop=cfg.crop_size, train=False, seed=cfg.seed,
                            indices=val_loader.indices)
    if enc_params is None:
        enc_params, enc_stats = mbv2_init(k_enc)
    cached_train = S._cache_taps(enc_params, enc_stats, cache_train)
    cached_val = S._cache_taps(enc_params, enc_stats, cache_val)

    family = "template" if cfg.ctrl_version in ("wacv", "template") \
        else "micro"
    spec = SupernetSpec(num_blocks=cfg.num_blocks,
                        num_cell_nodes=cfg.num_cell_nodes,
                        agg_size=cfg.agg_size, num_classes=cfg.num_classes)
    if family == "template":
        from segtpu.rl.controller import TemplateControllerSpec
        ctrl_spec = TemplateControllerSpec(
            num_blocks=cfg.num_blocks,
            hidden_size=cfg.lstm_hidden_size, emb_size=cfg.op_size)
    else:
        ctrl_spec = MicroControllerSpec(
            num_blocks=cfg.num_blocks, num_cell_nodes=cfg.num_cell_nodes,
            hidden_size=cfg.lstm_hidden_size, emb_size=cfg.op_size)
    agent = create_agent(k_agent, spec=ctrl_spec, algo=cfg.ctrl_algo,
                         lr=cfg.ctrl_lr,
                         baseline_decay=cfg.ctrl_baseline_decay,
                         entropy_coef=cfg.ctrl_entropy_coef)
    # exact search.proxy_train stage-1 optimizer (clip + wd + momentum)
    optimizer = optax.chain(optax.clip_by_global_norm(cfg.dec_grad_clip),
                            optax.add_decayed_weights(cfg.dec_wd),
                            optax.sgd(cfg.dec_lr, momentum=0.9))
    train_step = make_population_train_step(spec, optimizer,
                                            aux_weight=cfg.dec_aux_weight,
                                            family=family)
    eval_step = make_population_eval_step(spec, family=family)
    if mesh is not None:
        # manual SPMD (shard_map): K/data samples per device, zero step
        # collectives. NOT plain jit over sharded inputs — the GSPMD
        # partitioner silently corrupts the vmapped per-sample convs
        # (parallel.mesh.shard_population docstring).
        from segtpu.parallel.mesh import (make_sharded_population_step,
                                          make_sharded_population_eval)
        train_step = make_sharded_population_step(train_step, mesh)
        eval_step = make_sharded_population_eval(eval_step, mesh)
    saver = SearchSaver(cfg.snapshot_dir)

    mask_fn = (masks_from_actions if family == "micro"
               else template_masks_from_actions)
    masks_vec = jax.jit(jax.vmap(lambda a: mask_fn(a, spec)))

    # The whole stage-1 proxy as ONE program: scan(epochs) over
    # scan(stacked cached batches). The python epoch x batch loop made
    # epochs*n_batches separate dispatches per round (48 at the
    # search-v2 config), each paying the dev relay's dispatch+sync
    # latency — measured 21 s/round; the scanned program removes all
    # but one. Semantics identical: the cache is fixed and iterated in
    # the same deterministic order every epoch either way.
    batches_stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *cached_train)

    @jax.jit
    def stage1(pop, masks, batches):
        def epoch(p, _):
            def one(q, b):
                q2, _ = train_step(q, masks, b)
                return q2, 0.0
            p2, _ = jax.lax.scan(one, p, batches)
            return p2, None
        pop, _ = jax.lax.scan(epoch, pop, None,
                              length=cfg.num_epochs[0])
        return pop

    # population sampling as ONE vmapped dispatch (round 5): the
    # controller's masked-scan sampler is vmap-able over keys; the
    # per-i python loop made K small relay round trips per round.
    # RNG-identical to the loop: the same fold_in(fold_in(k_loop, rnd),
    # i) keys, batched.
    from segtpu.rl import controller as _ctrl
    decode = (_ctrl.genotype_from_actions
              if family == "micro"
              else _ctrl.template_genotype_from_actions)

    @jax.jit
    def sample_pop(params, keys):
        return jax.vmap(lambda k: _ctrl.sample(params, ctrl_spec, k))(keys)

    for rnd in range(cfg.num_iters):
        t0 = time.time()
        keys = jnp.stack([
            jax.random.fold_in(jax.random.fold_in(k_loop, rnd), i)
            for i in range(population)])
        acts_b, lps_b, ents_b = sample_pop(agent.state.params, keys)
        acts = list(np.asarray(acts_b))
        lps = list(lps_b)
        genos = [decode(a, ctrl_spec) for a in acts]
        # summed slot entropy (nats) — exploration-collapse signal
        # for the per-round summary (VERDICT r3 next#8)
        ents = [float(e) for e in np.asarray(jnp.sum(ents_b, axis=1))]
        masks = masks_vec(jnp.stack([jnp.asarray(a) for a in acts]))
        pop = population_init(jax.random.fold_in(k_pop, rnd), spec,
                              MBV2_TAP_CHANNELS, optimizer, population,
                              family=family, do_polyak=cfg.do_polyak)
        if mesh is not None:
            from segtpu.parallel.mesh import shard_population
            pop, masks = shard_population(mesh, pop, masks)
        pop = stage1(pop, masks, batches_stacked)
        cms = 0
        for batch in cached_val:
            cms = cms + np.asarray(eval_step(pop.eval_params(), pop.stats,
                                             masks, batch))
        rewards = [mean_iou(cms[i]) for i in range(population)]
        agent = train_agent_batch(agent, jnp.stack(acts), rewards,
                                  old_logprobs_batch=jnp.stack(lps))
        for i in range(population):
            saver.record(rnd * population + i, genos[i], rewards[i],
                         {"round": rnd, "mode": "supernet",
                          "baseline": float(agent.state.baseline),
                          "entropy": round(ents[i], 4)})
        log.info("supernet round %d: %d archs in %.1fs rewards %s", rnd,
                 population, time.time() - t0,
                 [round(float(r), 4) for r in rewards])
        saver.save((rnd + 1) * population, agent.state.params,
                   float(agent.state.baseline))
    return saver


# ---------------------------------------------------------------------------
# WACV template-family supergraph (same vectorization, template masks)
# ---------------------------------------------------------------------------


def template_masks_from_actions(actions, spec: SupernetSpec):
    """TemplateControllerSpec actions -> one-hot masks:
    conns [blocks, 2, pool_max], aggs [blocks, 2], ops [blocks, NUM_OPS]."""
    a = jnp.asarray(actions, jnp.int32)
    conns, aggs, ops = [], [], []
    idx = 0
    for b in range(spec.num_blocks):
        i, j, agg, op = a[idx], a[idx + 1], a[idx + 2], a[idx + 3]
        idx += 4
        conns.append(jnp.stack([jax.nn.one_hot(i, spec.pool_max),
                                jax.nn.one_hot(j, spec.pool_max)]))
        aggs.append(jax.nn.one_hot(agg, 2))
        ops.append(jax.nn.one_hot(op, NUM_OPS))
    return {"conns": jnp.stack(conns), "aggs": jnp.stack(aggs),
            "ops": jnp.stack(ops)}


def template_supernet_init(key, spec: SupernetSpec, inp_sizes,
                           dtype=jnp.float32):
    keys = jax.random.split(key, 64)
    ki = iter(range(64))
    params: Dict[str, Any] = {"adapt": [], "blocks": []}
    stats: Dict[str, Any] = {"adapt": [], "blocks": []}
    for c in inp_sizes:
        p, s = conv_bn_init(keys[next(ki)], 1, 1, c, spec.agg_size,
                            dtype=dtype)
        params["adapt"].append(p)
        stats["adapt"].append(s)
    for b in range(spec.num_blocks):
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        k1, k2, k3 = jax.random.split(keys[next(ki)], 3)
        bp["b1"], bs["b1"] = conv_bn_init(k1, 1, 1, spec.agg_size,
                                          spec.agg_size, dtype=dtype)
        bp["b2"], bs["b2"] = conv_bn_init(k2, 1, 1, spec.agg_size,
                                          spec.agg_size, dtype=dtype)
        bp["reduce"], bs["reduce"] = conv_bn_init(
            k3, 1, 1, 2 * spec.agg_size, spec.agg_size, dtype=dtype)
        bp["ops"], bs["ops"] = _all_ops_init(keys[next(ki)], spec.agg_size,
                                             dtype)
        bp["aux_clf"] = conv_init(keys[next(ki)], 1, 1, spec.agg_size,
                                  spec.num_classes, dtype=dtype)
        bp["aux_clf"]["b"] = jnp.zeros((spec.num_classes,), dtype)
        params["blocks"].append(bp)
        stats["blocks"].append(bs)
    bound = float(np.sqrt(3.0 / (2 * spec.agg_size)))
    params["clf"] = {
        "w": jax.random.uniform(keys[next(ki)],
                                (spec.pool_max, spec.agg_size,
                                 spec.num_classes), dtype, -bound, bound),
        "b": jnp.zeros((spec.num_classes,), dtype)}
    return params, stats


def template_supernet_apply(spec: SupernetSpec, params, stats, masks,
                            taps, *, train: bool = False,
                            with_aux: bool = False):
    """Template-family masked forward (both aggregation templates are
    computed, the sampled one selected by the agg one-hot). Same
    resolution/head trade-offs as supernet_apply."""
    hw = taps[0].shape[1:3]
    new_stats: Dict[str, Any] = {"adapt": [], "blocks": []}
    pool: List[Any] = []
    for t, p, s in zip(taps, params["adapt"], stats["adapt"]):
        y, ns = conv_bn_apply(p, s, t, act="relu", train=train)
        pool.append(resize_bilinear(y, hw))
        new_stats["adapt"].append(ns)

    used = jnp.zeros((spec.pool_max,), jnp.float32)
    aux = []
    for b in range(spec.num_blocks):
        bp, bs = params["blocks"][b], stats["blocks"][b]
        nbs: Dict[str, Any] = {}
        pool_arr = jnp.stack(pool + [jnp.zeros_like(pool[0])] *
                             (spec.pool_max - len(pool)))
        cm = masks["conns"][b]
        x1 = jnp.einsum("p,p...->...", cm[0].astype(pool_arr.dtype), pool_arr)
        x2 = jnp.einsum("p,p...->...", cm[1].astype(pool_arr.dtype), pool_arr)
        used = used + cm[0] + cm[1]
        # psum template
        y1, nbs["b1"] = conv_bn_apply(bp["b1"], bs["b1"], x1, act="relu",
                                      train=train)
        y2, nbs["b2"] = conv_bn_apply(bp["b2"], bs["b2"], x2, act="relu",
                                      train=train)
        psum = y1 + y2
        # cat template
        cat = jnp.concatenate([x1, x2], axis=-1)
        cat, nbs["reduce"] = conv_bn_apply(bp["reduce"], bs["reduce"], cat,
                                           act="relu", train=train)
        am = masks["aggs"][b]
        y = psum * am[0].astype(psum.dtype) + cat * am[1].astype(cat.dtype)
        y, nbs["ops"] = _all_ops_apply(bp["ops"], bs["ops"], y,
                                       masks["ops"][b], train=train)
        pool.append(y)
        if with_aux:
            aux.append(_conv1x1(bp["aux_clf"], y))
        new_stats["blocks"].append(nbs)

    logits = _masked_concat_head(params["clf"], pool, used)
    return logits, aux, new_stats


# ---------------------------------------------------------------------------
# Proxy-fidelity measurement: does the supernet rank archs like the
# faithful per-genotype path? (VERDICT r1 next#3; module docstring's
# "proxy rewards correlate" claim, quantified.)
# ---------------------------------------------------------------------------


def measure_proxy_fidelity(cfg, *, k: int = 16, seed: int = 0,
                           dataset=None, enc_params=None, enc_stats=None,
                           genotypes=None, discrete_only: bool = False):
    """Train K sampled genotypes BOTH ways on the same cached encoder
    taps — (a) the faithful per-genotype stage-1 proxy (exact
    search.proxy_train stage-1 semantics) and (b) the masked-supernet
    population step (exact run_supernet_search semantics) — and return
    (spearman, per_genotype_rewards, supernet_rewards, genotypes).

    The supernet deviates from the discrete builder in resolution only
    (uniform stride-4; the head has been concat-equivalent per-slot
    since round 2); this is the measurement that says whether that
    deviation changes the RANKING the controller learns from.

    discrete_only: skip the supernet path and return
    (None, per_genotype_rewards, None, genotypes) — the proxy-strength
    sweep (VERDICT r3 next#4) measures the DISCRETE proxy's
    self-consistency across init seeds at several (epochs, crop)
    settings; the K-vmapped supernet step would dominate its cost (and
    is unbuildable on CPU) without informing that number.
    """
    from segtpu import search as S
    from segtpu.data.datasets import BatchLoader, create_loaders
    from segtpu.engine.trainer import (init_train_state, eval_params_stats,
                                       make_decoder_train_step)
    from segtpu.models.encoders import mbv2_init, MBV2_TAP_CHANNELS
    from segtpu.models.families import infer_family
    from segtpu.rl.agent import create_agent, sample_genotype
    from segtpu.utils.metrics import mean_iou, spearman

    key = jax.random.PRNGKey(seed)
    k_enc, k_agent, k_samp, k_pop, k_dec = jax.random.split(key, 5)

    dataset = dataset if dataset is not None else S._make_dataset(cfg)
    train_loader, val_loader = create_loaders(
        dataset, batch_size=cfg.batch_size[0], crop=cfg.crop_size,
        meta_train_prct=cfg.meta_train_prct, seed=cfg.seed)
    cache_train = BatchLoader(dataset, batch_size=cfg.batch_size[0],
                              crop=cfg.crop_size, train=False, seed=cfg.seed,
                              indices=train_loader.indices)
    cache_val = BatchLoader(dataset, batch_size=cfg.batch_size[0],
                            crop=cfg.crop_size, train=False, seed=cfg.seed,
                            indices=val_loader.indices)
    if enc_params is None:
        enc_params, enc_stats = mbv2_init(k_enc)
    cached_train = S._cache_taps(enc_params, enc_stats, cache_train)
    cached_val = S._cache_taps(enc_params, enc_stats, cache_val)

    spec = SupernetSpec(num_blocks=cfg.num_blocks,
                        num_cell_nodes=cfg.num_cell_nodes,
                        agg_size=cfg.agg_size, num_classes=cfg.num_classes)
    ctrl_spec = MicroControllerSpec(
        num_blocks=cfg.num_blocks, num_cell_nodes=cfg.num_cell_nodes,
        hidden_size=cfg.lstm_hidden_size, emb_size=cfg.op_size)

    if genotypes is not None:
        # caller-fixed genotypes (deterministic ranking tests)
        from segtpu.rl.controller import actions_from_genotype
        genos = list(genotypes)
        acts = [actions_from_genotype(g, ctrl_spec) for g in genos]
    else:
        agent = create_agent(k_agent, spec=ctrl_spec)
        # K DISTINCT genotypes (an untrained controller can repeat itself)
        genos, acts, seen = [], [], set()
        i = 0
        while len(genos) < k and i < 50 * k:
            g, a, _, _ = sample_genotype(agent,
                                         jax.random.fold_in(k_samp, i))
            i += 1
            key_g = repr(g)
            if key_g in seen:
                continue
            seen.add(key_g)
            genos.append(g)
            acts.append(a)

    if discrete_only:
        r_discrete = _fidelity_discrete_rewards(cfg, genos, cached_train,
                                                cached_val, k_dec)
        return None, r_discrete, None, genos

    # --- (b) supernet path: one compiled program, K samples vmapped ---
    optimizer = optax.chain(optax.clip_by_global_norm(cfg.dec_grad_clip),
                            optax.add_decayed_weights(cfg.dec_wd),
                            optax.sgd(cfg.dec_lr, momentum=0.9))
    train_step = make_population_train_step(spec, optimizer,
                                            aux_weight=cfg.dec_aux_weight)
    eval_step = make_population_eval_step(spec)
    masks = jax.jit(jax.vmap(lambda a: masks_from_actions(a, spec)))(
        jnp.stack(acts))
    pop = population_init(k_pop, spec, MBV2_TAP_CHANNELS, optimizer,
                          len(genos), do_polyak=cfg.do_polyak)
    for _ in range(cfg.num_epochs[0]):
        for batch in cached_train:
            pop, _ = train_step(pop, masks, batch)
    cms = 0
    for batch in cached_val:
        cms = cms + np.asarray(eval_step(pop.eval_params(), pop.stats,
                                         masks, batch))
    r_supernet = [mean_iou(cms[i]) for i in range(len(genos))]

    # --- (a) faithful per-genotype stage-1 (search.proxy_train) ---
    r_discrete = _fidelity_discrete_rewards(cfg, genos, cached_train,
                                            cached_val, k_dec)
    return (spearman(r_discrete, r_supernet), r_discrete, r_supernet,
            genos)


def _fidelity_discrete_rewards(cfg, genos, cached_train, cached_val, k_dec):
    """Exact search.proxy_train stage-1 semantics, per genotype, on
    cached taps; returns the per-genotype val-mIoU rewards."""
    from segtpu import search as S
    from segtpu.engine.trainer import (init_train_state, eval_params_stats,
                                       make_decoder_train_step)
    from segtpu.models.encoders import MBV2_TAP_CHANNELS
    from segtpu.models.families import infer_family
    from segtpu.utils.metrics import mean_iou

    r_discrete = []
    for i, g in enumerate(genos):
        fam = infer_family(g)
        dec_params, dec_stats = fam.init(
            jax.random.fold_in(k_dec, i), g, MBV2_TAP_CHANNELS,
            cfg.num_classes, agg_size=cfg.agg_size,
            repeats=cfg.sep_repeats, aux=True, aux_cell=cfg.aux_cell)
        opt_dec = optax.chain(
            optax.clip_by_global_norm(cfg.dec_grad_clip),
            optax.add_decayed_weights(cfg.dec_wd),
            optax.sgd(cfg.dec_lr, momentum=0.9))
        state = init_train_state(dec_params, dec_stats, opt_dec,
                                 do_polyak=cfg.do_polyak)
        step1 = make_decoder_train_step(g, opt_dec,
                                        num_classes=cfg.num_classes,
                                        aux_weight=cfg.dec_aux_weight)
        for _ in range(cfg.num_epochs[0]):
            for batch in cached_train:
                state, _ = step1(state, batch)
        eval_dec = S._make_decoder_eval_step(g, cfg.num_classes, fam)
        ep, es = eval_params_stats(state)
        cm = 0
        for batch in cached_val:
            cm = cm + np.asarray(eval_dec(ep, es, batch))
        r_discrete.append(mean_iou(cm))
    return r_discrete
