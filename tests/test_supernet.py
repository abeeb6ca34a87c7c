"""Vectorized masked-supernet: mask selection exactness, population
training, one-compile search round."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segtpu.config import SearchConfig
from segtpu.models.encoders import MBV2_TAP_CHANNELS
from segtpu.ops.layer_factory import OP_NAMES, op_init, op_apply
from segtpu.rl.controller import MicroControllerSpec, controller_init, \
    sample, genotype_from_actions
from segtpu.supernet import (
    SupernetSpec, masks_from_actions, _all_ops_init, _all_ops_apply,
    supernet_init, supernet_apply, population_init,
    make_population_train_step, make_population_eval_step,
    run_supernet_search)


def test_all_ops_one_hot_selects_exact_op():
    c = 8
    ps, ss = _all_ops_init(jax.random.PRNGKey(0), c)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, c), jnp.float32)
    for i, name in enumerate(OP_NAMES):
        mask = jax.nn.one_hot(i, len(OP_NAMES))
        got, _ = _all_ops_apply(ps, ss, x, mask, train=False)
        want, _ = op_apply(name, ps[i], ss[i], x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_masks_round_trip_genotype():
    cspec = MicroControllerSpec()
    sspec = SupernetSpec()
    params = controller_init(jax.random.PRNGKey(0), cspec)
    actions, _, _ = sample(params, cspec, jax.random.PRNGKey(4))
    g = genotype_from_actions(actions, cspec)
    m = masks_from_actions(actions, sspec)
    cell, conns = g
    assert int(jnp.argmax(m["op0"])) == cell[0]
    for k, (p1, p2, o1, o2) in enumerate(cell[1:]):
        assert int(jnp.argmax(m["node_pos"][k][0])) == p1
        assert int(jnp.argmax(m["node_ops"][k][1])) == o2
    for b, (i, j) in enumerate(conns):
        assert int(jnp.argmax(m["conns"][b][0])) == i
        assert int(jnp.argmax(m["conns"][b][1])) == j


def test_supernet_forward_and_distinct_masks_differ():
    spec = SupernetSpec(num_classes=5)
    params, stats = supernet_init(jax.random.PRNGKey(0), spec,
                                  MBV2_TAP_CHANNELS)
    rng = np.random.RandomState(0)
    taps = [jnp.asarray(rng.randn(2, 16 // s, 16 // s, c), jnp.float32)
            for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    cspec = MicroControllerSpec()
    cp = controller_init(jax.random.PRNGKey(1), cspec)
    a1, _, _ = sample(cp, cspec, jax.random.PRNGKey(2))
    a2, _, _ = sample(cp, cspec, jax.random.PRNGKey(3))
    m1 = masks_from_actions(a1, spec)
    m2 = masks_from_actions(a2, spec)
    l1, aux, _ = supernet_apply(spec, params, stats, m1, taps, with_aux=True)
    l2, _, _ = supernet_apply(spec, params, stats, m2, taps)
    assert l1.shape == (2, 16, 16, 5)
    assert len(aux) == spec.num_blocks
    assert np.isfinite(np.asarray(l1)).all()
    assert float(jnp.abs(l1 - l2).max()) > 1e-4  # different archs differ


@pytest.mark.slow
def test_population_trains_and_evals():
    import optax
    spec = SupernetSpec(num_classes=4, agg_size=16)
    opt = optax.sgd(0.05, momentum=0.9)
    k = 3
    pop = population_init(jax.random.PRNGKey(0), spec, MBV2_TAP_CHANNELS,
                          opt, k)
    cspec = MicroControllerSpec()
    cp = controller_init(jax.random.PRNGKey(1), cspec)
    acts = jnp.stack([sample(cp, cspec, jax.random.PRNGKey(i))[0]
                      for i in range(k)])
    masks = jax.vmap(lambda a: masks_from_actions(a, spec))(acts)
    rng = np.random.RandomState(0)
    batch = {
        "taps": [jnp.asarray(rng.randn(2, 16 // s, 16 // s, c), jnp.float32)
                 for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)],
        "label": jnp.asarray(rng.randint(0, 4, size=(2, 64, 64)), jnp.int32),
    }
    step = make_population_train_step(spec, opt)
    losses = []
    for _ in range(5):
        pop, loss = step(pop, masks, batch)
        losses.append(np.asarray(loss))
    losses = np.stack(losses)  # [steps, K]
    assert np.isfinite(losses).all()
    assert (losses[-1] < losses[0]).all()  # every arch in the pop learns

    ev = make_population_eval_step(spec)
    cms = np.asarray(ev(pop[0], pop[1], masks, batch))
    assert cms.shape == (k, 4, 4)
    assert (cms.sum(axis=(1, 2)) == batch["label"].size).all()


@pytest.mark.slow
def test_supernet_search_round(tmp_path):
    cfg = SearchConfig(synthetic=True, num_classes=4, crop_size=(32, 32),
                       batch_size=(4, 4), num_epochs=(1, 0), num_iters=1,
                       ctrl_algo="reinforce", agg_size=16,
                       snapshot_dir=str(tmp_path / "sn"), seed=5)
    saver = run_supernet_search(cfg, population=3)
    assert len(saver.history) == 3
    assert all(r["mode"] == "supernet" for r in saver.history)
    assert all(0.0 <= r["reward"] <= 1.0 for r in saver.history)


@pytest.mark.slow
def test_template_supernet_search_round(tmp_path):
    cfg = SearchConfig(synthetic=True, num_classes=4, crop_size=(32, 32),
                       batch_size=(4, 4), num_epochs=(1, 0), num_iters=1,
                       ctrl_algo="reinforce", ctrl_version="wacv",
                       agg_size=16, snapshot_dir=str(tmp_path / "tsn"),
                       seed=6)
    saver = run_supernet_search(cfg, population=2)
    assert len(saver.history) == 2
    assert all(0.0 <= r["reward"] <= 1.0 for r in saver.history)


def test_template_masks_select_exactly():
    from segtpu.supernet import (template_masks_from_actions,
                                 template_supernet_init,
                                 template_supernet_apply)
    from segtpu.rl.controller import TemplateControllerSpec, \
        template_genotype_from_actions
    cspec = TemplateControllerSpec()
    sspec = SupernetSpec(num_classes=3, agg_size=16)
    cp = controller_init(jax.random.PRNGKey(0), cspec)
    actions, _, _ = sample(cp, cspec, jax.random.PRNGKey(1))
    g = template_genotype_from_actions(actions, cspec)
    m = template_masks_from_actions(actions, sspec)
    for b, (i, j, agg, op) in enumerate(g):
        assert int(jnp.argmax(m["conns"][b][0])) == i
        assert int(jnp.argmax(m["aggs"][b])) == agg
        assert int(jnp.argmax(m["ops"][b])) == op
    params, stats = template_supernet_init(jax.random.PRNGKey(2), sspec,
                                           MBV2_TAP_CHANNELS)
    taps = [jnp.ones((1, 16 // s, 16 // s, c)) for s, c in
            zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    logits, _, _ = template_supernet_apply(sspec, params, stats, m, taps)
    assert logits.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(logits)).all()


def _discrete_params_from_supernet(genotype, s_params, s_stats, spec):
    """Slice the per-op leaves a genotype selects out of the supernet
    param tree into the discrete micro-decoder's param structure. The
    supernet head is concat-EQUIVALENT (one classifier slice per pool
    slot); concatenating the collected slots' slices in collect order
    gives exactly the discrete concat-then-1x1 head weights."""
    from segtpu.models.micro_decoders import _decoder_collect_inds
    cell, conns = genotype
    op0 = cell[0]
    collect = _decoder_collect_inds(conns, spec.num_inputs)

    def map_block(sp, ss):
        bp = {"agg": {"branch1": sp["agg1"], "branch2": sp["agg2"]},
              "cell": {"node0": sp["node0"][op0],
                       "nodes": [{"a": sp["nodes"][n]["a"][o1],
                                  "b": sp["nodes"][n]["b"][o2]}
                                 for n, (_, _, o1, o2) in
                                 enumerate(cell[1:])]}}
        bs = {"agg": {"branch1": ss["agg1"], "branch2": ss["agg2"]},
              "cell": {"node0": ss["node0"][op0],
                       "nodes": [{"a": ss["nodes"][n]["a"][o1],
                                  "b": ss["nodes"][n]["b"][o2]}
                                 for n, (_, _, o1, o2) in
                                 enumerate(cell[1:])]}}
        return bp, bs

    blocks = [map_block(sp, ss) for sp, ss in
              zip(s_params["blocks"], s_stats["blocks"])]
    d_params = {
        "adapt": s_params["adapt"],
        "blocks": [b[0] for b in blocks],
        "clf": {"w": jnp.concatenate(
                    [s_params["clf"]["w"][i] for i in collect],
                    axis=0)[None, None],
                "b": s_params["clf"]["b"]},
    }
    d_stats = {"adapt": s_stats["adapt"], "blocks": [b[1] for b in blocks]}
    return d_params, d_stats


def test_supernet_matches_discrete_forward_on_equal_res_taps():
    """ADVICE r1 (medium): supernet one-hot forward must equal the
    discrete micro-decoder on equal-resolution taps (resolution is the
    only documented deviation; with equal taps, resizes are identity).
    The genotype is chosen so no cell node selects position 0 — the
    exact case where the collect bug leaked x into the cell output."""
    from segtpu.models.micro_decoders import micro_decoder_apply
    spec = SupernetSpec(num_classes=5, agg_size=16)
    # nodes chain 1->2->3; position 0 (x) never re-selected.
    cell = [1, [1, 1, 2, 0], [2, 2, 9, 4], [3, 3, 0, 2]]
    conns = [[0, 1], [2, 3], [1, 2]]  # pool collect = [4, 5, 6]
    genotype = [cell, conns]
    s_params, s_stats = supernet_init(jax.random.PRNGKey(0), spec,
                                      MBV2_TAP_CHANNELS)
    rng = np.random.RandomState(7)
    taps = [jnp.asarray(rng.randn(2, 8, 8, c), jnp.float32)
            for c in MBV2_TAP_CHANNELS]

    cspec = MicroControllerSpec(num_blocks=spec.num_blocks,
                                num_cell_nodes=spec.num_cell_nodes)
    from segtpu.rl.controller import actions_from_genotype
    actions = actions_from_genotype(genotype, cspec)
    masks = masks_from_actions(actions, spec)
    got, _, _ = supernet_apply(spec, s_params, s_stats, masks, taps,
                               train=False)

    d_params, d_stats = _discrete_params_from_supernet(
        genotype, s_params, s_stats, spec)
    want, _, _ = micro_decoder_apply(genotype, d_params, d_stats, taps,
                                     train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_proxy_ranking_degenerate_below_real_in_both_modes():
    """Proxy-fidelity ranking guard (VERDICT r1 next#3): a degenerate
    all-`none` cell (every collected output is zero, so the head sees
    only bias) must rank BELOW a real cell under BOTH the faithful
    per-genotype stage-1 proxy and the supernet population proxy.
    Deterministic companion to the measured K=16 Spearman of 0.66
    (scripts/supernet_fidelity.py --tpu, docs/DESIGN.md)."""
    from segtpu.supernet import measure_proxy_fidelity
    # the strongest genotype from the measured K=16 sweep; 10 epochs —
    # at 4 epochs a real arch has not yet separated from the
    # degenerate's bias-trained constant prediction (~0.04 mIoU both)
    real = [[3, [1, 1, 4, 6], [2, 2, 6, 5], [3, 0, 7, 8]],
            [[0, 0], [1, 0], [3, 4]]]
    degen = [[10, [1, 1, 10, 10], [2, 2, 10, 10], [3, 3, 10, 10]],
             [[0, 1], [2, 3], [1, 2]]]
    cfg = SearchConfig(synthetic=True, num_classes=5, crop_size=(64, 64),
                       batch_size=(8, 8), num_epochs=(10, 0), seed=0)
    rho, r_pg, r_sn, genos = measure_proxy_fidelity(
        cfg, genotypes=[real, degen], seed=0)
    assert r_pg[0] > r_pg[1], (r_pg, "discrete proxy mis-ranks")
    assert r_sn[0] > r_sn[1], (r_sn, "supernet proxy mis-ranks")
    assert rho == 1.0


@pytest.mark.slow
def test_supernet_search_round_mesh_sharded(tmp_path):
    """Full search loop with the K population samples sharded over a
    virtual 4-device 'data' mesh — covers jit(scan(scan(shard_map(
    train_step)))), the composition the round-5 scanned stage-1
    introduced (the dryrun covers the sharded STEP only)."""
    from segtpu.parallel.mesh import make_mesh
    cfg = SearchConfig(synthetic=True, num_classes=4, crop_size=(32, 32),
                       batch_size=(4, 4), num_epochs=(2, 0), num_iters=1,
                       ctrl_algo="reinforce", agg_size=16,
                       snapshot_dir=str(tmp_path / "snm"), seed=7)
    saver = run_supernet_search(cfg, population=4, mesh=make_mesh(4, 1))
    assert len(saver.history) == 4
    assert all(0.0 <= r["reward"] <= 1.0 for r in saver.history)


def test_population_sampling_vmapped_matches_sequential():
    """The round-5 one-dispatch population sampler must be RNG-identical
    to the sequential sample_genotype loop it replaced (same fold_in
    keys, vmapped): actions, logprobs, and entropies all equal."""
    import numpy as np
    from segtpu.rl import controller as ctrl
    from segtpu.rl.agent import create_agent, sample_genotype
    spec = ctrl.MicroControllerSpec(num_blocks=3, num_cell_nodes=3)
    agent = create_agent(jax.random.PRNGKey(11), spec=spec)
    k_loop = jax.random.PRNGKey(42)
    keys = jnp.stack([
        jax.random.fold_in(jax.random.fold_in(k_loop, 0), i)
        for i in range(4)])
    acts_b, lps_b, ents_b = jax.vmap(
        lambda k: ctrl.sample(agent.state.params, spec, k))(keys)
    for i in range(4):
        g, a, lp, ent = sample_genotype(agent, keys[i])
        np.testing.assert_array_equal(np.asarray(a), np.asarray(acts_b[i]))
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lps_b[i]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ent), np.asarray(ents_b[i]),
                                   rtol=1e-6)
        assert g == ctrl.genotype_from_actions(np.asarray(acts_b[i]), spec)
