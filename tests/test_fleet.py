"""Fleet search across 8 virtual devices + batched agent updates."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segtpu.config import SearchConfig
from segtpu.parallel.fleet import run_fleet_search
from segtpu.rl.agent import create_agent, sample_genotype, train_agent_batch
from segtpu.rl.controller import evaluate


def test_batched_agent_update_moves_toward_best():
    agent = create_agent(jax.random.PRNGKey(0), algo="reinforce", lr=5e-3,
                         entropy_coef=0.0, baseline_decay=0.5)
    sams = [sample_genotype(agent, jax.random.PRNGKey(i)) for i in range(4)]
    actions = jnp.stack([s[1] for s in sams])
    rewards = [1.0, 0.0, 0.0, 0.0]
    lp_win0 = float(jnp.sum(evaluate(agent.state.params, agent.spec,
                                     actions[0])[0]))
    for _ in range(5):
        agent = train_agent_batch(agent, actions, rewards)
    lp_win1 = float(jnp.sum(evaluate(agent.state.params, agent.spec,
                                     actions[0])[0]))
    assert lp_win1 > lp_win0


@pytest.mark.slow
def test_fleet_search_on_virtual_mesh(tmp_path):
    assert jax.device_count() == 8
    cfg = SearchConfig(
        synthetic=True, num_classes=4, crop_size=(32, 32),
        batch_size=(4, 4), num_epochs=(1, 0),  # stage-2 skipped: 0 epochs
        num_iters=1, ctrl_algo="reinforce",
        snapshot_dir=str(tmp_path / "fleet"), do_polyak=False,
        aux_cell=False, seed=3)
    saver = run_fleet_search(cfg, devices=jax.devices()[:4])
    assert len(saver.history) == 4  # one round x 4 devices
    assert all(r["status"] == "ok" for r in saver.history)
    assert all(0.0 <= r["reward"] <= 1.0 for r in saver.history)
