"""Controller + agent: genotype round-trips, logprob bookkeeping,
policy-gradient learning signal (SURVEY.md §4 item 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segtpu.models.micro_decoders import validate_genotype
from segtpu.rl.controller import (
    MicroControllerSpec, controller_init, sample, evaluate,
    genotype_from_actions)
from segtpu.rl.agent import create_agent, sample_genotype, train_agent


SPEC = MicroControllerSpec()


def test_slot_structure():
    # op0 + 3 nodes x (pos,pos,op,op) + 3 blocks x (i,j) = 19 decisions
    assert SPEC.n_slots == 19
    assert SPEC.slot_sizes[0] == 11
    assert SPEC.slot_sizes[1:3] == [2, 2]       # node1 positions: x, n0
    assert SPEC.slot_sizes[-2:] == [6, 6]       # block2 pool: 4 taps + 2
    assert SPEC.max_vocab == 11


def test_sampled_genotypes_are_always_valid():
    params = controller_init(jax.random.PRNGKey(0), SPEC)
    smp = jax.jit(lambda k: sample(params, SPEC, k))
    for i in range(50):
        actions, logprobs, entropies = smp(jax.random.PRNGKey(i))
        g = genotype_from_actions(actions, SPEC)
        validate_genotype(g)  # never raises: masks enforce vocab bounds
        assert np.all(np.isfinite(np.asarray(logprobs)))
        assert np.all(np.asarray(entropies) >= 0)


def test_evaluate_matches_sample_logprobs():
    params = controller_init(jax.random.PRNGKey(1), SPEC)
    actions, logprobs, entropies = sample(params, SPEC, jax.random.PRNGKey(7))
    lp2, ent2 = evaluate(params, SPEC, actions)
    np.testing.assert_allclose(np.asarray(logprobs), np.asarray(lp2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(entropies), np.asarray(ent2),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("algo", ["reinforce", "ppo"])
def test_agent_learns_to_prefer_rewarded_arch(algo):
    agent = create_agent(jax.random.PRNGKey(0), algo=algo, lr=5e-3,
                         entropy_coef=0.0)
    key = jax.random.PRNGKey(3)
    g, actions, logprobs, _ = sample_genotype(agent, key)
    lp_before = float(jnp.sum(evaluate(agent.state.params, SPEC, actions)[0]))
    for _ in range(10):
        agent = train_agent(agent, actions, reward=1.0,
                            old_logprobs=logprobs)
    lp_after = float(jnp.sum(evaluate(agent.state.params, SPEC, actions)[0]))
    assert lp_after > lp_before  # rewarded genotype became more likely
    assert float(agent.state.baseline) > 0.0


def test_reinforce_negative_advantage_decreases_logprob():
    agent = create_agent(jax.random.PRNGKey(0), algo="reinforce", lr=5e-3,
                         entropy_coef=0.0, baseline_decay=0.0)
    # set a high baseline by first training on reward 1
    _, actions, logprobs, _ = sample_genotype(agent, jax.random.PRNGKey(9))
    agent = train_agent(agent, actions, reward=1.0)
    lp0 = float(jnp.sum(evaluate(agent.state.params, SPEC, actions)[0]))
    agent = train_agent(agent, actions, reward=0.0)  # adv = -1
    lp1 = float(jnp.sum(evaluate(agent.state.params, SPEC, actions)[0]))
    assert lp1 < lp0
