"""Policy-gradient agent: REINFORCE-with-EMA-baseline and PPO.

Reference: src/rl/agent.py::create_agent / train_agent (SURVEY.md §2#6).
BASELINE.json names REINFORCE; the CVPR'19 paper used PPO — both exist
in the reference, so both are provided (``algo='reinforce' | 'ppo'``).
Reward is the proxy-training score (geometric mean of the two stage
mIoUs, computed by the search loop); updates are jitted optax/Adam,
compiled once per agent and reused across the whole search.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from segtpu.rl import controller as ctrl
from segtpu.rl.controller import MicroControllerSpec


class AgentState(NamedTuple):
    params: Any
    opt_state: Any
    baseline: jnp.ndarray  # EMA reward baseline


class Agent(NamedTuple):
    spec: MicroControllerSpec
    state: AgentState
    algo: str
    update_fn: Callable  # jitted (state, actions, reward[, old_logprobs])
    batch_update_fn: Callable = None  # fleet: (state, actions[K], rewards[K])


def create_agent(key, *, spec: MicroControllerSpec = MicroControllerSpec(),
                 algo: str = "reinforce", lr: float = 1e-4,
                 baseline_decay: float = 0.95, entropy_coef: float = 1e-4,
                 ppo_epochs: int = 4, ppo_clip: float = 0.2) -> Agent:
    """Reference: create_agent(...); hyperparameter names mirror the
    reference flags (--ctrl-lr, --ctrl-baseline-decay, SURVEY.md §5.6)."""
    assert algo in ("reinforce", "ppo")
    params = ctrl.controller_init(key, spec)
    optimizer = optax.adam(lr)
    state = AgentState(params, optimizer.init(params), jnp.asarray(0.0))

    def reinforce_update(state: AgentState, actions, reward):
        def loss_fn(params):
            logprobs, entropies = ctrl.evaluate(params, spec, actions)
            adv = reward - state.baseline
            pg = -jnp.sum(logprobs) * adv  # baseline is not a grad path
            ent = -entropy_coef * jnp.sum(entropies)
            return pg + ent

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        baseline = (baseline_decay * state.baseline
                    + (1 - baseline_decay) * reward)
        return AgentState(params, opt_state, baseline), loss

    def ppo_update(state: AgentState, actions, reward, old_logprobs):
        adv = reward - state.baseline
        old_sum = jnp.sum(old_logprobs)

        def loss_fn(params):
            logprobs, entropies = ctrl.evaluate(params, spec, actions)
            ratio = jnp.exp(jnp.sum(logprobs) - old_sum)
            clipped = jnp.clip(ratio, 1 - ppo_clip, 1 + ppo_clip)
            pg = -jnp.minimum(ratio * adv, clipped * adv)
            ent = -entropy_coef * jnp.sum(entropies)
            return pg + ent

        def epoch(st, _):
            params, opt_state = st
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            epoch, (state.params, state.opt_state), None, length=ppo_epochs)
        baseline = (baseline_decay * state.baseline
                    + (1 - baseline_decay) * reward)
        return AgentState(params, opt_state, baseline), losses[-1]

    def reinforce_batch_update(state: AgentState, actions, rewards):
        """Population update: K sampled archs, K rewards in one step
        (the fleet path — reference equivalent: sequential train_agent
        calls; one batched update is the variance-reduced form)."""
        def loss_fn(params):
            logprobs, entropies = jax.vmap(
                lambda a: ctrl.evaluate(params, spec, a))(actions)
            adv = rewards - state.baseline
            pg = -jnp.mean(jnp.sum(logprobs, -1) * adv)
            ent = -entropy_coef * jnp.mean(jnp.sum(entropies, -1))
            return pg + ent

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        baseline = (baseline_decay * state.baseline
                    + (1 - baseline_decay) * jnp.mean(rewards))
        return AgentState(params, opt_state, baseline), loss

    def ppo_batch_update(state: AgentState, actions, rewards, old_logprobs):
        adv = rewards - state.baseline
        old_sum = jnp.sum(old_logprobs, -1)

        def loss_fn(params):
            logprobs, entropies = jax.vmap(
                lambda a: ctrl.evaluate(params, spec, a))(actions)
            ratio = jnp.exp(jnp.sum(logprobs, -1) - old_sum)
            clipped = jnp.clip(ratio, 1 - ppo_clip, 1 + ppo_clip)
            pg = -jnp.mean(jnp.minimum(ratio * adv, clipped * adv))
            ent = -entropy_coef * jnp.mean(jnp.sum(entropies, -1))
            return pg + ent

        def epoch(st, _):
            params, opt_state = st
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            epoch, (state.params, state.opt_state), None, length=ppo_epochs)
        baseline = (baseline_decay * state.baseline
                    + (1 - baseline_decay) * jnp.mean(rewards))
        return AgentState(params, opt_state, baseline), losses[-1]

    update_fn = jax.jit(reinforce_update if algo == "reinforce"
                        else ppo_update)
    batch_update_fn = jax.jit(reinforce_batch_update if algo == "reinforce"
                              else ppo_batch_update)
    return Agent(spec, state, algo, update_fn, batch_update_fn)


def sample_genotype(agent: Agent, key):
    """-> (genotype, actions, logprobs, entropies). Decodes micro- or
    template-genotypes depending on the agent's controller spec
    (reference --ctrl-version cvpr/wacv)."""
    actions, logprobs, entropies = ctrl.sample(agent.state.params,
                                               agent.spec, key)
    if isinstance(agent.spec, ctrl.TemplateControllerSpec):
        genotype = ctrl.template_genotype_from_actions(actions, agent.spec)
    else:
        genotype = ctrl.genotype_from_actions(actions, agent.spec)
    return genotype, actions, logprobs, entropies


def train_agent_batch(agent: Agent, actions_batch, rewards, *,
                      old_logprobs_batch=None) -> Agent:
    """Population policy update from K (actions, reward) pairs — the
    fleet-search path (BASELINE.json config 5)."""
    actions_batch = jnp.asarray(actions_batch, jnp.int32)
    rewards = jnp.asarray(rewards, jnp.float32)
    if agent.algo == "reinforce":
        new_state, _ = agent.batch_update_fn(agent.state, actions_batch,
                                             rewards)
    else:
        assert old_logprobs_batch is not None
        new_state, _ = agent.batch_update_fn(agent.state, actions_batch,
                                             rewards,
                                             jnp.asarray(old_logprobs_batch))
    return agent._replace(state=new_state)


def train_agent(agent: Agent, actions, reward, *, old_logprobs=None) -> Agent:
    """One policy update from a scalar reward (reference: train_agent).
    Returns the agent with updated state."""
    reward = jnp.asarray(reward, jnp.float32)
    actions = jnp.asarray(actions, jnp.int32)
    if agent.algo == "reinforce":
        new_state, _ = agent.update_fn(agent.state, actions, reward)
    else:
        assert old_logprobs is not None, "PPO needs the sampling logprobs"
        new_state, _ = agent.update_fn(agent.state, actions, reward,
                                       old_logprobs)
    return agent._replace(state=new_state)
