"""RL controller: autoregressive LSTM emitting decoder genotypes.

Reference: src/rl/micro_controllers.py::MicroController (SURVEY.md §2#5)
— an LSTM (hidden ≈100) with token embeddings that autoregressively
emits the genotype: the contextual-cell description (first op, then per
node two positions + two ops) followed by per-block connection pairs.
``sample()`` returns (actions, log-probs, entropies); ``evaluate()``
re-scores stored actions for PPO.

TPU-first: the decision sequence has per-slot vocabularies of different
sizes (positions grow as the cell/pool grows). Instead of Python-side
per-slot branching, we precompute a static [n_slots, max_vocab] validity
mask and run ONE ``lax.scan`` over slots with masked categorical
sampling — a single compiled program, vmap-able over a population of
controllers / keys for fleet search.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from segtpu.ops.layer_factory import NUM_OPS


class MicroControllerSpec(NamedTuple):
    """Static description of the decision sequence."""
    num_enc_taps: int = 4
    num_blocks: int = 3      # merge blocks (conns pairs)
    num_cell_nodes: int = 3  # paired nodes after node 0
    num_ops: int = NUM_OPS
    hidden_size: int = 100   # reference --lstm-hidden-size
    emb_size: int = 100      # reference --op-size token embedding dim
    logit_tanh: float = 2.5  # ENAS-style logit squashing (0 = off)

    @property
    def slot_sizes(self) -> List[int]:
        """Vocabulary size per decision slot, in sampling order:
        [op0] + per cell node k: [pos,pos,op,op] + per block: [i, j]."""
        sizes = [self.num_ops]
        for k in range(1, self.num_cell_nodes + 1):
            sizes += [k + 1, k + 1, self.num_ops, self.num_ops]
        for b in range(self.num_blocks):
            sizes += [self.num_enc_taps + b] * 2
        return sizes

    @property
    def n_slots(self) -> int:
        return len(self.slot_sizes)

    @property
    def max_vocab(self) -> int:
        return max(self.slot_sizes)

    def mask(self) -> np.ndarray:
        m = np.zeros((self.n_slots, self.max_vocab), np.bool_)
        for i, s in enumerate(self.slot_sizes):
            m[i, :s] = True
        return m


class TemplateControllerSpec(NamedTuple):
    """WACV'20 template-search decision sequence (reference:
    rl/micro_controllers.py::TemplateController, conf:M; selected by the
    reference's --ctrl-version wacv flag, SURVEY.md §2#12). Per block:
    two pool indices, an aggregation template, a post-op."""
    num_enc_taps: int = 4
    num_blocks: int = 3
    num_agg_ops: int = 2     # AGG_OP_NAMES: psum, cat
    num_ops: int = NUM_OPS
    hidden_size: int = 100
    emb_size: int = 100
    logit_tanh: float = 2.5

    @property
    def slot_sizes(self) -> List[int]:
        sizes: List[int] = []
        for b in range(self.num_blocks):
            pool = self.num_enc_taps + b
            sizes += [pool, pool, self.num_agg_ops, self.num_ops]
        return sizes

    @property
    def n_slots(self) -> int:
        return len(self.slot_sizes)

    @property
    def max_vocab(self) -> int:
        return max(self.slot_sizes)

    def mask(self) -> np.ndarray:
        m = np.zeros((self.n_slots, self.max_vocab), np.bool_)
        for i, s in enumerate(self.slot_sizes):
            m[i, :s] = True
        return m


def template_genotype_from_actions(actions, spec: TemplateControllerSpec):
    """Decode actions -> [[i, j, agg, op], ...] (template genotype)."""
    a = [int(x) for x in np.asarray(actions)]
    assert len(a) == spec.n_slots
    it = iter(a)
    return [[next(it), next(it), next(it), next(it)]
            for _ in range(spec.num_blocks)]


def controller_init(key, spec, dtype=jnp.float32):
    h, e, v = spec.hidden_size, spec.emb_size, spec.max_vocab
    ks = jax.random.split(key, 6)
    u = lambda k, shape, fan: jax.random.uniform(  # noqa: E731
        k, shape, dtype, -1, 1) * math.sqrt(1.0 / fan)
    return {
        # token embeddings (+1 row: the start token)
        "embed": u(ks[0], (v + 1, e), e),
        # slot-type embedding added to the input (disambiguates decisions)
        "slot_embed": u(ks[1], (spec.n_slots, e), e),
        "lstm": {
            "wx": u(ks[2], (e, 4 * h), e),
            "wh": u(ks[3], (h, 4 * h), h),
            "b": jnp.zeros((4 * h,), dtype),
        },
        "head": {"w": u(ks[4], (h, v), h), "b": jnp.zeros((v,), dtype)},
    }


def _lstm_step(p, h, c, x):
    z = x @ p["wx"] + h @ p["wh"] + p["b"]
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _slot_logits(params, spec, h):
    logits = h @ params["head"]["w"] + params["head"]["b"]
    if spec.logit_tanh > 0:
        logits = spec.logit_tanh * jnp.tanh(logits)
    return logits


def _masked_dist(logits, mask):
    logits = jnp.where(mask, logits, -1e9)
    logp = jax.nn.log_softmax(logits)
    p = jnp.exp(logp)
    entropy = -jnp.sum(jnp.where(mask, p * logp, 0.0))
    return logp, entropy


def sample(params, spec: MicroControllerSpec, key):
    """-> (actions [n_slots] i32, logprobs [n_slots], entropies [n_slots])."""
    mask = jnp.asarray(spec.mask())
    keys = jax.random.split(key, spec.n_slots)
    h0 = jnp.zeros((spec.hidden_size,))
    c0 = jnp.zeros((spec.hidden_size,))
    start = params["embed"][spec.max_vocab]

    def body(carry, xs):
        h, c, x = carry
        slot_key, slot_mask, slot_emb = xs
        h, c = _lstm_step(params["lstm"], h, c, x + slot_emb)
        logits = _slot_logits(params, spec, h)
        logp, entropy = _masked_dist(logits, slot_mask)
        a = jax.random.categorical(slot_key, jnp.where(slot_mask, logits, -1e9))
        return ((h, c, params["embed"][a]),
                (a.astype(jnp.int32), logp[a], entropy))

    _, (actions, logprobs, entropies) = jax.lax.scan(
        body, (h0, c0, start), (keys, mask, params["slot_embed"]))
    return actions, logprobs, entropies


def evaluate(params, spec: MicroControllerSpec, actions):
    """Re-score stored actions -> (logprobs, entropies). Used by PPO."""
    mask = jnp.asarray(spec.mask())

    def body(carry, xs):
        h, c, x = carry
        a, slot_mask, slot_emb = xs
        h, c = _lstm_step(params["lstm"], h, c, x + slot_emb)
        logits = _slot_logits(params, spec, h)
        logp, entropy = _masked_dist(logits, slot_mask)
        return ((h, c, params["embed"][a]), (logp[a], entropy))

    h0 = jnp.zeros((spec.hidden_size,))
    c0 = jnp.zeros((spec.hidden_size,))
    start = params["embed"][spec.max_vocab]
    _, (logprobs, entropies) = jax.lax.scan(
        body, (h0, c0, start), (actions, mask, params["slot_embed"]))
    return logprobs, entropies


def genotype_from_actions(actions, spec: MicroControllerSpec):
    """Decode a sampled action vector into [cell_config, conns]."""
    a = [int(x) for x in np.asarray(actions)]
    assert len(a) == spec.n_slots
    it = iter(a)
    cell = [next(it)]
    for _ in range(spec.num_cell_nodes):
        p1, p2, o1, o2 = next(it), next(it), next(it), next(it)
        cell.append([p1, p2, o1, o2])
    conns = [[next(it), next(it)] for _ in range(spec.num_blocks)]
    return [cell, conns]


def actions_from_genotype(genotype, spec: MicroControllerSpec):
    """Inverse of genotype_from_actions: [cell_config, conns] -> action
    vector [n_slots] i32 (same slot order the controller samples in)."""
    cell, conns = genotype
    a: list = [cell[0]]
    for p1, p2, o1, o2 in cell[1:]:
        a.extend([p1, p2, o1, o2])
    for i, j in conns:
        a.extend([i, j])
    assert len(a) == spec.n_slots
    return jnp.asarray(a, jnp.int32)
