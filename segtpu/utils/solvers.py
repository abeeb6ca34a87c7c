"""Optimizer construction (reference: src/utils/solvers.py::create_optimisers,
SURVEY.md §2#10): separate SGD groups for encoder and decoder (distinct
lr / momentum / weight-decay), Adam for the controller.

TPU-first: optax transforms over the params pytree; the enc/dec split is
expressed with ``optax.multi_transform`` over the top-level keys, so the
whole update stays one fused jitted step (no per-group Python loops).
"""

from __future__ import annotations

import jax
import optax


def create_optimisers(*, enc_lr: float = 1e-3, dec_lr: float = 3e-3,
                      enc_mom: float = 0.9, dec_mom: float = 0.9,
                      enc_wd: float = 1e-5, dec_wd: float = 0.0,
                      enc_grad_clip: float = 3.0, dec_grad_clip: float = 3.0):
    """One optax GradientTransformation treating {'encoder','decoder'}
    top-level subtrees as independent SGD groups with per-group grad-norm
    clipping (reference: clip_grad_norm_ per enc/dec, SURVEY.md §2#8)."""

    def group(lr, mom, wd, clip):
        return optax.chain(
            optax.clip_by_global_norm(clip),
            optax.add_decayed_weights(wd),
            optax.sgd(lr, momentum=mom),
        )

    labels = lambda params: {k: k for k in params}  # noqa: E731
    return optax.multi_transform(
        {"encoder": group(enc_lr, enc_mom, enc_wd, enc_grad_clip),
         "decoder": group(dec_lr, dec_mom, dec_wd, dec_grad_clip)},
        labels)


def create_ctrl_optimiser(lr: float = 1e-4):
    """Adam for the RL controller (reference: rl/agent.py)."""
    return optax.adam(lr)


def polyak_update(avg_params, params, decay: float = 0.99, step=None):
    """Polyak weight averaging (reference --do-polyak, CVPR'19 §3.4).

    With ``step`` given, the effective decay is
    ``min(decay, step / (step + 1))`` — a true running mean during the
    first 1/(1-decay) steps. Matters for the short proxy trainings of
    the search: a fixed 0.99 decay over ~10 steps would evaluate weights
    that are still ~90% random init."""
    if step is not None:
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        decay = jnp.minimum(decay, step / (step + 1.0))
    return jax.tree_util.tree_map(
        lambda a, p: decay * a + (1.0 - decay) * p, avg_params, params)
