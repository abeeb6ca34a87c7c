"""Training engine: losses + jitted train/validate steps.

Reference: src/engine/trainer.py (SURVEY.md §2#8, §3.2) — per-batch
loop: forward -> CE(main) + Σ aux_weight·CE(aux heads) [+ kd_coeff·KD]
-> backward -> per-group grad clip -> SGD. Two-stage proxy training:
stage 1 trains the decoder only against a frozen encoder (optionally
from *cached* encoder features — the CVPR'19 wall-clock trick), stage 2
briefly fine-tunes end-to-end.

TPU-first: each stage is ONE jitted train step (forward+backward+update
+BN-stat update fused into a single XLA program); encoder-feature
caching becomes a jitted eval forward producing a device-resident tap
cache, and the stage-1 step then compiles a graph that contains no
encoder at all.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from segtpu.core.resize import resize_bilinear
from segtpu.models.encoders import mbv2_apply
from segtpu.models.segmenter import segmenter_apply
from segtpu.utils.metrics import confusion_matrix
from segtpu.utils.solvers import polyak_update


class TrainState(NamedTuple):
    params: Any
    stats: Any
    opt_state: Any
    polyak: Optional[Any] = None
    step: Any = 0


def init_train_state(params, stats, optimizer, *, do_polyak: bool = False):
    return TrainState(params, stats, optimizer.init(params),
                      jax.tree_util.tree_map(jnp.copy, params)
                      if do_polyak else None,
                      jnp.asarray(0, jnp.int32))


def eval_params_stats(state: TrainState):
    """The (params, stats) pair to evaluate with.

    Polyak-averaged weights pair with the LIVE BatchNorm running stats —
    a deliberate choice, applied at every eval site through this helper:
    BN running stats are themselves an exponential moving average
    (momentum 0.1, ~10-step time constant), so Polyak-averaging them
    again only adds lag without reducing variance, and PyTorch's
    canonical Polyak/EMA implementations (incl. the reference's
    --do-polyak lineage) average ``parameters()`` while buffers follow
    the live model. Tested in tests/test_train.py.
    """
    params = state.polyak if state.polyak is not None else state.params
    return params, state.stats


def cross_entropy(logits, labels, *, num_classes: int, ignore: int = 255):
    """Mean CE over non-ignored pixels. logits [N,h,w,K] are upsampled to
    the label resolution first (reference: interpolate-then-CE)."""
    if logits.shape[1:3] != labels.shape[1:3]:
        logits = resize_bilinear(logits, labels.shape[1:3],
                                 compute_dtype=jnp.float32)
    logits = logits.astype(jnp.float32)
    valid = (labels >= 0) & (labels < num_classes)
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def kd_loss(student_logits, teacher_logits, *, temperature: float = 1.0):
    """Soft-target distillation KL (reference --do-kd/--kd-coeff;
    mechanism conf:L per SURVEY.md §2#15 — re-verify vs mount)."""
    if student_logits.shape[1:3] != teacher_logits.shape[1:3]:
        student_logits = resize_bilinear(student_logits,
                                         teacher_logits.shape[1:3],
                                         compute_dtype=jnp.float32)
    t = temperature
    p_t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    logp_s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, -1)
    return -jnp.mean(jnp.sum(p_t * logp_s, axis=-1)) * (t * t)


def segmentation_loss(logits, aux_logits, labels, *, num_classes: int,
                      aux_weight: float = 0.3, teacher_logits=None,
                      kd_coeff: float = 0.0):
    loss = cross_entropy(logits, labels, num_classes=num_classes)
    for a in aux_logits:
        loss = loss + aux_weight * cross_entropy(a, labels,
                                                 num_classes=num_classes)
    if teacher_logits is not None and kd_coeff > 0:
        loss = loss + kd_coeff * kd_loss(logits, teacher_logits)
    return loss


def make_train_step(genotype, optimizer, *, num_classes: int,
                    aux_weight: float = 0.3, kd_coeff: float = 0.0,
                    freeze_encoder: bool = False, do_polyak: bool = False,
                    polyak_decay: float = 0.99):
    """Full-model jitted train step.

    batch = {'image': f32 normalized [N,H,W,3], 'label': int32 [N,H,W],
             optional 'teacher': f32 teacher logits}.
    Returns (new_state, loss).
    """

    def loss_fn(params, stats, batch):
        logits, aux, new_stats = segmenter_apply(
            genotype, params, stats, batch["image"], train=True,
            with_aux=True, freeze_encoder=freeze_encoder)
        loss = segmentation_loss(
            logits, aux, batch["label"], num_classes=num_classes,
            aux_weight=aux_weight, teacher_logits=batch.get("teacher"),
            kd_coeff=kd_coeff)
        return loss, new_stats

    @jax.jit
    def step(state: TrainState, batch):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.stats, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        polyak = (polyak_update(state.polyak, params, polyak_decay,
                                step=state.step)
                  if state.polyak is not None else None)
        return TrainState(params, new_stats, opt_state, polyak,
                          state.step + 1), loss

    return step


# ---------------------------------------------------------------------------
# Stage-1 speed trick: cached encoder features (CVPR'19 §3.3)
# ---------------------------------------------------------------------------


def make_encoder_cache_fn():
    """Jitted eval-mode encoder forward: normalized images -> 4 taps.
    Run once over the proxy set; taps stay device-resident."""

    @jax.jit
    def cache(enc_params, enc_stats, images):
        taps, _ = mbv2_apply(enc_params, enc_stats, images, train=False)
        return taps

    return cache


def make_decoder_train_step(genotype, optimizer, *, num_classes: int,
                            aux_weight: float = 0.3, kd_coeff: float = 0.0):
    """Stage-1 step over cached taps — the compiled graph contains only
    the sampled decoder, so per-genotype compile cost is minimal
    (SURVEY.md §7.3 item 4). state.params/stats are decoder-only trees.
    batch = {'taps': tuple of 4 arrays, 'label': ..., optional 'teacher'}."""
    from segtpu.models.families import infer_family
    fam = infer_family(genotype)

    def loss_fn(params, stats, batch):
        logits, aux, new_stats = fam.apply(
            genotype, params, stats, batch["taps"], train=True, with_aux=True)
        loss = segmentation_loss(
            logits, aux, batch["label"], num_classes=num_classes,
            aux_weight=aux_weight, teacher_logits=batch.get("teacher"),
            kd_coeff=kd_coeff)
        return loss, new_stats

    @jax.jit
    def step(state: TrainState, batch):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.stats, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        polyak = (polyak_update(state.polyak, params, step=state.step)
                  if state.polyak is not None else None)
        return TrainState(params, new_stats, opt_state, polyak,
                          state.step + 1), loss

    return step


def make_eval_step(genotype, *, num_classes: int):
    """Jitted validate step: batch -> confusion matrix (device-side);
    accumulate on host or via psum under a mesh (SURVEY.md §5.8)."""

    @jax.jit
    def step(params, stats, batch):
        logits, _, _ = segmenter_apply(genotype, params, stats,
                                       batch["image"], train=False)
        logits = resize_bilinear(logits, batch["label"].shape[1:3],
                                 compute_dtype=jnp.float32)
        pred = jnp.argmax(logits, axis=-1)
        return confusion_matrix(pred, batch["label"], num_classes)

    return step


def validate(eval_step, params, stats, batches, *, num_classes: int):
    """Accumulate mIoU over an iterable of batches (reference:
    trainer.py::validate)."""
    import numpy as np
    from segtpu.utils.metrics import mean_iou
    cm = np.zeros((num_classes, num_classes), np.int64)
    for batch in batches:
        cm += np.asarray(eval_step(params, stats, batch))
    return mean_iou(cm)
