"""Encoder + decoder composition.

Reference: the ``Segmenter(encoder, decoder)`` nn.Module assembled in
src/nn/micro_decoders.py / src/main_search.py (SURVEY.md §2#4). Forward
returns logits at 1/4 input resolution; callers upsample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from segtpu.models.encoders import mbv2_init, mbv2_apply, MBV2_TAP_CHANNELS


def segmenter_init(key, genotype, num_classes: int, *, agg_size: int = 48,
                   repeats: int = 1, aux: bool = False, aux_cell: bool = False,
                   family: str = None, dtype=jnp.float32):
    from segtpu.models.families import get_family, infer_family
    fam = get_family(family) if family else infer_family(genotype)
    ke, kd = jax.random.split(key)
    ep, es = mbv2_init(ke, dtype=dtype)
    dp, ds = fam.init(kd, genotype, MBV2_TAP_CHANNELS, num_classes,
                      agg_size=agg_size, repeats=repeats, aux=aux,
                      aux_cell=aux_cell, dtype=dtype)
    return {"encoder": ep, "decoder": dp}, {"encoder": es, "decoder": ds}


def segmenter_apply(genotype, params, stats, x, *, train: bool = False,
                    with_aux: bool = False, align_corners: bool = True,
                    freeze_encoder: bool = False, family: str = None,
                    input_format: str = "nhwc3"):
    """x: [N, H, W, 3] (H, W multiples of 32) -> (logits, aux_list, stats).

    freeze_encoder: run the encoder in eval mode (no BN stat updates) and
    block gradients into it — stage-1 proxy-training semantics
    (reference: the search loop freezes the encoder, SURVEY.md §3.1).
    family: 'micro' (CVPR'19) or 'template' (WACV'20); inferred from the
    genotype shape when omitted.
    """
    from segtpu.models.families import get_family, infer_family
    fam = get_family(family) if family else infer_family(genotype)
    enc_train = train and not freeze_encoder
    taps, enc_stats = mbv2_apply(params["encoder"], stats["encoder"], x,
                                 train=enc_train, input_format=input_format)
    if freeze_encoder:
        taps = [jax.lax.stop_gradient(t) for t in taps]
    logits, aux, dec_stats = fam.apply(
        genotype, params["decoder"], stats["decoder"], taps, train=train,
        with_aux=with_aux, align_corners=align_corners)
    return logits, aux, {"encoder": enc_stats, "decoder": dec_stats}


def create_segmenter(key, genotype, num_classes: int, **kw):
    """Convenience: returns (params, stats, apply_fn) where
    apply_fn(params, stats, x, **kwargs) closes over the genotype."""
    params, stats = segmenter_init(key, genotype, num_classes, **kw)

    def apply_fn(params, stats, x, **kwargs):
        return segmenter_apply(genotype, params, stats, x, **kwargs)

    return params, stats, apply_fn


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
