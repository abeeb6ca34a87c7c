"""Decoder-family dispatch: CVPR'19 micro-decoder vs WACV'20 template
decoder (reference --ctrl-version cvpr/wacv, SURVEY.md §2#12).

A family bundles (validate, init, apply) with identical signatures so
the segmenter, engine, and search layers stay family-agnostic.
"""

from __future__ import annotations

from typing import NamedTuple, Callable

from segtpu.models import micro_decoders as micro
from segtpu.models import template_decoders as template


class DecoderFamily(NamedTuple):
    name: str
    validate: Callable
    init: Callable
    apply: Callable


MICRO = DecoderFamily("micro", micro.validate_genotype,
                      micro.micro_decoder_init, micro.micro_decoder_apply)


def _template_init(key, genotype, inp_sizes, num_classes, *, agg_size=48,
                   repeats=1, aux=False, aux_cell=False, dtype=None):
    import jax.numpy as jnp
    kw = {"agg_size": agg_size, "repeats": repeats, "aux": aux}
    if dtype is not None:
        kw["dtype"] = dtype
    # template decoders have no private aux cell; aux_cell is accepted
    # for signature parity and ignored (the aux head is a classifier)
    return template.template_decoder_init(key, genotype, inp_sizes,
                                          num_classes, **kw)


TEMPLATE = DecoderFamily("template", template.validate_template_genotype,
                         _template_init, template.template_decoder_apply)

FAMILIES = {"micro": MICRO, "cvpr": MICRO,
            "template": TEMPLATE, "wacv": TEMPLATE}


def get_family(name: str) -> DecoderFamily:
    return FAMILIES[name]


def infer_family(genotype) -> DecoderFamily:
    """Classify a genotype literal by shape: [cell, conns] -> micro,
    [[i,j,agg,op], ...] -> template.

    Disambiguation is structural, not length-based: a micro genotype's
    second element is a list of 2-element [i,j] conn pairs, while every
    top-level entry of a template genotype is a 4-list of ints — so a
    2-block template ([[...4 ints...], [...4 ints...]]) is NOT micro."""
    if (isinstance(genotype, (list, tuple)) and len(genotype) == 2
            and isinstance(genotype[0], (list, tuple))
            and len(genotype[0]) >= 1
            and isinstance(genotype[0][0], int)
            and isinstance(genotype[1], (list, tuple))
            and len(genotype[1]) >= 1
            and all(isinstance(c, (list, tuple)) and len(c) == 2
                    for c in genotype[1])):
        return MICRO
    return TEMPLATE
