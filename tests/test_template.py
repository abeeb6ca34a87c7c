"""WACV'20 template decoder family + template controller."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segtpu.models.encoders import MBV2_TAP_CHANNELS
from segtpu.models.micro_decoders import GenotypeError
from segtpu.models.template_decoders import (
    template_decoder_init, template_decoder_apply,
    validate_template_genotype)
from segtpu.models.families import infer_family, get_family
from segtpu.models.segmenter import segmenter_init, segmenter_apply
from segtpu.rl.controller import (
    TemplateControllerSpec, controller_init, sample,
    template_genotype_from_actions)
from segtpu.rl.agent import create_agent, sample_genotype, train_agent

TEMPLATE_G = [[3, 2, 0, 2], [4, 1, 1, 0], [5, 0, 0, 9]]


def _taps(n=1, base=16):
    return [jnp.ones((n, base // st, base // st, c)) for st, c in
            zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]


def test_template_decoder_runs_both_agg_ops():
    p, s = template_decoder_init(jax.random.PRNGKey(0), TEMPLATE_G,
                                 MBV2_TAP_CHANNELS, num_classes=11, aux=True)
    logits, aux, _ = template_decoder_apply(TEMPLATE_G, p, s, _taps(2),
                                            with_aux=True, train=True)
    assert logits.shape[-1] == 11
    assert len(aux) == 3


@pytest.mark.parametrize("bad", [
    [[0, 1, 5, 0]],          # agg out of range
    [[0, 9, 0, 0]],          # index out of range
    [[0, 1, 0]],             # arity
    [],                      # empty
])
def test_template_validation(bad):
    with pytest.raises(GenotypeError):
        validate_template_genotype(bad)


def test_family_inference():
    assert infer_family(TEMPLATE_G).name == "template"
    assert infer_family([[2, [0, 1, 3, 4]], [[3, 2]]]).name == "micro"
    assert get_family("wacv").name == "template"
    assert get_family("cvpr").name == "micro"


def test_segmenter_with_template_family():
    params, stats = segmenter_init(jax.random.PRNGKey(0), TEMPLATE_G,
                                   num_classes=6)
    logits, _, _ = segmenter_apply(TEMPLATE_G, params, stats,
                                   jnp.ones((1, 64, 64, 3)))
    assert logits.shape == (1, 16, 16, 6)


def test_template_controller_samples_valid():
    spec = TemplateControllerSpec()
    assert spec.n_slots == 12
    params = controller_init(jax.random.PRNGKey(0), spec)
    for i in range(20):
        actions, _, _ = sample(params, spec, jax.random.PRNGKey(i))
        g = template_genotype_from_actions(actions, spec)
        validate_template_genotype(g)


def test_template_agent_end_to_end():
    spec = TemplateControllerSpec()
    agent = create_agent(jax.random.PRNGKey(1), spec=spec, algo="reinforce")
    g, actions, logprobs, _ = sample_genotype(agent, jax.random.PRNGKey(2))
    validate_template_genotype(g)
    agent = train_agent(agent, actions, 0.5)
    assert float(agent.state.baseline) > 0
