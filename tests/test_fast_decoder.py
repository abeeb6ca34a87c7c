"""CHW fast decoder == NHWC reference decoder (eval), per-pixel."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segtpu.models.arch_literals import ARCHS
from segtpu.models.encoders import MBV2_TAP_CHANNELS
from segtpu.models.fast_decoder import build_fast_decoder
from segtpu.models.micro_decoders import micro_decoder_init, \
    micro_decoder_apply


@pytest.mark.parametrize("arch", list(ARCHS))
def test_fast_decoder_matches_reference(arch):
    genotype = ARCHS[arch]
    params, stats = micro_decoder_init(jax.random.PRNGKey(0), genotype,
                                       MBV2_TAP_CHANNELS, num_classes=9)
    # non-trivial BN stats so folding is actually exercised
    rng = np.random.RandomState(0)
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.rand(*v.shape).astype(np.float32) + 0.5),
        stats)

    taps = [jnp.asarray(rng.randn(2, 32 // s, 48 // s, c).astype(np.float32))
            for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    want, _, _ = micro_decoder_apply(genotype, params, stats, taps)
    want = np.asarray(want)

    fast = build_fast_decoder(genotype, params, stats, interpret=True)
    got = np.asarray(fast(taps))                    # [B, K, h, w]
    got = np.transpose(got, (0, 2, 3, 1))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_fast_template_decoder_matches_reference():
    from segtpu.models.fast_decoder import build_fast_template_decoder
    from segtpu.models.template_decoders import (
        template_decoder_init, template_decoder_apply)
    genotype = [[3, 2, 0, 2], [4, 1, 1, 4], [5, 0, 0, 9]]
    params, stats = template_decoder_init(jax.random.PRNGKey(2), genotype,
                                          MBV2_TAP_CHANNELS, num_classes=7)
    rng = np.random.RandomState(4)
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.rand(*v.shape).astype(np.float32) + 0.5),
        stats)
    taps = [jnp.asarray(rng.randn(1, 32 // s, 48 // s, c).astype(np.float32))
            for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    want, _, _ = template_decoder_apply(genotype, params, stats, taps)
    fast = build_fast_template_decoder(genotype, params, stats,
                                       interpret=True)
    got = np.transpose(np.asarray(fast(taps)), (0, 2, 3, 1))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-3, atol=1e-4)


def test_fast_decoder_cell_fusion_parity():
    """Whole-cell fusion (kernels.chw_ops.cell_op_chw) engages only at
    lane-aligned grids (w%128==0) — the small-tap parity tests above
    never reach it. Force an eligible grid and assert BOTH that the
    fused kernel actually ran and that it is per-pixel-equal to the
    NHWC reference. (The sep-branch weight-layout bug that reached
    hardware in round 4 lived exactly in this untested gap.)"""
    import segtpu.kernels.chw_ops as chw
    genotype = ARCHS["arch0"]
    params, stats = micro_decoder_init(jax.random.PRNGKey(1), genotype,
                                       MBV2_TAP_CHANNELS, num_classes=5)
    rng = np.random.RandomState(2)
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.rand(*v.shape).astype(np.float32) + 0.5),
        stats)
    # taps at a 64x128 base grid -> cell w = 128 (eligible)
    taps = [jnp.asarray(rng.randn(1, 64 // s, 128 // s, c)
                        .astype(np.float32))
            for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    want, _, _ = micro_decoder_apply(genotype, params, stats, taps)

    calls = []
    orig = chw.cell_op_chw

    def counting(*a, **k):
        out = orig(*a, **k)
        calls.append(out is not None)
        return out

    chw.cell_op_chw = counting
    try:
        fast = build_fast_decoder(genotype, params, stats, interpret=True)
        got = np.asarray(fast(taps))
    finally:
        chw.cell_op_chw = orig
    assert calls and any(calls), "cell fusion never engaged"
    got = np.transpose(got, (0, 2, 3, 1))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-3, atol=1e-4)


def test_fast_decoder_cell_fusion_parity_shift_out_im2col():
    """Same parity check with the shift-the-dot-output im2col A/B path
    forced on (SEGTPU_CELL_ROLL_IM2COL; default off — a measured
    regression on v5e, see chw_ops._CELL_ROLL_IM2COL) so the only
    Mosaic-lowerable im2col form for fused value chains stays tested."""
    import segtpu.kernels.chw_ops as chw
    genotype = ARCHS["arch0"]
    params, stats = micro_decoder_init(jax.random.PRNGKey(1), genotype,
                                       MBV2_TAP_CHANNELS, num_classes=5)
    rng = np.random.RandomState(2)
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.rand(*v.shape).astype(np.float32) + 0.5),
        stats)
    taps = [jnp.asarray(rng.randn(1, 64 // s, 128 // s, c)
                        .astype(np.float32))
            for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    want, _, _ = micro_decoder_apply(genotype, params, stats, taps)
    old = chw._CELL_ROLL_IM2COL
    chw._CELL_ROLL_IM2COL = True
    try:
        fast = build_fast_decoder(genotype, params, stats, interpret=True)
        got = np.asarray(fast(taps))
    finally:
        chw._CELL_ROLL_IM2COL = old
    got = np.transpose(got, (0, 2, 3, 1))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-3, atol=1e-4)


def test_fused_cell_slid_window_bit_exact():
    """The property _fused_cell_sp (the sharded decoder's whole-cell
    fusion, VERDICT r4 next#1) rests on, pinned MESH-FREE: running
    cell_op_chw on a per-shard slid WINDOW — the top shard's window
    starting at true row 0, the bottom shard's ending at the true last
    row, interior shards symmetric — and keeping each shard's own rows
    reproduces the full-tensor fused kernel BIT-EXACTLY. A symmetric
    zero-extended halo does NOT have this property (the kernel
    recomputes intermediate node rows with image-boundary masking at
    its block edges; the two true-boundary rows diverge — the round-4
    slow-tier red). arch2's cell: GAP-free, max source reach e=4."""
    import segtpu.models.fast_decoder as fd
    from segtpu.kernels.chw_ops import cell_entry_ext
    from segtpu.ops.layer_factory import OP_NAMES

    genotype = ARCHS["arch2"]
    cell_config, _ = genotype
    params, stats = micro_decoder_init(jax.random.PRNGKey(0), genotype,
                                       MBV2_TAP_CHANNELS, num_classes=5)
    bp, bs = params["blocks"][2], stats["blocks"][2]
    blk = {
        "node0": fd._Op(OP_NAMES[cell_config[0]], bp["cell"]["node0"],
                        bs["cell"]["node0"], True),
        "nodes": [(fd._Op(OP_NAMES[o1], bp["cell"]["nodes"][k]["a"],
                          bs["cell"]["nodes"][k]["a"], True),
                   fd._Op(OP_NAMES[o2], bp["cell"]["nodes"][k]["b"],
                          bs["cell"]["nodes"][k]["b"], True))
                  for k, (p1, p2, o1, o2) in enumerate(cell_config[1:])],
    }
    collect = fd._cell_collect_inds(cell_config)
    rng = np.random.RandomState(0)
    h, n_sh = 32, 4
    x = jnp.asarray(rng.randn(1, 48, h, 128).astype(np.float32)
                    ).astype(jnp.bfloat16)
    run = jax.jit(lambda b: fd._fused_cell(blk, cell_config, collect,
                                           b, True))
    ref = np.asarray(run(x))
    assert ref.shape == (1, 48, h, 128)

    # derive e exactly as _fused_cell_sp does
    plan = fd._cell_plan(blk, cell_config)
    assert plan is not None
    all_nodes, start = plan
    descs = fd._cell_descs(all_nodes, start, [x], lambda op, t: None)
    e = max(cell_entry_ext(descs, 1)[:1])
    assert e > 0
    h_loc = h // n_sh
    assert 2 * e <= h_loc

    z = jnp.zeros((1, 48, 2 * e, 128), jnp.bfloat16)
    xe = jnp.concatenate([z, x, z], axis=2)   # what ppermute delivers
    got_rows = []
    for i in range(n_sh):
        off_in = 2 * e if i == 0 else (0 if i == n_sh - 1 else e)
        lo = 2 * e + i * h_loc - (2 * e - off_in)
        win = xe[:, :, lo:lo + h_loc + 2 * e]
        out = np.asarray(run(win))
        keep = 2 * e - off_in
        got_rows.append(out[:, :, keep:keep + h_loc])
    got = np.concatenate(got_rows, axis=2)
    np.testing.assert_array_equal(got, ref)

    # negative control: the naive symmetric window diverges at the two
    # true-boundary rows (documents WHY the slid window exists)
    naive = []
    for i in range(n_sh):
        lo = 2 * e + i * h_loc - e
        win = xe[:, :, lo:lo + h_loc + 2 * e]
        naive.append(np.asarray(run(win))[:, :, e:e + h_loc])
    naive = np.concatenate(naive, axis=2)
    d = (naive.astype(np.float64) != ref.astype(np.float64)).sum(
        axis=(0, 1, 3))
    assert d[0] > 0 and d[-1] > 0 and d[1:-1].sum() == 0, d


def test_decoder_shard_plan_static_mirror():
    """decoder_shard_plan (VERDICT r4 next#7: record the scaling
    fraction) shares its per-block predicate with apply_sp
    (_block_shards); pin the plans the slow-tier execution tests
    already establish behaviorally: at 256x512/4 only arch0's block3
    shards (test_arch0_space_sharded_executes_256x512 docstring) and at
    the 1024x2048/8 headline blocks 2-3 shard with >=94% of decoder+head
    pixels in sharded blocks."""
    from segtpu.models.fast_decoder import decoder_shard_plan

    p = decoder_shard_plan(ARCHS["arch0"], (256, 512), 4)
    assert [b["sharded"] for b in p["blocks"]] == [False, False, True]

    p8 = decoder_shard_plan(ARCHS["arch0"], (1024, 2048), 8)
    assert [b["sharded"] for b in p8["blocks"]] == [False, True, True]
    assert p8["sharded_px_fraction"] >= 0.94
    assert p8["blocks"][0]["halo_req"] == 12   # sep5x5_dil6

    # arch2 (max halo 1) shards everywhere at the parity-test shape
    p2 = decoder_shard_plan(ARCHS["arch2"], (64, 512), 2)
    assert all(b["sharded"] for b in p2["blocks"])
    assert p2["sharded_px_fraction"] == 1.0


@pytest.mark.slow
def test_fast_decoder_random_genotype_parity_sweep():
    """Controller-sampled genotype sweep: the fast decoder's structural
    optimizations (round-5 lazy-tap adapt->agg fusion, whole-cell
    fusion, pair-add-in-resize) are GENOTYPE-DEPENDENT — lazy
    eligibility hinges on tap use counts and collect sets, cell fusion
    on op mixes and halo reach. The fixed-arch parity tests pin three
    points of that space; this sweeps K always-valid controller samples
    (deterministic keys) through fast-vs-reference per-pixel parity so
    an eligibility-logic regression on an unusual connection pattern
    cannot hide between the literals."""
    from segtpu.rl.agent import create_agent, sample_genotype
    from segtpu.rl.controller import MicroControllerSpec
    spec = MicroControllerSpec(num_blocks=3, num_cell_nodes=3)
    agent = create_agent(jax.random.PRNGKey(7), spec=spec)
    rng = np.random.RandomState(3)
    taps = [jnp.asarray(rng.randn(2, 32 // s, 48 // s, c)
                        .astype(np.float32))
            for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    for k in range(6):
        g, _, _, _ = sample_genotype(agent, jax.random.PRNGKey(500 + k))
        g = jax.tree_util.tree_map(int, g)
        params, stats = micro_decoder_init(
            jax.random.PRNGKey(k), g, MBV2_TAP_CHANNELS, num_classes=7)
        stats = jax.tree_util.tree_map(
            lambda v: jnp.asarray(
                rng.rand(*v.shape).astype(np.float32) + 0.5), stats)
        want, _, _ = micro_decoder_apply(g, params, stats, taps)
        fast = build_fast_decoder(g, params, stats, interpret=True)
        got = np.transpose(np.asarray(fast(taps)), (0, 2, 3, 1))
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-3,
                                   atol=1e-4, err_msg=str(g))


@pytest.mark.slow
def test_fast_template_decoder_random_genotype_parity_sweep():
    """The WACV template family's counterpart of the sweep above: six
    always-valid template-controller samples through
    build_fast_template_decoder vs the NHWC reference."""
    from segtpu.models.fast_decoder import build_fast_template_decoder
    from segtpu.models.template_decoders import (
        template_decoder_init, template_decoder_apply)
    from segtpu.rl.agent import create_agent, sample_genotype
    from segtpu.rl.controller import TemplateControllerSpec
    spec = TemplateControllerSpec()
    agent = create_agent(jax.random.PRNGKey(8), spec=spec)
    rng = np.random.RandomState(5)
    taps = [jnp.asarray(rng.randn(1, 32 // s, 48 // s, c)
                        .astype(np.float32))
            for s, c in zip((1, 2, 4, 8), MBV2_TAP_CHANNELS)]
    for k in range(6):
        g, _, _, _ = sample_genotype(agent, jax.random.PRNGKey(900 + k))
        g = jax.tree_util.tree_map(int, g)
        params, stats = template_decoder_init(
            jax.random.PRNGKey(k), g, MBV2_TAP_CHANNELS, num_classes=7)
        stats = jax.tree_util.tree_map(
            lambda v: jnp.asarray(
                rng.rand(*v.shape).astype(np.float32) + 0.5), stats)
        want, _, _ = template_decoder_apply(g, params, stats, taps)
        fast = build_fast_template_decoder(g, params, stats,
                                           interpret=True)
        got = np.transpose(np.asarray(fast(taps)), (0, 2, 3, 1))
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-3,
                                   atol=1e-4, err_msg=str(g))
