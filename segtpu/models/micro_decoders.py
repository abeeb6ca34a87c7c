"""NAS micro-decoder: genotype -> pure (init, apply) pair.

Reference: src/nn/micro_decoders.py::MicroDecoder / ContextualCell /
AggregateCell (SURVEY.md §2#3, §3.5). Where the reference materializes an
``nn.Module`` graph from a sampled genotype, we materialize a pair of
pure functions over explicit pytrees — graph construction is plain
Python that runs at trace time, so each genotype compiles to a single
fused XLA program (and distinct genotypes hit a per-genotype compile
cache, SURVEY.md §7.3 item 4).

Genotype schema (CVPR'19 arXiv:1810.10804 §3.1; re-verify the literal
encoding against the reference notebook per SURVEY.md §7.4 item 2):

    genotype = [cell_config, conns]
    cell_config = [op0, [p1, p2, o1, o2], ...]   # node 0 + paired nodes
    conns = [[i, j], ...]                        # one pair per block

* ``conns``: each block merges two entries of a growing feature pool.
  The pool starts with the 4 adapted encoder taps (indices 0..3); each
  block appends its output, so block k samples indices in [0, 4+k).
* ``cell_config``: the contextual cell applied after every merge. Node 0
  applies op ``op0`` to the cell input x. Each later node applies two
  ops to two previous node *outputs* (positions index the list
  [x, node0_out, node1_out, ...]) and sums the two branches. All node
  outputs never consumed by a later node are summed to form the cell
  output (the reference tracks this as ``_collect_inds``).
* Decoder-level: pool entries never consumed by any block are collected,
  bilinearly upsampled to the largest spatial size, concatenated, and
  fed to a 1x1 classifier (logits at 1/4 input resolution).

Auxiliary cells (the CVPR'19 speed trick, SURVEY.md §2#3): in search
mode every block output gets an auxiliary classifier head whose CE loss
is added with ``aux_weight``; optionally a private copy of the
contextual cell precedes the aux classifier (``aux_cell=True``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from segtpu.core.layers import conv_init, conv_bn_init, conv_bn_apply
from segtpu.core.resize import resize_bilinear
from segtpu.ops.layer_factory import OP_NAMES, NUM_OPS, op_init, op_apply

AGG_SIZE = 48  # reference default agg_size (MicroDecoder ctor)


class GenotypeError(ValueError):
    """Invalid sampled architecture — the search loop catches this and
    assigns ~zero reward (reference behavior, SURVEY.md §5.3)."""


def validate_genotype(genotype, num_inputs: int = 4) -> None:
    """Raise GenotypeError unless ``genotype`` is well-formed."""
    try:
        cell_config, conns = genotype
    except (TypeError, ValueError):
        raise GenotypeError(f"genotype must be [cell_config, conns]: {genotype!r}")
    if not isinstance(cell_config, (list, tuple)) or len(cell_config) < 1:
        raise GenotypeError(f"bad cell_config: {cell_config!r}")
    op0 = cell_config[0]
    if not isinstance(op0, int) or not (0 <= op0 < NUM_OPS):
        raise GenotypeError(f"bad first cell op: {op0!r}")
    for k, node in enumerate(cell_config[1:], start=1):
        if not (isinstance(node, (list, tuple)) and len(node) == 4):
            raise GenotypeError(f"cell node {k} must be [p1,p2,o1,o2]: {node!r}")
        p1, p2, o1, o2 = node
        n_pos = k + 1  # [x, node0..node_{k-1}]
        for p in (p1, p2):
            if not isinstance(p, int) or not (0 <= p < n_pos):
                raise GenotypeError(f"cell node {k}: position {p!r} out of [0,{n_pos})")
        for o in (o1, o2):
            if not isinstance(o, int) or not (0 <= o < NUM_OPS):
                raise GenotypeError(f"cell node {k}: op {o!r} out of range")
    if not isinstance(conns, (list, tuple)) or len(conns) < 1:
        raise GenotypeError(f"bad conns: {conns!r}")
    for b, conn in enumerate(conns):
        if not (isinstance(conn, (list, tuple)) and len(conn) == 2):
            raise GenotypeError(f"block {b} conn must be [i,j]: {conn!r}")
        pool = num_inputs + b
        for i in conn:
            if not isinstance(i, int) or not (0 <= i < pool):
                raise GenotypeError(f"block {b}: pool index {i!r} out of [0,{pool})")


def prettify(genotype) -> str:
    """Human-readable genotype (reference: MicroDecoder.prettify)."""
    cell_config, conns = genotype
    names = [x for x in ["x"]]
    lines = [f"cell: node0 = {OP_NAMES[cell_config[0]]}(x)"]
    names.append(f"{OP_NAMES[cell_config[0]]}(x)")
    for k, (p1, p2, o1, o2) in enumerate(cell_config[1:], start=1):
        expr = f"{OP_NAMES[o1]}({names[p1]}) + {OP_NAMES[o2]}({names[p2]})"
        lines.append(f"      node{k} = {expr}")
        names.append(f"n{k}")
    for b, (i, j) in enumerate(conns):
        lines.append(f"block{b}: merge(pool[{i}], pool[{j}]) -> cell")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Contextual cell
# ---------------------------------------------------------------------------


def _cell_collect_inds(cell_config) -> List[int]:
    """Node outputs (incl. x at index 0) never consumed by a later node."""
    n_outputs = len(cell_config) + 1  # x + one output per node
    used = {0}  # x is consumed by node 0
    for p1, p2, _, _ in cell_config[1:]:
        used.add(p1)
        used.add(p2)
    return [i for i in range(n_outputs) if i not in used]


def cell_init(key, cell_config, c: int, *, repeats: int = 1, dtype=jnp.float32):
    keys = jax.random.split(key, 2 * len(cell_config))
    p0, s0 = op_init(OP_NAMES[cell_config[0]], keys[0], c, repeats=repeats, dtype=dtype)
    params: Dict[str, Any] = {"node0": p0}
    stats: Dict[str, Any] = {"node0": s0}
    nodes_p, nodes_s = [], []
    for k, (_, _, o1, o2) in enumerate(cell_config[1:]):
        pa, sa = op_init(OP_NAMES[o1], keys[2 * k + 1], c, repeats=repeats, dtype=dtype)
        pb, sb = op_init(OP_NAMES[o2], keys[2 * k + 2], c, repeats=repeats, dtype=dtype)
        nodes_p.append({"a": pa, "b": pb})
        nodes_s.append({"a": sa, "b": sb})
    params["nodes"] = nodes_p
    stats["nodes"] = nodes_s
    return params, stats


def cell_apply(cell_config, params, stats, x, *, train: bool = False):
    outs = [x]
    y0, ns0 = op_apply(OP_NAMES[cell_config[0]], params["node0"],
                       stats["node0"], x, train=train)
    outs.append(y0)
    new_stats: Dict[str, Any] = {"node0": ns0, "nodes": []}
    for k, (p1, p2, o1, o2) in enumerate(cell_config[1:]):
        ya, nsa = op_apply(OP_NAMES[o1], params["nodes"][k]["a"],
                           stats["nodes"][k]["a"], outs[p1], train=train)
        yb, nsb = op_apply(OP_NAMES[o2], params["nodes"][k]["b"],
                           stats["nodes"][k]["b"], outs[p2], train=train)
        outs.append(ya + yb)
        new_stats["nodes"].append({"a": nsa, "b": nsb})
    out = None
    for i in _cell_collect_inds(cell_config):
        out = outs[i] if out is None else out + outs[i]
    return out, new_stats


# ---------------------------------------------------------------------------
# Aggregate cell: merge two pool entries at possibly different scales
# (reference: micro_decoders.py::AggregateCell, pre_transform=True)
# ---------------------------------------------------------------------------


def agg_init(key, c1: int, c2: int, agg_size: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    p1, s1 = conv_bn_init(k1, 1, 1, c1, agg_size, dtype=dtype)
    p2, s2 = conv_bn_init(k2, 1, 1, c2, agg_size, dtype=dtype)
    return {"branch1": p1, "branch2": p2}, {"branch1": s1, "branch2": s2}


def agg_apply(params, stats, x1, x2, *, align_corners: bool = True,
              train: bool = False):
    y1, ns1 = conv_bn_apply(params["branch1"], stats["branch1"], x1,
                            act="relu", train=train)
    y2, ns2 = conv_bn_apply(params["branch2"], stats["branch2"], x2,
                            act="relu", train=train)
    # upsample the smaller map to the larger one's spatial size
    h = max(y1.shape[-3], y2.shape[-3])
    w = max(y1.shape[-2], y2.shape[-2])
    y1 = resize_bilinear(y1, (h, w), align_corners=align_corners)
    y2 = resize_bilinear(y2, (h, w), align_corners=align_corners)
    return y1 + y2, {"branch1": ns1, "branch2": ns2}


# ---------------------------------------------------------------------------
# Micro-decoder
# ---------------------------------------------------------------------------


def micro_decoder_init(key, genotype, inp_sizes: Sequence[int],
                       num_classes: int, *, agg_size: int = AGG_SIZE,
                       repeats: int = 1, aux: bool = False,
                       aux_cell: bool = False, dtype=jnp.float32):
    """Materialize parameters for ``genotype``.

    inp_sizes: channel widths of the encoder taps (e.g. MBV2_TAP_CHANNELS).
    aux: build per-block auxiliary classifier heads (search mode).
    aux_cell: aux head = private contextual cell + classifier.
    """
    validate_genotype(genotype, num_inputs=len(inp_sizes))
    cell_config, conns = genotype
    keys = jax.random.split(key, len(inp_sizes) + 3 * len(conns) + 1)
    ki = iter(range(len(keys)))

    params: Dict[str, Any] = {"adapt": [], "blocks": [], }
    stats: Dict[str, Any] = {"adapt": [], "blocks": []}
    for c in inp_sizes:
        p, s = conv_bn_init(keys[next(ki)], 1, 1, c, agg_size, dtype=dtype)
        params["adapt"].append(p)
        stats["adapt"].append(s)

    for _ in conns:
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        bp["agg"], bs["agg"] = agg_init(keys[next(ki)], agg_size, agg_size,
                                        agg_size, dtype=dtype)
        bp["cell"], bs["cell"] = cell_init(keys[next(ki)], cell_config,
                                           agg_size, repeats=repeats, dtype=dtype)
        if aux:
            ka = keys[next(ki)]
            ax: Dict[str, Any] = {}
            axs: Dict[str, Any] = {}
            if aux_cell:
                ka, kc = jax.random.split(ka)
                ax["cell"], axs["cell"] = cell_init(kc, cell_config, agg_size,
                                                    repeats=repeats, dtype=dtype)
            ax["clf"] = conv_init(ka, 1, 1, agg_size, num_classes, dtype=dtype)
            ax["clf"]["b"] = jnp.zeros((num_classes,), dtype)
            bp["aux"] = ax
            bs["aux"] = axs
        else:
            next(ki)
        params["blocks"].append(bp)
        stats["blocks"].append(bs)

    n_collect = len(_decoder_collect_inds(conns, len(inp_sizes)))
    kc = keys[next(ki)]
    params["clf"] = conv_init(kc, 1, 1, n_collect * agg_size, num_classes,
                              dtype=dtype)
    params["clf"]["b"] = jnp.zeros((num_classes,), dtype)
    return params, stats


def _decoder_collect_inds(conns, num_inputs: int) -> List[int]:
    used = set()
    for i, j in conns:
        used.add(i)
        used.add(j)
    n_pool = num_inputs + len(conns)
    return [i for i in range(n_pool) if i not in used]


def micro_decoder_apply(genotype, params, stats, taps, *,
                        align_corners: bool = True, train: bool = False,
                        with_aux: bool = False):
    """taps: list of 4 NHWC encoder features -> (logits, aux_list, stats).

    logits are at the resolution of the largest collected feature map
    (1/4 input for the standard taps); the caller (engine) upsamples to
    full resolution — same division of labor as the reference
    (src/engine/inference.py does the final interpolate).
    """
    cell_config, conns = genotype
    new_stats: Dict[str, Any] = {"adapt": [], "blocks": []}
    pool = []
    for x, p, s in zip(taps, params["adapt"], stats["adapt"]):
        y, ns = conv_bn_apply(p, s, x, act="relu", train=train)
        pool.append(y)
        new_stats["adapt"].append(ns)

    aux_outs = []
    for b, (i, j) in enumerate(conns):
        bp, bs = params["blocks"][b], stats["blocks"][b]
        nbs: Dict[str, Any] = {}
        y, nbs["agg"] = agg_apply(bp["agg"], bs["agg"], pool[i], pool[j],
                                  align_corners=align_corners, train=train)
        y, nbs["cell"] = cell_apply(cell_config, bp["cell"], bs["cell"], y,
                                    train=train)
        pool.append(y)
        if with_aux and "aux" in bp:
            ax, axs = bp["aux"], bs["aux"]
            naxs: Dict[str, Any] = {}
            ay = y
            if "cell" in ax:
                ay, naxs["cell"] = cell_apply(cell_config, ax["cell"],
                                              axs["cell"], ay, train=train)
            aux_logits = jax.lax.conv_general_dilated(
                ay, ax["clf"]["w"].astype(ay.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + ax["clf"]["b"].astype(ay.dtype)
            aux_outs.append(aux_logits)
            nbs["aux"] = naxs
        new_stats["blocks"].append(nbs)

    collect = _decoder_collect_inds(conns, len(taps))
    h = max(pool[i].shape[-3] for i in collect)
    w = max(pool[i].shape[-2] for i in collect)
    feats = [resize_bilinear(pool[i], (h, w), align_corners=align_corners)
             for i in collect]
    y = jnp.concatenate(feats, axis=-1)
    logits = jax.lax.conv_general_dilated(
        y, params["clf"]["w"].astype(y.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["clf"]["b"].astype(y.dtype)
    return logits, aux_outs, new_stats
