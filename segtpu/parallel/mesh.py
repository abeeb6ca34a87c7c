"""Multi-device execution over a jax.sharding.Mesh.

The reference's only parallelism is single-process ``nn.DataParallel``
(SURVEY.md §2#14, §5.8). The TPU-native replacement is SPMD over an ICI
mesh with XLA collectives:

  * ``data`` axis — batch data-parallelism (grad all-reduce + sync-BN
    fall out of jit + shardings automatically);
  * ``space`` axis — spatial partitioning of the activation H dimension,
    the CV analogue of sequence/context parallelism (SURVEY.md §5.7):
    XLA's SPMD partitioner inserts halo exchanges for spatially-sharded
    convolutions, so full-res 2048×1024 CityScapes activations can
    exceed one chip's HBM and still train/infer.

Everything is ``jit`` + ``NamedSharding`` — no hand-written collectives;
XLA lays psum/all-gather/ppermute onto ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from segtpu.engine.trainer import TrainState


def make_mesh(data: int, space: int = 1, *,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, space) mesh. ``devices`` defaults to all devices of
    the default backend; pass ``jax.devices('cpu')`` for the virtual
    8-device CPU mesh used in tests and dry runs."""
    devices = list(devices if devices is not None else jax.devices())
    need = data * space
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def batch_spec() -> P:
    """Images [N, H, W, C]: batch over 'data', H over 'space'."""
    return P("data", "space", None, None)


def label_spec() -> P:
    return P("data", "space", None)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh with dp+sp shardings."""
    img_s = NamedSharding(mesh, batch_spec())
    lab_s = NamedSharding(mesh, label_spec())
    out = dict(batch)
    out["image"] = jax.device_put(batch["image"], img_s)
    if "label" in batch:
        out["label"] = jax.device_put(batch["label"], lab_s)
    return out


def _replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def make_sharded_train_step(step_fn, mesh: Mesh):
    """Wrap a trainer step (built by engine.trainer.make_train_step —
    already jitted) with explicit mesh shardings: state replicated,
    batch dp+sp sharded. Gradients psum over 'data'+'space' and batch
    norm's global reductions become cross-replica collectives — all
    inserted by XLA, nothing hand-written."""
    rep = _replicated(mesh)
    img_s = NamedSharding(mesh, batch_spec())
    lab_s = NamedSharding(mesh, label_spec())

    def place(state: TrainState, batch):
        state = jax.device_put(state, rep)
        b = dict(batch)
        b["image"] = jax.device_put(b["image"], img_s)
        if "label" in b:
            b["label"] = jax.device_put(b["label"], lab_s)
        return state, b

    def sharded_step(state, batch):
        state, batch = place(state, batch)
        with jax.set_mesh(mesh):
            return step_fn(state, batch)

    return sharded_step


def make_sharded_infer_fn(infer_fn, mesh: Mesh, *, mode: str = "data"):
    """Shard the fused uint8->uint8 inference program over the mesh
    (BASELINE config 3 is streaming inference; SURVEY §5.7/§5.8).

    infer_fn: a build_infer_fn result (engine.inference). Input must be
    batched uint8 [N, H, W, 3]; returns uint8 masks [N, H, W].

    mode='data' — per-device batch fan-out via shard_map: every device
      runs the ENTIRE fused program (including the Pallas decoder/tail
      kernels, which XLA's SPMD partitioner cannot split) on its slice
      of the batch. Zero collectives; N must divide by the mesh size.
    mode='space' — activations split along H over 'space' (batch axis
      replicated — this mode exists to fit ONE huge image): jit +
      NamedSharding, XLA inserts the conv halo exchanges. Build infer_fn
      with use_pallas=False here — custom calls are opaque to the SPMD
      partitioner and would force gathers around the decoder. For the
      PRODUCTION Pallas CHW path space-sharded, use
      make_sharded_pallas_infer_fn (manual-SPMD halo exchange).
    """
    from jax import shard_map

    if mode == "data":
        flat = P(("data", "space"))
        mapped = shard_map(
            infer_fn, mesh=mesh,
            in_specs=(P(), P(), P(("data", "space"), None, None, None)),
            out_specs=P(("data", "space"), None, None),
            check_vma=False)
        mapped = jax.jit(mapped)
        n_shards = mesh.size

        def run(params, stats, img_u8):
            assert img_u8.ndim == 4, "sharded inference takes [N,H,W,3]"
            assert img_u8.shape[0] % n_shards == 0, (
                f"batch {img_u8.shape[0]} must divide mesh size {n_shards}")
            params = jax.device_put(params, _replicated(mesh))
            stats = jax.device_put(stats, _replicated(mesh))
            img_u8 = jax.device_put(
                img_u8, NamedSharding(mesh, P(("data", "space"),
                                              None, None, None)))
            return mapped(params, stats, img_u8)

        return run

    if mode == "space":
        rep = _replicated(mesh)
        img_s = NamedSharding(mesh, P(None, "space", None, None))
        # output sharding is inferred (works for uint8 masks [N,H,W] and
        # return_logits [N,H,W,K] alike)
        jitted = jax.jit(infer_fn)

        def run(params, stats, img_u8):
            assert img_u8.ndim == 4, "sharded inference takes [N,H,W,3]"
            params = jax.device_put(params, rep)
            stats = jax.device_put(stats, rep)
            img_u8 = jax.device_put(img_u8, img_s)
            with jax.set_mesh(mesh):
                return jitted(params, stats, img_u8)

        return run

    raise ValueError(f"unknown mode {mode!r} (use 'data' or 'space')")


def make_sharded_pallas_infer_fn(genotype, mesh: Mesh, *, num_classes: int,
                                 input_hw, align_corners: bool = True,
                                 compute_dtype=None,
                                 pallas_interpret: bool = False):
    """Space-shard the PRODUCTION Pallas CHW inference engine over the
    mesh 'space' axis (VERDICT r2 #3: previously only the slower XLA
    path could be space-sharded, because Pallas custom calls are opaque
    to XLA's SPMD partitioner).

    Manual SPMD via shard_map: engine.inference.build_sharded_pallas_infer
    runs the encoder shard-local with explicit ppermute halo exchanges
    (overlap-discard per block), all-gathers the small taps, and each
    shard emits its own H slice of the mask. Bit-exact vs the
    single-device Pallas program (tests/test_parallel.py).

    Returns ``run(params, stats, img_u8)``: uint8 [N, H, W, 3] ->
    uint8 [N, H, W], image H-sharded over 'space', batch replicated.
    """
    import jax.numpy as jnp
    from jax import shard_map
    from segtpu.engine.inference import build_sharded_pallas_infer

    n = mesh.shape["space"]
    local = build_sharded_pallas_infer(
        genotype, num_classes=num_classes, input_hw=input_hw,
        n_shards=n, axis_name="space",
        align_corners=align_corners,
        compute_dtype=compute_dtype or jnp.bfloat16,
        pallas_interpret=pallas_interpret)
    mapped = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(None, "space", None, None)),
        out_specs=P(None, "space", None),
        check_vma=False))
    rep = _replicated(mesh)
    img_s = NamedSharding(mesh, P(None, "space", None, None))

    def run(params, stats, img_u8):
        params = jax.device_put(params, rep)
        stats = jax.device_put(stats, rep)
        img_u8 = jax.device_put(img_u8, img_s)
        return mapped(params, stats, img_u8)

    return run


def shard_population(mesh: Mesh, pop, masks):
    """Place a supernet population (supernet.PopState + its mask pytree)
    with every array leaf's leading K axis sharded over 'data'; 0-d
    leaves (the shared step counter) replicate. K must be divisible by
    the 'data' axis size.

    Placement only — run the placed population through
    make_sharded_population_step / make_sharded_population_eval
    (manual-SPMD shard_map), NOT through the plain jitted step: letting
    the GSPMD partitioner split the K axis of the vmapped supernet
    SILENTLY CORRUPTS the results on jax 0.9.0 — a vmapped 1x1 VALID
    conv whose input AND kernel both carry the sharded vmap dim (a
    batch-grouped conv with both operands partitioned on the group dim)
    computes wrong values (max|diff| ~1.3x the output scale on the CPU
    backend; 3x3 SAME lowers differently and is exact). Minimal repro
    in DESIGN.md 'negative results'.

    Reference scaling story (SURVEY §5.7/§3.1): the upstream searches
    ~1000 archs sequentially per GPU; here one compiled program trains
    the whole population and the mesh multiplies it.
    """
    k_s = NamedSharding(mesh, P("data"))
    rep = _replicated(mesh)
    data = mesh.shape["data"]

    def put(x):
        x = jnp.asarray(x) if not hasattr(x, "ndim") else x
        if x.ndim == 0:
            return jax.device_put(x, rep)
        if x.shape[0] % data:
            raise ValueError(
                f"population {x.shape[0]} not divisible by data={data}")
        return jax.device_put(x, k_s)

    return (jax.tree_util.tree_map(put, pop),
            jax.tree_util.tree_map(put, masks))


def _pop_specs(pop_cls):
    """PopState-shaped PartitionSpec prefix: K-leaved fields over
    'data', the shared step counter replicated."""
    k, r = P("data"), P()
    return pop_cls(params=k, stats=k, opt_state=k, polyak=k, step=r)


def make_sharded_population_step(step_fn, mesh: Mesh):
    """Manual-SPMD population train step: each device runs the vanilla
    vmapped step (make_population_train_step) on its K/data slice —
    zero collectives, and no GSPMD partitioning of the vmapped convs
    (see shard_population: the partitioner corrupts them on jax 0.9.0).
    step_fn(pop, masks, batch) -> (pop, losses [K])."""
    from jax import shard_map
    from segtpu.supernet import PopState
    pspec = _pop_specs(PopState)
    mapped = jax.jit(shard_map(
        step_fn, mesh=mesh,
        in_specs=(pspec, P("data"), P()),
        out_specs=(pspec, P("data")),
        check_vma=False))
    return mapped


def make_sharded_population_eval(eval_fn, mesh: Mesh):
    """Manual-SPMD population eval: eval_fn(params, stats, masks, batch)
    -> per-sample confusion matrices [K, C, C]; K splits over 'data'."""
    from jax import shard_map
    return jax.jit(shard_map(
        eval_fn, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P()),
        out_specs=P("data"),
        check_vma=False))


def make_sharded_eval_step(eval_step, mesh: Mesh):
    """Sharded confusion-matrix eval: per-shard matrices reduce via the
    bincount's global sum (one psum over the mesh)."""
    rep = _replicated(mesh)
    img_s = NamedSharding(mesh, batch_spec())
    lab_s = NamedSharding(mesh, label_spec())

    def sharded(params, stats, batch):
        params = jax.device_put(params, rep)
        stats = jax.device_put(stats, rep)
        b = dict(batch)
        b["image"] = jax.device_put(b["image"], img_s)
        b["label"] = jax.device_put(b["label"], lab_s)
        with jax.set_mesh(mesh):
            return eval_step(params, stats, b)

    return sharded
