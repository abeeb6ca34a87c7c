"""CLI entry point (reference: src/main_search.py, SURVEY.md §2#12).

Subcommands: ``search`` (the NAS loop), ``infer`` (fused single-image
inference), ``eval`` (mIoU over a manifest), ``bench``. Flags mirror the
reference's argparse names where they exist; everything maps onto
segtpu.config.SearchConfig.

Usage:
    python -m segtpu.main_search search --synthetic --num-iters 5
    python -m segtpu.main_search infer --arch arch0 --image img.png
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import sys


def _add_search_flags(p: argparse.ArgumentParser):
    from segtpu.config import SearchConfig
    defaults = SearchConfig()
    p.add_argument("--data-root", default=defaults.data_root)
    p.add_argument("--train-list", default=defaults.train_list)
    p.add_argument("--val-list", default=defaults.val_list)
    p.add_argument("--num-classes", type=int, default=defaults.num_classes)
    p.add_argument("--crop-size", type=int, nargs=2,
                   default=list(defaults.crop_size))
    p.add_argument("--shorter-side", type=int, default=None)
    p.add_argument("--meta-train-prct", type=float,
                   default=defaults.meta_train_prct)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batch-size", type=int, nargs=2,
                   default=list(defaults.batch_size))
    p.add_argument("--num-epochs", type=int, nargs=2,
                   default=list(defaults.num_epochs))
    p.add_argument("--enc-lr", type=float, default=defaults.enc_lr)
    p.add_argument("--dec-lr", type=float, default=defaults.dec_lr)
    p.add_argument("--enc-grad-clip", type=float,
                   default=defaults.enc_grad_clip)
    p.add_argument("--dec-grad-clip", type=float,
                   default=defaults.dec_grad_clip)
    p.add_argument("--dec-aux-weight", type=float,
                   default=defaults.dec_aux_weight)
    p.add_argument("--do-kd", action="store_true")
    p.add_argument("--kd-coeff", type=float, default=defaults.kd_coeff)
    p.add_argument("--no-polyak", dest="do_polyak", action="store_false")
    p.add_argument("--no-aux-cell", dest="aux_cell", action="store_false")
    p.add_argument("--agg-size", type=int, default=defaults.agg_size)
    p.add_argument("--sep-repeats", type=int, default=defaults.sep_repeats)
    p.add_argument("--ctrl-version", choices=["cvpr", "wacv"],
                   default=defaults.ctrl_version)
    p.add_argument("--ctrl-algo", choices=["reinforce", "ppo"],
                   default=defaults.ctrl_algo)
    p.add_argument("--ctrl-lr", type=float, default=defaults.ctrl_lr)
    p.add_argument("--ctrl-baseline-decay", type=float,
                   default=defaults.ctrl_baseline_decay)
    p.add_argument("--lstm-hidden-size", type=int,
                   default=defaults.lstm_hidden_size)
    p.add_argument("--op-size", type=int, default=defaults.op_size)
    p.add_argument("--num-iters", type=int, default=defaults.num_iters)
    p.add_argument("--supernet", type=int, default=0, metavar="K",
                   help="vectorized population search: K archs per round "
                        "in one compiled program (segtpu.supernet)")
    p.add_argument("--pop-devices", type=int, default=0, metavar="D",
                   help="with --supernet: shard the K population samples "
                        "over D devices (K %% D == 0; zero step "
                        "collectives — parallel.mesh.shard_population)")
    p.add_argument("--fleet", action="store_true",
                   help="per-device fleet search (one genotype per device)")
    p.add_argument("--seed", type=int, default=defaults.seed)
    p.add_argument("--snapshot-dir", default=defaults.snapshot_dir)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--val-every", type=int, default=defaults.val_every)
    p.add_argument("--enc-ckpt", default=defaults.enc_ckpt)


def _cfg_from_args(args):
    from segtpu.config import SearchConfig
    fields = {f.name for f in dataclasses.fields(SearchConfig)}
    kw = {k: v for k, v in vars(args).items() if k in fields}
    for tup in ("crop_size", "batch_size", "num_epochs"):
        if tup in kw and kw[tup] is not None:
            kw[tup] = tuple(kw[tup])
    return SearchConfig(**kw)


def cmd_search(args):
    cfg = _cfg_from_args(args)
    if getattr(args, "supernet", 0):
        from segtpu.supernet import run_supernet_search
        mesh = None
        if getattr(args, "pop_devices", 0):
            from segtpu.parallel.mesh import make_mesh
            mesh = make_mesh(args.pop_devices, 1)
        saver = run_supernet_search(cfg, population=args.supernet,
                                    mesh=mesh)
    elif getattr(args, "fleet", False):
        from segtpu.parallel.fleet import run_fleet_search
        saver = run_fleet_search(cfg)
    else:
        from segtpu.search import run_search
        saver = run_search(cfg)
    best = saver.best(1)
    if best:
        print(f"best reward {best[0]['reward']:.4f}: {best[0]['genotype']}")


def cmd_infer(args):
    import numpy as np
    import jax
    from segtpu.models import ARCHS
    from segtpu.models.segmenter import segmenter_init
    from segtpu.engine.inference import Segmenter
    from segtpu.data.datasets import _read_image

    genotype = ARCHS[args.arch]
    if args.ckpt:
        from segtpu.convert.torch_import import load_segmenter_checkpoint
        params, stats = load_segmenter_checkpoint(args.ckpt, genotype,
                                                  args.num_classes)
    else:
        params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                       num_classes=args.num_classes)
    seg = Segmenter(genotype, params, stats, num_classes=args.num_classes)
    img = _read_image(args.image)
    mask = seg.predict(img)
    out = args.output or (args.image.rsplit(".", 1)[0] + "_mask.npy")
    np.save(out, mask)
    print(f"wrote {out}: classes {sorted(np.unique(mask).tolist())}")


def cmd_train(args):
    import jax
    from segtpu.data.datasets import (SegmentationDataset, SyntheticDataset,
                                      BatchLoader)
    from segtpu.models import ARCHS
    from segtpu.train import TrainConfig, run_training

    genotype = ARCHS[args.arch] if args.arch in ARCHS else eval(args.arch)
    if args.synthetic or not args.train_list:
        ds = SyntheticDataset(n=32, hw=tuple(args.crop_size),
                              num_classes=args.num_classes)
        val_ds = ds
    else:
        ds = SegmentationDataset(args.data_root, args.train_list)
        val_ds = SegmentationDataset(args.data_root,
                                     args.val_list or args.train_list)
    train_loader = BatchLoader(ds, batch_size=args.batch_size,
                               crop=tuple(args.crop_size), train=True,
                               shorter_side=args.shorter_side)
    val_loader = BatchLoader(val_ds, batch_size=args.batch_size,
                             crop=tuple(args.crop_size), train=False)
    cfg = TrainConfig(num_classes=args.num_classes,
                      crop_size=tuple(args.crop_size),
                      batch_size=args.batch_size,
                      num_epochs=args.num_epochs,
                      enc_lr=args.enc_lr, dec_lr=args.dec_lr,
                      snapshot_dir=args.snapshot_dir,
                      data_parallel=args.data_parallel,
                      val_every=args.val_every)
    best, _ = run_training(genotype, train_loader, val_loader, cfg)
    print(f"best val mIoU: {best:.4f} (checkpoint in {cfg.snapshot_dir})")


def cmd_eval(args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from segtpu.models import ARCHS
    from segtpu.models.segmenter import segmenter_init
    from segtpu.engine.trainer import make_eval_step
    from segtpu.data.datasets import SegmentationDataset, BatchLoader
    from segtpu.utils.metrics import mean_iou, compute_iu

    genotype = ARCHS[args.arch] if args.arch in ARCHS else eval(args.arch)
    if args.ckpt and args.ckpt.endswith(".npz"):
        # segtpu-native checkpoint (run_training best_params.npz)
        from segtpu.train import load_trained
        params, stats = load_trained(args.ckpt, genotype, args.num_classes)
    elif args.ckpt:
        from segtpu.convert.torch_import import load_segmenter_checkpoint
        params, stats = load_segmenter_checkpoint(args.ckpt, genotype,
                                                  args.num_classes)
    else:
        params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                       num_classes=args.num_classes)
    ds = SegmentationDataset(args.data_root, args.val_list)
    loader = BatchLoader(ds, batch_size=args.batch_size,
                         crop=tuple(args.crop_size), train=False)
    ev = make_eval_step(genotype, num_classes=args.num_classes)
    cm = np.zeros((args.num_classes, args.num_classes), np.int64)
    for batch in loader:
        cm += np.asarray(ev(params, stats,
                            {"image": jnp.asarray(batch["image"], jnp.float32),
                             "label": jnp.asarray(batch["label"])}))
    iu = compute_iu(cm)
    print("per-class IoU:", np.round(iu, 4).tolist())
    print(f"mIoU: {mean_iou(cm):.4f}")


def cmd_fidelity(args):
    """Per-pixel logit fidelity vs reference goldens (BASELINE config 2):
    goldens are .npz files with 'image' (uint8 HWC) and 'logits'
    (f32 [H,W,K], the reference's full-res logits for that image)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from segtpu.models import ARCHS
    from segtpu.models.segmenter import segmenter_init
    from segtpu.engine.inference import build_infer_fn

    genotype = ARCHS[args.arch]
    if args.ckpt:
        from segtpu.convert.torch_import import load_segmenter_checkpoint
        params, stats = load_segmenter_checkpoint(args.ckpt, genotype,
                                                  args.num_classes)
    else:
        params, stats = segmenter_init(jax.random.PRNGKey(0), genotype,
                                       num_classes=args.num_classes)
    worst = 0.0
    for path in args.golden:
        g = np.load(path)
        img, want = g["image"], g["logits"]
        fn = jax.jit(build_infer_fn(
            genotype, num_classes=args.num_classes,
            input_hw=img.shape[:2], compute_dtype=jnp.float32,
            return_logits=True))
        got = np.asarray(fn(params, stats, jnp.asarray(img)))
        err = np.abs(got - want).max()
        agree = (got.argmax(-1) == want.argmax(-1)).mean()
        worst = max(worst, float(err))
        print(f"{path}: max|dlogit|={err:.5f} argmax-agreement={agree:.6f}")
    print(f"worst max|dlogit|: {worst:.5f}")
    if args.max_dlogit is not None and worst > args.max_dlogit:
        print(f"FAIL: worst {worst:.5f} > --max-dlogit {args.max_dlogit}")
        raise SystemExit(1)


def cmd_bench(args):
    import os
    os.environ.setdefault("BENCH_ARCH", args.arch)
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import bench
    bench.main()


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    # persistent XLA compile cache: per-genotype / per-shape-bucket
    # programs compile once per MACHINE, not once per process
    from segtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser("segtpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("search", help="run the NAS search loop")
    _add_search_flags(ps)
    ps.set_defaults(fn=cmd_search, do_polyak=True, aux_cell=True)

    pi = sub.add_parser("infer", help="segment one image")
    pi.add_argument("--arch", default="arch0")
    pi.add_argument("--image", required=True)
    pi.add_argument("--num-classes", type=int, default=19)
    pi.add_argument("--ckpt", default="")
    pi.add_argument("--output", default="")
    pi.set_defaults(fn=cmd_infer)

    pt = sub.add_parser("train", help="train a fixed architecture")
    pt.add_argument("--arch", default="arch0",
                    help="arch0/1/2 or a genotype literal")
    pt.add_argument("--data-root", default="")
    pt.add_argument("--train-list", default="")
    pt.add_argument("--val-list", default="")
    pt.add_argument("--synthetic", action="store_true")
    pt.add_argument("--num-classes", type=int, default=21)
    pt.add_argument("--crop-size", type=int, nargs=2, default=[512, 512])
    pt.add_argument("--shorter-side", type=int, default=512)
    pt.add_argument("--batch-size", type=int, default=16)
    pt.add_argument("--num-epochs", type=int, default=100)
    pt.add_argument("--enc-lr", type=float, default=1e-3)
    pt.add_argument("--dec-lr", type=float, default=3e-3)
    pt.add_argument("--val-every", type=int, default=5)
    pt.add_argument("--snapshot-dir", default="snapshots/train")
    pt.add_argument("--data-parallel", action="store_true")
    pt.set_defaults(fn=cmd_train)

    pe = sub.add_parser("eval", help="mIoU over a .lst manifest")
    pe.add_argument("--arch", default="arch0")
    pe.add_argument("--data-root", required=True)
    pe.add_argument("--val-list", required=True)
    pe.add_argument("--num-classes", type=int, default=19)
    pe.add_argument("--batch-size", type=int, default=4)
    pe.add_argument("--crop-size", type=int, nargs=2, default=[512, 512])
    pe.add_argument("--ckpt", default="")
    pe.set_defaults(fn=cmd_eval)

    pb = sub.add_parser("bench", help="headline throughput benchmark")
    pb.add_argument("--arch", default="arch0")
    pb.set_defaults(fn=cmd_bench)

    pf = sub.add_parser("fidelity",
                        help="per-pixel logit check vs golden .npz files")
    pf.add_argument("--arch", default="arch0")
    pf.add_argument("--num-classes", type=int, default=19)
    pf.add_argument("--ckpt", default="")
    pf.add_argument("--golden", nargs="+", required=True)
    pf.add_argument("--max-dlogit", type=float, default=None,
                    help="exit 1 if worst max|dlogit| exceeds this")
    pf.set_defaults(fn=cmd_fidelity)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
