"""Training CLI: federated procedures + centralized baseline.

Mirrors the reference experiment surface (flower_runner.py composing
per-role commands for flower_pCE_2D.py / …_Ours.py / Unet_pCE.py), collapsed
into a single in-process entry point: the federation runs as one program on
the TPU mesh instead of 6 gRPC-connected GPU processes.

Usage:
  python -m fedicra_tpu.cli.train --img_class odoc --strategy FedICRA \
      --procedure ours --model unet_lc_multihead --exp myrun \
      --root_path /data --max_iterations 30000
  python -m fedicra_tpu.cli.train --centralized --img_class odoc \
      --client client1 --sup_type scribble ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Persistent jit cache: remote-compile runtimes take minutes per program
# signature; without this every process (and every watchdog relaunch)
# recompiles from scratch. Must go through jax.config (utils/jit_cache.py).
from ..utils.jit_cache import enable_persistent_cache

enable_persistent_cache()


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root_path", type=str, default=None,
                   help="data root containing {FAZ_h5,ODOC_h5,...}")
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated synthetic data (EXPLICIT opt-in; "
                        "a missing --root_path is an error otherwise — a run "
                        "silently switching to synthetic data produces "
                        "plausible but meaningless metrics)")
    p.add_argument("--exp", type=str, default="exp")
    p.add_argument("--img_class", type=str, default="odoc",
                   choices=["odoc", "faz", "polyp"])
    p.add_argument("--model", type=str, default="unet_lc_multihead")
    p.add_argument("--procedure", type=str, default="ours",
                   choices=["pce", "treeenergy_add", "ours"])
    p.add_argument("--strategy", type=str, default="FedICRA",
                   choices=["FedICRA", "FedAvg", "FedAdagrad", "FedAdam", "FedYogi"])
    p.add_argument("--max_iterations", type=int, default=30000)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--eval_iters", type=int, default=20)
    p.add_argument("--ckpt_iters", type=int, default=3000,
                   help="periodic-checkpoint cadence in global iterations "
                        "(reference hardcodes 3000)")
    p.add_argument("--resume", action="store_true",
                   help="continue a previous run from the snapshot dir's "
                        "resume checkpoint (saved every --ckpt_iters)")
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--base_lr", type=float, default=0.01)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--rep_iters", type=int, default=3)
    p.add_argument("--tree_loss_weight", type=float, default=0.1)
    p.add_argument("--img_size", type=int, default=None,
                   help="override task default (faz 256 / odoc 384)")
    p.add_argument("--amp", type=int, default=0)
    p.add_argument("--encoder_weights", type=str, default=None,
                   help="efficientnet-pytorch B3 .pth for efficient_unet "
                        "(reference parity: encoder_weights='imagenet')")
    p.add_argument("--seed", type=int, default=2022)
    p.add_argument("--snapshot_root", type=str, default="../model")
    p.add_argument("--limit_per_client", type=int, default=None,
                   help="cap samples per client (debug)")
    # centralized baseline (Unet_pCE.py)
    p.add_argument("--centralized", action="store_true")
    p.add_argument("--client", type=str, default="client1")
    p.add_argument("--sup_type", type=str, default="scribble")
    p.add_argument("--stop_after", type=int, default=None,
                   help="stop after this many global iterations while "
                        "keeping --max_iterations as the poly-LR horizon "
                        "(budgeted runs comparable to the reference schedule)")
    p.add_argument("--sharded", action="store_true",
                   help="run the single-program SPMD federation over the "
                        "(client, data) device mesh instead of the "
                        "reference-parity sequential simulator")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from ..engine.config import TASKS, TrainConfig

    task = TASKS[args.img_class]
    # fail fast, before any model/jit work: a run without data must refuse
    # up front rather than silently training on synthetic splits
    if not args.synthetic:
        _root = (
            os.path.join(args.root_path, task["root_subdir"])
            if args.root_path else None
        )
        if not (_root and os.path.isdir(_root)):
            raise FileNotFoundError(
                f"data root for task {args.img_class!r} not found "
                f"({_root!r}); pass a valid --root_path or request "
                f"synthetic data EXPLICITLY with --synthetic"
            )
    overrides = dict(
        model=args.model,
        procedure=args.procedure,
        strategy=args.strategy,
        max_iterations=args.max_iterations,
        iters=args.iters,
        eval_iters=args.eval_iters,
        ckpt_iters=args.ckpt_iters,
        batch_size=args.batch_size,
        base_lr=args.base_lr,
        alpha=args.alpha,
        rep_iters=args.rep_iters,
        tree_loss_weight=args.tree_loss_weight,
        amp=bool(args.amp),
        seed=args.seed,
        encoder_weights=args.encoder_weights,
    )
    if args.img_size:
        overrides["img_size"] = args.img_size

    snapshot_dir = os.path.join(args.snapshot_root, args.exp)

    if args.centralized:
        cfg = TrainConfig.for_task(
            args.img_class, **{**overrides, "strategy": "FedAvg",
                               "procedure": "pce", "model": args.model}
        )
        from ..data.h5io import load_client_split, make_synthetic_split
        from ..engine.centralized import train_centralized
        from ..models import net_factory

        root = (
            os.path.join(args.root_path, task["root_subdir"])
            if args.root_path
            else None
        )
        if not args.synthetic and not (root and os.path.isdir(root)):
            raise FileNotFoundError(
                f"data root not found ({root!r}); pass a valid --root_path "
                f"or request synthetic data EXPLICITLY with --synthetic"
            )
        if not args.synthetic:
            train = load_client_split(root, args.client, "train", args.sup_type,
                                      args.limit_per_client)
            val = load_client_split(root, args.client, "val", "mask",
                                    args.limit_per_client)
        else:
            n = args.limit_per_client or 24
            train = make_synthetic_split(n, cfg.img_size, cfg.img_size,
                                         cfg.in_chns, cfg.num_classes, seed=0)
            val = make_synthetic_split(max(n // 3, 2), cfg.img_size, cfg.img_size,
                                       cfg.in_chns, cfg.num_classes, seed=1,
                                       sparse=False)
        model = net_factory(cfg.model, in_chns=cfg.in_chns,
                            class_num=cfg.num_classes)
        _, history = train_centralized(
            model, cfg, train, val, snapshot_dir=snapshot_dir
        )
        if history:
            print(json.dumps(history[-1]))
        return

    cfg = TrainConfig.for_task(args.img_class, **overrides)
    if args.sharded:
        from ..federation.sharded_experiment import ShardedFederation

        fed = ShardedFederation(
            cfg,
            data_root=args.root_path,
            snapshot_dir=snapshot_dir,
            limit_per_client=args.limit_per_client,
            synthetic=args.synthetic,
        )
        history = fed.run()
        if history:
            last = {k: v for k, v in history[-1].items() if isinstance(v, float)}
            print(json.dumps({"final": last, "best_dice": fed.best_dice}))
        return

    from ..federation import build_experiment

    server = build_experiment(
        cfg,
        data_root=args.root_path,
        snapshot_dir=snapshot_dir,
        limit_per_client=args.limit_per_client,
        synthetic=args.synthetic,
    )
    if args.resume:
        server.try_resume()
    # cooperative quiesce: when a benchmark/dryrun takes the box, finish the
    # current round, write a resume snapshot, and exit 0 (the watchdog
    # relaunches with --resume after the sentinel clears)
    from ..utils.quiesce import quiesce_requested

    history = server.run(num_rounds=args.stop_after, stop_fn=quiesce_requested)
    if history:
        last = {k: v for k, v in history[-1].items() if isinstance(v, float)}
        print(json.dumps({"final": last, "best_dice": server.best_dice}))


if __name__ == "__main__":
    main()
