"""Launcher CLI mirroring the reference flower_runner.py flag surface.

The reference composes per-role shell commands and spawns 1 server + N
client processes, one GPU each (flower_runner.py:96-122, asserting exactly 6
GPUs). Here the same experiment-level flags configure either:

- the default in-process TPU-mesh run (no processes, no sockets), or
- ``--distributed``: 1 server + N client OS processes federated over the TCP
  transport (the reference's execution model), staggered like the reference's
  10s/7s sleeps but via the transport's connection retries.

The per-task supervision tables (odoc/faz/polyp) and the procedure/strategy
asserts match flower_runner.py:57-94.
"""

from __future__ import annotations

import argparse
import os
import sys

from ..utils.jit_cache import enable_persistent_cache

enable_persistent_cache()

PROCEDURE_ALIASES = {
    # reference script names -> our procedure ids
    "flower_pCE_2D": "pce",
    "flower_pCE_MScaleTreeEnergyLoss_ADD": "treeenergy_add",
    "flower_pCE_2D_GateCRFMsacleTreeEnergyLoss_Ours": "ours",
    "pce": "pce",
    "treeenergy_add": "treeenergy_add",
    "ours": "ours",
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--port", type=int, default=9009,
                   help="transport port (distributed mode)")
    p.add_argument("--debug", type=int, default=0,
                   help="print the composed configuration without running")
    p.add_argument("--procedure", type=str, required=True)
    p.add_argument("--exp", type=str, required=True)
    p.add_argument("--gpus", nargs="+", type=int, default=None,
                   help="accepted for flag parity; TPU mesh is used instead")
    p.add_argument("--base_lr", type=float, default=0.01)
    p.add_argument("--model", type=str, default="unet")
    p.add_argument("--img_class", type=str, default="faz")
    p.add_argument("--max_iterations", type=int, default=30000)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--eval_iters", type=int, default=20)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--tree_loss_weight", type=float, default=0.1)
    p.add_argument("--strategy", type=str, default="FedAvg")
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--amp", type=int, default=0)
    p.add_argument("--rep_iters", type=int, default=3)
    p.add_argument("--root_path", type=str, default="../data")
    p.add_argument("--synthetic", action="store_true",
                   help="explicit opt-in to generated data (otherwise a "
                        "missing --root_path is an error)")
    p.add_argument("--distributed", action="store_true",
                   help="run 1 server + N client OS processes over TCP")
    args = p.parse_args(argv)

    assert args.img_class in ["odoc", "faz", "polyp"]
    assert args.procedure in PROCEDURE_ALIASES, (
        f"unknown procedure {args.procedure}"
    )
    procedure = PROCEDURE_ALIASES[args.procedure]

    from ..engine.config import TASKS

    task = TASKS[args.img_class]
    train_args = [
        "--root_path", args.root_path,
        "--img_class", args.img_class,
        "--exp", args.exp,
        "--model", args.model,
        "--procedure", procedure,
        "--strategy", args.strategy,
        "--max_iterations", str(args.max_iterations),
        "--iters", str(args.iters),
        "--eval_iters", str(args.eval_iters),
        "--batch_size", str(args.batch_size),
        "--base_lr", str(args.base_lr),
        "--alpha", str(args.alpha),
        "--rep_iters", str(args.rep_iters),
        "--tree_loss_weight", str(args.tree_loss_weight),
        "--img_size", str(args.img_size),
        "--amp", str(args.amp),
    ]
    if args.synthetic:
        train_args.append("--synthetic")

    if args.debug:
        print("config:", " ".join(train_args))
        print("clients:", task["sup_types"])
        return

    if args.distributed:
        _run_distributed(args, procedure, task)
    else:
        from .train import main as train_main

        train_main(train_args)


def _run_distributed(args, procedure, task):
    """Reference execution model: per-role OS processes over the transport."""
    import multiprocessing as mp

    num_clients = len(task["sup_types"])
    ctx = mp.get_context("spawn")
    procs = []
    server = ctx.Process(
        target=_server_proc, args=(args, procedure, num_clients)
    )
    server.start()
    procs.append(server)
    for cid in range(num_clients):
        c = ctx.Process(target=_client_proc, args=(args, procedure, cid))
        c.start()
        procs.append(c)
    for pr in procs:
        pr.join()


def _build_cfg(args, procedure):
    from ..engine.config import TrainConfig

    return TrainConfig.for_task(
        args.img_class,
        model=args.model,
        procedure=procedure,
        strategy=args.strategy,
        max_iterations=args.max_iterations,
        iters=args.iters,
        eval_iters=args.eval_iters,
        batch_size=args.batch_size,
        base_lr=args.base_lr,
        alpha=args.alpha,
        rep_iters=args.rep_iters,
        tree_loss_weight=args.tree_loss_weight,
        amp=bool(args.amp),
    )


def _server_proc(args, procedure, num_clients):
    from ..engine.config import TASKS
    from ..engine.trainer import init_client_state
    from ..federation.server import FederatedServer
    from ..federation.strategies import get_strategy
    from ..federation.transport import accept_clients
    from ..models import net_factory
    from ..utils.logging import MetricsWriter

    cfg = _build_cfg(args, procedure)
    model = net_factory(cfg.model, in_chns=cfg.in_chns, class_num=cfg.num_classes,
                        num_clients=cfg.num_clients)
    init_state = init_client_state(model, cfg)
    proxies = accept_clients("0.0.0.0", args.port, num_clients)
    snapshot = os.path.join("../model", args.exp)
    server = FederatedServer(
        cfg=cfg,
        clients=proxies,
        strategy=get_strategy(cfg.strategy),
        initial_payload={"params": init_state.params,
                         "batch_stats": init_state.batch_stats},
        snapshot_dir=snapshot,
        writer=MetricsWriter(snapshot),
    )
    server.run()
    for prx in proxies:
        prx.close()


def _client_proc(args, procedure, cid):
    import jax

    from ..engine.split_trainer import build_round_fn
    from ..engine.trainer import init_client_state
    from ..federation.ala import make_ala_epoch_fn
    from ..federation.client import FederatedClient
    from ..federation.experiment import load_task_splits
    from ..federation.transport import serve_client
    from ..models import net_factory

    cfg = _build_cfg(args, procedure)
    model = net_factory(cfg.model, in_chns=cfg.in_chns, class_num=cfg.num_classes,
                        num_clients=cfg.num_clients)
    splits = load_task_splits(cfg, args.root_path, synthetic=args.synthetic)
    # client-side own-best checkpoints land in the shared snapshot dir, like
    # the reference's per-process clients writing to one snapshot_path
    from ..utils.checkpoint import CheckpointManager

    client = FederatedClient(
        cid=cid,
        cfg=cfg,
        model=model,
        train_split=splits[cid]["train"],
        val_split=splits[cid]["val"],
        round_fn=build_round_fn(model, cfg),
        ala_epoch_fn=make_ala_epoch_fn(model, cfg) if cfg.fedicra else None,
        init_state=init_client_state(model, cfg),
        ckpt=CheckpointManager(os.path.join("../model", args.exp)),
    )
    serve_client(client, "127.0.0.1", args.port)


if __name__ == "__main__":
    main()
