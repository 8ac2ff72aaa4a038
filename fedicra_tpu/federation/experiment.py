"""Experiment assembly: build model, clients, and server for a federation.

The in-process counterpart of the reference launcher + per-process mains
(flower_runner.py + …_Ours.py main()): one Python process hosts the server
and every client; communication is shared on-device arrays instead of gRPC
state_dict payloads.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax

from ..data.h5io import ClientSplit, load_client_split, make_synthetic_split
from ..engine.config import TASKS, TrainConfig
from ..engine.split_trainer import build_round_fn
from ..engine.trainer import init_client_state
from ..models import net_factory
from ..utils.logging import MetricsWriter
from .ala import make_ala_epoch_fn
from .client import FederatedClient
from .server import FederatedServer
from .strategies import get_strategy


def load_task_splits(
    cfg: TrainConfig,
    data_root: Optional[str],
    limit_per_client: Optional[int] = None,
    synthetic: bool = False,
) -> Dict[int, Dict[str, ClientSplit]]:
    """Per-client train/val splits.

    ``synthetic=True`` is the ONLY way to get generated data; a missing or
    wrong ``data_root`` raises instead of silently substituting synthetic
    splits (a real training run that silently switches datasets produces
    plausible-looking but meaningless metrics — exactly what happened to a
    round-5 north-star relaunch that dropped ``--root_path``)."""
    task = TASKS[cfg.img_class]
    sup_types = task["sup_types"]
    out = {}
    root = os.path.join(data_root, task["root_subdir"]) if data_root else None
    if not synthetic and not (root and os.path.isdir(root)):
        raise FileNotFoundError(
            f"data root for task {cfg.img_class!r} not found "
            f"({root!r}); pass a valid --root_path, or request synthetic "
            f"data EXPLICITLY (--synthetic / synthetic=True)"
        )
    for cid, (client, sup) in enumerate(sup_types.items()):
        if not synthetic:
            print(f"[data] loading {client} ({sup}) from {root}", flush=True)
            train = load_client_split(root, client, "train", sup, limit_per_client)
            val = load_client_split(root, client, "val", "mask", limit_per_client)
            print(f"[data] {client}: train={len(train)} val={len(val)}",
                  flush=True)
        else:
            n = limit_per_client or 24
            train = make_synthetic_split(
                n, cfg.img_size, cfg.img_size, cfg.in_chns, cfg.num_classes,
                seed=cid, sparse=True, sup_type=sup,
            )
            val = make_synthetic_split(
                max(n // 3, 2), cfg.img_size, cfg.img_size, cfg.in_chns,
                cfg.num_classes, seed=100 + cid, sparse=False,
            )
        out[cid] = {"train": train, "val": val}
    return out


def build_experiment(
    cfg: TrainConfig,
    data_root: Optional[str] = None,
    snapshot_dir: Optional[str] = None,
    limit_per_client: Optional[int] = None,
    splits: Optional[Dict[int, Dict[str, ClientSplit]]] = None,
    synthetic: bool = False,
) -> FederatedServer:
    cfg = cfg.validate()
    model = net_factory(
        cfg.model,
        in_chns=cfg.in_chns,
        class_num=cfg.num_classes,
        num_clients=cfg.num_clients,
        client_id=0,
    )
    init_state = init_client_state(model, cfg)
    round_fn = build_round_fn(model, cfg)
    ala_fn = make_ala_epoch_fn(model, cfg) if cfg.fedicra else None

    if splits is None:
        splits = load_task_splits(cfg, data_root, limit_per_client,
                                  synthetic=synthetic)

    # one manager shared by the server (aggregate best, periodic, resume)
    # and the clients (client-side own-best, flower_common.py:106-114)
    ckpt = None
    if snapshot_dir:
        from ..utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(snapshot_dir)

    clients: List[FederatedClient] = []
    for cid in range(cfg.num_clients):
        clients.append(
            FederatedClient(
                cid=cid,
                cfg=cfg,
                model=model,
                train_split=splits[cid]["train"],
                val_split=splits[cid]["val"],
                round_fn=round_fn,
                ala_epoch_fn=ala_fn,
                init_state=init_state,
                ckpt=ckpt,
            )
        )

    initial_payload = {
        "params": init_state.params,
        "batch_stats": init_state.batch_stats,
    }
    strategy = get_strategy(cfg.strategy)
    return FederatedServer(
        cfg=cfg,
        clients=clients,
        strategy=strategy,
        initial_payload=initial_payload,
        snapshot_dir=snapshot_dir,
        writer=MetricsWriter(snapshot_dir),
        central_eval_fn=make_central_eval_fn(model, cfg, splits),
        ckpt=ckpt,
    )


def make_central_eval_fn(model, cfg: TrainConfig, splits):
    """Server-side central evaluation of the aggregated model — the
    reference's get_evaluate_fn over the 'client_all' val loader
    (flower_common.py:139-151), run every eval round by MyServer.fit for
    CENTRALIZED_FL strategies only (:288-301; PERSONALIZED_FL skips it).
    Returns None for personalized strategies."""
    from .strategies import PERSONALIZED_FL

    if cfg.strategy in PERSONALIZED_FL:
        return None
    import numpy as np

    from ..evaluation.evaluate import evaluate_client

    # client_all == the union of every domain's val split (dataset.py:98-171)
    images = np.concatenate([splits[c]["val"].images for c in sorted(splits)])
    labels = np.concatenate([splits[c]["val"].labels for c in sorted(splits)])

    def central_eval(payload):
        m = evaluate_client(
            model,
            payload["params"],
            payload["batch_stats"],
            images,
            labels,
            cfg.num_classes,
            emb_idx=0,
        )
        out = {}
        for k, v in m.items():
            if k.startswith("mean_"):
                out[f"val_mean_{k[5:]}"] = v
            else:  # classN_metric
                cls, name = k.split("_", 1)
                out[f"val_{cls[5:]}_{name}"] = v
        return out

    return central_eval
