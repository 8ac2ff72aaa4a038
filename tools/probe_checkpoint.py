"""Checkpoint probe: per-class probability statistics on validation data.

Diagnoses "Dice = 0" evals: distinguishes a healthy-but-under-confident
model (foreground probabilities rising toward the argmax threshold across
checkpoints) from a collapsed or broken one. Round-3 example (FAZ 'ours',
runs/faz_r3): fg-prob on true-FAZ pixels went 0.36 (iter 10) -> 0.002
(iter 20, gated-CRF collapse to all-background) -> recovery, with Dice
lifting off 0 at iter 40 — see BASELINE.md.

Usage:
  python tools/probe_checkpoint.py --snapshot_root runs/faz_r3 \
      --img_class faz --root_path /root/reference/data --iters 10 20 30
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot_root", required=True,
                    help="run directory holding iter_*_global snapshots")
    ap.add_argument("--img_class", default="faz")
    ap.add_argument("--root_path", default="/root/reference/data")
    ap.add_argument("--client", default="client1")
    ap.add_argument("--iters", type=int, nargs="+", required=True)
    ap.add_argument("--n_images", type=int, default=4)
    ap.add_argument("--model", default="unet_lc_multihead")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from fedicra_tpu.data.h5io import load_client_split
    from fedicra_tpu.engine import TrainConfig, init_client_state
    from fedicra_tpu.engine.config import TASKS
    from fedicra_tpu.models import net_factory
    from fedicra_tpu.utils.checkpoint import CheckpointManager

    cfg = TrainConfig.for_task(
        args.img_class, strategy="FedICRA", procedure="ours", model=args.model
    )
    model = net_factory(
        cfg.model, in_chns=cfg.in_chns, class_num=cfg.num_classes,
        num_clients=cfg.num_clients, client_id=0,
    )
    state = init_client_state(model, cfg)
    template = {"payload": {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
    }}
    cm = CheckpointManager(args.snapshot_root)
    root = os.path.join(args.root_path, TASKS[args.img_class]["root_subdir"])
    val = load_client_split(root, args.client, "val", "mask", args.n_images)
    x = val.images[: args.n_images]

    for it in args.iters:
        pay = cm._restore(f"iter_{it}_global", template)["payload"]
        out = model.apply(
            {"params": pay["params"], "batch_stats": pay["batch_stats"]},
            x, train=False,
        )
        probs = np.asarray(jax.nn.softmax(out["logits"], axis=-1))
        line = [f"iter {it}:"]
        for c in range(1, cfg.num_classes):
            mask = val.labels[: args.n_images] == c
            if not mask.any():
                continue
            p = probs[..., c][mask]
            line.append(
                f"class{c}: p(true-px) mean={p.mean():.4f} "
                f"p95={np.quantile(p, 0.95):.4f} max={p.max():.4f} "
                f"argmax-px={(probs[..., c] > 0.5).sum()}"
            )
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
