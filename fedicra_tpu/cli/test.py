"""Offline test CLI: per-case CSVs + prediction/GT PNGs from a checkpoint.

Reference parity (/root/reference/code/test.py):
- metrics per case: dice, jaccard, HD95, ASSD, SE (sensitivity == recall),
  SP, Rec, Pre — 8 columns (test.py:120-133); ODOC gets _cup (exact class 1)
  and _disc (union >= 1) column groups;
- empty predictions get a 1-px disk drawn at (192,192) before metric
  computation (test.py:227-234);
- outputs: result.csv (per case), mean_std_result.csv, and pred/gt PNGs
  (x85 grey levels for ODOC, x127 for binary tasks);
- client naming shift reproduced: at test time ``client0`` maps to Domain1
  (test.py:71-80) whereas training's ``client1`` maps to Domain1.

Usage:
  python -m fedicra_tpu.cli.test --root_path ../data --img_class odoc \
      --client client0 --exp myrun --model unet_lc_multihead
"""

from __future__ import annotations

import argparse
import os
import shutil
from typing import Dict, List

from ..utils.jit_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def offline_client_to_train_client(client: str) -> str:
    """test.py's client0..clientN-1 -> training's client1..clientN."""
    if client == "client_all":
        return client
    return f"client{int(client[len('client'):]) + 1}"


def _draw_fallback_dot(pred: np.ndarray) -> np.ndarray:
    """Filled radius-1 disk at (192,192) for empty predictions.

    Matches ``cv2.circle(pred, (192,192), 1, 1, -1)`` (reference
    test.py:227-234): a 5-pixel diamond (center + 4-neighbors), so HD95/ASSD
    on empty predictions agree with reference CSVs.
    """
    if pred.sum() == 0:
        p = pred.astype(np.uint8).copy()
        y, x = 192, 192
        h, w = p.shape[:2]
        for dy, dx in ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)):
            yy, xx = y + dy, x + dx
            if 0 <= yy < h and 0 <= xx < w:
                p[yy, xx] = 1
        return p
    return pred


def case_metrics(pred: np.ndarray, gt: np.ndarray):
    """8 offline metrics (dice, jaccard, HD95, ASSD, SE, SP, Rec, Pre)."""
    import jax.numpy as jnp

    from ..evaluation.metrics import (
        dice as m_dice,
        jaccard as m_jc,
        precision as m_pre,
        recall as m_rec,
        specificity as m_sp,
        surface_distances,
    )

    pred = (pred > 0).astype(np.float32)
    gt = (gt > 0).astype(np.float32)
    if pred.sum() == 0:
        return dict(dice=0.0, jaccard=0.0, HD95=0.0, ASSD=0.0, SE=0.0, SP=0.0,
                    Rec=0.0, Pre=0.0)
    p, g = jnp.asarray(pred), jnp.asarray(gt)
    sd = surface_distances(p, g)
    rec = float(m_rec(p, g))
    return dict(
        dice=float(m_dice(p, g)),
        jaccard=float(m_jc(p, g)),
        HD95=float(sd["hd95"]),
        ASSD=float(sd["assd"]),
        SE=rec,  # medpy sensitivity == recall
        SP=float(m_sp(p, g)),
        Rec=rec,
        Pre=float(m_pre(p, g)),
    )


def run_inference(
    model,
    params,
    batch_stats,
    images: np.ndarray,
    case_names: List[str],
    labels: np.ndarray,
    img_class: str,
    test_save_path: str,
    emb_idx: int = None,
) -> Dict[str, List[float]]:
    import jax.numpy as jnp

    from ..evaluation.evaluate import predict_labels

    os.makedirs(os.path.join(test_save_path, "pre"), exist_ok=True)
    rows: Dict[str, List[float]] = {"name": []}

    try:
        import cv2

        def imwrite(path, arr):
            cv2.imwrite(path, arr)
    except Exception:  # pragma: no cover
        from PIL import Image

        def imwrite(path, arr):
            Image.fromarray(arr.astype(np.uint8)).save(path)

    scale = 85.0 if img_class == "odoc" else 127.0
    for i, case in enumerate(case_names):
        img = jnp.asarray(images[i : i + 1])
        emb = None
        if emb_idx is not None:
            emb = jnp.full((1,), emb_idx, dtype=np.int32)
        pred = np.asarray(
            predict_labels(model, params, batch_stats, img, emb_idx=emb)
        )[0]
        gt = labels[i]
        item = case.split("/")[-1].split(".")[0]
        imwrite(
            os.path.join(test_save_path, "pre", item + "_pred.png"),
            (pred * scale).astype(np.uint8),
        )
        imwrite(
            os.path.join(test_save_path, "pre", item + "_gt.png"),
            (gt * scale).astype(np.uint8),
        )

        pred = _draw_fallback_dot(pred)
        rows["name"].append(case)
        if img_class == "odoc":
            m1 = case_metrics(pred == 1, gt == 1)
            m2 = case_metrics(pred >= 1, gt >= 1)
            for k, v in m1.items():
                rows.setdefault(f"{k}_cup", []).append(v)
            for k, v in m2.items():
                rows.setdefault(f"{k}_disc", []).append(v)
        else:
            m = case_metrics(pred == 1, gt == 1)
            for k, v in m.items():
                rows.setdefault(k, []).append(v)
    return rows


def write_csvs(rows: Dict[str, List[float]], test_save_path: str):
    import pandas as pd

    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(test_save_path, "result.csv"), index=False, sep=",")
    stats = {"name": ["mean", "std"]}
    for k, v in rows.items():
        if k == "name":
            continue
        stats[k] = [float(np.mean(v)), float(np.std(v))]
    pd.DataFrame(stats).to_csv(
        os.path.join(test_save_path, "mean_std_result.csv"), index=False, sep=","
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, required=True)
    p.add_argument("--img_class", type=str, default="odoc",
                   choices=["odoc", "faz", "polyp"])
    p.add_argument("--client", type=str, default="client0")
    p.add_argument("--exp", type=str, required=True)
    p.add_argument("--model", type=str, default="unet_lc_multihead")
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--in_chns", type=int, default=None)
    p.add_argument("--snapshot_root", type=str, default="../model")
    args = p.parse_args(argv)

    from ..data.h5io import load_client_split
    from ..engine.config import TASKS
    from ..models import net_factory
    from ..utils.checkpoint import CheckpointManager

    task = TASKS[args.img_class]
    num_classes = args.num_classes or task["num_classes"]
    in_chns = args.in_chns or task["in_chns"]
    num_clients = len(task["sup_types"])

    root = os.path.join(args.root_path, task["root_subdir"])
    train_client = offline_client_to_train_client(args.client)
    split = load_client_split(root, train_client, "val", "mask")

    model = net_factory(args.model, in_chns=in_chns, class_num=num_classes,
                        num_clients=num_clients)

    snapshot_path = os.path.join(args.snapshot_root, args.exp)
    import jax

    ckpt = CheckpointManager(snapshot_path)
    # template from a fresh init
    import jax.numpy as jnp

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, split.images.shape[1], split.images.shape[2], in_chns)),
        train=False,
    )
    # The reference's test.py loads the PER-CLIENT best model
    # (client_{N}_{model}_best_model.pth, saved for every client at the
    # round the weighted mean dice peaked — flower_common.py:352-365,
    # test.py:264-265). Personalized strategies make this essential: the
    # aggregated global model can be far worse than the client-adapted
    # ones. Fall back to best_global for client_all / centralized runs.
    template = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
    payload = None
    if args.client != "client_all":
        cid = int(args.client[len("client"):])
        state_template = {
            "params": template["params"],
            "batch_stats": template["batch_stats"],
            "current_iter": jnp.zeros((), jnp.int32),
            "rng": jax.random.PRNGKey(0),
        }
        try:
            state = ckpt.restore_best_client(cid, state_template)
            payload = {"params": state["params"],
                       "batch_stats": state["batch_stats"]}
            print(f"init weight from best_client_{cid}")
        except FileNotFoundError:
            pass
    if payload is None:
        payload = ckpt.restore_best_global(template)
        print("init weight from best_global")

    test_save_path = os.path.join(args.snapshot_root, f"{args.exp}_test", args.client)
    if os.path.exists(test_save_path):
        shutil.rmtree(test_save_path)
    os.makedirs(test_save_path)

    emb = None
    if args.model.startswith("unet_lc") and args.client != "client_all":
        emb = int(args.client[len("client"):])
    rows = run_inference(
        model, payload["params"], payload["batch_stats"], split.images,
        split.case_names, split.labels, args.img_class, test_save_path,
        emb_idx=emb,
    )
    write_csvs(rows, test_save_path)
    key = "dice_cup" if args.img_class == "odoc" else "dice"
    print(f"avg dice: {np.mean(rows[key]):.4f}")


if __name__ == "__main__":
    main()
