"""Done-criterion check for client-side own-best checkpoints (VERDICT r4 #1).

For every client k of a federated run: run the offline test CLI
(`fedicra_tpu.cli.test`) on the on-disk `best_client_k` checkpoint and
compare its mean Dice against the ONLINE best recorded in
`best_client_k_info.txt` (written by `FederatedClient.evaluate` at that
client's own val_mean_dice peak — reference semantics,
/root/reference/code/flower_common.py:106-114). The two numbers are the
same quantity measured through two code paths (online eval vs offline
test harness incl. the empty-pred fallback dot, test.py:227-234), so they
must agree within eval noise; a mismatch means the checkpoint on disk is
NOT the state that produced the online best (the round-4 defect).

Usage:
  python tools/check_best_clients.py --exp odoc_r5 --snapshot_root runs \
      --img_class odoc --root_path /root/reference/data [--tol 0.02]

Prints a markdown table + PASS/FAIL per client; exits nonzero on FAIL.
Takes the quiesce sentinel (runs 5 TPU inference passes).
"""

from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def online_best(snapshot_dir: str, cid: int):
    """(iter, dice) from best_client_{cid}_info.txt."""
    path = os.path.join(snapshot_dir, f"best_client_{cid}_info.txt")
    it = dice = None
    with open(path) as f:
        for tok in f.read().split():
            if tok.startswith("iter="):
                it = int(tok.split("=")[1])
            elif tok.startswith("dice="):
                dice = float(tok.split("=")[1])
    return it, dice


def offline_mean_dice(csv_path: str, img_class: str) -> float:
    """Mean Dice from mean_std_result.csv, matching online val_mean_dice:
    ODOC = mean(cup, disc); binary tasks = the single dice column."""
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    mean_row = rows[0]  # first row is the mean, second the std
    if img_class == "odoc":
        return 0.5 * (
            float(mean_row["dice_cup"]) + float(mean_row["dice_disc"])
        )
    return float(mean_row["dice"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--snapshot_root", default="runs")
    ap.add_argument("--img_class", default="odoc")
    ap.add_argument("--root_path", default="/root/reference/data")
    ap.add_argument("--model", default="unet_lc_multihead")
    ap.add_argument("--num_clients", type=int, default=None)
    ap.add_argument("--tol", type=float, default=0.02,
                    help="allowed |offline - online| Dice gap (eval noise: "
                    "empty-pred fallback dot + fp reduction order)")
    args = ap.parse_args()

    from fedicra_tpu.engine.config import TASKS

    n = args.num_clients or len(TASKS[args.img_class]["sup_types"])
    snap = os.path.join(args.snapshot_root, args.exp)

    print("| client | online best (iter) | offline test-CLI | delta | verdict |")
    print("|---|---|---|---|---|")
    failed = []
    for cid in range(n):
        it, online = online_best(snap, cid)
        cmd = [
            sys.executable, "-m", "fedicra_tpu.cli.test",
            "--root_path", args.root_path,
            "--img_class", args.img_class,
            "--client", f"client{cid}",
            "--exp", args.exp,
            "--model", args.model,
            "--snapshot_root", args.snapshot_root,
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            print(f"| {cid} | {online:.4f} (@{it}) | CLI FAILED | — | FAIL |")
            failed.append(cid)
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
            continue
        if f"init weight from best_client_{cid}" not in proc.stdout:
            print(f"| {cid} | {online:.4f} (@{it}) | wrong ckpt loaded | — | FAIL |")
            failed.append(cid)
            continue
        csv_path = os.path.join(
            args.snapshot_root, f"{args.exp}_test", f"client{cid}",
            "mean_std_result.csv",
        )
        offline = offline_mean_dice(csv_path, args.img_class)
        delta = offline - online
        ok = abs(delta) <= args.tol
        if not ok:
            failed.append(cid)
        print(f"| {cid} | {online:.4f} (@{it}) | {offline:.4f} "
              f"| {delta:+.4f} | {'PASS' if ok else 'FAIL'} |")
    if failed:
        print(f"FAILED clients: {failed}")
        return 1
    print(f"all {n} clients PASS (tol {args.tol})")
    return 0


if __name__ == "__main__":
    from fedicra_tpu.utils.quiesce import quiesce

    with quiesce():
        raise SystemExit(main())
