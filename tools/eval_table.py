"""Print a markdown eval table from a run's metrics.jsonl.

Usage: python tools/eval_table.py runs/odoc_r5/metrics.jsonl [--every 20]
Columns match the BASELINE.md ODOC tables: weighted Dice / weighted HD95 /
per-client mean Dice.
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics")
    ap.add_argument("--every", type=int, default=20)
    args = ap.parse_args()

    rows = []
    with open(args.metrics) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "val_mean_dice" in r and r.get("step", 0) % args.every == 0:
                rows.append(r)

    print("| iter | weighted Dice | weighted HD95 | per-client Dice (c0..c4) |")
    print("|---|---|---|---|")
    for r in rows:
        cids = sorted(
            int(k.split("_")[1])
            for k in r
            if k.startswith("client_") and k.endswith("_val_mean_dice")
        )
        pc = ", ".join(
            f"{r[f'client_{c}_val_mean_dice']:.3f}" for c in cids
        )
        print(
            f"| {r['step']} | {r['val_mean_dice']:.4f} | "
            f"{r['val_mean_hd95']:.1f} | {pc} |"
        )


if __name__ == "__main__":
    main()
