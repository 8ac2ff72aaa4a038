"""Summarize a training run's metrics.jsonl into a Dice-vs-iteration table.

Usage: python tools/summarize_run.py /tmp/odoc_run/odoc_r2/metrics.jsonl

Prints a markdown table (iteration, per-client val_mean_dice, weighted
val_mean_dice, unweighted val_avg_mean_dice, val_mean_hd95) for every eval
row, plus the fit-loss trajectory — the format recorded in BASELINE.md.
"""

import json
import sys


def main(path: str) -> None:
    evals, fits = [], []
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            if any(k.endswith("val_mean_dice") for k in row):
                evals.append(row)
            elif any("total_loss" in k for k in row):
                fits.append(row)

    if fits:
        print("## fit loss (per logged round)\n")
        print("| iter | " + " | ".join(f"c{i} total" for i in range(5)) + " |")
        print("|" + "---|" * 6)
        for r in fits:
            cells = [
                f"{r.get(f'client_{i}_total_loss', float('nan')):.3f}"
                for i in range(5)
            ]
            print(f"| {r.get('step', r.get('round', '?'))} | " + " | ".join(cells) + " |")

    if evals:
        print("\n## eval trajectory\n")
        print(
            "| iter | "
            + " | ".join(f"c{i} dice" for i in range(5))
            + " | weighted dice | mean dice | weighted hd95 |"
        )
        print("|" + "---|" * 9)
        for r in evals:
            it = r.get("step", r.get("round", "?"))
            cells = [
                f"{r.get(f'client_{i}_val_mean_dice', float('nan')):.4f}"
                for i in range(5)
            ]
            print(
                f"| {it} | "
                + " | ".join(cells)
                + f" | {r.get('val_mean_dice', float('nan')):.4f}"
                + f" | {r.get('val_avg_mean_dice', float('nan')):.4f}"
                + f" | {r.get('val_mean_hd95', float('nan')):.2f} |"
            )
    else:
        print("\n(no eval rows yet)")


if __name__ == "__main__":
    main(sys.argv[1])
