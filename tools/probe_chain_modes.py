"""Host-chain bimodality probe (VERDICT r4 weak #7).

The packed native tree chain's standalone time on this box swings between a
~2.0 s fast mode and a ~4.3 s slow mode with no code difference — the
largest error bar on every headline bench number. This probe runs the
EXACT production chain call (multi_scale_tree_loss_host_npacked on a
bs12/384^2 native-packed wire array, warm low-tree cache) in a long loop
and records, per repetition:

  - wall seconds of the chain call
  - /proc/stat deltas over the call: user/nice/system/idle/iowait/irq/
    softirq/STEAL jiffies (steal is the KVM noisy-neighbor signature)
  - /proc/cpuinfo MHz before the call (frequency-scaling signature)
  - 1-min loadavg

so the slow mode can be attributed to (a) hypervisor steal, (b) cpufreq,
(c) kernel/system time (memory reclaim), or (d) none of the above (i.e.
genuinely data/allocator-dependent — would need perf, not available here).

Run on an otherwise-idle box (the chain owns the single core); takes the
quiesce sentinel. Writes JSONL to --out and prints a mode summary.
"""

import argparse
import json
import os
import statistics
import time

import numpy as np


def read_proc_stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    names = ("user", "nice", "system", "idle", "iowait", "irq", "softirq",
             "steal")
    return {n: int(v) for n, v in zip(names, parts[1:9])}


def read_mhz():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("cpu MHz"):
                    return float(line.split(":")[1])
    except OSError:
        pass
    return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=120)
    ap.add_argument("--img", type=int, default=384)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--out", type=str, default="/tmp/chain_modes.jsonl")
    args = ap.parse_args()

    import jax

    from fedicra_tpu.engine import TrainConfig, init_client_state
    from fedicra_tpu.engine.split_trainer import make_split_round_fn
    from fedicra_tpu.losses.tree_energy_host import (
        low_tree_cache_stats,
        multi_scale_tree_loss_host_npacked,
    )
    from fedicra_tpu.models import net_factory

    cfg = TrainConfig.for_task(
        "odoc", img_size=args.img, batch_size=args.batch, iters=1,
        rep_iters=1, strategy="FedICRA", procedure="ours",
        model="unet_lc_multihead",
    )
    model = net_factory(cfg.model, in_chns=cfg.in_chns,
                        class_num=cfg.num_classes,
                        num_clients=cfg.num_clients, client_id=0)
    state = init_client_state(model, cfg)
    parts = make_split_round_fn(model, cfg).parts
    partF, ship_shapes = parts["partF"], parts["ship_shapes"]
    if parts["ship_mode"] != "native":
        raise SystemExit("set FEDICRA_AUX_SHIP=native (production wire mode)")

    # trace only (no device execution): fills ship_shapes with the
    # decoder-native block resolutions the packed wire uses
    rng = np.random.default_rng(0)
    img_np = rng.uniform(
        size=(args.batch, args.img, args.img, cfg.in_chns)
    ).astype(np.float32)
    lab_np = rng.integers(
        0, cfg.num_classes + 1, size=(args.batch, args.img, args.img)
    ).astype(np.int32)
    k = jax.random.PRNGKey(0)
    jax.eval_shape(
        partF, state.params, state.batch_stats, k,
        {"image": img_np, "label": lab_np}, np.int32(1),
    )
    assert ship_shapes, "eval_shape did not fill ship_shapes"

    C = cfg.num_classes
    L = C * sum(h * w for h, w in ship_shapes)
    # softmax-looking probs block, small-magnitude aux blocks, bf16 wire rows
    import ml_dtypes

    wire = rng.uniform(0.0, 1.0, size=(args.batch, L)).astype(np.float32)
    wire = wire.astype(ml_dtypes.bfloat16)
    rois = (lab_np == cfg.num_classes).astype(np.float32)
    n_roi = float(rois.sum())

    def chain():
        return multi_scale_tree_loss_host_npacked(
            wire, img_np, rois, cfg.tree_loss_weight, list(ship_shapes),
            recursive=True, roi_total=n_roi,
        )

    chain()  # warm: build + cache the low-tree structures
    cs0 = low_tree_cache_stats()

    walls = []
    with open(args.out, "w") as f:
        for i in range(args.reps):
            mhz = read_mhz()
            s0 = read_proc_stat()
            t0 = time.perf_counter()
            chain()
            w = time.perf_counter() - t0
            s1 = read_proc_stat()
            rec = {
                "rep": i,
                "wall": round(w, 4),
                "mhz": mhz,
                "load1": round(os.getloadavg()[0], 2),
                **{f"d_{k}": s1[k] - s0[k] for k in s0},
            }
            f.write(json.dumps(rec) + "\n")
            walls.append(w)

    walls_s = sorted(walls)
    fast = [w for w in walls if w < statistics.median(walls_s) * 1.3]
    slow = [w for w in walls if w >= statistics.median(walls_s) * 1.3]
    print(json.dumps({
        "reps": args.reps,
        "min": round(walls_s[0], 3),
        "p50": round(statistics.median(walls_s), 3),
        "p90": round(walls_s[int(0.9 * len(walls_s))], 3),
        "max": round(walls_s[-1], 3),
        "n_fast": len(fast),
        "n_slow": len(slow),
        "cache": {**low_tree_cache_stats(), "warm_start": cs0},
        "out": args.out,
    }))


if __name__ == "__main__":
    from fedicra_tpu.utils.quiesce import quiesce

    with quiesce():
        main()
