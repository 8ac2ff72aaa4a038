"""Measure the epoch-tail wrap deviation (PARITY #9 / VERDICT r3 item 9).

The reference's torch DataLoader (drop_last=False) ends each epoch with a
SHORT batch; our static-shape batcher pads the tail by wrapping the epoch
permutation. This tool trains three matched runs of the full 'ours'
objective on synthetic data whose N % batch_size != 0 (so every epoch has a
tail) and quantifies how much the wrap changes the trajectory, against the
scale of ordinary trajectory sensitivity:

  A: wrap-padded tail (production batcher), training rng r0
  B: true short tail (torch semantics; the padded tail batch sliced to its
     valid prefix — identical samples and augmentations otherwise)
  C: wrap-padded tail, training rng r1  (control: dropout-noise scale)

Reported: per-iteration |loss_A - loss_B| vs |loss_A - loss_C|, final
parameter L2 relative distances, and val Dice of each run. If
d(A,B) ~ d(A,C), the wrap deviation is within ordinary trajectory noise.

Caveats (recorded, not hidden): runs use iters=1 rounds so the short batch
can compile per-shape — the per-round AdamW reset therefore happens every
iteration (both variants identically), unlike production's per-10. The
contrast/ALA terms are off (FedAvg, single phase); CE, tree, CRF and the
BatchNorm batch statistics — every batch-composition-sensitive piece of the
objective — are live.

Usage: python tools/measure_tail_deviation.py [--iters 45] [--size 48]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fedicra_tpu.data import EpochBatcher, make_synthetic_split
from fedicra_tpu.engine import TrainConfig, init_client_state
from fedicra_tpu.engine.trainer import make_round_fn
from fedicra_tpu.evaluation.evaluate import evaluate_client
from fedicra_tpu.models import net_factory


def run_variant(model, cfg, state0, batcher, n_iters, short_tail, rng_seed):
    """Train n_iters single-step rounds; returns (losses, final_state)."""
    round_fn = jax.jit(make_round_fn(model, cfg))
    state = state0._replace(rng=jax.random.PRNGKey(rng_seed))
    n_valid = batcher.n - (batcher.num_batches - 1) * batcher.batch_size
    losses = []
    for it in range(n_iters):
        b = batcher.batch_at(it)
        if short_tail and (it % batcher.num_batches) == batcher.num_batches - 1:
            b = {k: v[:n_valid] for k, v in b.items()}
        batches = {k: v[None] for k, v in b.items()}
        state, m = round_fn(state, batches, jnp.int32(0))
        losses.append(float(np.asarray(m["total_loss"])[-1]))
    return np.asarray(losses), state


def param_rel_dist(a, b):
    num = sum(
        float(jnp.sum((x - y) ** 2))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )
    den = sum(float(jnp.sum(x**2)) for x in jax.tree.leaves(a))
    return (num / max(den, 1e-30)) ** 0.5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=45)
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--n_train", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=4)
    args = ap.parse_args()

    cfg = TrainConfig.for_task(
        "odoc",
        img_size=args.size,
        batch_size=args.batch_size,
        iters=1,
        rep_iters=0,
        eval_iters=1000,
        max_iterations=30000,
        strategy="FedAvg",
        procedure="ours",
        model="unet_lc_multihead",
    )
    model = net_factory(
        cfg.model, in_chns=cfg.in_chns, class_num=cfg.num_classes,
        num_clients=cfg.num_clients,
    )
    state0 = init_client_state(model, cfg)
    split = make_synthetic_split(
        args.n_train, args.size, args.size, cfg.in_chns, cfg.num_classes,
        seed=1,
    )
    assert args.n_train % args.batch_size != 0, "need a partial tail batch"
    val = make_synthetic_split(
        6, args.size, args.size, cfg.in_chns, cfg.num_classes, seed=2
    )

    def fresh_batcher():
        return EpochBatcher(
            split, cfg.batch_size, cfg.num_classes, "odoc", seed=5
        )

    print(
        f"N={args.n_train} bs={args.batch_size} -> "
        f"{fresh_batcher().num_batches} batches/epoch, tail size "
        f"{args.n_train % args.batch_size}; {args.iters} iterations"
    )
    loss_a, st_a = run_variant(
        model, cfg, state0, fresh_batcher(), args.iters, False, 2022
    )
    loss_b, st_b = run_variant(
        model, cfg, state0, fresh_batcher(), args.iters, True, 2022
    )
    loss_c, st_c = run_variant(
        model, cfg, state0, fresh_batcher(), args.iters, False, 2023
    )

    def val_dice(st):
        m = evaluate_client(
            model, st.params, st.batch_stats, val.images,
            val.labels.astype(np.int32), cfg.num_classes, emb_idx=0, batch=6,
        )
        return m["mean_dice"]

    out = {
        "mean_abs_dloss_wrap_vs_short": float(np.abs(loss_a - loss_b).mean()),
        "mean_abs_dloss_rng_control": float(np.abs(loss_a - loss_c).mean()),
        "max_abs_dloss_wrap_vs_short": float(np.abs(loss_a - loss_b).max()),
        "max_abs_dloss_rng_control": float(np.abs(loss_a - loss_c).max()),
        "param_rel_dist_wrap_vs_short": param_rel_dist(
            st_a.params, st_b.params
        ),
        "param_rel_dist_rng_control": param_rel_dist(st_a.params, st_c.params),
        "val_dice_wrap": val_dice(st_a),
        "val_dice_short": val_dice(st_b),
        "val_dice_rng_control": val_dice(st_c),
        "final_loss_wrap": float(loss_a[-1]),
        "final_loss_short": float(loss_b[-1]),
        "final_loss_rng_control": float(loss_c[-1]),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
