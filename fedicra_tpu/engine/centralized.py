"""Centralized (non-federated) single-site baseline trainer.

Reference: Unet_pCE.py:63-244 — SGD(momentum 0.9, weight_decay 1e-4),
partial-CE loss only, poly LR decay per iteration, validation every
``eval_iters`` (default 20) iterations with best-dice checkpointing.
Epoch loop over a shuffled, per-epoch-augmented dataset.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.batcher import EpochBatcher
from ..data.h5io import ClientSplit
from ..evaluation.evaluate import evaluate_client
from ..losses.partial import partial_cross_entropy
from ..utils.logging import MetricsWriter
from .config import TrainConfig
from .trainer import poly_lr


def train_centralized(
    model,
    cfg: TrainConfig,
    train_split: ClientSplit,
    val_split: ClientSplit,
    max_iterations: Optional[int] = None,
    eval_iters: Optional[int] = None,
    snapshot_dir: Optional[str] = None,
    seed: Optional[int] = None,
    batcher=None,
    loss_log: Optional[list] = None,
):
    """Runs the centralized pCE baseline; returns (state_dict, history).

    ``batcher`` overrides the EpochBatcher (any object with batch_at(it) —
    used by the cross-framework parity tests to inject fixed batches);
    ``loss_log`` when given collects the per-iteration train losses."""
    max_iterations = max_iterations or cfg.max_iterations
    eval_iters = eval_iters or cfg.eval_iters
    seed = cfg.seed if seed is None else seed

    key = jax.random.PRNGKey(seed)
    kp, kd, kr = jax.random.split(key, 3)
    x = jnp.zeros((1, cfg.img_size, cfg.img_size, cfg.in_chns))
    variables = model.init({"params": kp, "dropout": kd}, x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    sched = lambda count: poly_lr(cfg.base_lr, count, max_iterations)
    opt = optax.sgd(learning_rate=sched, momentum=0.9)
    wd = 1e-4
    opt_state = opt.init(params)

    if batcher is None:
        batcher = EpochBatcher(
            train_split, cfg.batch_size, cfg.num_classes, cfg.img_class, seed=seed
        )
    writer = MetricsWriter(snapshot_dir)

    @jax.jit
    def step(params, batch_stats, opt_state, rng, batch):
        rng, k = jax.random.split(rng)

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["image"],
                train=True,
                rngs={"dropout": k},
                mutable=["batch_stats"],
            )
            l = partial_cross_entropy(out["logits"], batch["label"], cfg.num_classes)
            return l, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # torch SGD weight_decay adds wd*p to the gradient before momentum
        grads = jax.tree.map(lambda g, p: g + wd * p, grads, params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, rng, loss

    history = []
    best = 0.0
    rng = kr
    for it in range(max_iterations):
        batch = batcher.batch_at(it)
        params, batch_stats, opt_state, rng, loss = step(
            params, batch_stats, opt_state, rng, batch
        )
        if loss_log is not None:
            loss_log.append(float(loss))
        if (it + 1) % eval_iters == 0:
            m = evaluate_client(
                model, params, batch_stats, val_split.images, val_split.labels,
                cfg.num_classes,
            )
            rec = {"iter": it + 1, "loss": float(loss), **m}
            history.append(rec)
            writer.write(it + 1, rec)
            if m["mean_dice"] > best:
                best = m["mean_dice"]
    return {"params": params, "batch_stats": batch_stats}, history
