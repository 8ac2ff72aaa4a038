"""Online validation: per-case inference + per-class metric aggregation.

Reference parity (val_2D.py:25-74, flower_common.py:122-151):
- eval-mode forward (running BN stats, no dropout), argmax over classes;
- per class i in 1..C-1: class 1 compares exact match (pred==1 vs gt==1),
  classes >= 2 compare the union (pred>=1 vs gt>=1) — the ODOC cup/disc
  convention applied to every task;
- per-client metric means over the val set; 7 metrics per class.

TPU-native: cases are batched and the metric kernel vmapped; medpy's
sequential host loop becomes one compiled program.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import METRIC_NAMES, metrics_percase

Array = jax.Array


@partial(jax.jit, static_argnames=("model",))
def predict_labels(model, params, batch_stats, images: Array, emb_idx=None) -> Array:
    """argmax prediction, eval mode. images [N,H,W,C] -> [N,H,W] int32.

    Jitted with the flax module as a static argument (frozen dataclass,
    hashable): an eager ``model.apply`` dispatches every op separately, which
    on a tunneled remote runtime costs ~10+ s per val batch in round-trip
    latency alone — one compiled program per (model, shape, emb) signature
    makes each val batch a single dispatch (measured ~5x faster full-client
    eval through the tunnel)."""
    kwargs = {}
    if emb_idx is not None:
        kwargs["emb_idx"] = emb_idx
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        images,
        train=False,
        **kwargs,
    )
    return jnp.argmax(out["logits"], axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("num_classes",))
def metrics_batch(preds: Array, gts: Array, num_classes: int) -> Array:
    """Per-case per-class metrics. preds/gts [N,H,W] -> [N, C-1, 7]."""

    def per_case(pred, gt):
        rows = []
        for i in range(1, num_classes):
            if i == 1:
                rows.append(metrics_percase(pred == 1, gt == 1))
            else:
                rows.append(metrics_percase(pred >= 1, gt >= 1))
        return jnp.stack(rows)

    return jax.vmap(per_case)(preds, gts)


def evaluate_client(
    model,
    params,
    batch_stats,
    images: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    emb_idx: Optional[int] = None,
    batch: int = 8,
) -> Dict[str, float]:
    """Mean metrics over a client's val set (reference evaluate(),
    flower_common.py:122-137): per-case class-mean then case-mean."""
    n = images.shape[0]
    all_metrics = []
    for s in range(0, n, batch):
        img = images[s : s + batch]
        gt = labels[s : s + batch].astype(np.int32)
        # pad the tail batch to the full batch size (repeat the last case)
        # so every eval call shares ONE compiled signature — ragged tails
        # would each cost a separate multi-minute remote compile
        pad = batch - img.shape[0]
        if pad:
            img = np.concatenate([img, np.repeat(img[-1:], pad, axis=0)])
            gt = np.concatenate([gt, np.repeat(gt[-1:], pad, axis=0)])
        img_j = jnp.asarray(img)
        gt_j = jnp.asarray(gt)
        emb = None
        if emb_idx is not None:
            emb = jnp.full((img_j.shape[0],), emb_idx, dtype=jnp.int32)
        preds = predict_labels(model, params, batch_stats, img_j, emb_idx=emb)
        mb = np.asarray(metrics_batch(preds, gt_j, num_classes))
        all_metrics.append(mb[: batch - pad] if pad else mb)
    m = np.concatenate(all_metrics, axis=0)  # [N, C-1, 7]
    mean_per_class = m.mean(axis=0)  # [C-1, 7]
    out = {}
    for ci in range(mean_per_class.shape[0]):
        for mi, name in enumerate(METRIC_NAMES):
            out[f"class{ci + 1}_{name}"] = float(mean_per_class[ci, mi])
    for mi, name in enumerate(METRIC_NAMES):
        out[f"mean_{name}"] = float(mean_per_class[:, mi].mean())
    return out
