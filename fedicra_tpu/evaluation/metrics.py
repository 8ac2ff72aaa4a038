"""Segmentation metrics in pure JAX (medpy.metric.binary semantics).

The reference evaluates 7 online metrics per class
(['dice','hd95','recall','precision','jc','specificity','ravd'],
flower_common.py:121, computed by medpy in val_2D.py:9-22) plus ASSD offline
(test.py). medpy is a host/CPU library; here everything runs on device:

- overlap metrics are confusion-count expressions;
- surface metrics (hd95 / asd / assd) use boundary extraction by binary
  erosion (medpy's definition) and *masked pairwise distances* between padded
  boundary point sets — static shapes, one big distance matrix that the MXU
  eats for breakfast, instead of medpy's sequential EDT.

Reference quirk reproduced at the caller level (val_2D.py:67-73): when a
prediction is empty, every metric is reported as 0.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

METRIC_NAMES = ("dice", "hd95", "recall", "precision", "jc", "specificity", "ravd")


def _counts(pred: Array, gt: Array) -> Tuple[Array, Array, Array, Array]:
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    tp = jnp.sum(pred * gt)
    fp = jnp.sum(pred * (1 - gt))
    fn = jnp.sum((1 - pred) * gt)
    tn = jnp.sum((1 - pred) * (1 - gt))
    return tp, fp, fn, tn


def dice(pred: Array, gt: Array) -> Array:
    tp, fp, fn, _ = _counts(pred, gt)
    return 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-8)


def jaccard(pred: Array, gt: Array) -> Array:
    tp, fp, fn, _ = _counts(pred, gt)
    return tp / jnp.maximum(tp + fp + fn, 1e-8)


def recall(pred: Array, gt: Array) -> Array:
    tp, _, fn, _ = _counts(pred, gt)
    return tp / jnp.maximum(tp + fn, 1e-8)


def precision(pred: Array, gt: Array) -> Array:
    tp, fp, _, _ = _counts(pred, gt)
    return tp / jnp.maximum(tp + fp, 1e-8)


def specificity(pred: Array, gt: Array) -> Array:
    _, fp, _, tn = _counts(pred, gt)
    return tn / jnp.maximum(tn + fp, 1e-8)


def ravd(pred: Array, gt: Array) -> Array:
    """medpy ravd: (|pred| - |gt|) / |gt| (result vs reference volumes)."""
    vp = jnp.sum(pred.astype(jnp.float32))
    vg = jnp.sum(gt.astype(jnp.float32))
    return (vp - vg) / jnp.maximum(vg, 1e-8)


def _boundary(mask: Array) -> Array:
    """medpy-style border: mask ^ erosion(mask) with the 4-connected cross.

    Erosion with zero padding outside (pixels at the image border erode).
    """
    m = mask.astype(bool)
    p = jnp.pad(m, 1, constant_values=False)
    er = (
        p[1:-1, 1:-1]
        & p[:-2, 1:-1]
        & p[2:, 1:-1]
        & p[1:-1, :-2]
        & p[1:-1, 2:]
    )
    return m & ~er


def _boundary_points(mask: Array, max_points: int) -> Tuple[Array, Array]:
    """Top-k packed boundary coordinates + validity mask (static shape)."""
    b = _boundary(mask)
    h, w = b.shape
    flat = b.reshape(-1)
    # stable ordering: valid points first, by flat index
    order = jnp.argsort(jnp.where(flat, jnp.arange(h * w), h * w))[:max_points]
    valid = flat[order]
    ys = (order // w).astype(jnp.float32)
    xs = (order % w).astype(jnp.float32)
    pts = jnp.stack([ys, xs], axis=1)
    return pts, valid


def _directed_dists(
    pts_a: Array, va: Array, pts_b: Array, vb: Array
) -> Tuple[Array, Array]:
    """min distance from each valid point of A to the valid set of B."""
    # squared distance matrix via the MXU: |a|^2 + |b|^2 - 2 a.b
    an = jnp.sum(pts_a * pts_a, axis=1, keepdims=True)
    bn = jnp.sum(pts_b * pts_b, axis=1, keepdims=True)
    d2 = an + bn.T - 2.0 * (pts_a @ pts_b.T)
    d2 = jnp.maximum(d2, 0.0)
    d2 = jnp.where(vb[None, :], d2, jnp.inf)
    dmin = jnp.sqrt(jnp.min(d2, axis=1))
    return dmin, va


def _masked_percentile(vals: Array, valid: Array, q: float) -> Array:
    """numpy 'linear' percentile over the valid entries (padded arrays)."""
    big = jnp.asarray(jnp.inf, vals.dtype)
    n = jnp.sum(valid)
    sorted_vals = jnp.sort(jnp.where(valid, vals, big))
    pos = (q / 100.0) * (n.astype(jnp.float32) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, vals.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, vals.shape[0] - 1)
    frac = pos - lo.astype(jnp.float32)
    v_lo = sorted_vals[lo]
    v_hi = jnp.where(hi < n, sorted_vals[hi], v_lo)
    return v_lo + frac * (v_hi - v_lo)


def _masked_mean(vals: Array, valid: Array) -> Array:
    return jnp.sum(jnp.where(valid, vals, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


@partial(jax.jit, static_argnames=("max_points",))
def surface_distances(
    pred: Array, gt: Array, max_points: int = 4096
) -> Dict[str, Array]:
    """hd95 / asd / assd between binary masks (2D), medpy conventions.

    hd95: 95th percentile of the concatenated symmetric surface distances;
    assd: mean of the concatenated distances; asd: mean pred->gt distance.
    """
    pa, va = _boundary_points(pred, max_points)
    pb, vb = _boundary_points(gt, max_points)
    d_ab, m_ab = _directed_dists(pa, va, pb, vb)
    d_ba, m_ba = _directed_dists(pb, vb, pa, va)
    both = jnp.concatenate([d_ab, d_ba])
    both_m = jnp.concatenate([m_ab, m_ba])
    return {
        "hd95": _masked_percentile(both, both_m, 95.0),
        "asd": _masked_mean(d_ab, m_ab),
        "assd": _masked_mean(both, both_m),
    }


@partial(jax.jit, static_argnames=("max_points",))
def metrics_percase(pred: Array, gt: Array, max_points: int = 4096) -> Array:
    """The reference's calculate_metric_percase (val_2D.py:9-22): 7 metrics,
    all-zero when the prediction is empty. pred/gt are binary (H,W)."""
    pred = (pred > 0).astype(jnp.float32)
    gt = (gt > 0).astype(jnp.float32)
    sd = surface_distances(pred, gt, max_points=max_points)
    vals = jnp.stack(
        [
            dice(pred, gt),
            sd["hd95"],
            recall(pred, gt),
            precision(pred, gt),
            jaccard(pred, gt),
            specificity(pred, gt),
            ravd(pred, gt),
        ]
    )
    nonempty = jnp.sum(pred) > 0
    return jnp.where(nonempty, vals, jnp.zeros_like(vals))
