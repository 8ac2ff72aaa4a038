"""Tree energy losses: single-scale, multi-scale additive and recursive.

Behavioural parity with /root/reference/code/flower_common.py:
- TreeEnergyLoss (:646-689): low-level MST from guide features (sigma=0.02),
  filter the softmax probs into soft pseudo-labels AS, optionally refine once
  through a high-level tree (sigma=1, weight-gradients enabled);
  loss = weight * sum(ROI * |prob - AS|) / sum(ROI).
- MScaleAddTreeEnergyLoss (:692-753): three high-level trees each filter the
  *same* low-level AS; loss sums the three |prob - AS_k| terms.
- MScaleRecurveTreeEnergyLoss (:756-818): the "Ours" loss — the three
  high-level trees are chained (AS -> AS_1 -> AS_2 -> AS_3) and the loss is
  taken on AS_3 only. Returns (loss, AS_1, AS_2, AS_3).

MST edge weights are ||dfeat||^2 + 1 (modules/tree_filter.py:27-34); the
filter re-derives per-edge weights from features as exp(-||dfeat||^2 / sigma)
for the low tree and exp(-||dfeat||^2) for high trees.

TPU-native: everything stays on device — MST, tree build, and filtering are
the dense JAX primitives of :mod:`fedicra_tpu.ops` (the reference round-trips
every MST through CPU threads). Layout NHWC; batch handled with vmap.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.mst import boruvka_mst, grid_edges
from ..ops.tree import build_tree
from ..ops.tree_filter import tree_filter

Array = jax.Array


def _resize_bilinear(x: Array, hw: Tuple[int, int]) -> Array:
    """torch F.interpolate(mode='bilinear', align_corners=False) parity."""
    if x.shape[-3:-1] == hw:
        return x
    return jax.image.resize(x, (*x.shape[:-3], *hw, x.shape[-1]), method="linear")


def _resize_nearest(x: Array, hw: Tuple[int, int]) -> Array:
    if x.shape[-3:-1] == hw:
        return x
    return jax.image.resize(x, (*x.shape[:-3], *hw, x.shape[-1]), method="nearest")


def _mst_structure(feats: Array, eu: Array, ev: Array):
    """feats: [H, W, C] guide; returns TreeStructure for its 4-connected MST."""
    h, w, _ = feats.shape
    flat = feats.reshape(h * w, -1)
    # MST weights: ||dfeat||^2 + 1 (tie-break by edge index inside boruvka)
    dist = jnp.sum((flat[eu] - flat[ev]) ** 2, axis=-1) + 1.0
    dist = jax.lax.stop_gradient(dist)
    sel = boruvka_mst(eu, ev, dist, h * w)
    return build_tree(eu, ev, sel, h * w)


def _filter_image(
    feature: Array, embed: Array, struct, *, sigma: float, low_tree: bool
) -> Array:
    """feature/embed: [H, W, C]; filter over the tree, back to image shape."""
    h, w, c = feature.shape
    out = tree_filter(
        feature.reshape(h * w, c),
        embed.reshape(h * w, -1),
        struct,
        sigma=sigma,
        low_tree=low_tree,
    )
    return out.reshape(h, w, c)


def _single_image_recursive(
    prob: Array,
    low: Array,
    highs: Tuple[Array, ...],
    eu: Array,
    ev: Array,
    *,
    sigma: float,
    recursive: bool,
):
    """Run low-level filtering then the chain/fan of high-level refinements."""
    struct = _mst_structure(low, eu, ev)
    AS = _filter_image(prob, low, struct, sigma=sigma, low_tree=True)
    outs = []
    cur = AS
    for hf in highs:
        struct_h = _mst_structure(hf, eu, ev)
        src = cur if recursive else AS
        nxt = _filter_image(src, hf, struct_h, sigma=sigma, low_tree=False)
        outs.append(nxt)
        cur = nxt
    return AS, outs


def _prep(preds: Array, low_feats: Array, unlabeled_rois: Array):
    b, h, w, _ = preds.shape
    low = jax.lax.stop_gradient(_resize_bilinear(low_feats, (h, w)))
    rois = _resize_nearest(unlabeled_rois[..., None].astype(preds.dtype), (h, w))
    prob = jax.nn.softmax(preds, axis=-1)
    return prob, low, rois


def _use_host_offload(host_offload) -> bool:
    """Auto policy: offload the graph phase to the native C++ on accelerator
    backends (TPU gathers make the on-device pointer-chasing path
    memory-bound; see ops/tree_filter_host.py). Pure-JAX path on CPU."""
    if host_offload is not None:
        return bool(host_offload)
    if jax.default_backend() in ("tpu", "axon"):
        try:
            from .. import native

            return native.available()
        except Exception:
            return False
    return False


def _roi_l1(prob: Array, AS: Array, rois: Array) -> Array:
    n = jnp.sum(rois)
    loss = jnp.sum(rois * jnp.abs(prob - AS))
    return jnp.where(n > 0, loss / jnp.maximum(n, 1.0), loss)


def _host_filter_chain(prob, low, highs, h, w, *, sigma, recursive):
    """Batched host-offloaded low + high filtering chain. Shapes [B,H,W,C]."""
    from ..ops.mst import grid_edges as _ge
    from ..ops.tree_filter_host import make_host_tree_filter

    eu, ev = _ge(h, w)
    b, _, _, c = prob.shape
    V = h * w
    flat = lambda t: t.reshape(b, V, t.shape[-1])
    unflat = lambda t: t.reshape(b, h, w, -1)

    filt_low = make_host_tree_filter(eu, ev, sigma=sigma, low_tree=True)
    filt_high = make_host_tree_filter(eu, ev, sigma=sigma, low_tree=False)

    AS = unflat(filt_low(flat(prob), jax.lax.stop_gradient(flat(low))))
    outs = []
    cur = AS
    for hf in highs:
        src = cur if recursive else AS
        nxt = unflat(filt_high(flat(src), flat(hf)))
        outs.append(nxt)
        cur = nxt
    return AS, outs


def tree_energy_loss(
    preds: Array,
    low_feats: Array,
    high_feats: Optional[Array],
    unlabeled_rois: Array,
    weight: float,
    *,
    sigma: float = 0.02,
    host_offload: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Single-scale TreeEnergyLoss (flower_common.py:646-689).

    preds: logits [B,H,W,C]; low_feats: guide image [B,h,w,D];
    high_feats: aux logits or None; unlabeled_rois: [B,H,W] bool/float.
    """
    b, h, w, _ = preds.shape
    prob, low, rois = _prep(preds, low_feats, unlabeled_rois)

    highs = ()
    if high_feats is not None:
        highs = (_resize_bilinear(high_feats, (h, w)),)

    if _use_host_offload(host_offload):
        AS0, outs = _host_filter_chain(
            prob, low, highs, h, w, sigma=sigma, recursive=True
        )
        AS = outs[-1] if outs else AS0
        return weight * _roi_l1(prob, AS, rois), AS

    eu, ev = (jnp.asarray(a) for a in grid_edges(h, w))

    def per_image(p, l, hs):
        AS, outs = _single_image_recursive(
            p, l, tuple(hs), eu, ev, sigma=sigma, recursive=True
        )
        return outs[-1] if outs else AS

    if highs:
        AS = jax.vmap(lambda p, l, h1: per_image(p, l, (h1,)))(prob, low, highs[0])
    else:
        AS = jax.vmap(lambda p, l: per_image(p, l, ()))(prob, low)
    return weight * _roi_l1(prob, AS, rois), AS


def multi_scale_tree_energy_loss(
    preds: Array,
    low_feats: Array,
    aux1: Array,
    aux2: Array,
    aux3: Array,
    unlabeled_rois: Array,
    weight: float,
    *,
    sigma: float = 0.02,
    recursive: bool = True,
    host_offload: Optional[bool] = None,
) -> Tuple[Array, Array, Array, Array]:
    """MScaleRecurve (recursive=True) / MScaleAdd (False) tree energy loss.

    Returns (loss, AS_1, AS_2, AS_3) like the reference
    (flower_common.py:756-818 / :692-753).
    """
    b, h, w, _ = preds.shape
    prob, low, rois = _prep(preds, low_feats, unlabeled_rois)
    h1 = _resize_bilinear(aux1, (h, w))
    h2 = _resize_bilinear(aux2, (h, w))
    h3 = _resize_bilinear(aux3, (h, w))

    if _use_host_offload(host_offload):
        _, (AS_1, AS_2, AS_3) = _host_filter_chain(
            prob, low, (h1, h2, h3), h, w, sigma=sigma, recursive=recursive
        )
    else:
        eu, ev = (jnp.asarray(a) for a in grid_edges(h, w))

        def per_image(p, l, f1, f2, f3):
            _, outs = _single_image_recursive(
                p, l, (f1, f2, f3), eu, ev, sigma=sigma, recursive=recursive
            )
            return outs[0], outs[1], outs[2]

        AS_1, AS_2, AS_3 = jax.vmap(per_image)(prob, low, h1, h2, h3)
    if recursive:
        loss = _roi_l1(prob, AS_3, rois)
    else:
        loss = (
            jnp.sum(rois * jnp.abs(prob - AS_1))
            + jnp.sum(rois * jnp.abs(prob - AS_2))
            + jnp.sum(rois * jnp.abs(prob - AS_3))
        )
        n = jnp.sum(rois)
        loss = jnp.where(n > 0, loss / jnp.maximum(n, 1.0), loss)
    return weight * loss, AS_1, AS_2, AS_3
