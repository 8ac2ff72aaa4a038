"""Host-side multi-scale tree-energy loss: forward + analytic cotangents.

Used by the split-step trainer (engine/split_trainer.py) on platforms whose
PJRT runtime cannot host callbacks inside jit: the device program ships
(prob, guide image, resized aux heads, ROI) to the host, this module runs
the full recursive filter chain with the native C++ tree filter and returns
the loss plus d(loss)/d(prob, aux1, aux2, aux3); the device program then
injects those cotangents linearly into the objective.

Numerically identical to losses/tree_energy.multi_scale_tree_energy_loss
(verified in tests): AS = F_low(prob); AS_k = F_hk(AS_{k-1}); loss =
weight * sum(ROI * |prob - AS_3|) / sum(ROI); |.|' at 0 is 0 (torch parity).
"""

from __future__ import annotations

import zlib
from collections import OrderedDict
from typing import Tuple

import numpy as np

# LRU of precomputed low-level tree structures keyed by the guide batch's
# content hash. The reference materializes an epoch of batches once and
# replays them by index across rounds (quirk #9, ..._Ours.py:71-79), so the
# guide image — and therefore its MST/rooting, the dominant level cost —
# repeats exactly. Content-addressed (full-buffer crc32, ~10ms for a 21MB
# batch) so a hash hit can never reuse a wrong tree silently.
_LOW_TREE_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_LOW_TREE_CACHE_MAX = 8


def _low_structure_cached(low_f: np.ndarray, eu, ev, sigma: float):
    from .. import native

    key = (low_f.shape, float(sigma), zlib.crc32(low_f.tobytes()))
    hit = _LOW_TREE_CACHE.get(key)
    if hit is not None:
        _LOW_TREE_CACHE.move_to_end(key)
        return hit
    structure = native.tree_low_structure_build(low_f, eu, ev, sigma)
    _LOW_TREE_CACHE[key] = structure
    while len(_LOW_TREE_CACHE) > _LOW_TREE_CACHE_MAX:
        _LOW_TREE_CACHE.popitem(last=False)
    return structure


def _filter_fwd(embed, x, eu, ev, sigma, low_tree):
    from .. import native

    return native.tree_filter_host_batch(embed, x, eu, ev, sigma, low_tree)


def _filter_bwd(embed, x, g, eu, ev, sigma, low_tree):
    from .. import native

    _, dx, dembed = native.tree_filter_host_batch(
        embed, x, eu, ev, sigma, low_tree, gout=g
    )
    return dx, dembed


def multi_scale_tree_loss_host(
    prob: np.ndarray,  # [B,H,W,C] softmax probabilities
    low: np.ndarray,  # [B,H,W,D] guide image (3-channel)
    aux1: np.ndarray,  # [B,H,W,C] full-res (already resized on device)
    aux2: np.ndarray,
    aux3: np.ndarray,
    rois: np.ndarray,  # [B,H,W]
    weight: float,
    *,
    sigma: float = 0.02,
    recursive: bool = True,
) -> Tuple[float, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (loss, d_prob, d_aux1, d_aux2, d_aux3)."""
    from ..ops.mst import grid_edges

    b, h, w, c = prob.shape
    V = h * w
    eu, ev = grid_edges(h, w)
    flat = lambda t: np.ascontiguousarray(t.reshape(b, V, t.shape[-1]), np.float32)
    prob_f = flat(prob)
    low_f = flat(low)
    a_f = [flat(aux1), flat(aux2), flat(aux3)]

    if not recursive:
        raise NotImplementedError(
            "host path implements the recursive ('Ours') variant; the "
            "additive variant runs on the device path"
        )

    roi_b = rois.reshape(b, V).astype(np.float32)
    n = float(roi_b.sum())
    scale = weight / (n if n > 0 else 1.0)

    from .. import native

    loss, d_prob, d_a1, d_a2, d_a3 = native.tree_energy_chain_host(
        low_f, prob_f, a_f[0], a_f[1], a_f[2], roi_b, scale, sigma, eu, ev,
        low_structure=_low_structure_cached(low_f, eu, ev, sigma),
    )
    d_aux = [d_a1, d_a2, d_a3]

    unflat = lambda t, ch: t.reshape(b, h, w, ch)
    return (
        loss,
        unflat(d_prob, c),
        unflat(d_aux[0], c),
        unflat(d_aux[1], c),
        unflat(d_aux[2], c),
    )
