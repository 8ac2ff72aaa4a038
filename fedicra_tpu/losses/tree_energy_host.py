"""Host-side multi-scale tree-energy loss: forward + analytic cotangents.

Used by the split-step trainer (engine/split_trainer.py) on platforms whose
PJRT runtime cannot host callbacks inside jit: the device program ships
(prob, guide image, native-res aux heads, ROI) to the host, this module runs
the full recursive filter chain with the native C++ tree filter and returns
the loss plus d(loss)/d(prob, aux1, aux2, aux3); the device program then
injects those cotangents linearly into the objective.

Numerically identical to losses/tree_energy.multi_scale_tree_energy_loss
(verified in tests): AS = F_low(prob); AS_k = F_hk(AS_{k-1}); loss =
weight * sum(ROI * |prob - AS_3|) / sum(ROI); |.|' at 0 is 0 (torch parity).
"""

from __future__ import annotations

import hashlib
import os
from collections import OrderedDict
from typing import Tuple

import numpy as np

# LRU of precomputed low-level tree structures keyed by the guide batch's
# content hash. The reference materializes an epoch of batches once and
# replays them by index across rounds (quirk #9, ..._Ours.py:71-79), so the
# guide image — and therefore its MST/rooting, the dominant level cost —
# repeats exactly. Sized to cover a full epoch of distinct batches (ODOC
# 889/12=75 @ ~21MB/entry, FAZ 1332/12=111 @ ~9MB/entry — ~1.6GB worst
# case), else an 8-entry LRU would *never* hit during real training. Keyed
# by the (h, w) grid (edge topology) + a 128-bit blake2b content digest so
# a hash hit cannot silently reuse a wrong tree.
_LOW_TREE_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_LOW_TREE_CACHE_MAX = int(os.environ.get("FEDICRA_LOW_TREE_CACHE", "128"))
_CACHE_STATS = {"hits": 0, "misses": 0, "disk_hits": 0}


def low_tree_cache_stats() -> dict:
    """Hit/miss counters + occupancy (bench/observability)."""
    return dict(_CACHE_STATS, size=len(_LOW_TREE_CACHE), max=_LOW_TREE_CACHE_MAX)


# Version of native.tree_low_structure_build's OUTPUT representation
# (parent/order/w layout + tie-breaking). Bump whenever a change to the
# builder can alter the emitted arrays, so warm disk caches can't silently
# serve structures built by older logic (the same latent-bug class the
# round-4 advisor flagged for the decoded-split cache). Version 1 keeps the
# historical unversioned filenames — the round-5 r3-vs-HEAD bitwise check
# (BASELINE.md round-5 divergence forensics) verified every era through
# round 5 emits identical structures, so existing entries are all "v1".
_STRUCTURE_VERSION = 1


def _disk_cache_dir() -> str | None:
    """Second cache level on disk: the MST/rooting depends only on the guide
    image (which never changes across relaunches), so a process restart —
    watchdog resume, quiesce yield, wedge recovery — shouldn't repay ~10-15s
    per distinct batch rebuilding trees the previous process already built.
    FEDICRA_TREE_CACHE_DIR= (empty) disables."""
    d = os.environ.get("FEDICRA_TREE_CACHE_DIR")
    if d is None:
        d = os.path.expanduser("~/.cache/fedicra_tpu/trees")
    return d or None


def _low_structure_cached(low_f: np.ndarray, hw: tuple, eu, ev, sigma: float):
    from .. import native

    digest = hashlib.blake2b(low_f.tobytes(), digest_size=16).digest()
    key = (low_f.shape, tuple(hw), float(sigma), digest)
    hit = _LOW_TREE_CACHE.get(key)
    if hit is not None:
        _CACHE_STATS["hits"] += 1
        _LOW_TREE_CACHE.move_to_end(key)
        return hit
    _CACHE_STATS["misses"] += 1
    ddir = _disk_cache_dir()
    fname = None
    if ddir:
        shape_tag = "x".join(map(str, low_f.shape + tuple(hw)))
        ver = "" if _STRUCTURE_VERSION == 1 else f"_v{_STRUCTURE_VERSION}"
        fname = os.path.join(
            ddir, f"{digest.hex()}_{shape_tag}_{float(sigma)}{ver}.npz"
        )
        try:
            with np.load(fname) as z:
                structure = (z["parent"], z["order"], z["w"])
            _CACHE_STATS["disk_hits"] += 1
        except (OSError, KeyError):
            structure = None
    else:
        structure = None
    if structure is None:
        structure = native.tree_low_structure_build(low_f, eu, ev, sigma)
        if fname:
            try:
                os.makedirs(ddir, exist_ok=True)
                # savez appends .npz unless the name already ends with it
                tmp = f"{fname}.{os.getpid()}.tmp.npz"
                np.savez(tmp, parent=structure[0], order=structure[1],
                         w=structure[2])
                os.replace(tmp, fname)  # atomic vs concurrent writers
            except OSError:
                pass
    _LOW_TREE_CACHE[key] = structure
    while len(_LOW_TREE_CACHE) > _LOW_TREE_CACHE_MAX:
        _LOW_TREE_CACHE.popitem(last=False)
    return structure


def linear_resize_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Row-stochastic [n_out, n_in] matrix reproducing jax.image.resize
    method='linear' upsampling (half-pixel centers, edge clamp) exactly."""
    W = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        pos = (i + 0.5) * scale - 0.5
        j0 = int(np.floor(pos))
        f = pos - j0
        a = min(max(j0, 0), n_in - 1)
        b = min(max(j0 + 1, 0), n_in - 1)
        W[i, a] += 1.0 - f
        W[i, b] += f
    return W


def _apply_rows(M: np.ndarray, x: np.ndarray) -> np.ndarray:
    """out[b,i,w,c] = sum_j M[i,j] x[b,j,w,c] as ONE big BLAS GEMM.

    np.einsum's element loop runs ~1-2 GFLOP/s on these contractions —
    ~10 s/iteration of host resize at the headline config (the round-2
    throughput regression); a reshaped sgemm is ~10x faster and
    multithreaded on production hosts."""
    b, j, w, c = x.shape
    xt = np.ascontiguousarray(np.moveaxis(x, 1, 0).reshape(j, b * w * c))
    y = M @ xt  # (i, b*w*c)
    return np.moveaxis(y.reshape(M.shape[0], b, w, c), 0, 1)


def _apply_cols(M: np.ndarray, x: np.ndarray) -> np.ndarray:
    """out[b,h,i,c] = sum_j M[i,j] x[b,h,j,c] as one big GEMM."""
    b, h, j, c = x.shape
    xt = np.ascontiguousarray(np.moveaxis(x, 2, 0).reshape(j, b * h * c))
    y = M @ xt
    return np.moveaxis(y.reshape(M.shape[0], b, h, c), 0, 2)


def resize_up_host(x: np.ndarray, H: int, W: int) -> np.ndarray:
    """Bilinear upsample [B,h,w,C] -> [B,H,W,C], == jax resize 'linear'."""
    b, h, w, c = x.shape
    if (h, w) == (H, W):
        return x
    Wh = linear_resize_matrix(H, h)
    Ww = linear_resize_matrix(W, w)
    return _apply_cols(Ww, _apply_rows(Wh, x))


def resize_adjoint_host(d: np.ndarray, h: int, w: int) -> np.ndarray:
    """Adjoint of resize_up_host: pull a full-res cotangent [B,H,W,C] back
    to the native resolution [B,h,w,C] (R^T d). Linearity makes injecting
    native-res cotangents into the native-res aux heads exactly equivalent
    to injecting full-res cotangents into resized heads."""
    b, H, W, c = d.shape
    if (H, W) == (h, w):
        return d
    Wh = linear_resize_matrix(H, h)
    Ww = linear_resize_matrix(W, w)
    return _apply_cols(Ww.T, _apply_rows(Wh.T, d))


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
    aux1: np.ndarray,  # [B,h1,w1,C] aux head at ANY resolution (native or full)
    aux2: np.ndarray,
    aux3: np.ndarray,
    rois: np.ndarray,  # [B,H,W]
    weight: float,
    *,
    sigma: float = 0.02,
    recursive: bool = True,
    roi_total: float | None = None,
    per_image: bool = False,
) -> Tuple[float, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (loss, d_prob, d_aux1, d_aux2, d_aux3).

    ``roi_total``: override the ROI normalizer N (for chunked callers that
    process a slice of the batch but must normalize by the whole batch's ROI
    count, exactly as the unchunked call would). ``per_image``: return the
    un-summed float32 [B] loss vector as the first element.

    Aux heads may arrive at their native decoder resolution: they are
    bilinearly upsampled here (== the device's jax.image.resize 'linear'),
    and each returned d_aux_i is pulled back through the resize adjoint to
    the *input* aux_i shape — so the caller injects it at native resolution
    and by linearity gets exactly the full-res gradient.
    """
    from ..ops.mst import grid_edges

    b, h, w, c = prob.shape
    V = h * w
    eu, ev = grid_edges(h, w)
    flat = lambda t: np.ascontiguousarray(t.reshape(b, V, t.shape[-1]), np.float32)
    prob_f = flat(prob)
    low_f = flat(low)
    aux_in = (aux1, aux2, aux3)
    a_f = [flat(resize_up_host(np.asarray(a, np.float32), h, w)) for a in aux_in]

    roi_b = rois.reshape(b, V).astype(np.float32)
    n = float(roi_b.sum()) if roi_total is None else float(roi_total)
    scale = weight / (n if n > 0 else 1.0)

    from .. import native

    loss, d_prob, d_a1, d_a2, d_a3 = native.tree_energy_chain_host(
        low_f, prob_f, a_f[0], a_f[1], a_f[2], roi_b, scale, sigma, eu, ev,
        low_structure=_low_structure_cached(low_f, (h, w), eu, ev, sigma),
        recursive=recursive,
        per_image=per_image,
    )
    unflat = lambda t, ch: t.reshape(b, h, w, ch)
    d_aux = [
        resize_adjoint_host(unflat(d, c), a.shape[1], a.shape[2])
        for d, a in zip((d_a1, d_a2, d_a3), aux_in)
    ]
    return (loss, unflat(d_prob, c), d_aux[0], d_aux[1], d_aux[2])


def multi_scale_tree_loss_host_packed(
    packed: np.ndarray,  # [B,H,W,4C] f32 or bfloat16: [probs|aux1|aux2|aux3]
    low: np.ndarray,     # [B,H,W,3] guide image, float32
    rois: np.ndarray,    # [B,H,W]
    weight: float,
    *,
    sigma: float = 0.02,
    recursive: bool = True,
    roi_total: float | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Packed fast path for the split trainer's aux_full mode: the device
    ships ONE (B,H,W,4C) array (probs + full-res aux heads), this returns
    (per_image_loss [B], d_packed float32 [B,H,W,4C]) with the cotangents in
    the same layout for a single upload. Numerically identical to calling
    ``multi_scale_tree_loss_host`` on the widened channel slices — bf16
    input widens exactly, the chain is the same chain_one — but skips the
    ~2 s/iteration of numpy strided slice/concatenate copies (measured at
    384^2 bs12 on the 1-core dev host; tests/test_split_chunked.py pins the
    equivalence)."""
    from ..ops.mst import grid_edges
    from .. import native

    b, h, w, p = packed.shape
    c = p // 4
    V = h * w
    eu, ev = grid_edges(h, w)
    low_f = np.ascontiguousarray(low.reshape(b, V, low.shape[-1]), np.float32)
    roi_b = rois.reshape(b, V).astype(np.float32)
    n = float(roi_b.sum()) if roi_total is None else float(roi_total)
    scale = weight / (n if n > 0 else 1.0)
    loss, d_packed = native.tree_energy_chain_host_packed(
        low_f, packed.reshape(b, V, p), roi_b, scale, sigma, eu, ev,
        low_structure=_low_structure_cached(low_f, (h, w), eu, ev, sigma),
        recursive=recursive,
    )
    return loss, d_packed.reshape(b, h, w, p)


def multi_scale_tree_loss_host_npacked(
    packed: np.ndarray,  # [B, L] f32/bf16: [prob|aux1|aux2|aux3] flat blocks
    low: np.ndarray,     # [B,H,W,3] guide image, float32
    rois: np.ndarray,    # [B,H,W]
    weight: float,
    hws,                 # [(H,W),(h1,w1),(h2,w2),(h3,w3)] per-block shapes
    *,
    sigma: float = 0.02,
    recursive: bool = True,
    roi_total: float | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Native-resolution packed fast path (FEDICRA_AUX_SHIP=native): the
    device ships ONE flat (B, L) array whose aux blocks stay at decoder
    resolution (~42% fewer wire bytes than the full-res packed format at
    384^2); the C++ workers upsample them to full res (bilinear, == jax
    resize 'linear'), run the same chain, and pull the aux cotangents back
    through the resize adjoint, re-packed in the same flat layout. Returns
    (per_image_loss [B], d_packed float32 [B, L]). Equivalence with the
    composed unpacked path is pinned bitwise in tests/test_tree_host.py."""
    from ..ops.mst import grid_edges
    from .. import native

    b = packed.shape[0]
    (h, w) = hws[0]
    V = h * w
    eu, ev = grid_edges(h, w)
    low_f = np.ascontiguousarray(low.reshape(b, V, low.shape[-1]), np.float32)
    roi_b = rois.reshape(b, V).astype(np.float32)
    n = float(roi_b.sum()) if roi_total is None else float(roi_total)
    scale = weight / (n if n > 0 else 1.0)
    return native.tree_energy_chain_host_npacked(
        low_f, packed, roi_b, scale, sigma, eu, ev, hws,
        low_structure=_low_structure_cached(low_f, (h, w), eu, ev, sigma),
        recursive=recursive,
    )
